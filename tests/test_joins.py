"""As-of join and range join: semantics on hand-built frames, real-data
parity against a naive reference computation, and plan-shape guarantees."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dftly_spark.ops import asof_join, range_join
from dftly_spark.io import normalize_event_ts

SF_DIR = "/root/testdata/sf0.001"


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        (1, "A", _ts("2024-01-01 10:00:00"), 100.0),
        (2, "A", _ts("2024-01-01 10:05:00"), 101.0),
        (3, "B", _ts("2024-01-01 10:01:00"), 50.0),
        (4, "B", _ts("2024-01-01 09:00:00"), 49.0),  # before any quote
    ]
    return spark.createDataFrame(rows, "trade_id long, sym string, ts timestamp, px double")


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        ("A", _ts("2024-01-01 09:59:00"), 99.5),
        ("A", _ts("2024-01-01 10:05:00"), 100.5),  # equal-ts vs trade 2
        ("B", _ts("2024-01-01 10:00:30"), 49.9),
        ("B", _ts("2024-01-01 10:30:00"), 51.0),
    ]
    return spark.createDataFrame(rows, "sym string, ts timestamp, bid double")


def test_asof_backward_semantics(spark, trades, quotes):
    out = asof_join(trades, quotes, on="ts", by="sym", how="left")
    got = {r.trade_id: r.bid_right for r in out.collect()}
    # trade 2 at 10:05 sees the 10:05 quote (ties match backward)
    assert got == {1: 99.5, 2: 100.5, 3: 49.9, 4: None}


def test_asof_inner_drops_unmatched(spark, trades, quotes):
    out = asof_join(trades, quotes, on="ts", by="sym", how="inner")
    assert {r.trade_id for r in out.collect()} == {1, 2, 3}


def test_asof_forward_semantics(spark, trades, quotes):
    out = asof_join(trades, quotes, on="ts", by="sym", direction="forward", how="left")
    got = {r.trade_id: r.bid_right for r in out.collect()}
    # forward: earliest quote at-or-after; trade 2's equal-ts quote matches
    assert got == {1: 100.5, 2: 100.5, 3: 51.0, 4: 49.9}


def test_asof_tolerance_bounds_match_age(spark, trades, quotes):
    out = asof_join(
        trades, quotes, on="ts", by="sym", how="left",
        tolerance_micros=2 * 60 * 1_000_000,
    )
    got = {r.trade_id: r.bid_right for r in out.collect()}
    # trade 1's 09:59 quote is 60s old (in); trade 3's 10:00:30 is 30s (in);
    # nothing within 2min of trades 2? 10:05 quote is 0s old (in)
    assert got == {1: 99.5, 2: 100.5, 3: 49.9, 4: None}


def test_asof_real_events_match_naive(spark):
    """Backward as-of over real events equals a per-row naive scan."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = normalize_event_ts(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    purch = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    got = {
        r.event_id: r.click_id_right
        for r in asof_join(purch, clicks, on="ts", by="user_id").collect()
    }
    by_user = {}
    for r in clicks.collect():
        by_user.setdefault(r.user_id, []).append((r.ts, r.click_id))
    expect = {}
    for r in purch.collect():
        cands = [(t, i) for t, i in by_user.get(r.user_id, []) if t <= r.ts]
        if cands:
            expect[r.event_id] = max(cands)[1]
    assert got == expect


def test_asof_single_exchange(spark, trades, quotes):
    """The whole as-of is ONE hash shuffle on the key + a window sort."""
    plan = (
        asof_join(trades, quotes, on="ts", by="sym")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_boundaries(spark):
    ivl = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
            (2, _ts("2024-01-01 10:30:00"), _ts("2024-01-01 10:30:00")),  # empty
        ],
        "window_id long, start timestamp, end timestamp",
    )
    pts = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 10:00:00")),  # == start: in
            (11, _ts("2024-01-01 10:59:59")),  # in
            (12, _ts("2024-01-01 11:00:00")),  # == end: out (half-open)
            (13, _ts("2024-01-01 09:59:59")),  # out
        ],
        "point_id long, ts timestamp",
    )
    out = range_join(
        pts, ivl, point_on="ts", start_on="start", end_on="end",
        bucket_micros=15 * 60 * 1_000_000,  # interval spans 4 buckets
    )
    assert {(r.window_id, r.point_id) for r in out.collect()} == {(1, 10), (1, 11)}


def test_range_join_left_outer_keeps_empty_intervals(spark):
    ivl = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
            (2, _ts("2024-01-02 00:00:00"), _ts("2024-01-02 01:00:00")),
        ],
        "window_id long, start timestamp, end timestamp",
    )
    pts = spark.createDataFrame(
        [(10, _ts("2024-01-01 10:30:00"))], "point_id long, ts timestamp"
    )
    out = range_join(
        pts, ivl, point_on="ts", start_on="start", end_on="end", how="left_outer"
    ).collect()
    assert {(r.window_id, r.point_id) for r in out} == {(1, 10), (2, None)}


def test_range_join_with_key_and_no_cartesian(spark):
    ivl = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
            ("u2", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
        ],
        "user string, start timestamp, end timestamp",
    )
    pts = spark.createDataFrame(
        [("u1", 10, _ts("2024-01-01 10:30:00")), ("u2", 11, _ts("2024-01-01 12:30:00"))],
        "user string, point_id long, ts timestamp",
    )
    out = range_join(
        pts, ivl, point_on="ts", start_on="start", end_on="end", by="user"
    )
    assert {(r.user, r.point_id) for r in out.collect()} == {("u1", 10)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_self_lineage(spark):
    """Intervals derived from the points table (the ambiguous-self-join trap)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = normalize_event_ts(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    sign = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end"),
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("point_id"), "ts"
    )
    out = range_join(purch, sign, point_on="ts", start_on="start", end_on="end")
    naive = [
        (s.window_id, p.point_id)
        for s in sign.collect()
        for p in purch.collect()
        if s.start <= p.ts < s.end
    ]
    assert {(r.window_id, r.point_id) for r in out.collect()} == set(naive)


# ---------------------------------------------------------------------------
# Property-based: random event sets vs a naive reference implementation
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_ts_us = st.integers(min_value=0, max_value=10_000)
_key = st.integers(min_value=0, max_value=3)


@settings(max_examples=12, deadline=None)
@given(
    lefts=st.lists(st.tuples(_key, _ts_us), min_size=0, max_size=20),
    rights=st.lists(st.tuples(_key, _ts_us, st.floats(-10, 10, allow_nan=False)),
                    min_size=0, max_size=20),
    direction=st.sampled_from(["backward", "forward"]),
)
def test_asof_join_matches_naive_property(spark, lefts, rights, direction):
    from dftly_spark.ops import asof_join

    left = spark.createDataFrame(
        [(i, k, dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=t))
         for i, (k, t) in enumerate(lefts)] or [(0, 0, None)],
        "lid long, k long, ts timestamp",
    ).where(F.col("ts").isNotNull())
    # dedupe right (key, ts) — ties are contractually pre-aggregated
    seen, rrows = set(), []
    for j, (k, t, v) in enumerate(rights):
        if (k, t) not in seen:
            seen.add((k, t))
            rrows.append((j, k, dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=t), v))
    right = spark.createDataFrame(
        rrows or [(0, 0, None, 0.0)], "rid long, k long, ts timestamp, v double"
    ).where(F.col("ts").isNotNull())

    got = {
        r.lid: (r.rid_right, r.v_right)
        for r in asof_join(left, right, on="ts", by="k", direction=direction,
                           how="left").collect()
    }
    expect = {}
    for i, (k, t) in enumerate(lefts):
        cands = [
            (rt, rid, rv)
            for (rid, rk, rts, rv) in rrows
            for rt in [int((rts - dt.datetime(2024, 1, 1)).total_seconds() * 1e6)]
            if rk == k and (rt <= t if direction == "backward" else rt >= t)
        ]
        if not cands:
            expect[i] = (None, None)
        elif direction == "backward":
            _, rid, rv = max(cands)
            expect[i] = (rid, rv)
        else:
            _, rid, rv = min(cands)
            expect[i] = (rid, rv)
    assert got == expect


@settings(max_examples=12, deadline=None)
@given(
    points=st.lists(st.tuples(_ts_us), min_size=0, max_size=20),
    ivals=st.lists(st.tuples(_ts_us, st.integers(0, 2_000)), min_size=0, max_size=10),
    bucket=st.sampled_from([128, 1000, 4096]),
)
def test_range_join_matches_naive_property(spark, points, ivals, bucket):
    from dftly_spark.ops import range_join

    epoch = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(i, epoch + dt.timedelta(microseconds=t)) for i, (t,) in enumerate(points)]
        or [(0, None)],
        "pid long, ts timestamp",
    ).where(F.col("ts").isNotNull())
    ivl = spark.createDataFrame(
        [(j, epoch + dt.timedelta(microseconds=s),
          epoch + dt.timedelta(microseconds=s + d)) for j, (s, d) in enumerate(ivals)]
        or [(0, None, None)],
        "wid long, start timestamp, end timestamp",
    ).where(F.col("start").isNotNull())

    got = {
        (r.wid, r.pid)
        for r in range_join(pts, ivl, point_on="ts", start_on="start",
                            end_on="end", bucket_micros=bucket).collect()
    }
    expect = {
        (j, i)
        for j, (s, d) in enumerate(ivals)
        for i, (t,) in enumerate(points)
        if s <= t < s + d
    }
    assert got == expect


def test_asof_null_keys_never_match(spark):
    """SQL equality semantics: null keys match nothing on either side."""
    left = spark.createDataFrame(
        [(1, None, _ts("2024-01-01 10:00:00")), (2, "A", _ts("2024-01-01 10:00:00"))],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(None, _ts("2024-01-01 09:00:00"), 5.0), ("A", _ts("2024-01-01 09:00:00"), 7.0)],
        "k string, ts timestamp, v double",
    )
    out = {r.lid: r.v_right for r in asof_join(left, right, on="ts", by="k", how="left").collect()}
    assert out == {1: None, 2: 7.0}
    inner = asof_join(left, right, on="ts", by="k", how="inner")
    assert [r.lid for r in inner.collect()] == [2]


def test_range_join_null_timestamps_drop(spark):
    ivl = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")), (2, None, None)],
        "window_id long, start timestamp, end timestamp",
    )
    pts = spark.createDataFrame(
        [(10, _ts("2024-01-01 10:30:00")), (11, None)],
        "point_id long, ts timestamp",
    )
    out = range_join(pts, ivl, point_on="ts", start_on="start", end_on="end")
    assert {(r.window_id, r.point_id) for r in out.collect()} == {(1, 10)}


def test_asof_join_composite_key(spark):
    left = spark.createDataFrame(
        [(1, "A", "x", _ts("2024-01-01 10:00:00")),
         (2, "A", "y", _ts("2024-01-01 10:00:00"))],
        "lid long, k1 string, k2 string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("A", "x", _ts("2024-01-01 09:00:00"), 1.0),
         ("A", "y", _ts("2024-01-01 09:30:00"), 2.0)],
        "k1 string, k2 string, ts timestamp, v double",
    )
    out = {r.lid: r.v_right for r in asof_join(
        left, right, on="ts", by=["k1", "k2"], how="left").collect()}
    assert out == {1: 1.0, 2: 2.0}


def test_range_join_composite_key(spark):
    ivl = spark.createDataFrame(
        [("A", "x", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        "k1 string, k2 string, start timestamp, end timestamp",
    )
    pts = spark.createDataFrame(
        [("A", "x", 10, _ts("2024-01-01 10:30:00")),
         ("A", "y", 11, _ts("2024-01-01 10:30:00"))],
        "k1 string, k2 string, point_id long, ts timestamp",
    )
    out = range_join(pts, ivl, point_on="ts", start_on="start",
                     end_on="end", by=["k1", "k2"])
    assert {r.point_id for r in out.collect()} == {10}


# ---------------------------------------------------------------------------
# nearest_join
# ---------------------------------------------------------------------------


def _us(us):
    import datetime as dt

    return dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=us)


def test_nearest_join_picks_closer_side_and_ties_backward(spark):
    from dftly_spark.ops import nearest_join

    left = spark.createDataFrame(
        [(1, "u", _us(100)), (2, "u", _us(205)), (3, "u", _us(390))],
        "id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _us(0), "a"), ("u", _us(210), "b"), ("u", _us(400), "c")],
        "user_id string, ts timestamp, tag string",
    )
    got = {r["id"]: r["tag_right"] for r in
           nearest_join(left, right, on="ts", by="user_id").collect()}
    assert got[1] == "a"   # 100 vs gaps (100, 110) -> backward a
    assert got[2] == "b"   # gaps (205 back to 0, 5 fwd to 210) -> forward b
    assert got[3] == "c"   # gaps (180, 10) -> forward c

    # exact tie: left at 305 is 95 from b(210) and 95 from c(400) -> backward
    tie = spark.createDataFrame(
        [(9, "u", _us(305))], "id long, user_id string, ts timestamp"
    )
    t = nearest_join(tie, right, on="ts", by="user_id").collect()[0]
    assert t["tag_right"] == "b"


def test_nearest_join_tolerance_and_how(spark):
    from dftly_spark.ops import nearest_join

    left = spark.createDataFrame(
        [(1, "u", _us(1_000_000)), (2, "x", _us(0))],
        "id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _us(0), "a")], "user_id string, ts timestamp, tag string"
    )
    inner = nearest_join(
        left, right, on="ts", by="user_id", tolerance_micros=100
    ).collect()
    assert inner == []  # 1s gap > 100us, and key x has no marks
    outer = {
        r["id"]: r["tag_right"]
        for r in nearest_join(
            left, right, on="ts", by="user_id", how="left"
        ).collect()
    }
    assert outer == {1: "a", 2: None}


def test_nearest_join_no_pairwise_plan(spark):
    from dftly_spark.ops import nearest_join, plan_summary

    left = spark.createDataFrame(
        [(1, "u", _us(0))], "id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", _us(5), 1.0)], "user_id string, ts timestamp, v double"
    )
    plan = plan_summary(nearest_join(left, right, on="ts", by="user_id"))
    assert plan["has_nested_loop"] is False
    assert plan["has_python_eval"] is False


def test_rolling_time_features_values(spark):
    """Trailing 10s window per key: hand-checked counts/sums, null value
    skipped, include_current=False excludes the row itself."""
    import datetime as dt

    from dftly_spark.ops import rolling_time_features

    t0 = dt.datetime(2024, 1, 1)
    s = lambda k: t0 + dt.timedelta(seconds=k)  # noqa: E731
    df = spark.createDataFrame(
        [
            (1, 1, s(0), 10.0),
            (2, 1, s(5), 20.0),
            (3, 1, s(12), None),   # null: counted by nothing
            (4, 1, s(14), 40.0),   # window [4,14]: t=5,12,14 -> n=2 (null skipped)
            (5, 2, s(5), 7.0),     # other key
        ],
        "event_id long, user_id long, ts timestamp, v double",
    )
    out = {r["event_id"]: r for r in rolling_time_features(
        df, "user_id", "ts", "v", lookback_micros=10_000_000
    ).collect()}
    assert out[1]["v_trail_n"] == 1 and out[1]["v_trail_sum"] == 10.0
    assert out[2]["v_trail_n"] == 2 and out[2]["v_trail_sum"] == 30.0
    assert out[3]["v_trail_n"] == 1 and out[3]["v_trail_sum"] == 20.0  # 20 in [2,12]
    assert out[4]["v_trail_n"] == 2 and out[4]["v_trail_sum"] == 60.0
    assert out[4]["v_trail_min"] == 20.0 and out[4]["v_trail_mean"] == 30.0
    assert out[5]["v_trail_n"] == 1 and out[5]["v_trail_sum"] == 7.0
    # leakage-free variant: frame excludes the current row
    out2 = {r["event_id"]: r for r in rolling_time_features(
        df, "user_id", "ts", "v", lookback_micros=10_000_000,
        include_current=False,
    ).collect()}
    assert out2[1]["v_trail_n"] == 0 and out2[1]["v_trail_sum"] is None
    assert out2[2]["v_trail_n"] == 1 and out2[2]["v_trail_sum"] == 10.0


def test_rolling_time_features_single_window_shuffle(spark):
    """All five aggregates share ONE RANGE-frame window — a single keyed
    Exchange, one Window node."""
    import datetime as dt

    from dftly_spark.ops import rolling_time_features

    df = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1), 1.0)],
        "event_id long, user_id long, ts timestamp, v double",
    )
    plan = rolling_time_features(
        df, "user_id", "ts", "v", lookback_micros=1_000_000
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") - plan.count("WindowGroupLimit") <= 1 or \
        plan.count("hashpartitioning(user_id") <= 1


def test_interval_join_overlap_cases(spark):
    import datetime as dt

    from dftly_spark.ops import interval_join

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, "u", t(10), t(12)), (2, "u", t(15), t(16)), (3, "v", t(10), t(12))],
        "lid long, user string, start timestamp, end timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, "u", t(11), t(13)),   # overlaps lid=1 (partial)
            (11, "u", t(12), t(14)),   # touches lid=1 end only: half-open, NO overlap
            (12, "u", t(9), t(18)),    # spans lid=1 AND lid=2
            (13, "v", t(11, 30), t(11, 45)),  # nested inside lid=3
            (14, "w", t(10), t(12)),   # wrong key
        ],
        "rid long, user string, start timestamp, end timestamp",
    )
    out = interval_join(left, right, by="user")
    pairs = sorted((r["lid"], r["rid"]) for r in out.collect())
    assert pairs == [(1, 10), (1, 12), (2, 12), (3, 13)]
    # each pair exactly once even when it shares many 30-min buckets
    assert len(pairs) == out.count()


def test_interval_join_bucket_width_invariance(spark):
    import datetime as dt

    from dftly_spark.ops import interval_join

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, dt.timedelta(minutes=7 * i % 300), dt.timedelta(minutes=7 * i % 300 + 11 * (i % 5) + 1))
        for i in range(80)
    ]
    df = spark.createDataFrame(
        [(i, base + s, base + e) for i, s, e in rows],
        "id long, start timestamp, end timestamp",
    )
    r = df.select(F.col("id").alias("rid"), "start", "end")
    a = sorted(
        (x["id"], x["rid"])
        for x in interval_join(df, r, bucket_micros=60_000_000).collect()
    )
    b = sorted(
        (x["id"], x["rid"])
        for x in interval_join(df, r, bucket_micros=3_600_000_000).collect()
    )
    assert a == b and len(a) > 80


def test_interval_join_degenerate_spans_match_nothing(spark):
    import datetime as dt

    from dftly_spark.ops import interval_join

    t = lambda h: dt.datetime(2024, 1, 1, h)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(12), t(12)), (2, t(14), t(13)), (3, t(10), t(11))],
        "lid long, start timestamp, end timestamp",
    )
    right = spark.createDataFrame(
        [(10, t(9), t(18))], "rid long, start timestamp, end timestamp"
    )
    # zero-length (lid=1) and inverted (lid=2) spans pair with nothing,
    # even against a covering interval; the real span (lid=3) pairs
    out = interval_join(left, right)
    assert [(r["lid"], r["rid"]) for r in out.collect()] == [(3, 10)]


def test_resample_ffill_timezone_independent(spark):
    import datetime as dt

    from dftly_spark.ops import resample_ffill

    df = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1, 10, 5), 1.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        a = resample_ffill(df, "user_id", "ts", "value", interval="1 hour").collect()
        # non-UTC session tz must not change the interval WIDTH (the naive
        # epoch literal alone would embed the tz offset — negative east of
        # Greenwich); bucket ids shift with the wall-clock reading of the
        # naive timestamp, but the grid step stays one hour
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        b = resample_ffill(df, "user_id", "ts", "value", interval="1 hour").collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    # timestamps are instants: session tz must change NOTHING — under the
    # old epoch-literal width derivation the Tokyo run produced a NEGATIVE
    # interval width and garbage buckets
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 1 and a[0]["value"] == 1.0


def test_interval_join_randomized_vs_brute_force(spark):
    """Property check: the bucket-burst plan reproduces the all-pairs
    overlap join on randomized interval sets (several bucket widths,
    spans from sub-bucket to many-bucket, degenerate rows mixed in)."""
    import datetime as dt
    import random

    from dftly_spark.ops import interval_join

    rng = random.Random(23)
    base = dt.datetime(2024, 1, 1)

    def mk(n, key_space):
        rows = []
        for i in range(n):
            start = rng.randrange(0, 72 * 60)  # minutes over 3 days
            length = rng.choice([0, 1, 7, 45, 300, 1500])  # 0 → degenerate
            rows.append(
                (i, rng.randrange(key_space),
                 base + dt.timedelta(minutes=start),
                 base + dt.timedelta(minutes=start + length))
            )
        return rows

    left_rows, right_rows = mk(120, 4), mk(150, 4)
    left = spark.createDataFrame(
        left_rows, "lid long, k long, start timestamp, end timestamp")
    right = spark.createDataFrame(
        right_rows, "rid long, k long, start timestamp, end timestamp")

    expected = set()
    for lid, lk, ls, le in left_rows:
        for rid, rk, rs, re in right_rows:
            if lk == rk and max(ls, rs) < min(le, re):
                expected.add((lid, rid))

    for bucket_s in (300, 1800, 7200):
        got = {
            (r["lid"], r["rid"])
            for r in interval_join(
                left, right, by="k", bucket_micros=bucket_s * 1_000_000
            ).collect()
        }
        assert got == expected, f"bucket={bucket_s}s"
