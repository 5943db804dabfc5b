"""Sessionization: batch windows vs stateful streaming parity."""

import pytest
from pyspark.sql import functions as F

from dftly_spark.ops.sessions import sessionize, sessionize_stream
from dftly_spark.streaming import stream_table
from dftly_spark.io import normalize_event_ts

SF_DIR = "/root/testdata/sf0.001"
GAP = 30 * 60 * 1_000_000


def _batch_events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(spark.read.parquet(f"{SF_DIR}/events.parquet"))


def test_batch_sessionize_sanity(spark):
    out = sessionize(_batch_events(spark), gap_micros=GAP)
    rows = out.collect()
    assert len(rows) == _batch_events(spark).count()
    # session indexes start at 1 and are contiguous per user
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, set()).add(r.session_idx)
    for sessions in per_user.values():
        assert min(sessions) == 1
        assert sessions == set(range(1, max(sessions) + 1))


def test_stream_sessionize_matches_batch(spark):
    batch = {tuple(r) for r in sessionize(_batch_events(spark), gap_micros=GAP).collect()}
    stream = sessionize_stream(stream_table(spark, SF_DIR, "events"), gap_micros=GAP)
    q = (
        stream.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.table("sessions_stream").collect()}
    assert got == batch


def test_cohort_retention_matrix(spark):
    import datetime as dt

    from dftly_spark.ops import cohort_retention

    day = 86_400 * 1_000_000
    rows = [
        # user 1: first in bucket 0, active buckets 0,1,2
        (1, dt.datetime(1970, 1, 2)), (1, dt.datetime(1970, 1, 9)),
        (1, dt.datetime(1970, 1, 16)),
        # user 2: first in bucket 0, active buckets 0,2
        (2, dt.datetime(1970, 1, 3)), (2, dt.datetime(1970, 1, 20)),
        # user 3: first in bucket 1, active bucket 1 only (twice in-bucket)
        (3, dt.datetime(1970, 1, 10)), (3, dt.datetime(1970, 1, 11)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.cohort_bucket, r.period): r.n_users
        for r in cohort_retention(ev, bucket_micros=7 * day).collect()
    }
    assert out == {(0, 0): 2, (0, 1): 1, (0, 2): 2, (1, 0): 1}


def test_cohort_retention_pre_1970_floors(spark):
    """Pre-epoch timestamps bucket toward -inf (floor division), matching
    the DuckDB mirror's explicit floor() — not C-style truncation toward
    zero, which would merge the last pre-epoch bucket with bucket 0."""
    import datetime as dt

    import duckdb

    from dftly_spark.ops import cohort_retention

    day = 86_400 * 1_000_000
    rows = [
        (1, dt.datetime(1969, 12, 29)),  # -3 days → bucket -1 under floor
        (1, dt.datetime(1970, 1, 2)),    # bucket 0
        (2, dt.datetime(1969, 12, 20)),  # bucket -2
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.cohort_bucket, r.period): r.n_users
        for r in cohort_retention(ev, bucket_micros=7 * day).collect()
    }
    assert out == {(-1, 0): 1, (-1, 1): 1, (-2, 0): 1}
    # and the mirror formulation agrees on the same rows
    pdf = ev.toPandas()
    got = duckdb.sql(
        """
        WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM pdf),
        first AS (
          SELECT user_id, CAST(floor(MIN(us) / 604800000000.0) AS BIGINT) AS cohort
          FROM e GROUP BY user_id
        ),
        act AS (
          SELECT DISTINCT user_id,
                 CAST(floor(us / 604800000000.0) AS BIGINT) AS w FROM e
        )
        SELECT f.cohort, a.w - f.cohort AS period, COUNT(*) AS n
        FROM act a JOIN first f USING (user_id) GROUP BY 1, 2
        """
    ).fetchall()
    assert {(r[0], r[1]): r[2] for r in got} == out


def test_stream_sessionize_tws_matches_batch(spark):
    """transformWithStateInPandas twin (Spark 4 API, RocksDB state)."""
    pytest.importorskip("pyspark.sql.streaming.stateful_processor")
    # the transformWithState state-server protocol runs over protobuf;
    # this container ships no google.protobuf, so the twin is exercised
    # only where the dependency exists (any real Spark 4 deployment)
    pytest.importorskip("google.protobuf")
    from dftly_spark.ops.sessions import sessionize_stream_tws

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        batch = {
            tuple(r)
            for r in sessionize(_batch_events(spark), gap_micros=GAP).collect()
        }
        stream = sessionize_stream_tws(
            stream_table(spark, SF_DIR, "events"), gap_micros=GAP
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("sessions_tws")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {tuple(r) for r in spark.table("sessions_tws").collect()}
        assert got == batch
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


def test_debounce_chain_and_value_change(spark):
    import datetime as dt

    from dftly_spark.ops import debounce

    t0 = dt.datetime(2024, 1, 1)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    df = spark.createDataFrame(
        [
            (1, 7, at(0), "click"),    # first -> keep
            (2, 7, at(0.5), "click"),  # repeat within 1s -> drop
            (3, 7, at(0.9), "click"),  # chain: gap vs PREVIOUS row < 1s -> drop
            (4, 7, at(2.5), "click"),  # gap > 1s -> keep
            (5, 7, at(2.6), "view"),   # value changed -> keep
            (6, 8, at(2.6), "view"),   # other key -> keep
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    kept = {r["event_id"] for r in
            debounce(df, "user_id", "ts", value_cols=["event_type"],
                     within_micros=1_000_000).collect()}
    assert kept == {1, 4, 5, 6}


def test_debounce_null_values_compare_null_safe(spark):
    import datetime as dt

    from dftly_spark.ops import debounce

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, 1, t0, None), (2, 1, t0 + dt.timedelta(seconds=0.1), None),
         (3, 1, t0 + dt.timedelta(seconds=0.2), "x")],
        "event_id long, user_id long, ts timestamp, v string",
    )
    kept = {r["event_id"] for r in
            debounce(df, "user_id", "ts", value_cols=["v"],
                     within_micros=1_000_000).collect()}
    assert kept == {1, 3}  # null == null within window -> drop; null -> 'x' keeps


def test_debounce_order_cols_not_compared(spark):
    import datetime as dt

    from dftly_spark.ops import debounce

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, 1, t0, "x"), (2, 1, t0 + dt.timedelta(seconds=0.1), "x")],
        "event_id long, user_id long, ts timestamp, v string",
    )
    # event_id is a unique tie-break, NOT a compared value: default
    # value_cols must exclude it, so the second burst row drops
    kept = {r["event_id"] for r in
            debounce(df, "user_id", "ts", within_micros=1_000_000,
                     order_cols=["event_id"]).collect()}
    assert kept == {1}
    with pytest.raises(ValueError, match="no value columns"):
        debounce(df.select("event_id", "user_id", "ts"), "user_id", "ts",
                 order_cols=["event_id"])


def test_debounce_default_tiebreak_matches_stream(spark):
    # rows sharing (key, ts): without explicit order_cols, batch debounce
    # must tiebreak by event_id (the debounce_stream hard-wired order) so
    # the twins agree
    import datetime as dt

    from dftly_spark.ops import debounce

    t0 = dt.datetime(2024, 1, 1)
    # in event_id order the values run a, a, b: id-2 repeats id-1 at the
    # same ts -> drop; under the old ts-only order this was a coin flip
    df = spark.createDataFrame(
        [(2, 1, t0, "a"), (1, 1, t0, "a"), (3, 1, t0, "b")],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    kept = {r["event_id"] for r in
            debounce(df, "user_id", "ts", value_cols=["event_type"],
                     within_micros=1_000_000).collect()}
    assert kept == {1, 3}


def test_resample_ffill_grid_and_fill(spark):
    import datetime as dt

    from dftly_spark.ops import resample_ffill

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    # user 1: events in hours 0 and 3 -> grid buckets 0..3 with buckets
    # 1,2 forward-filled from hour 0; in-bucket last (10:30 beats 10:05).
    # user 2: single event -> single-bucket grid, no fill needed.
    df = spark.createDataFrame(
        [
            (1, 1, t(10, 5), 1.0),
            (2, 1, t(10, 30), 2.0),
            (3, 1, t(13, 59), 9.0),
            (4, 2, t(0), 5.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = resample_ffill(
        df, "user_id", "ts", "value", interval="1 hour", order_col="event_id"
    )
    rows = {(r["user_id"], r["bucket"]): r["value"] for r in out.collect()}
    h = 473362  # bucket index of 2024-01-01 10:00 at 1-hour grid
    assert rows == {
        (1, h): 2.0,
        (1, h + 1): 2.0,
        (1, h + 2): 2.0,
        (1, h + 3): 9.0,
        (2, h - 10): 5.0,
    }


def test_resample_ffill_ts_tiebreak_is_order_col(spark):
    import datetime as dt

    from dftly_spark.ops import resample_ffill

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, 1, t0, 1.0), (3, 1, t0, 3.0), (2, 1, t0, 2.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = resample_ffill(
        df, "user_id", "ts", "value", interval="1 hour", order_col="event_id"
    )
    assert [r["value"] for r in out.collect()] == [3.0]


def test_session_stats_duration_depth_bounce(spark):
    import datetime as dt

    from dftly_spark.ops import session_stats

    t = lambda m: dt.datetime(2024, 1, 1, 10, m)  # noqa: E731
    df = spark.createDataFrame(
        [
            # user 1, session 1: three events over 20 min, two types
            (1, 1, t(0), "a"), (2, 1, t(10), "b"), (3, 1, t(20), "a"),
            # user 1, session 2 (after a >30min gap): single bounce event
            (4, 1, t(59), "a"),
            # user 2: one event
            (5, 2, t(0), "c"),
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    out = {(r["user_id"], r["session_idx"]):
           (r["n_events"], r["duration_us"], r["is_bounce"], r["n_types"])
           for r in session_stats(df, gap_micros=30 * 60 * 1_000_000,
                                  type_col="event_type").collect()}
    assert out[(1, 1)] == (3, 20 * 60 * 1_000_000, False, 2)
    assert out[(1, 2)] == (1, 0, True, 1)
    assert out[(2, 1)] == (1, 0, True, 1)


def test_scd2_snapshot_time_travel(spark):
    import datetime as dt

    from dftly_spark.ops import scd2_history, scd2_snapshot

    d = lambda day: dt.datetime(2024, 1, day)  # noqa: E731
    df = spark.createDataFrame(
        [(1, d(1), "A", 1), (1, d(10), "B", 2), (2, d(5), "X", 3)],
        "k long, ts timestamp, v string, seq long",
    )
    hist = scd2_history(df, "k", "ts", ["v"], order_cols=["seq"])
    # at day 7: key 1 still in state A, key 2 in X
    snap = {r["k"]: r["v"]
            for r in scd2_snapshot(hist, "2024-01-07 00:00:00").collect()}
    assert snap == {1: "A", 2: "X"}
    # at day 12: key 1 moved to B (current, open valid_to)
    snap2 = {r["k"]: r["v"]
             for r in scd2_snapshot(hist, "2024-01-12 00:00:00").collect()}
    assert snap2 == {1: "B", 2: "X"}
    # before any version: empty
    assert scd2_snapshot(hist, "2023-12-31 00:00:00").count() == 0


def test_resample_ffill_randomized_vs_pandas(spark):
    """Property check: resample_ffill equals pandas resample().last().ffill()
    on randomized per-key event sets (pandas is the semantics donor)."""
    import datetime as dt
    import random

    import pandas as pd

    from dftly_spark.ops import resample_ffill

    rng = random.Random(31)
    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for user in range(6):
        for _ in range(rng.randrange(1, 40)):
            eid += 1
            rows.append(
                (eid, user,
                 base + dt.timedelta(minutes=rng.randrange(0, 5000)),
                 float(rng.randrange(1000)))
            )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        (r["user_id"], r["bucket"]): r["value"]
        for r in resample_ffill(
            df, "user_id", "ts", "value", interval="1 hour",
            order_col="event_id",
        ).collect()
    }
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    expected = {}
    for user, g in pdf.groupby("user_id"):
        # in-bucket last by (ts, event_id) — sort then resample-last + ffill
        g = g.sort_values(["ts", "event_id"]).set_index("ts")
        ser = g["value"].resample("1h").last().ffill()
        for ts, v in ser.items():
            expected[(user, int(ts.timestamp()) // 3600)] = v
    assert got == expected
