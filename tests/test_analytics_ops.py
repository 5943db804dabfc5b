"""Edge-case tests for the round-3 analytics family (x57-x66 surface):
interval merging, rolling anomalies, SCD2 history, weighted sampling,
rank features, skew profiling, transitions, time-weighted averages,
distinctive terms, centroid outliers.

The sf0.01 oracle gate proves value parity on the generated data; these
tests pin the semantics the generated data never exercises — touching
intervals, heartbeat collapse, cold starts, zero-span keys, weight
proportionality, partition invariance.
"""

import pytest
from pyspark.sql import functions as F


def _rows(df, *cols):
    return [tuple(r) for r in df.select(*cols).collect()]


# ---------------------------------------------------------------------------
# merge_intervals
# ---------------------------------------------------------------------------


def test_merge_intervals_overlap_touch_gap(spark):
    from dftly_spark.ops import merge_intervals

    df = spark.createDataFrame(
        [
            # overlapping pair -> one span
            ("a", 0, 10),
            ("a", 5, 20),
            # touching (start == prior end) -> merges
            ("a", 20, 30),
            # gap -> new span
            ("a", 40, 50),
            # contained interval (running-max guard: [60,100] swallows [70,80])
            ("b", 60, 100),
            ("b", 70, 80),
            ("b", 90, 110),
        ],
        "k string, s long, e long",
    )
    out = sorted(_rows(merge_intervals(df, "k", "s", "e"), "k", "span_start", "span_end", "n_rows"))
    assert out == [("a", 0, 30, 3), ("a", 40, 50, 1), ("b", 60, 110, 3)]


def test_merge_intervals_partition_invariance(spark):
    from dftly_spark.ops import merge_intervals

    df = spark.range(200).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 13 % 101).alias("s"),
        (F.col("id") * 13 % 101 + 5).alias("e"),
    )
    a = sorted(_rows(merge_intervals(df, "k", "s", "e"), "k", "span_start", "span_end"))
    b = sorted(
        _rows(merge_intervals(df.repartition(17), "k", "s", "e"), "k", "span_start", "span_end")
    )
    assert a == b


# ---------------------------------------------------------------------------
# scd2_history
# ---------------------------------------------------------------------------


def test_scd2_collapses_heartbeats_and_versions_null_transitions(spark):
    from dftly_spark.ops import scd2_history

    df = spark.createDataFrame(
        [
            ("u1", 1, "A", 1),
            ("u1", 2, "A", 2),  # heartbeat: same state, no new version
            ("u1", 3, "B", 3),  # change
            ("u1", 4, None, 4),  # value -> NULL is a real transition
            ("u1", 5, None, 5),  # repeated NULL collapses
            ("u1", 6, "A", 6),  # NULL -> value is a real transition
        ],
        "k string, ts long, v string, seq long",
    )
    out = scd2_history(df, "k", "ts", ["v"], order_cols=["seq"])
    got = sorted(_rows(out, "valid_from", "v", "valid_to", "is_current"))
    assert got == [
        (1, "A", 3, False),
        (3, "B", 4, False),
        (4, None, 6, False),
        (6, "A", None, True),
    ]


# ---------------------------------------------------------------------------
# weighted_sample_per_group
# ---------------------------------------------------------------------------


def test_weighted_sample_deterministic_and_partition_invariant(spark):
    from dftly_spark.ops import weighted_sample_per_group

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).alias("g"),
        (F.col("id") % 97 + 1).alias("w"),
    )
    a = sorted(_rows(weighted_sample_per_group(df, "g", "doc_id", "w", k=10, seed=3), "g", "doc_id"))
    b = sorted(
        _rows(
            weighted_sample_per_group(df.repartition(13), "g", "doc_id", "w", k=10, seed=3),
            "g",
            "doc_id",
        )
    )
    assert a == b
    assert len(a) == 50  # 5 groups x k=10


def test_weighted_sample_prefers_heavy_weights(spark):
    from dftly_spark.ops import weighted_sample_per_group

    # one group: ids 0..199 weight 1, ids 200..219 weight 1000.  The 20
    # heavy rows hold ~99% of total weight; a k=20 sample should be
    # dominated by them (bound loose enough to be seed-robust).
    df = spark.range(220).select(
        F.col("id").alias("doc_id"),
        F.lit("g").alias("g"),
        F.when(F.col("id") >= 200, 1000).otherwise(1).alias("w"),
    )
    out = _rows(weighted_sample_per_group(df, "g", "doc_id", "w", k=20, seed=1), "doc_id")
    heavy = sum(1 for (i,) in out if i >= 200)
    assert heavy >= 15


def test_weighted_sample_nonpositive_weights_lose(spark):
    from dftly_spark.ops import weighted_sample_per_group

    df = spark.createDataFrame(
        [(1, "g", 5), (2, "g", 0), (3, "g", -4), (4, "g", None), (5, "g", 2)],
        "doc_id long, g string, w int",
    )
    out = sorted(i for (i,) in _rows(weighted_sample_per_group(df, "g", "doc_id", "w", k=2, seed=0), "doc_id"))
    assert out == [1, 5]


# ---------------------------------------------------------------------------
# rolling_zscore
# ---------------------------------------------------------------------------


def test_rolling_zscore_cold_start_and_flag(spark):
    from dftly_spark.ops import rolling_zscore

    rows = [("k", i, 10.0) for i in range(12)] + [("k", 12, 1000.0)]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    out = rolling_zscore(df, "k", ["i"], "v", lookback=50, z_threshold=3.0, min_obs=10)
    got = {r["i"]: (r["zscore"], r["is_anomaly"]) for r in out.collect()}
    # rows 0..9: fewer than min_obs predecessors -> null score, False flag
    for i in range(10):
        assert got[i] == (None, False)
    # rows 10,11: 10+ predecessors but zero variance -> null score (sd==0)
    assert got[10] == (None, False) and got[11] == (None, False)
    # the jump row still has sd==0 history -> honest null, not +inf
    assert got[12] == (None, False)


def test_rolling_zscore_flags_outlier(spark):
    from dftly_spark.ops import rolling_zscore

    vals = [10.0, 12.0, 9.0, 11.0, 10.0, 13.0, 8.0, 11.0, 12.0, 9.0, 10.5, 500.0]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "k string, i long, v double"
    )
    out = rolling_zscore(df, "k", ["i"], "v", lookback=50, z_threshold=3.0, min_obs=10)
    got = {r["i"]: r["is_anomaly"] for r in out.collect()}
    assert got[11] is True
    assert not any(got[i] for i in range(11))


# ---------------------------------------------------------------------------
# ntile_features / key_skew_profile / transition_matrix
# ---------------------------------------------------------------------------


def test_ntile_buckets_and_rank_bounds(spark):
    from dftly_spark.ops import ntile_features

    df = spark.range(100).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    out = ntile_features(df, "g", "v", ["v"], buckets=4).collect()
    sizes = {}
    for r in out:
        sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
        assert 0.0 <= r["pct_rank"] <= 1.0
        assert 0.0 < r["cume"] <= 1.0
    assert sizes == {1: 25, 2: 25, 3: 25, 4: 25}


def test_key_skew_shares_sum_and_order(spark):
    from dftly_spark.ops import key_skew_profile

    df = spark.range(100).select(
        F.when(F.col("id") < 60, "hot").otherwise((F.col("id") % 8).cast("string")).alias("k")
    )
    out = key_skew_profile(df, "k", top_k=3).collect()
    assert out[0]["key"] == "hot" and out[0]["n"] == 60
    assert abs(out[0]["share"] - 0.6) < 1e-12
    # cum_share is nondecreasing and ends at the top-k coverage
    cums = [r["cum_share"] for r in out]
    assert cums == sorted(cums)
    assert abs(cums[-1] - sum(r["n"] for r in out) / 100) < 1e-12


def test_transition_matrix_probabilities(spark):
    from dftly_spark.ops import transition_matrix

    df = spark.createDataFrame(
        [("u", 1, "a"), ("u", 2, "b"), ("u", 3, "a"), ("u", 4, "c"),
         ("v", 1, "a"), ("v", 2, "b")],
        "k string, ts long, s string",
    )
    out = {(r["from_state"], r["to_state"]): (r["n"], r["p"]) for r in
           transition_matrix(df, "k", "ts", "s").collect()}
    assert out[("a", "b")] == (2, 2 / 3)
    assert out[("a", "c")] == (1, 1 / 3)
    assert out[("b", "a")] == (1, 1.0)
    # per-source probabilities sum to 1
    assert abs(sum(p for (f, _), (_, p) in out.items() if f == "a") - 1.0) < 1e-12


# ---------------------------------------------------------------------------
# time_weighted_avg
# ---------------------------------------------------------------------------


def test_time_weighted_avg_step_semantics(spark):
    from dftly_spark.ops import time_weighted_avg

    df = spark.createDataFrame(
        [
            # value 10 holds 1s, value 20 holds 3s -> twa 17.5
            ("a", "2024-01-01 00:00:00", 10.0),
            ("a", "2024-01-01 00:00:01", 20.0),
            ("a", "2024-01-01 00:00:04", 99.0),  # last value carries no weight
            # single event -> value itself, zero span
            ("b", "2024-01-01 00:00:00", 7.0),
        ],
        "k string, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["k"]: (r["twa"], r["span_us"], r["n_events"]) for r in
           time_weighted_avg(df, "k", "ts", "v").collect()}
    assert got["a"] == (17.5, 4_000_000, 3)
    assert got["b"] == (7.0, 0, 1)


# ---------------------------------------------------------------------------
# distinctive_terms / centroid_outliers
# ---------------------------------------------------------------------------


def test_distinctive_terms_surfaces_group_vocab(spark):
    from dftly_spark.ops import distinctive_terms

    rows = []
    for i in range(30):
        rows.append((i, "tech", "the kernel scheduler preempts the kernel thread"))
    for i in range(30, 60):
        rows.append((i, "food", "the recipe simmers the onion broth gently"))
    df = spark.createDataFrame(rows, "doc_id long, g string, text string")
    out = distinctive_terms(df, "g", "doc_id", "text", k=3, min_group_tf=5)
    by_group = {}
    for r in out.collect():
        by_group.setdefault(r["g"], []).append(r["term"])
        assert r["lift"] > 1.0  # distinctive terms always lift above corpus rate
    assert "kernel" in by_group["tech"]
    assert set(by_group["tech"]).isdisjoint(by_group["food"])
    # the shared stop word never surfaces
    assert "the" not in by_group["tech"] + by_group["food"]


def test_centroid_outliers_finds_planted_outlier(spark):
    from dftly_spark.ops import centroid_outliers

    import math

    rows = []
    for i in range(50):
        a = 0.02 * i
        rows.append((i, [1.0, 0.05 * math.sin(a), 0.05 * math.cos(a), 0.0]))
    rows.append((99, [-1.0, 0.0, 0.0, 0.0]))  # opposite the cluster
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = centroid_outliers(df, "vec_id", "embedding", k=3).collect()
    assert out[0]["vec_id"] == 99
    assert out[0]["centroid_cos"] < 0
    # scores ranked ascending
    scores = [r["centroid_cos"] for r in out]
    assert scores == sorted(scores)


# ---------------------------------------------------------------------------
# pagerank / ranking_metrics / pool_embeddings
# ---------------------------------------------------------------------------


def test_pagerank_mass_and_hub(spark):
    from dftly_spark.ops import pagerank

    # star: everyone links to hub; hub links back to a
    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")],
        "src string, dst string",
    )
    out = {r["node"]: r["rank"] for r in pagerank(edges, iters=10).collect()}
    assert abs(sum(out.values()) - len(out)) < 1e-4  # mass conserved at N
    # hub and its backlink target dominate (their ranks oscillate between
    # rounds on this 2-cycle-ish structure; either may lead at a given iter)
    assert set(sorted(out, key=out.get)[-2:]) == {"hub", "a"}
    assert out["a"] > out["b"] == out["c"]  # a gets the hub's backlink


def test_triangle_count_known_graph(spark):
    from dftly_spark.ops import triangle_count

    # K4 on {a,b,c,d} (4 triangles, each node in 3) plus a pendant edge
    # d-e (e touches no triangle and must be absent from the output).
    # Edges arrive in mixed orientation with a duplicate and a self-loop —
    # canonicalization must absorb all three.
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    noisy = k4 + [("c", "b"), ("e", "d"), ("a", "a")]
    edges = spark.createDataFrame(noisy, "src string, dst string")
    out = {r["node"]: r["triangles"] for r in triangle_count(edges).collect()}
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangle_count_partition_invariance(spark):
    from dftly_spark.ops import triangle_count

    import random
    from itertools import combinations

    rng = random.Random(7)
    raw = [(rng.randrange(14), rng.randrange(14)) for _ in range(70)]
    edges = spark.createDataFrame(raw, "src long, dst long")
    a = sorted(map(tuple, triangle_count(edges).collect()))
    b = sorted(map(tuple, triangle_count(edges.repartition(17)).collect()))
    # brute-force reference on the same edge set
    und = {tuple(sorted(e)) for e in raw if e[0] != e[1]}
    expected: dict[int, int] = {}
    nodes = {n for e in und for n in e}
    for x, y, z in combinations(sorted(nodes), 3):
        if {(x, y), (x, z), (y, z)} <= und:
            for n in (x, y, z):
                expected[n] = expected.get(n, 0) + 1
    assert a == b == sorted(expected.items()) and len(a) > 0


def test_pagerank_dangling_self_loop_repair(spark):
    from dftly_spark.ops import pagerank

    # d has no out-edges: without repair its mass would leak each round
    edges = spark.createDataFrame([("a", "d"), ("d2", "d")], "src string, dst string")
    out = {r["node"]: r["rank"] for r in pagerank(edges, iters=5).collect()}
    assert abs(sum(out.values()) - len(out)) < 1e-4
    assert out["d"] > 1.0  # sink + self-loop accumulates


def test_pagerank_partition_invariance(spark):
    from dftly_spark.ops import pagerank

    edges = spark.range(300).select(
        (F.col("id") % 37).cast("string").alias("src"),
        ((F.col("id") * 7) % 37).cast("string").alias("dst"),
    )
    a = sorted((r["node"], r["rank"]) for r in pagerank(edges, iters=4).collect())
    b = sorted(
        (r["node"], r["rank"])
        for r in pagerank(edges.repartition(13), iters=4).collect()
    )
    assert a == b


def test_ranking_metrics_values(spark):
    from dftly_spark.ops import ranking_metrics

    run = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 21, 2)],
        "query_id long, doc_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [(1, 11), (1, 99), (2, 77), (3, 5)], "query_id long, doc_id long"
    )
    got = {r["query_id"]: (r["recall_at_k"], r["precision_at_k"], r["mrr"])
           for r in ranking_metrics(run, qrels, k=2).collect()}
    assert got[1] == (0.5, 0.5, 0.5)   # doc 11 at rank 2 of 2 relevant
    assert got[2] == (0.0, 0.0, 0.0)   # nothing relevant retrieved
    assert got[3] == (0.0, 0.0, 0.0)   # query with qrels but NO run rows

def test_pool_embeddings_mean_and_max(spark):
    from dftly_spark.ops import pool_embeddings

    df = spark.createDataFrame(
        [("x", [1.0, 4.0]), ("x", [3.0, 0.0]), ("y", [5.0, 5.0])],
        "g string, embedding array<double>",
    )
    mean = {(r["g"], r["pos"]): r["val"] for r in
            pool_embeddings(df, "g", how="mean").collect()}
    assert mean == {("x", 0): 2.0, ("x", 1): 2.0, ("y", 0): 5.0, ("y", 1): 5.0}
    mx = {(r["g"], r["pos"]): r["val"] for r in
          pool_embeddings(df, "g", how="max").collect()}
    assert mx[("x", 0)] == 3.0 and mx[("x", 1)] == 4.0
    import pytest as _pt

    with _pt.raises(ValueError):
        pool_embeddings(df, "g", how="median")


# ---------------------------------------------------------------------------
# salted_join / winsorize / impute_nulls
# ---------------------------------------------------------------------------


def test_salted_join_matches_plain_join(spark):
    from dftly_spark.ops import salted_join

    left = spark.range(500).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("lv")
    )
    right = spark.createDataFrame(
        [(0, "a"), (0, "b"), (1, "c"), (9, "z")], "k long, rv string"
    )
    got = sorted(tuple(r) for r in salted_join(left, right, "k", salt=8).collect())
    want = sorted(tuple(r) for r in left.join(right, "k").collect())
    assert got == want

    got_l = sorted(
        tuple(r) for r in salted_join(left, right, "k", salt=8, how="left").collect()
    )
    want_l = sorted(tuple(r) for r in left.join(right, "k", "left").collect())
    assert got_l == want_l

    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="full")


def test_salted_join_plan_has_no_nested_loop(spark):
    from dftly_spark.ops import salted_join

    left = spark.range(100).select((F.col("id") % 3).alias("k"), F.col("id").alias("lv"))
    right = spark.createDataFrame([(0, "a")], "k long, rv string")
    plan = salted_join(left, right, "k", salt=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_winsorize_clamps_and_flags(spark):
    from dftly_spark.ops import winsorize

    vals = list(range(1, 100)) + [10_000]  # one huge outlier
    df = spark.createDataFrame([("g", float(v)) for v in vals], "g string, v double")
    out = winsorize(df, "g", "v", lower=0.01, upper=0.95)
    rows = {r["v"]: (r["clamped"], r["was_clamped"]) for r in out.collect()}
    assert rows[10_000.0][1] is True and rows[10_000.0][0] < 10_000
    assert rows[50.0] == (50.0, False)
    # a single-value group clamps nothing
    one = winsorize(
        spark.createDataFrame([("s", 7.0)], "g string, v double"), "g", "v"
    ).collect()[0]
    assert one["clamped"] == 7.0 and one["was_clamped"] is False


def test_impute_nulls_strategies_and_all_null_group(spark):
    from dftly_spark.ops import impute_nulls

    df = spark.createDataFrame(
        [
            ("a", 1.0, "x"), ("a", None, "x"), ("a", 3.0, None),
            ("b", None, None),  # all-null group stays null
            ("c", 5.0, "p"), ("c", None, "q"), ("c", 7.0, "q"),
        ],
        "g string, v double, s string",
    )
    out = impute_nulls(df, "g", {"v": "median", "s": "mode"})
    rows = sorted(tuple(r) for r in out.collect())
    assert ("a", 2.0, "x") in rows          # median of (1,3), mode x
    assert ("b", None, None) in rows        # no statistic to fill from
    assert ("c", 6.0, "q") in rows          # median of (5,7), mode q (2x)
    # mode tie breaks on smallest value
    tie = impute_nulls(
        spark.createDataFrame(
            [("t", "b"), ("t", "a"), ("t", None)], "g string, s string"
        ),
        "g",
        {"s": "mode"},
    )
    assert {r["s"] for r in tie.collect()} == {"a", "b"}
    with pytest.raises(ValueError):
        impute_nulls(df, "g", {"v": "mad"})


def test_impute_nulls_mean_uses_portable_rounding(spark):
    # mean fills go through the shared floor-scale convention: the
    # .5e-6 knife edge rounds toward +inf on BOTH engine and oracle
    # sides (F.round's HALF_UP would give -2.000001 for the negative
    # case below; floor-scale gives -2.0)
    from dftly_spark.ops import impute_nulls

    df = spark.createDataFrame(
        [
            ("p", 1.0), ("p", 2.0), ("p", None),      # mean 1.5 exact
            ("k", 0.0000005), ("k", 0.0000005), ("k", None),  # knife edge
            ("n", -2.0000005), ("n", -2.0000005), ("n", None),
        ],
        "g string, v double",
    )
    out = {(r["g"], r["v"]) for r in impute_nulls(df, "g", {"v": "mean"}).collect()}
    assert ("p", 1.5) in out
    assert ("k", 1e-06) in out      # floor(0.5 + 0.5) = 1 at 1e-6 units
    assert ("n", -2.0) in out       # floor(-2.0000005*1e6 + 0.5) = -2e6


# ---------------------------------------------------------------------------
# group_trend / count-min sketch
# ---------------------------------------------------------------------------


def test_group_trend_recovers_known_line(spark):
    from dftly_spark.ops import group_trend

    # y = 3x + 7 exactly; plus a single-point and a zero-variance group
    rows = [("lin", float(x), 3.0 * x + 7.0) for x in range(10)]
    rows += [("one", 5.0, 2.0)]
    rows += [("flat", 4.0, 9.0), ("flat", 4.0, 11.0)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r["k"]: r for r in group_trend(df, "k", "x", "y").collect()}
    assert got["lin"]["slope"] == 3.0 and got["lin"]["intercept"] == 7.0
    assert got["lin"]["r2"] == 1.0
    assert got["one"]["slope"] is None and got["one"]["r2"] is None
    assert got["flat"]["slope"] is None  # zero x variance


def test_group_trend_centering_beats_epoch_scale(spark):
    from dftly_spark.ops import group_trend

    # epoch-microsecond x values: uncentered sums of x^2 (~1e35) destroy
    # the mantissa; centering keeps the fit exact
    base = 1_700_000_000_000_000
    rows = [("k", float(base + i * 60_000_000), 2.0 * i + 1.0) for i in range(20)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    # decimals=12: the slope is ~3e-8 per microsecond, below the default
    # 1e-6 output rounding (callers fitting micro-scale x should rescale
    # x or widen decimals, exactly as here)
    out = group_trend(df, "k", "x", "y", decimals=12).collect()[0]
    # slope per microsecond * 6e7 us per step = 2.0 per step
    # 12-decimal output rounding keeps ~5 significant digits of a 3e-8
    # slope; without centering the fit is garbage at the 1e0 level
    assert abs(out["slope"] * 60_000_000 - 2.0) < 1e-3
    assert out["r2"] == 1.0


def test_cms_never_undercounts_and_is_exactish_when_sparse(spark):
    from dftly_spark.ops import cms_build, cms_estimate

    df = spark.range(2000).select((F.col("id") % 40).alias("k"))  # 50 each
    sketch = cms_build(df, "k", depth=4, width=256)
    probes = spark.range(45).select(F.col("id").alias("k"))
    est = {r["key"]: r["est"] for r in
           cms_estimate(sketch, probes, "k", depth=4, width=256).collect()}
    for k in range(40):
        assert est[k] >= 50  # never undercount
    # 40 keys in 256 buckets: most estimates are exact
    exact_hits = sum(1 for k in range(40) if est[k] == 50)
    assert exact_hits >= 30
    # absent keys can only report collision mass, never negative
    for k in range(40, 45):
        assert est[k] >= 0


def test_cms_sketch_is_mergeable(spark):
    from dftly_spark.ops import cms_build, cms_estimate

    df = spark.range(1000).select((F.col("id") % 10).alias("k"))
    a, b = df.where("id < 400"), df.where("id >= 400")
    merged = (
        cms_build(a, "k", depth=4, width=128)
        .unionByName(cms_build(b, "k", depth=4, width=128))
        .groupBy("row", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    whole = cms_build(df, "k", depth=4, width=128)
    probes = spark.range(10).select(F.col("id").alias("k"))
    em = sorted(tuple(r) for r in cms_estimate(merged, probes, "k", depth=4, width=128).collect())
    ew = sorted(tuple(r) for r in cms_estimate(whole, probes, "k", depth=4, width=128).collect())
    assert em == ew


def test_corr_matrix_known_values(spark):
    from dftly_spark.ops import corr_matrix

    df = spark.createDataFrame(
        [(float(i), 2.0 * i + 1, -3.0 * i, 5.0) for i in range(20)],
        "a double, b double, c double, d double",
    )
    got = {(r["col_x"], r["col_y"]): r["corr"] for r in
           corr_matrix(df, ["a", "b", "c", "d"]).collect()}
    assert got[("a", "b")] == 1.0      # exact linear
    assert got[("a", "c")] == -1.0     # exact anti-linear
    assert got[("a", "d")] is None     # zero variance side -> null
    assert len(got) == 6               # upper triangle only
    with pytest.raises(ValueError):
        corr_matrix(df, ["a"])


def test_group_entropy_bounds_and_nulls(spark):
    import math

    from dftly_spark.ops import group_entropy

    rows = (
        [("uni", c) for c in "abcd" * 5]         # uniform over 4 cats
        + [("one", "x")] * 7                      # single category
        + [("mix", "a"), ("mix", None), ("mix", None)]  # null is a category
    )
    df = spark.createDataFrame(rows, "k string, c string")
    got = {r["k"]: r for r in group_entropy(df, "k", "c").collect()}
    assert abs(got["uni"]["entropy"] - math.log(4)) < 1e-6
    assert got["uni"]["n_cats"] == 4
    assert got["one"]["entropy"] == 0.0
    assert got["mix"]["n_cats"] == 2  # null counted as its own category
    expected = -(1 / 3) * math.log(1 / 3) - (2 / 3) * math.log(2 / 3)
    assert abs(got["mix"]["entropy"] - expected) < 1e-6


def test_psi_drift_hand_computed(spark):
    """PSI contributions against a hand-computed example: 2 buckets of
    [0, 10), smoothing 0.5, known counts."""
    import math

    from dftly_spark.ops import psi_drift

    rows = (
        [("a", 1.0)] * 6 + [("a", 7.0)] * 2      # a: 6 low, 2 high
        + [("b", 2.0)] * 3 + [("b", 8.0)] * 5    # b: 3 low, 5 high
        + [("c", 1.0)] * 9                       # other group: ignored
        + [("a", None)]                          # null: dropped
    )
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["bucket"]: r for r in psi_drift(
        df, "v", "g", "a", "b", lo=0.0, hi=10.0, n_buckets=2
    ).collect()}
    assert set(out) == {0, 1}
    # p = (c + 0.5) / (N + 0.5*2)
    pa0, pb0 = (6 + 0.5) / 9.0, (3 + 0.5) / 9.0
    pa1, pb1 = (2 + 0.5) / 9.0, (5 + 0.5) / 9.0
    assert out[0]["n_a"] == 6 and out[0]["n_b"] == 3
    assert abs(out[0]["p_a"] - pa0) < 1e-12 and abs(out[0]["p_b"] - pb0) < 1e-12
    want0 = (pa0 - pb0) * math.log(pa0 / pb0)
    want1 = (pa1 - pb1) * math.log(pa1 / pb1)
    assert abs(out[0]["psi"] - want0) < 1e-6
    assert abs(out[1]["psi"] - want1) < 1e-6
    assert out[0]["psi"] >= 0 and out[1]["psi"] >= 0


def test_psi_drift_clamps_and_empty_buckets(spark):
    from dftly_spark.ops import psi_drift

    df = spark.createDataFrame(
        [("a", -5.0), ("a", 99.0), ("b", 3.0)], "g string, v double"
    )
    out = {r["bucket"]: r for r in psi_drift(
        df, "v", "g", "a", "b", lo=0.0, hi=10.0, n_buckets=5
    ).collect()}
    assert set(out) == {0, 1, 2, 3, 4}          # full spine, empties present
    assert out[0]["n_a"] == 1                    # -5 clamped low
    assert out[4]["n_a"] == 1                    # 99 clamped high
    assert out[1]["n_b"] == 1                    # 3.0 -> bucket 1
    assert all(out[i]["psi"] is not None for i in out)  # smoothing: finite


def test_psi_drift_validates_and_handles_empty(spark):
    import pytest as _pytest

    from dftly_spark.ops import psi_drift

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with _pytest.raises(ValueError, match="hi > lo"):
        psi_drift(df, "v", "g", "a", "b", lo=10.0, hi=10.0)
    with _pytest.raises(ValueError, match="n_buckets"):
        psi_drift(df, "v", "g", "a", "b", lo=0.0, hi=1.0, n_buckets=0)
    # all-empty slice: smoothed proportions stay finite, psi = 0 per bucket
    empty = df.where(F.col("g") == "zzz")
    out = psi_drift(empty, "v", "g", "a", "b", lo=0.0, hi=1.0, n_buckets=4).collect()
    assert len(out) == 4
    for r in out:
        assert r["p_a"] == r["p_b"] == 0.25 and r["psi"] == 0.0


def test_kcore_known_graph_and_convergence(spark):
    from dftly_spark.ops import kcore

    # K4 {a,b,c,d} + a tail d-e-f: the 3-core is exactly the K4 (e,f peel
    # in cascading rounds — f first, then e), each surviving node at
    # degree 3
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("d", "e"), ("e", "f")]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = kcore(df, 3, max_rounds=4).collect()
    out = {r["node"]: r["degree"] for r in rows}
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}
    assert all(r["converged"] for r in rows)
    # k above the densest core peels everything
    assert kcore(df, 4, max_rounds=4).count() == 0


def test_kcore_truncated_budget_reports_not_converged(spark):
    """A budget too small for the peel must say so in-band: a 10-node
    path at k=2 loses only its two endpoints per round, so 2 rounds
    leave a shorter path whose endpoints still have degree 1 < 2."""
    from dftly_spark.ops import kcore

    path = [(f"n{i}", f"n{i+1}") for i in range(9)]
    df = spark.createDataFrame(path, "src string, dst string")
    rows = kcore(df, 2, max_rounds=2).collect()
    assert len(rows) == 6 and all(not r["converged"] for r in rows)
    # a sufficient budget empties the frame (a path has no 2-core)
    assert kcore(df, 2, max_rounds=5).count() == 0


def test_kcore_gate_budget_converges(spark):
    """The x111 gate claims 8 rounds converge at k=80; pin it on the
    sf0.001 co-purchase graph: one extra round must change nothing."""
    from dftly_spark.ops import kcore

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    items = li.select("l_orderkey", "l_partkey").distinct()
    o2 = items.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pk2")
    )
    edges = (
        items.join(
            o2,
            (items["l_orderkey"] == o2["ok2"]) & (items["l_partkey"] < o2["pk2"]),
        )
        .select(F.col("l_partkey").alias("src"), F.col("pk2").alias("dst"))
        .distinct()
    )
    a = sorted(map(tuple, kcore(edges, 12, max_rounds=8).collect()))
    b = sorted(map(tuple, kcore(edges, 12, max_rounds=9).collect()))
    assert a == b and len(a) > 0


def test_kcore_x111_gate_budget_converges_at_gate_scale(spark):
    """Pin the x111 claim AT GATE SCALE: the k=80 peel over the sf0.01
    co-purchase graph converges within the 8-round budget (round 9 is a
    no-op), so the gate output IS the exact 80-core.  A testdata regen
    that densifies the graph past the budget fails HERE, not silently
    inside a green-but-wrong oracle pair."""
    from dftly_spark.ops import kcore

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    items = li.select("l_orderkey", "l_partkey").distinct()
    o2 = items.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pk2")
    )
    edges = (
        items.join(
            o2,
            (items["l_orderkey"] == o2["ok2"]) & (items["l_partkey"] < o2["pk2"]),
        )
        .select(F.col("l_partkey").alias("src"), F.col("pk2").alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    a = sorted(map(tuple, kcore(edges, 80, max_rounds=8).collect()))
    b = sorted(map(tuple, kcore(edges, 80, max_rounds=9).collect()))
    assert a == b and len(a) > 0


def test_pagerank_weighted_uniform_equals_unweighted(spark):
    from dftly_spark.ops import pagerank

    edges = spark.createDataFrame(
        [("a", "b", 2.0), ("b", "c", 2.0), ("c", "a", 2.0), ("a", "c", 2.0)],
        "src string, dst string, w double",
    )
    plain = sorted(map(tuple, pagerank(edges, iters=6).collect()))
    weighted = sorted(map(tuple, pagerank(edges, iters=6, weight="w").collect()))
    # uniform weights cancel in w/strength: identical ranks
    assert plain == weighted


def test_pagerank_weighted_prefers_heavy_edge(spark):
    from dftly_spark.ops import pagerank

    # hub splits its rank 9:1 between b and c; b must outrank c
    edges = spark.createDataFrame(
        [("hub", "b", 9.0), ("hub", "c", 1.0), ("b", "hub", 1.0),
         ("c", "hub", 1.0)],
        "src string, dst string, w double",
    )
    out = {r["node"]: r["rank"]
           for r in pagerank(edges, iters=10, weight="w").collect()}
    assert out["b"] > out["c"]
    # parallel weighted edges combine: duplicating the heavy edge as
    # two 4.5-weight rows changes nothing
    edges2 = spark.createDataFrame(
        [("hub", "b", 4.5), ("hub", "b", 4.5), ("hub", "c", 1.0),
         ("b", "hub", 1.0), ("c", "hub", 1.0)],
        "src string, dst string, w double",
    )
    out2 = {r["node"]: r["rank"]
            for r in pagerank(edges2, iters=10, weight="w").collect()}
    assert out == out2


def test_rolling_zscore_and_ewma_survive_colliding_temp_names(spark):
    """Public ops must not clobber a caller's own _m/_sd/_np/_xs columns."""
    from dftly_spark.ops import ewma, rolling_zscore

    df = spark.createDataFrame(
        [(1, i, float(i % 7), "keep") for i in range(30)],
        "k int, o int, v double, _m string",
    ).withColumn("_xs", F.lit("keep2"))
    z = rolling_zscore(df, "k", ["o"], "v", lookback=5, min_obs=2)
    assert "_m" in z.columns and z.select("_m").first()["_m"] == "keep"
    e = ewma(df, "k", ["o"], "v", alpha=0.5, lookback=5)
    assert "_xs" in e.columns and e.select("_xs").first()["_xs"] == "keep2"
    assert "ewma" in e.columns and "zscore" in z.columns


# ---------------------------------------------------------------------------
# round-13 additions: rrf_fuse / hard_negatives / doremi_weights
# ---------------------------------------------------------------------------


def test_rrf_fuse_formula_and_absence(spark):
    """A doc in both lists scores 1/(60+r1)+1/(60+r2); a doc in one list
    gets only that term (absence is not rank infinity); re-rank orders by
    fused score with doc-id tie-break."""
    from dftly_spark.ops import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id int, doc_id int, rank int"
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], "query_id int, doc_id int, rank int"
    )
    out = {r["doc_id"]: r for r in rrf_fuse([a, b]).collect()}
    assert out[11]["n_lists"] == 2
    assert out[11]["rrf"] == round(1 / 62 + 1 / 61, 9)
    assert out[10]["rrf"] == round(1 / 61, 9)
    assert out[13]["rrf"] == round(1 / 62, 9)
    # 11 (two lists) first; then 10 (rank1 in a); then 13 (rank2 in b, 1/62)
    # vs 12 (rank3 in a, 1/63) -> 13 before 12
    order = sorted(out.values(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in order] == [11, 10, 13, 12]


def test_rrf_fuse_dedupes_within_list_and_topk(spark):
    from dftly_spark.ops import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 10, 4), (1, 11, 2)], "query_id int, doc_id int, rank int"
    )
    out = {r["doc_id"]: r for r in rrf_fuse([a]).collect()}
    # duplicate (1,10) keeps its BEST rank once, never double-counts
    assert out[10]["rrf"] == round(1 / 61, 9)
    assert out[10]["n_lists"] == 1
    top1 = rrf_fuse([a], topk=1).collect()
    assert len(top1) == 1 and top1[0]["doc_id"] == 10


def test_hard_negatives_excludes_positives_and_capped(spark):
    from dftly_spark.ops import hard_negatives

    # 1-d embeddings: cosine is sign(x*q) -> use 2-d to get graded sims
    rows = [(i, [1.0, float(i) / 10.0]) for i in range(6)]
    corpus = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    qs = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id int, embedding array<double>"
    )
    pos = spark.createDataFrame([(0, 1)], "query_id int, vec_id int")
    out = hard_negatives(corpus, qs, pos, k=10, sim_cap=0.9999999999)
    got = [r["vec_id"] for r in out.orderBy("rank").collect()]
    # vec 0 is the exact query (cos=1) -> capped out; vec 1 is a positive
    # -> anti-joined; the rest rank by descending cosine (2 closest first)
    assert got == [2, 3, 4, 5]


def test_doremi_weights_softmax_floor_and_nulls(spark):
    import math

    from dftly_spark.ops import doremi_weights

    rows = [
        ("a", 2.0, 1.0),   # excess 1.0
        ("a", 0.0, 5.0),   # clipped to 0 -> mean 0.5
        ("b", 1.0, 1.0),   # excess 0
        ("b", None, 1.0),  # null proxy: SKIPPED by the mean (not a zero
        #                    observation - the null-propagating clip),
        #                    still counted in n_rows
        (None, 9.0, 0.0),  # null domain: excluded entirely
    ]
    df = spark.createDataFrame(rows, "dom string, p double, r double")
    out = {r["dom"]: r for r in doremi_weights(
        df, "dom", "p", "r", temperature=0.5, floor=0.2
    ).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["n_rows"] == 2 and out["b"]["n_rows"] == 2
    assert out["a"]["excess"] == 0.5 and out["b"]["excess"] == 0.0
    ea, eb = math.exp(0.5 / 0.5), math.exp(0.0)
    za = 0.8 * ea / (ea + eb) + 0.2 / 2
    assert abs(out["a"]["weight"] - za) < 2e-6
    assert abs(out["a"]["weight"] + out["b"]["weight"] - 1.0) < 2e-6


def test_doremi_weights_null_losses_skip_the_mean(spark):
    """A null-loss row must NOT register as a zero-excess observation:
    greatest() skips nulls in both engines, so a bare greatest(diff, 0)
    would dilute the mean — the clip is null-propagating instead."""
    from dftly_spark.ops import doremi_weights

    rows = [("b", None, 1.0), ("b", 3.0, 1.0)]
    df = spark.createDataFrame(rows, "dom string, p double, r double")
    out = doremi_weights(df, "dom", "p", "r").collect()[0]
    # mean over the ONE usable row -> 2.0; a zero-diluted mean would be 1.0
    assert out["excess"] == 2.0
    assert out["n_rows"] == 2


def test_doremi_weights_all_null_domain_gets_floor_share(spark):
    from dftly_spark.ops import doremi_weights

    df = spark.createDataFrame(
        [("a", None, None), ("b", 1.0, 0.0)], "dom string, p double, r double"
    )
    out = {r["dom"]: r for r in doremi_weights(
        df, "dom", "p", "r", floor=0.5
    ).collect()}
    # 'a' has no usable losses: excess 0, still gets floor/K + softmax share
    assert out["a"]["excess"] == 0.0
    assert out["a"]["weight"] > 0.25


def test_doremi_weights_validates_args(spark):
    from dftly_spark.ops import doremi_weights

    df = spark.createDataFrame([("a", 1.0, 0.0)], "dom string, p double, r double")
    with pytest.raises(ValueError):
        doremi_weights(df, "dom", "p", "r", floor=1.5)
    with pytest.raises(ValueError):
        doremi_weights(df, "dom", "p", "r", temperature=0.0)


def test_rrf_fuse_null_rank_rows_are_absent(spark):
    """A NULL-rank row is 'absent': no score term, no n_lists count, and
    a doc whose only appearance is null-ranked yields no output row."""
    from dftly_spark.ops import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 10, None), (1, 99, None)],
        "query_id int, doc_id int, rank int",
    )
    out = {r["doc_id"]: r for r in rrf_fuse([a]).collect()}
    assert set(out) == {10}
    assert out[10]["n_lists"] == 1
    assert out[10]["rrf"] == round(1 / 61, 9)


def test_doremi_weights_survives_tiny_temperature(spark):
    """Max-shifted softmax: temperature=0.01 with a large excess must not
    overflow exp() to inf/NaN — the hot domain approaches (1-floor)+floor/K
    and the cold one keeps only its floor share."""
    from dftly_spark.ops import doremi_weights

    rows = [("hot", 9.0, 1.0), ("cold", 1.0, 1.0)]
    df = spark.createDataFrame(rows, "dom string, p double, r double")
    out = {r["dom"]: r for r in doremi_weights(
        df, "dom", "p", "r", temperature=0.01, floor=0.2
    ).collect()}
    import math

    assert all(not math.isnan(r["weight"]) for r in out.values())
    assert abs(out["hot"]["weight"] - 0.9) < 1e-6
    assert abs(out["cold"]["weight"] - 0.1) < 1e-6


def test_pair_quality_orientation_duplicates_and_nulls(spark):
    """Pairs are unordered and deduped: orientation flips and duplicate
    emissions can't skew counts; empty denominators give null ratios."""
    from dftly_spark.ops import pair_quality

    pred = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (3, 4), (5, 6)], "id_l long, id_r long"
    )  # normalized: {1-2, 3-4, 5-6}
    truth = spark.createDataFrame(
        [(2, 1), (4, 3), (7, 8), (9, 10)], "id_l long, id_r long"
    )  # normalized: {1-2, 3-4, 7-8, 9-10}
    r = pair_quality(pred, truth).collect()[0]
    assert (r["n_pred"], r["n_truth"], r["n_hit"]) == (3, 4, 2)
    assert r["precision"] == 2 / 3 and r["recall"] == 0.5
    p, rc = 2 / 3, 0.5
    assert abs(r["f1"] - 2 * p * rc / (p + rc)) < 1e-15

    empty = spark.createDataFrame([], "id_l long, id_r long")
    r2 = pair_quality(empty, truth).collect()[0]
    assert r2["n_pred"] == 0 and r2["precision"] is None and r2["recall"] == 0.0
    assert r2["f1"] is None
    r3 = pair_quality(pred, empty).collect()[0]
    assert r3["recall"] is None and r3["f1"] is None


def test_pair_quality_zero_hits_f1_null_not_nan(spark):
    from dftly_spark.ops import pair_quality

    pred = spark.createDataFrame([(1, 2)], "id_l long, id_r long")
    truth = spark.createDataFrame([(3, 4)], "id_l long, id_r long")
    r = pair_quality(pred, truth).collect()[0]
    # P = R = 0 -> P+R = 0: F1 is null (undefined), never 0/0 = NaN
    assert (r["precision"], r["recall"], r["f1"]) == (0.0, 0.0, None)


def test_hard_negatives_lsh_method_subset_of_brute(spark):
    """method='lsh' mines from LSH candidates (keyed join, no query
    broadcast): every mined negative must be a legal brute negative
    (passes the same gates), ranked consistently with its cosine."""
    from dftly_spark.ops import hard_negatives

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pos = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 2)], "query_id long, vec_id long"
    )
    brute = {
        (r["query_id"], r["vec_id"]): r["cos"]
        for r in hard_negatives(emb, qs, pos, k=40, sim_cap=0.99).collect()
    }
    lsh = hard_negatives(
        emb, qs, pos, k=5, sim_cap=0.99, method="lsh", dim=64
    ).collect()
    assert len(lsh) > 0
    for r in lsh:
        key = (r["query_id"], r["vec_id"])
        assert key in brute, key  # gates agree: never a positive/capped row
        assert abs(brute[key] - r["cos"]) < 1e-12
    with pytest.raises(ValueError):
        hard_negatives(emb, qs, pos, method="nope")


def test_hard_negatives_lsh_gates_before_truncation(spark):
    """Dense near-positive cluster: the query's top candidates are all
    above sim_cap, with eligible rows further down.  The r13 LSH leg
    truncated candidates to overfetch*k BEFORE the gates and came back
    under-filled here; gates must run on the FULL candidate pool so the
    contract (k rows whenever k eligible candidates exist) holds."""
    from dftly_spark.ops import hard_negatives

    dim = 8
    rows = [(0, [1.0] + [0.0] * (dim - 1))]                 # the query itself
    for i in range(1, 13):                                   # 12 near-dups, cos>0.999
        v = [1.0, 0.001 * i] + [0.0] * (dim - 2)
        rows.append((i, v))
    for j in range(5):                                       # 5 eligible, cos~0.9
        v = [1.0, 0.47 + 0.01 * j] + [0.0] * (dim - 2)
        rows.append((100 + j, v))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = corpus.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pos = spark.createDataFrame([(0, 0)], "query_id long, vec_id long")
    out = hard_negatives(
        corpus, qs, pos, k=3, sim_cap=0.99, method="lsh", dim=dim, n_planes=2
    ).collect()
    assert len(out) == 3, [r.asDict() for r in out]          # full k, not starved
    assert {r["vec_id"] for r in out} <= {100, 101, 102, 103, 104}
    assert all(r["cos"] < 0.99 for r in out)


def test_hard_negatives_exclude_self(spark):
    """Queries drawn from the corpus: the query's own vector scores
    cos=1.0 and must not surface as a 'negative' when exclude_self=True
    (and DOES surface by default, so the trap stays visible)."""
    from dftly_spark.ops import hard_negatives

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pos = spark.createDataFrame([], "query_id long, vec_id long")
    dflt = hard_negatives(emb, qs, pos, k=3).collect()
    assert any(r["query_id"] == r["vec_id"] for r in dflt)   # the documented trap
    excl = hard_negatives(emb, qs, pos, k=3, exclude_self=True).collect()
    assert all(r["query_id"] != r["vec_id"] for r in excl)
    assert len(excl) == 9


def test_pair_quality_null_members_dropped(spark):
    """A pair with a null member is dropped, never normalized into a
    fabricated self-pair (least/greatest skip nulls)."""
    from dftly_spark.ops import pair_quality

    pred = spark.createDataFrame(
        [(None, 5), (3, None), (None, None), (1, 2)], "id_l int, id_r int"
    )
    truth = spark.createDataFrame([(2, 1), (5, 5)], "id_l int, id_r int")
    r = pair_quality(pred, truth).collect()[0]
    # only (1,2) survives in pred; (5,5)-from-(null,5) must NOT appear
    assert (r["n_pred"], r["n_truth"], r["n_hit"]) == (1, 2, 1)
    assert r["precision"] == 1.0 and r["recall"] == 0.5


def test_mixture_kl_formula_and_exclusions(spark):
    import math

    from dftly_spark.ops import mixture_kl

    rows = [
        ("en", 300), ("en", 100),   # mass 400
        ("de", 100),                # mass 100
        ("zh", 999),                # not in target: excluded
        ("en", None),               # null mass: excluded from sums
        (None, 50),                 # null group: excluded
        ("de", -5),                 # negative mass: excluded
    ]
    df = spark.createDataFrame(rows, "lang string, n int")
    out = {r["lang"]: r for r in mixture_kl(
        df, "lang", {"en": 0.5, "de": 0.5}, weight_col="n"
    ).collect()}
    assert set(out) == {"en", "de"}
    assert out["en"]["mass"] == 400.0 and out["de"]["mass"] == 100.0
    assert out["en"]["observed"] == 0.8 and out["de"]["observed"] == 0.2
    assert abs(out["en"]["kl_term"] - 0.8 * math.log(0.8 / 0.5)) < 2e-6
    assert abs(out["de"]["kl_term"] - 0.2 * math.log(0.2 / 0.5)) < 2e-6
    # perfectly on-target mixture: every term 0
    bal = spark.createDataFrame([("a", 1), ("b", 1)], "lang string, n int")
    terms = [r["kl_term"] for r in mixture_kl(
        bal, "lang", {"a": 0.5, "b": 0.5}, weight_col="n"
    ).collect()]
    assert terms == [0.0, 0.0]
    with pytest.raises(ValueError):
        mixture_kl(df, "lang", {})
    with pytest.raises(ValueError):
        mixture_kl(df, "lang", {"en": 0.0})


def test_mixture_kl_zero_mass_group_contributes_zero(spark):
    """A target group whose rows all carry zero mass must report
    kl_term = 0 (the explicit 0·ln 0 = 0 limit), never log(0)'s null —
    a null would silently vanish from sum(kl_term)."""
    from dftly_spark.ops import mixture_kl

    rows = [("en", 300), ("en", 100), ("de", 0), ("de", 0)]
    df = spark.createDataFrame(rows, "lang string, n int")
    out = {r["lang"]: r for r in mixture_kl(
        df, "lang", {"en": 0.5, "de": 0.5}, weight_col="n"
    ).collect()}
    assert out["de"]["mass"] == 0.0
    assert out["de"]["observed"] == 0.0
    assert out["de"]["kl_term"] == 0.0          # explicit 0, NOT null
    assert out["en"]["observed"] == 1.0
    total = sum(r["kl_term"] for r in out.values())   # no TypeError on None
    assert total == out["en"]["kl_term"]


# -- round-14 additions: alpha_sampling / token_fertility / vocab_coverage /
#    spearman_corr / cluster_balanced_sample --


def test_alpha_sampling_limits_and_exclusions(spark):
    import pytest as _pytest

    from dftly_spark.ops import alpha_sampling

    rows = [
        ("en", 800), ("de", 100), ("fr", 100),
        (None, 50),          # null group: excluded
        ("es", None),        # null mass: excluded
        ("zh", 0),           # zero-mass group: dropped entirely
    ]
    df = spark.createDataFrame(rows, "lang string, n int")
    # alpha=1 reproduces the natural distribution
    nat = {r["lang"]: r for r in alpha_sampling(
        df, "lang", alpha=1.0, weight_col="n"
    ).collect()}
    assert set(nat) == {"en", "de", "fr"}
    assert abs(nat["en"]["weight"] - 0.8) < 2e-6
    assert abs(nat["en"]["boost"] - 1.0) < 2e-6
    # alpha=0 is uniform
    uni = {r["lang"]: r["weight"] for r in alpha_sampling(
        df, "lang", alpha=0.0, weight_col="n"
    ).collect()}
    assert all(abs(w - 1 / 3) < 2e-6 for w in uni.values())
    # alpha=0.3 boosts the tail above natural, shaves the head
    mid = {r["lang"]: r for r in alpha_sampling(
        df, "lang", alpha=0.3, weight_col="n"
    ).collect()}
    assert mid["en"]["boost"] < 1.0 < mid["de"]["boost"]
    assert abs(sum(r["weight"] for r in mid.values()) - 1.0) < 1e-5
    with _pytest.raises(ValueError):
        alpha_sampling(df, "lang", alpha=-0.1)


def test_token_fertility_nulls_and_ratios(spark):
    from dftly_spark.ops import token_fertility

    rows = [
        ("en", "hello, world"),       # 2 words; bpe: hello , world = 3
        ("en", None),                 # null text: 0 into every sum
        ("de", ""),                   # empty: 0 words, 0 tokens
        (None, "dropped"),            # null group: excluded
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    out = {r["lang"]: r for r in token_fertility(df, "lang").collect()}
    assert set(out) == {"en", "de"}
    en = out["en"]
    assert (en["n_docs"], en["n_chars"], en["n_words"], en["n_tokens"]) == (2, 12, 2, 3)
    assert en["fertility"] == 1.5
    assert en["chars_per_token"] == 4.0
    de = out["de"]
    assert (de["n_words"], de["n_tokens"]) == (0, 0)
    assert de["fertility"] is None and de["chars_per_token"] is None


def test_vocab_coverage_zero_token_docs_and_dedup(spark):
    from dftly_spark.ops import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, "x y"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame(
        [("a",), ("b",), ("a",)], "term string"   # dup term must not double-count
    )
    out = {r["doc_id"]: r for r in vocab_coverage(docs, vocab).collect()}
    assert out[1]["n_tokens"] == 4 and out[1]["n_oov"] == 1   # only 'c'
    assert out[1]["oov_rate"] == 0.25
    assert out[2]["n_tokens"] == 2 and out[2]["n_oov"] == 2
    for d in (3, 4):                                          # tokenless docs kept
        assert (out[d]["n_tokens"], out[d]["n_oov"], out[d]["oov_rate"]) == (0, 0, None)


def test_spearman_corr_monotone_ties_and_degenerate(spark):
    from dftly_spark.ops import spearman_corr

    rows = (
        # monotone increasing -> rho = 1 regardless of nonlinearity
        [("up", float(i), float(i**3)) for i in range(6)]
        # monotone decreasing -> rho = -1
        + [("dn", float(i), float(-i)) for i in range(5)]
        # constant y -> undefined (null), never NaN
        + [("const", float(i), 7.0) for i in range(4)]
        # a single pair -> null
        + [("one", 1.0, 2.0)]
        # null member rows excluded (complete-case)
        + [("up", None, 5.0), ("up", 3.0, None)]
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in spearman_corr(df, "g", "x", "y").collect()}
    assert out["up"]["n"] == 6 and out["up"]["spearman"] == 1.0
    assert out["dn"]["spearman"] == -1.0
    assert out["const"]["spearman"] is None
    assert out["one"]["spearman"] is None
    # tie handling: x=[1,1,2], y=[1,2,3] -> ranks x=(1.5,1.5,3), y=(1,2,3)
    # -> rho = cov/sqrt(vx*vy) = 0.75/sqrt(0.5*2/3) ~ 0.866025
    ties = spark.createDataFrame(
        [("t", 1.0, 1.0), ("t", 1.0, 2.0), ("t", 2.0, 3.0)],
        "g string, x double, y double",
    )
    r = spearman_corr(ties, "g", "x", "y").collect()[0]
    assert abs(r["spearman"] - 0.866025) < 2e-6


def test_cluster_balanced_sample_cap_and_determinism(spark):
    import pytest as _pytest

    from dftly_spark.ops import cluster_balanced_sample

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = cluster_balanced_sample(emb, n_cells=4, cap=25, kmeans_iters=1,
                                kmeans_init="first").collect()
    counts = {}
    for r in a:
        counts[r["cell"]] = counts.get(r["cell"], 0) + 1
        assert 1 <= r["cell_rank"] <= 25
    assert all(c <= 25 for c in counts.values())
    b = cluster_balanced_sample(emb, n_cells=4, cap=25, kmeans_iters=1,
                                kmeans_init="first").collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}   # rerun-stable
    with _pytest.raises(ValueError):
        cluster_balanced_sample(emb, n_cells=4, cap=0)
