"""Tests for the round-2 pipeline operators: funnel, CDC merge, budgeted
mixture sampling, and bigram-LM scoring."""

import math

import pytest
from pyspark.sql import functions as F
from dftly_spark.io import normalize_event_ts

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(spark.read.parquet(f"{SF_DIR}/events.parquet"))


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


# ---------------------------------------------------------------- funnel


def test_funnel_matches_python_reference(spark, events):
    from dftly_spark.ops import funnel

    steps = ["view", "click", "purchase"]
    got = {
        r.user_id: (r.step_1_ts, r.step_2_ts, r.step_3_ts, r.steps_completed)
        for r in funnel(events, steps).collect()
    }

    rows = events.select("user_id", "ts", "event_type").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_type))
    want = {}
    for uid, evs in by_user.items():
        reached = []
        prev_ts = None
        for step in steps:
            cand = [
                t
                for t, tp in evs
                if tp == step and (prev_ts is None or t >= prev_ts)
            ]
            if not cand:
                break
            prev_ts = min(cand)
            reached.append(prev_ts)
        if reached:
            padded = reached + [None] * (3 - len(reached))
            want[uid] = (*padded, len(reached))
    assert got == want
    assert any(v[3] == 3 for v in got.values())  # someone converts fully


def test_funnel_single_shuffle(spark, events):
    from dftly_spark.ops import funnel

    plan = funnel(events, ["view", "click", "purchase"])._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1


def test_funnel_step_order_enforced(spark):
    from dftly_spark.ops import funnel

    df = spark.createDataFrame(
        [
            # user 1: click BEFORE any view — step 2 must not complete
            (1, "2024-01-01 00:00:00", "click"),
            (1, "2024-01-01 00:01:00", "view"),
            # user 2: proper order
            (2, "2024-01-01 00:00:00", "view"),
            (2, "2024-01-01 00:00:30", "click"),
        ],
        "user_id int, ts string, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.user_id: r.steps_completed for r in funnel(df, ["view", "click"]).collect()}
    assert got == {1: 1, 2: 2}


# ---------------------------------------------------------------- CDC merge


def test_merge_upsert_semantics(spark):
    from dftly_spark.ops import merge_upsert

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id bigint, v string"
    )
    chg = spark.createDataFrame(
        [
            (2, "b2", 1, "U"),       # update
            (3, None, 1, "D"),       # delete
            (4, "d", 1, "I"),        # insert
            (5, "e-old", 1, "U"),    # stale insert-update …
            (5, None, 2, "D"),       # … then deleted: must not appear
            (2, "b-stale", 0, "U"),  # stale update: must lose to seq=1
        ],
        "id bigint, v string, seq bigint, op string",
    )
    got = {r.id: r.v for r in merge_upsert(snap, chg, "id").collect()}
    assert got == {1: "a", 2: "b2", 4: "d"}


def test_merge_upsert_schema_matches_snapshot(spark, docs):
    from dftly_spark.ops import merge_upsert

    chg = docs.limit(5).select(
        "doc_id", F.upper("text").alias("text"), "lang", "source", "n_chars",
        F.lit(1).alias("seq"), F.lit("U").alias("op"),
    )
    out = merge_upsert(docs, chg, "doc_id")
    assert out.columns == docs.columns
    assert out.count() == docs.count()


# ---------------------------------------------------------------- mixture


def test_mixture_sample_hits_budget(spark, docs):
    from dftly_spark.ops import mixture_sample

    total = {
        r.source: r.s
        for r in docs.groupBy("source").agg(F.sum("n_chars").alias("s")).collect()
    }
    budget = sum(total.values()) / 4.0
    weights = {"src1": 0.7, "src2": 0.3}
    out = mixture_sample(
        docs, "source", weights, budget=budget, cost_col="n_chars", id_col="doc_id"
    )
    rows = out.collect()
    assert {r.source for r in rows} <= set(weights)
    # realized cost per source tracks rate * total (LCG uniformity, ±15%)
    for src, wt in weights.items():
        want_rate = min(1.0, budget * wt / total[src])
        got = sum(r.n_chars for r in rows if r.source == src)
        assert got == pytest.approx(want_rate * total[src], rel=0.15)
    # nested: same seed, higher budget is a superset
    bigger = mixture_sample(
        docs, "source", weights, budget=budget * 2, cost_col="n_chars", id_col="doc_id"
    )
    ids = {r.doc_id for r in rows}
    assert ids <= {r.doc_id for r in bigger.collect()}


def test_mixture_sample_caps_rate_at_one(spark, docs):
    from dftly_spark.ops import mixture_sample

    out = mixture_sample(
        docs, "source", {"src1": 1.0}, budget=10**15,
        cost_col="n_chars", id_col="doc_id",
    )
    assert out.count() == docs.where(F.col("source") == "src1").count()
    assert out.select(F.max("mix_rate")).first()[0] == 1.0


# ---------------------------------------------------------------- bigram LM


def test_bigram_lm_matches_python_reference(spark, docs):
    from dftly_spark.ops import bigram_lm_scores

    sample = docs.where(F.col("doc_id") < 50)
    got = {
        r.doc_id: (r.n_bigrams, r.logprob, r.avg_logprob)
        for r in bigram_lm_scores(sample).collect()
    }

    texts = {
        r.doc_id: r.text.lower().split() for r in sample.collect() if r.text.strip()
    }
    c2, c1, vocab = {}, {}, set()
    for ws in texts.values():
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    v = len(vocab)
    for doc_id, ws in texts.items():
        if len(ws) < 2:
            assert doc_id not in got
            continue
        lps = [
            math.log((c2[(a, b)] + 1.0) / (c1[a] + 1.0 * v))
            for a, b in zip(ws, ws[1:])
        ]
        n, lp, avg = got[doc_id]
        assert n == len(lps)
        acc = 0.0
        for x in lps:
            acc += x
        assert lp == pytest.approx(acc, abs=1e-9)
        assert avg == pytest.approx(acc / len(lps), abs=1e-12)


def test_bigram_lm_no_python_eval(spark, docs):
    from dftly_spark.ops import bigram_lm_scores

    plan = bigram_lm_scores(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_expect_observed_free_metrics_on_write(spark, tmp_path):
    from dftly_spark.ops import expect_observed

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 500.0)], "id long, v double"
    )
    observed, exp = expect_observed(
        df,
        [
            {"rule": "not_null", "col": "v"},
            {"rule": "in_range", "col": "v", "min": 0, "max": 100},
        ],
    )
    # the production action IS the metrics pass — no second scan
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    rep = {r[0]: (r[1], r[2], r[3]) for r in exp.report()}
    nn = [k for k in rep if "not_null" in k][0]
    rg = [k for k in rep if "in_range" in k][0]
    assert rep[nn] == (3, 1, False)     # one null
    assert rep[rg] == (3, 1, False)     # 500 out of range (null not counted)
    # round-trip: the written data is intact
    assert spark.read.parquet(str(tmp_path / "out")).count() == 3


def test_expect_observed_rejects_unique(spark):
    import pytest as _pytest

    from dftly_spark.ops import expect_observed

    df = spark.createDataFrame([(1,)], "id long")
    with _pytest.raises(ValueError, match="row-local"):
        expect_observed(df, [{"rule": "unique", "cols": "id"}])
