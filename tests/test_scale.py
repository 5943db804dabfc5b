"""Scale-utility tests: salted aggregation exactness, bucketed co-located
joins, IVF similarity."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_salted_agg_matches_plain(spark):
    from dftly_spark.ops.scale import salted_agg

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plain = {
        tuple(r)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("qty"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .collect()
    }
    salted = {
        tuple(r)
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {
                "n": ("count", "l_quantity"),
                "qty": ("sum", "l_quantity"),
                "lo": ("min", "l_extendedprice"),
                "hi": ("max", "l_extendedprice"),
            },
            salt=8,
        ).collect()
    }
    assert salted == plain


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from dftly_spark.ops.scale import read_bucketed, write_bucketed

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "li_b", key="l_orderkey", buckets=8)
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "ord_b",
        key="l_orderkey", buckets=8,
    )
    a = read_bucketed(spark, "li_b")
    b = read_bucketed(spark, "ord_b")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located buckets: shuffle paid at write
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_ivf_topk_recall(spark):
    from dftly_spark.ops import brute_force_topk
    from dftly_spark.ops.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = brute_force_topk(emb, queries, k=5).collect()
    ivf = ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=4).collect()
    truth, got = {}, {}
    for r in brute:
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    for r in ivf:
        got.setdefault(r.query_id, set()).add(r.vec_id)
    # probing half the cells: expect decent overlap with the exact top-5
    for qid in truth:
        assert len(got.get(qid, set()) & truth[qid]) >= 2
    # every query's own vector is its nearest neighbor and shares its own cell
    for r in ivf:
        if r.vec_id == r.query_id:
            assert r.rank == 1
