"""End-to-end similarity-search pipeline over an embedding corpus.

The ANN serving-prep story in one flow, composed from dftly-spark
operators — the memory ladder a 100 TB embedding store actually climbs:

    read → near-dup prune (embedding LSH pairs → clusters → keep one per
    cluster) → scalar quantization (int8 codes + fidelity audit) →
    IVF index (learned centroids, cell assignment) → query serving
    (ivf_topk with nprobe, RRF-fused with the LSH retriever) → recall
    audit vs the exact scorer (topk_recall)

Each stage's scale shape: the LSH prune is a banded bucket equi-join
(never corpus²); the quantizer fit is ONE agg pass collecting 2·dim
doubles; cell assignment is a broadcast argmax (zero shuffle); serving
joins queries to only ``nprobe`` cells' worth of corpus; and the recall
audit runs the exact scorer on the (small) query set only.

Run:  python examples/similarity_pipeline.py [sf_dir]
Test: tests/test_example_pipeline.py runs it end-to-end at sf0.001.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    from dftly_spark.ops import (
        brute_force_topk,
        dup_clusters,
        embedding_dup_pairs,
        fit_scalar_quantizer,
        ivf_topk,
        lsh_bucket_topk,
        quantization_fidelity,
        quantize_embeddings,
        rrf_fuse,
        topk_recall,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )

    # 1. Near-dup prune: keep the lowest id of each near-duplicate cluster.
    pairs = embedding_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.98, method="lsh", dim=64
    )
    clusters = dup_clusters(pairs, "id_l", "id_r")  # (doc_id, cluster_id=min)
    drop = clusters.where(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias("vec_id")
    )
    corpus = emb.join(drop, "vec_id", "left_anti")

    # 2. Quantize for storage; audit fidelity before committing.
    mins, maxs = fit_scalar_quantizer(corpus, "embedding", dim=64)
    codes = quantize_embeddings(corpus, "vec_id", "embedding", mins, maxs)
    fidelity = quantization_fidelity(
        corpus, "vec_id", "embedding", mins, maxs
    )

    # 3. Serve top-k through the IVF index (learned centroids).
    queries = emb.where(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # Synthetic embeddings are uniform-random — the WORST case for IVF
    # (no cluster structure, so neighbors scatter across cells); nprobe=8
    # of 16 cells trades half the brute-force compute for high recall.
    # Real embedding corpora cluster, so production runs probe far fewer.
    approx = ivf_topk(
        corpus, queries, k=10, n_centroids=16, nprobe=8,
        strategy="kmeans", kmeans_iters=2, kmeans_init="first",
    )

    # 4. Hybrid serving: fuse the IVF retriever with an LSH retriever by
    #    reciprocal rank (no score calibration needed across retrievers —
    #    two index families miss different neighbors, the fusion keeps
    #    whichever found each one).
    lsh = lsh_bucket_topk(corpus, queries, k=10, n_planes=6, seed=42, dim=64)
    fused = rrf_fuse(
        [approx, lsh], query_col="query_id", doc_col="vec_id", topk=10
    )

    # 5. Recall audit against the exact scorer (query set only): the
    #    harness op scores EVERY candidate ranking, which is how you
    #    decide whether a fusion earns its place — on these structureless
    #    random vectors the weak LSH retriever dilutes the cut top-10
    #    (its votes outrank better IVF-only candidates), and the audit
    #    is what surfaces that before production does.
    exact = brute_force_topk(corpus, queries, k=10)

    def _macro(approx_df, name):
        return topk_recall(exact, approx_df).agg(
            (F.sum("n_hits") / F.sum("n_truth")).alias(name)
        )

    recall = (
        _macro(approx, "ivf_recall_at_10")
        .crossJoin(_macro(lsh, "lsh_recall_at_10"))
        .crossJoin(_macro(fused, "fused_recall_at_10"))
    )

    return {
        "corpus": corpus,
        "codes": codes,
        "fidelity": fidelity,
        "topk": approx,
        "fused": fused,
        "recall": recall,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    out = build(spark, sf_dir)
    for name, df in out.items():
        print(f"== {name}: {df.count()} rows")
    out["recall"].show()


if __name__ == "__main__":
    main()
