"""End-to-end entity-resolution pipeline with a measured match quality.

The record-linkage story in one flow, composed from dftly-spark
operators — and, unusually for dedup pipelines, with its accuracy
AUDITED in the same job:

    read catalog → plant a noisy twin catalog (known ground truth) →
    fuzzy_join ALL candidate pairs (prefix-filter similarity join, exact
    threshold recall) → best-match resolution from the same checkpointed
    pair set → audit precision & coverage against a DEDUP-AWARE truth
    set (the same operator run catalog-vs-itself: a twin resolving to
    its source's near-duplicate is a correct link in substance, so the
    acceptable answers are the source plus its >=0.8-jaccard twins)

Each stage's scale shape: the similarity joins are the AllPairs/PPJoin
prefix-filter plan (never catalog², recall 1 by construction — see
ops/entity.py); the audit is two tiny aggregations.  In a real
deployment the right catalog is another source's table and truth labels
come from a reviewed sample; the planted twin here makes the example
self-contained and deterministic.  The same resolution runs streaming
against a persisted index via fuzzy_index + stream_fuzzy_join.  (A score
AUC/calibration audit — roc_auc / calibration_curve — needs candidates
on BOTH sides of the decision boundary; this synthetic corpus has no
mid-band near-misses at any threshold, so the example audits the
resolution itself instead.)

Run:  python examples/entity_resolution_pipeline.py [sf_dir]
Test: tests/test_example_pipeline.py runs it end-to-end at sf0.001.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def build(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    from dftly_spark.ops import fuzzy_join

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")

    # noisy twin catalog: every 2nd document re-identified, first 4 words
    # dropped — ground truth is doc_id + OFFSET
    OFFSET = 10_000_000
    w = F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " ")
    twin = (
        docs.where(F.col("doc_id") % 2 == 0)
        .where(F.size(w) > 6)
        .select(
            (F.col("doc_id") + OFFSET).alias("doc_id"),
            F.concat_ws(" ", F.slice(w, 5, F.size(w))).alias("text"),
        )
    )

    # ALL candidate pairs; consumed twice below (resolution + audit) ->
    # truncate lineage once at the boundary
    pairs = fuzzy_join(
        twin, docs, "doc_id", "text", n=3, threshold=0.3
    ).localCheckpoint(eager=False)

    # the RESOLUTION: best match per twin (window over the checkpointed
    # pair set — no second similarity join)
    rk = Window.partitionBy("id_l").orderBy(F.desc("jaccard"), F.asc("id_r"))
    matches = (
        pairs.withColumn("_rk", F.row_number().over(rk))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )

    # DEDUP-AWARE truth: the planted source AND its >=0.8-jaccard
    # duplicates are all correct answers — derived with the SAME operator
    # run catalog-vs-itself (entity linking and near-dedup are one
    # primitive here).  Strict source-id-only labels would count a link
    # to the source's duplicate as a miss (measured: they understate
    # precision by ~12% on this corpus).
    selfdups = fuzzy_join(docs, docs, "doc_id", "text", n=3, threshold=0.8)
    truth = (
        selfdups.select((F.col("id_l") + OFFSET).alias("id_l"), "id_r")
        .join(twin.select("doc_id"), F.col("id_l") == F.col("doc_id"), "left_semi")
        .withColumn("is_true", F.lit(1))
    )
    labeled = matches.join(truth, ["id_l", "id_r"], "left").fillna(0, "is_true")

    # audit: coverage (every twin resolved?) and precision (resolved to
    # an acceptable answer?)
    n_twins = twin.count()
    metrics = labeled.agg(
        F.count(F.lit(1)).alias("n_resolved"),
        F.sum("is_true").alias("n_correct"),
        (F.count(F.lit(1)) / F.lit(n_twins)).alias("coverage"),
        (F.sum("is_true") / F.count(F.lit(1))).alias("precision"),
    )

    return {"matches": matches, "labeled": labeled, "metrics": metrics}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("entity-resolution-example")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    out = build(spark, sf_dir)
    out["matches"].show(10, truncate=60)
    out["metrics"].show()


if __name__ == "__main__":
    main()
