"""End-to-end entity-resolution pipeline with a measured match quality.

The record-linkage story in one flow, composed from dftly-spark
operators — and, unusually for dedup pipelines, with its accuracy
AUDITED in the same job:

    read catalog → plant a noisy twin catalog (known ground truth) →
    fuzzy_join best-match resolution (prefix-filter similarity join,
    exact threshold recall) → label each match against the truth →
    quality audit: ROC-AUC of the jaccard score as a match classifier +
    calibration_curve (is a 0.8-jaccard match right ~80% of the time?)

Each stage's scale shape: the similarity join is the AllPairs/PPJoin
prefix-filter plan (never catalog², recall 1 by construction — see
ops/entity.py); the audit ops are one keyed aggregation each.  In a real
deployment the right catalog is another source's table and truth labels
come from a reviewed sample; the planted twin here makes the example
self-contained and deterministic.  The same resolution runs streaming
against a persisted index via fuzzy_index + stream_fuzzy_join.

Run:  python examples/entity_resolution_pipeline.py [sf_dir]
Test: tests/test_example_pipeline.py runs it end-to-end at sf0.001.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    from dftly_spark.ops import calibration_curve, fuzzy_join, roc_auc

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

    # resolution: each twin resolved to its best original (threshold low
    # enough to also surface near-miss candidates for the audit)
    matches = fuzzy_join(
        twin, docs, "doc_id", "text", n=3, threshold=0.3, best_match=True
    )

    # truth labels: the planted source is the one right answer
    labeled = matches.withColumn(
        "is_true", (F.col("id_l") - F.lit(OFFSET) == F.col("id_r")).cast("int")
    )

    # quality audit: does the jaccard score separate and CALIBRATE?
    auc = roc_auc(labeled.select("is_true", "jaccard"), "is_true", "jaccard")
    calib = calibration_curve(labeled, "jaccard", "is_true", bins=10)

    return {"matches": matches, "labeled": labeled, "auc": auc, "calibration": calib}


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
    out["auc"].show()
    out["calibration"].orderBy("bin").show()


if __name__ == "__main__":
    main()
