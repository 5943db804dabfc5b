#!/usr/bin/env python
"""Hot-token skew probe for fuzzy_join's max_prefix_df salted reroute.

Builds a deliberately skewed ER corpus from sf0.1 documents — every row
(both sides) carries the same boilerplate header, so the header's shingles
are prefix-hot join keys whose candidate fan-out lands on single reducers
in the plain prefix join — then times fuzzy_join with and without the cap
and asserts the pair sets are identical.

Usage: python scripts/skew_probe.py [n_left] [n_right]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.1"
N_LEFT = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
N_RIGHT = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
BOILER = "standard corpus license header text"


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("skew-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w = F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " ")
    skewed = F.concat(F.lit(BOILER + " "), F.col("text"))
    left = (
        docs.where(F.col("doc_id") < N_LEFT)
        .select("doc_id", skewed.alias("text"))
        .localCheckpoint()
    )
    right = (
        docs.where((F.col("doc_id") % 3 == 0) & (F.col("doc_id") < 3 * N_RIGHT))
        .where(F.size(w) > 8)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.lit(BOILER + " "), F.concat_ws(" ", F.slice(w, 7, F.size(w)))).alias("text"),
        )
        .localCheckpoint()
    )
    print(f"left={left.count()} right={right.count()} (every row shares {BOILER!r})")

    from dftly_spark.ops import fuzzy_join

    results = {}
    for label, kwargs in [
        ("plain", {}),
        ("capped", {"max_prefix_df": 1000}),
        ("capped+df", {"max_prefix_df": 1000, "token_order": "df"}),
    ]:
        t0 = time.perf_counter()
        out = fuzzy_join(
            left, right, "doc_id", "text", n=3, threshold=0.5, **kwargs
        )
        pairs = {(r["id_l"], r["id_r"]) for r in out.collect()}
        wall = time.perf_counter() - t0
        results[label] = pairs
        print(f"{label:10s} wall={wall:7.2f}s pairs={len(pairs)}", flush=True)

    assert results["capped"] == results["plain"], "pair set changed under cap!"
    assert results["capped+df"] == results["plain"], "pair set changed under cap+df!"
    print("pair sets identical across all modes")
    spark.stop()


if __name__ == "__main__":
    main()
