#!/usr/bin/env python
"""BPE merge-loop probe: wall time AND driver-job budget per mode.

Verdict-r10 item: the merge loop's ceiling is driver-sequential Spark job
rounds.  This probe fits ``n_merges`` (default 256) rules on the sf0.1
documents corpus in each mode and reports wall seconds, Spark JOB count
(via the status tracker's job-group listing — the thing that is ~160 ms
each no matter how small the data), driver rounds, and jobs-per-merge.

Usage: python scripts/bpe_probe.py [n_merges] [mode ...]
  modes default: batch16 batch64 auto exact   (exact last — it's the slow one)

The synthetic documents vocab is only 31 distinct words (merge capacity
~107 rules), so probing >=1k merges needs the ``rich`` corpus: pass
``rich`` anywhere in the mode list and the probe unions documents.text
with the customer and part name columns from the same SF dir (15k+
distinct words, ~250k merge capacity) — the vocab-table shape of a real
tokenizer fit, built entirely from the provided parquet inputs.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.1"
N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 256
_ARGS = sys.argv[2:]
RICH = "rich" in _ARGS
MODES = [a for a in _ARGS if a != "rich"] or ["batch16", "batch64", "auto", "exact"]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("bpe-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("text")
    if RICH:
        from pyspark.sql import functions as F

        # union in the high-cardinality name columns so the vocab table has
        # a realistic distinct-word count and the merge loop can run >=1k
        # rounds without exhausting
        cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
            F.col("c_name").alias("text")
        )
        part = spark.read.parquet(f"{SF_DIR}/part.parquet").select(
            F.col("p_name").alias("text")
        )
        docs = docs.unionByName(cust).unionByName(part)
    docs = docs.localCheckpoint()
    docs.count()

    from dftly_spark.ops import bpe_learn

    sc = spark.sparkContext
    for mode in MODES:
        kwargs = {
            "exact": {"batch": 1},
            "batch16": {"batch": 16},
            "batch64": {"batch": 64},
            "auto": {"batch": "auto"},
        }[mode]
        group = f"bpe-probe-{mode}"
        sc.setJobGroup(group, mode)
        t0 = time.perf_counter()
        out = bpe_learn(docs, "text", n_merges=N_MERGES, **kwargs)
        rows = out.collect()
        wall = time.perf_counter() - t0
        sc.setJobGroup("idle", "idle")
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        print(
            f"{mode:8s} n_merges={N_MERGES}: wall={wall:7.2f}s jobs={jobs:5d} "
            f"jobs/merge={jobs / max(len(rows), 1):.2f} rules={len(rows)}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
