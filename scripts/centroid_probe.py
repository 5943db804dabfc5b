#!/usr/bin/env python
"""Centroid-materialization probe: literal plan vs 1-row broadcast.

Verdict-r10 item: at production IVF shapes (k=65k, dim=1k ~ 0.5 GB) the
literal-centroid path inlines the k x dim matrix into the SQL plan and the
plan/py4j layer breaks.  ``centroids_as="broadcast_join"`` keeps the matrix
cluster-resident.  This probe measures BOTH modes at a shape big enough to
show the cliff direction (default k=4096, dim=512 = 16 MB of doubles as
plan literals) and prints:

  * driver-side plan-build wall time (includes the py4j literal transfer)
  * optimized-plan string size (the literal mode carries the matrix inline)
  * end-to-end execution wall time of the cell assignment

Usage: python scripts/centroid_probe.py [k] [dim] [modes]
  modes: comma list of broadcast_join,literal (default both) — at big
  shapes run broadcast_join alone; the literal plan-build is the cliff.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 512
MODES = (
    tuple(sys.argv[3].split(",")) if len(sys.argv) > 3 else ("broadcast_join", "literal")
)
# modes: broadcast_join | literal | arrow (broadcast_join centroids +
# Arrow/numpy matmul scorer)
N_ROWS = max(2 * K, 16384)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("centroid-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic embeddings: dim values derived from xxhash64
    emb = (
        spark.range(N_ROWS)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda i: (
                    F.pmod(F.xxhash64(F.col("id"), i), F.lit(2000)) - F.lit(1000.0)
                )
                / F.lit(1000.0),
            ).alias("embedding"),
        )
        .localCheckpoint()
    )
    emb.count()

    from dftly_spark.ops.similarity import topic_assign

    results = {}
    for mode in MODES:
        t0 = time.perf_counter()
        if mode == "arrow":
            out = topic_assign(
                emb, n_topics=K, strategy="first",
                centroids_as="broadcast_join", scorer="arrow",
            )
        else:
            out = topic_assign(
                emb, n_topics=K, strategy="first", centroids_as=mode
            )
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        t_build = time.perf_counter() - t0
        t1 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        t_exec = time.perf_counter() - t1
        results[mode] = (t_build, len(plan), t_exec)
        print(
            f"{mode:15s} k={K} dim={DIM}: plan_build={t_build:7.2f}s "
            f"plan_chars={len(plan):>12,} exec={t_exec:7.2f}s",
            flush=True,
        )

    if "broadcast_join" in results and "literal" in results:
        bj, lit = results["broadcast_join"], results["literal"]
        print(
            f"literal/broadcast ratios: plan_build={lit[0] / max(bj[0], 1e-9):.1f}x "
            f"plan_chars={lit[1] / max(bj[1], 1):.1f}x exec={lit[2] / max(bj[2], 1e-9):.1f}x"
        )
    spark.stop()


if __name__ == "__main__":
    main()
