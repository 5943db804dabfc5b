"""Measure the cost of the strict-unsigned uint64 mode (DECIMAL(20,0)).

The mode trades whole-stage-codegen bigint math for decimal math
(README: "The trade is decimal arithmetic outside whole-stage codegen's
fastest path").  This probe quantifies that trade at scan speed: hash +
cast over ``spark.range`` rows, default bigint lowering vs uint64_decimal
lowering, same session, interleaved A/B/A/B so box drift hits both sides.

Usage: python scripts/uint64_probe.py [n_rows] [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from dftly_spark.nodes import LoweringContext  # noqa: E402
from dftly_spark.parser import Parser  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    df = spark.range(n).select(
        (F.col("id") - F.lit(n // 2)).alias("v"), F.col("id").cast("string").alias("s")
    )
    spec = {"h": "hash($s)", "u": "$v ::? uint64", "r": "($v ::? uint64) :: str"}

    def run(uint64_decimal: bool) -> float:
        cols = Parser.to_spark(spec, schema=df, uint64_decimal=uint64_decimal)
        out = df.select(*cols.values())
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run(False)  # warm codegen/JIT
    run(True)
    big, dec = [], []
    for _ in range(reps):
        big.append(run(False))
        dec.append(run(True))
    mb, md = statistics.median(big), statistics.median(dec)
    print(f"rows={n} reps={reps}")
    print(f"bigint  (default):       median {mb:.2f}s  reps {[round(x,2) for x in big]}")
    print(f"decimal (uint64_decimal): median {md:.2f}s  reps {[round(x,2) for x in dec]}")
    print(f"overhead: {md / mb:.2f}x")


if __name__ == "__main__":
    main()
