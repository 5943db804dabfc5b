"""Long-haul soak for the stateful streaming trio (VERDICT r6 item 9).

Drives ~100 rate-source micro-batches through each of the two
``applyInPandasWithState`` operators (the as-of enrichment and the
sessionizer — the SAME ``_asof_loop``/session loop the
``transformWithStateInPandas`` twins route through, pinned by
``test_asof_stream_twins_share_one_loop``; the TWS twins themselves need
the protobuf state-server wire format, absent in this container), then
~15 ``availableNow`` rounds of the MinHash index maintenance loop.

What "bounded state" means per op:

* as-of / sessionize: state is O(1) per key (a fixed-width tuple), so over
  a FIXED key universe the state store must PLATEAU at n_keys rows while
  batches keep flowing — asserted as max(numRowsTotal) == n_keys and a
  flat tail over the last third of the soak.
* index maintenance: with ``dedup_first`` screening, re-streaming text
  drawn from a fixed distribution must stop growing the index — asserted
  as a plateaued banded-row count across the last rounds.

Run: ``python scripts/streaming_soak.py [n_batches] [n_index_rounds]``;
writes one line per probe and a PASS/FAIL summary (the committed soak log
is gate_logs/r07_streaming_soak.log).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_KEYS = 200


def _rate(spark, rows_per_sec=2000):
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .load()
    )


def _soak_query(spark, out_df, name, n_batches):
    """Run a streaming frame for n_batches micro-batches; return the
    per-batch stateOperators numRowsTotal series."""
    q = (
        out_df.writeStream.format("noop")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix=f"soak_{name}_"))
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    totals = []
    seen = set()
    try:
        while len(totals) < n_batches:
            time.sleep(0.25)
            p = q.lastProgress
            if not p or p["batchId"] in seen or not p.get("stateOperators"):
                continue
            seen.add(p["batchId"])
            totals.append(int(p["stateOperators"][0]["numRowsTotal"]))
    finally:
        q.stop()
    return totals


def soak_asof(spark, n_batches):
    from dftly_spark.ops import asof_join_stream

    r = _rate(spark)
    left = r.where(F.col("value") % 2 == 0).select(
        F.col("value").alias("event_id"),
        ((F.col("value") / 2).cast("long") % N_KEYS).alias("user_id"),
        F.col("timestamp").alias("ts"),
    )
    right = r.where(F.col("value") % 2 == 1).select(
        ((F.col("value") / 2).cast("long") % N_KEYS).alias("user_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 97).cast("double").alias("value"),
    )
    out = asof_join_stream(left, right)
    return _soak_query(spark, out, "soak_asof", n_batches)


def soak_sessionize(spark, n_batches):
    from dftly_spark.ops import sessionize_stream

    r = _rate(spark)
    ev = r.select(
        F.col("value").alias("event_id"),
        (F.col("value") % N_KEYS).alias("user_id"),
        F.col("timestamp").alias("ts"),
    )
    out = sessionize_stream(ev, gap_micros=2_000_000)
    return _soak_query(spark, out, "soak_sessions", n_batches)


#: fuzzy-ER soak: watermark delay (seconds) for the downstream dedup and
#: the state ceiling derived from it — rate × (delay + trigger/eviction
#: slack); state above this means the watermark is not evicting.
FUZZY_RATE = 1000
FUZZY_WM_S = 2
FUZZY_STATE_BOUND = FUZZY_RATE * (FUZZY_WM_S + 8)


def soak_fuzzy(spark, n_batches):
    """Watermarked entity-resolution ingest: stream_fuzzy_join (stateless)
    → dropDuplicatesWithinWatermark (the ONE stateful stage).  Every
    arriving row matches exactly one indexed doc and carries a UNIQUE
    new_id, so pairs never repeat and the dedup state holds only the
    rows inside the watermark horizon — bounded by rate × delay, NOT by
    stream length.  PASS = state stays under that ceiling and at least
    one eviction (a numRowsTotal decrease) is observed."""
    from dftly_spark.ops import fuzzy_index
    from dftly_spark.streaming import stream_fuzzy_join

    corpus = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit(f"t{j}x"), F.col("id").cast("string")) for j in range(5)],
        ).alias("text"),
    )
    prefix, sets = fuzzy_index(corpus, "doc_id", "text", n=3, threshold=0.8)
    # disjoint per-doc vocab: prefix/sets frames are tiny; materialize so
    # every micro-batch joins against a settled static side
    prefix = prefix.localCheckpoint()
    sets = sets.localCheckpoint()

    r = _rate(spark, rows_per_sec=FUZZY_RATE)
    stream = r.select(
        F.col("value").alias("doc_id"),
        F.col("timestamp").alias("ts"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"t{j}x"), (F.col("value") % 20).cast("string"))
                for j in range(5)
            ],
        ).alias("text"),
    ).withWatermark("ts", f"{FUZZY_WM_S} seconds")
    out = stream_fuzzy_join(
        stream, prefix, sets, "doc_id", "text", n=3, threshold=0.8,
        carry_cols=("ts",),
    ).dropDuplicatesWithinWatermark(["new_id", "corpus_id"])
    return _soak_query(spark, out, "soak_fuzzy", n_batches)


def soak_index(spark, n_rounds):
    from dftly_spark.ops import minhash_index
    from dftly_spark.streaming import maintain_minhash_index

    base = tempfile.mkdtemp(prefix="soak_idx_")
    banded_path, sets_path = f"{base}/banded", f"{base}/sets"
    ckpt = f"{base}/ckpt"
    # fixed text distribution: 7*5*3*11 = 1155 distinct documents; once
    # they are all indexed, screening must admit nothing new
    text = F.concat_ws(
        " ",
        F.concat(F.lit("alpha"), (F.col("value") % 7).cast("string")),
        F.concat(F.lit("beta"), (F.col("value") % 5).cast("string")),
        F.concat(F.lit("gamma"), (F.col("value") % 3).cast("string")),
        F.concat(F.lit("delta"), (F.col("value") % 11).cast("string")),
    )
    # seed the index tables so dedup_first has something to read
    seed = spark.range(1).select(
        F.lit(-1).cast("long").alias("doc_id"),
        F.lit("seed document text here").alias("text"),
    )
    b0, s0 = minhash_index(seed, "doc_id", "text")
    b0.write.mode("overwrite").parquet(banded_path)
    s0.write.mode("overwrite").parquet(sets_path)
    sizes = []
    for _ in range(n_rounds):
        docs = _rate(spark, rows_per_sec=500).select(
            F.col("value").alias("doc_id"), text.alias("text")
        )
        q = maintain_minhash_index(
            docs, "doc_id", "text",
            banded_path=banded_path, sets_path=sets_path, checkpoint=ckpt,
            dedup_first=(
                spark.read.parquet(banded_path), spark.read.parquet(sets_path)
            ),
        )
        q.awaitTermination()
        time.sleep(1.0)  # let the rate source accrue rows for the next round
        sizes.append(
            spark.read.parquet(banded_path).select("doc_id").distinct().count()
        )
    shutil.rmtree(base, ignore_errors=True)
    return sizes


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    # the plateau check needs batches past ramp-up and the flat check
    # needs >= 2 index rounds — tiny manual args would FAIL vacuously
    if n_batches < 3 or n_rounds < 2:
        raise SystemExit("usage: streaming_soak.py [n_batches>=3] [n_rounds>=2]")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ok = True

    for name, fn in (("asof", soak_asof), ("sessionize", soak_sessionize)):
        totals = fn(spark, n_batches)
        tail = totals[-max(1, len(totals) // 3):]
        plateau = max(totals) <= N_KEYS and len(set(tail)) == 1
        ok &= plateau
        print(
            f"{name}: batches={len(totals)} max_state_rows={max(totals)} "
            f"tail={sorted(set(tail))} bound={N_KEYS} "
            f"{'PASS' if plateau else 'FAIL'}"
        )

    totals = soak_fuzzy(spark, n_batches)
    evicted = any(b < a for a, b in zip(totals, totals[1:]))
    bounded = max(totals) <= FUZZY_STATE_BOUND
    fuzzy_ok = bounded and evicted
    ok &= fuzzy_ok
    print(
        f"fuzzy_er_dedup: batches={len(totals)} max_state_rows={max(totals)} "
        f"bound={FUZZY_STATE_BOUND} evictions={'yes' if evicted else 'no'} "
        f"{'PASS' if fuzzy_ok else 'FAIL'}"
    )

    sizes = soak_index(spark, n_rounds)
    # live rounds can admit intra-batch duplicates (screening is against
    # the INDEX, not within-batch — at-least-once appends; the compaction
    # pass dedups), and under machine load the 500-rows/sec rate source
    # may need SEVERAL rounds to cover the 1155-text distribution (the r14
    # concurrent-gate run covered it in 2 instead of 1).  The invariant is
    # NO GROWTH once the distribution is indexed: the last two-thirds of
    # the rounds must be flat — ramp length is wall-clock, the plateau is
    # the contract.
    tail = sizes[len(sizes) // 3:]
    flat = len(set(tail)) == 1 and tail[-1] > 1
    ok &= flat
    print(
        f"minhash_index: rounds={len(sizes)} sizes={sizes} "
        f"{'PASS' if flat else 'FAIL'}"
    )
    print("SOAK", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
