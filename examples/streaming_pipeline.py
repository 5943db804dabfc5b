"""Streaming consumers over one event feed — the streaming-twin catalog.

FOUR INDEPENDENT streaming queries over the same readStream (not a
chained pipeline: Spark restricts chaining arbitrary-state operators
like debounce→sessionize inside one query, so production deployments
run them as parallel consumers of the feed, each with its own sink and
checkpoint — exactly what this builds).  Each is watermark-bounded or
O(1) state per key, so all four run forever without state growth:

    debounce    — drop duplicate bursts (O(1)/key state)
    sessionize  — per-key session ids (O(1)/key state)
    tumbling    — watermarked per-type counts, 1-hour windows
    heavy hitters — per-window support threshold, append-safe

Run:  python examples/streaming_pipeline.py [sf_dir]   (availableNow —
drains the table as a stream, prints each output table, exits)
Test: tests/test_example_pipeline.py runs it end-to-end at sf0.001.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    from dftly_spark.ops import debounce_stream, sessionize_stream
    from dftly_spark.streaming import (
        stream_table,
        tumbling_agg,
        windowed_heavy_hitters,
    )

    events = stream_table(spark, sf_dir, "events")

    # 1. Debounce: surviving event ids (semi-join downstream tables
    #    against this to exclude retry storms).
    clean_ids = debounce_stream(
        events, "user_id", "ts", "event_id",
        value_cols=["event_type"], within_micros=60_000_000,
    )

    # 2. Sessionize the feed (session ids per user, O(1) state).
    sessions = sessionize_stream(events, gap_micros=1_800_000_000)

    # 3. Watermarked per-type activity counts, 1-hour tumbling windows.
    activity = tumbling_agg(
        events, "ts", window="1 hour", watermark="2 hours",
        keys=["event_type"],
        aggs={"n": F.count(F.lit(1)), "total_value": F.sum("value")},
    )

    # 4. Heavy hitters per window (support threshold — append-safe).
    hot_users = windowed_heavy_hitters(
        events, "ts", "user_id", window="1 hour", watermark="2 hours",
        min_count=3,
    )

    return {
        "debounced": clean_ids,
        "sessions": sessions,
        "activity": activity,
        "hot_users": hot_users,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    outs = build(spark, sf_dir)
    for name, sdf in outs.items():
        mode = "append" if name in ("debounced", "sessions") else "complete"
        q = (
            sdf.writeStream.format("memory")
            .queryName(f"out_{name}")
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        print(f"== {name}: {spark.table(f'out_{name}').count()} rows")


if __name__ == "__main__":
    main()
