"""Sessionization: batch windows vs stateful streaming parity."""

import pytest
from pyspark.sql import functions as F

from dftly_spark.ops.sessions import sessionize, sessionize_stream
from dftly_spark.streaming import stream_table
from dftly_spark.io import normalize_event_ts

SF_DIR = "/root/testdata/sf0.001"
GAP = 30 * 60 * 1_000_000


def _batch_events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(spark.read.parquet(f"{SF_DIR}/events.parquet"))


def test_batch_sessionize_sanity(spark):
    out = sessionize(_batch_events(spark), gap_micros=GAP)
    rows = out.collect()
    assert len(rows) == _batch_events(spark).count()
    # session indexes start at 1 and are contiguous per user
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, set()).add(r.session_idx)
    for sessions in per_user.values():
        assert min(sessions) == 1
        assert sessions == set(range(1, max(sessions) + 1))


def test_stream_sessionize_matches_batch(spark):
    batch = {tuple(r) for r in sessionize(_batch_events(spark), gap_micros=GAP).collect()}
    stream = sessionize_stream(stream_table(spark, SF_DIR, "events"), gap_micros=GAP)
    q = (
        stream.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.table("sessions_stream").collect()}
    assert got == batch
