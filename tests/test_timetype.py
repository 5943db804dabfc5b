"""Spark 4.1 TIME bridge (SURVEY §7.5 #2): version-gated, opt-in.

The engine's internal time representation stays the tagged
micros-since-midnight bigint (portable, codegen'd, oracle-replayable);
``dftly_spark.timetype`` converts at the output boundary when the session
has ``spark.sql.timeType.enabled`` on.  Skips on any Spark that lacks the
flag or the type.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def time_spark(spark):
    try:
        spark.conf.set("spark.sql.timeType.enabled", "true")
    except Exception:
        pytest.skip("this Spark has no TIME feature flag")
    try:
        spark.range(1).select(F.expr("make_time(1, 1, 1.0)")).collect()
    except Exception:
        pytest.skip("TIME type unsupported on this Spark")
    yield spark
    spark.conf.set("spark.sql.timeType.enabled", "false")


def test_micros_roundtrip_through_time(time_spark):
    from dftly_spark.timetype import micros_to_time, time_to_micros, time_type_enabled

    assert time_type_enabled(time_spark)
    us = 13 * 3_600_000_000 + 5 * 60_000_000 + 7_123_456
    row = (
        time_spark.range(1)
        .select(micros_to_time(F.lit(us)).alias("t"))
        .select(F.col("t"), time_to_micros(F.col("t")).alias("us"))
        .collect()[0]
    )
    import datetime as dt

    assert row.t == dt.time(13, 5, 7, 123456)
    assert row.us == us


def test_engine_time_surfaces_as_real_time(time_spark):
    """End-to-end: a strptime'd engine time value materializes as TIME(6)."""
    from dftly_spark import Parser
    from dftly_spark.timetype import micros_to_time

    df = time_spark.createDataFrame([("13:05:07",)], "s string")
    tagged = Parser.select(df, {"t_us": "$s::'%H:%M:%S'"})
    out = tagged.select(micros_to_time(F.col("t_us")).alias("t"))
    assert out.schema["t"].dataType.typeName().startswith("time")
    import datetime as dt

    assert out.collect()[0].t == dt.time(13, 5, 7)


def test_time_type_enabled_false_by_default():
    from dftly_spark.timetype import time_type_enabled

    class FakeConf:
        def get(self, k):
            raise Exception("no such conf")

    class FakeSpark:
        conf = FakeConf()

    assert time_type_enabled(FakeSpark()) is False


def test_native_time_input_column_accessors(spark):
    """A Spark 4.1 native time(6) INPUT column flows through the engine:
    tagged TIME at inference, converted to micros at the input boundary,
    so accessors / totals / @ all work unchanged."""
    from pyspark.sql import functions as F

    from dftly_spark import Parser

    spark.conf.set("spark.sql.timeType.enabled", "true")
    df = spark.createDataFrame(
        [("13:45:12.123456",), ("00:00:01",)], "s string"
    ).select(F.col("s").cast("time(6)").alias("t"), F.lit("2024-03-05").cast("date").alias("d"))
    out = Parser.select(
        df,
        {
            "h": "$t::hour_of_day::int64",
            "m": "$t::minute_of_hour::int64",
            "s": "$t::second_of_minute::int64",
            # '@' requires a time LITERAL in the string grammar (reference
            # parity); expression-valued time uses the node form.
            "at": {"set_time": ["$d", "$t"]},
        },
    ).collect()
    assert (out[0]["h"], out[0]["m"], out[0]["s"]) == (13, 45, 12)
    assert (out[1]["h"], out[1]["m"], out[1]["s"]) == (0, 0, 1)
    assert str(out[0]["at"]) == "2024-03-05 13:45:12.123456"


def test_native_time_roundtrip_through_engine(spark):
    """time(6) in -> engine micros -> micros_to_time out is the identity."""
    from pyspark.sql import functions as F

    from dftly_spark import Parser, micros_to_time

    spark.conf.set("spark.sql.timeType.enabled", "true")
    df = spark.createDataFrame([("07:08:09.5",)], "s string").select(
        F.col("s").cast("time(6)").alias("t")
    )
    tagged = Parser.select(df, {"t_us": "$t"})
    back = tagged.select(micros_to_time(F.col("t_us")).alias("t")).collect()
    import datetime

    assert back[0]["t"] == datetime.time(7, 8, 9, 500000)


def _qseries_names():
    import __spark_entry__ as entry

    return sorted(n for n in entry.queries() if n.startswith("q"))


@pytest.mark.parametrize("name", _qseries_names())
def test_qseries_identical_under_time_flag(spark, name):
    """Full q-series TIME-flag matrix (r12 verdict item 5): every
    reference-surface query must produce IDENTICAL rows with
    ``spark.sql.timeType.enabled`` off and on.  The engine's internal
    time representation is the tagged micros bigint on both legs; this
    pins that no lowering (accessors, set_time, strptime, casts) drifts
    when the session's native TIME type is live — the failure mode when
    a future Spark flips the flag default and e.g. a string→time cast
    starts resolving to the native type.  (q26 enables the flag for
    itself on both legs by design — the bridge query.)"""
    import __spark_entry__ as entry

    fn = entry.queries()[name]
    sf = "/root/testdata/sf0.001"
    legs = {}
    for flag in ("false", "true"):
        spark.conf.set("spark.sql.timeType.enabled", flag)
        try:
            legs[flag] = sorted(map(repr, fn(spark, sf).collect()))
        finally:
            spark.conf.set("spark.sql.timeType.enabled", "false")
    assert legs["false"] == legs["true"], f"{name} drifts under TIME flag"
