"""Session-timezone invariance of time/duration lowering.

The driver and the other tests pin ``spark.sql.session.timeZone=UTC``; these
tests flip the session to a non-UTC zone and assert the same values come back,
so no lowering silently bakes in the zone's UTC offset (durations and
time-of-day are naive quantities in the reference's model).
"""

import pytest


@pytest.fixture
def ny_tz(spark):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", old)


@pytest.mark.parametrize(
    "expr, want",
    [
        ("(90::minutes)::total_seconds", 5400),
        ("(90::minutes)::total_minutes", 90),
        ("(3::hours)::total_seconds", 10800),
        ("((-90)::minutes)::total_seconds", -5400),
        ("(1::days)::total_hours", 24),
    ],
)
def test_interval_totals_tz_invariant(ny_tz, run1, expr, want):
    assert run1(expr) == want


def test_strptime_time_tz_invariant(ny_tz, run1):
    # 13:45:00 → micros since midnight, regardless of session tz.
    got = run1("$t::'%H:%M:%S'", t="13:45:00")
    assert got == (13 * 3600 + 45 * 60) * 1_000_000


def test_cast_str_to_time_tz_invariant(ny_tz, run1):
    got = run1("$t::time", t="13:45:00")
    assert got == (13 * 3600 + 45 * 60) * 1_000_000


def test_cast_datetime_to_time_tz_invariant(ny_tz, spark):
    # Wall-clock 13:45 built *inside* the session (to_timestamp of a naive
    # string) → time-of-day must be 13:45 whatever the session tz is.
    from pyspark.sql import functions as F

    from dftly_spark import Parser

    df = spark.range(1).select(
        F.to_timestamp(F.lit("2024-03-05 13:45:00")).alias("ts")
    )
    got = df.select(Parser.expr_to_spark("$ts::time", schema=df).alias("v")).collect()[0][0]
    assert got == (13 * 3600 + 45 * 60) * 1_000_000


def test_strict_cast_str_to_time_raises(run1):
    with pytest.raises(Exception, match="strict cast|USER_RAISED"):
        run1("$t::time", t="not a time")


def test_nonstrict_cast_str_to_time_nulls(run1):
    assert run1("$t::?time", t="not a time") is None
