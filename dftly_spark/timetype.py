"""Opt-in bridge from the engine's tagged time representation to Spark TIME.

The reference has a first-class ``time`` dtype (Polars ``pl.Time``); Spark
had none before 4.1, so the engine represents time values as
micros-since-midnight ``bigint`` with an AST-level type tag (SURVEY §4.3
#6) — every accessor, literal, ``@`` combination and strptime understands
the tag, and q11/q16 gate the arithmetic.

Spark 4.1 ships a real ``TIME(n)`` type behind a feature flag
(``spark.sql.timeType.enabled``, default false in 4.1).  This module is the
version-gated bridge: when the flag is on, :func:`micros_to_time` converts
the tagged long into a genuine ``time(6)`` column at the OUTPUT BOUNDARY
(the internal representation stays the portable bigint — expression
arithmetic on longs is codegen'd and engine-replayable, and flipping the
internals would fork the oracle surface for a type most sessions haven't
enabled).  When TIME becomes default-on in a later Spark, the same
conversion becomes the lowering for ``::time`` itself; the tag plumbing is
already centralized in ``nodes/cast.py``/``nodes/datetimes.py``, so that
change is one lowering swap, not a redesign.
"""

from __future__ import annotations

from pyspark.sql import Column as SparkColumn
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def time_type_enabled(spark: SparkSession) -> bool:
    """True when this session can materialize TIME columns (4.1+, flag on)."""
    try:
        return spark.conf.get("spark.sql.timeType.enabled") == "true"
    except Exception:
        return False


def micros_to_time(col: SparkColumn) -> SparkColumn:
    """Tagged micros-since-midnight (bigint) → ``time(6)``.

    Pure integer decomposition + ``make_time`` — no UDF.  Raises at runtime
    with Spark's own UNSUPPORTED_TIME_TYPE error if the session has the
    feature flag off; guard with :func:`time_type_enabled`.
    """
    us = col.cast("bigint")
    hours = F.floor(us / F.lit(3_600_000_000)).cast("int")
    minutes = (F.floor(us / F.lit(60_000_000)) % 60).cast("int")
    secs = (us % F.lit(60_000_000)).cast("decimal(16,6)") / F.lit(1_000_000)
    return F.call_function("make_time", hours, minutes, secs)


def time_to_micros(col: SparkColumn) -> SparkColumn:
    """``time(n)`` → micros-since-midnight bigint (the engine's tagged form).

    ``date_part('SECOND', t)`` returns the fractional seconds as a decimal,
    so the decomposition is exact to the microsecond.
    """
    return (
        F.hour(col).cast("bigint") * F.lit(3_600_000_000)
        + F.minute(col).cast("bigint") * F.lit(60_000_000)
        + (F.date_part(F.lit("SECOND"), col) * F.lit(1_000_000)).cast("bigint")
    )
