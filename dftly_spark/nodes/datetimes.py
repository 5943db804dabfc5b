"""Datetime combiner + component/duration accessor nodes.

Reference: /root/reference/src/dftly/nodes/datetime.py.

Lowering notes (SURVEY.md §2 #33-50):

* ``set_time`` → exact micros arithmetic: midnight timestamp of the date plus
  the tagged time-of-day micros (``timestamp_micros(unix_micros(...) + t)``).
* ``day_of_week`` → ``F.weekday() + 1`` (Polars: 1=Mon…7=Sun; Spark's
  ``dayofweek`` is 1=Sun — wrong one; §4.3 #7).
* Component accessors dispatch on the input tag: datetime/date → native
  functions; tagged TIME longs → micros arithmetic.
* ``total_*`` accessors read a day-time interval through exact micros
  (epoch + interval → ``unix_micros``), then divide with truncation toward
  zero, matching Rust/Polars integer division.  Spark intervals are µs
  resolution, so ``total_nanoseconds`` is micros × 1000 (§2 #47).
"""

from __future__ import annotations

from typing import Callable, ClassVar

from pyspark.sql import Column as SparkColumn
from pyspark.sql import functions as F

from .. import dtypes as DT
from .base import LoweringContext, Node

MICROS = {
    "second": 1_000_000,
    "minute": 60 * 1_000_000,
    "hour": 3_600 * 1_000_000,
    "day": 86_400 * 1_000_000,
}


def _interval_micros(iv: SparkColumn) -> SparkColumn:
    """Total microseconds of a day-time interval, exactly.

    Computed as ``unix_micros(epoch + iv) - unix_micros(epoch)`` so the
    session-timezone term cancels: ``unix_micros`` interprets a naive
    timestamp in ``spark.sql.session.timeZone``, and under a non-UTC zone
    the lone ``unix_micros(epoch + iv)`` would be shifted by the zone's
    UTC offset.
    """
    epoch = F.to_timestamp(F.lit("1970-01-01 00:00:00"))
    return F.unix_micros(epoch + iv) - F.unix_micros(epoch)


def _div_trunc(c: SparkColumn, n: int) -> SparkColumn:
    """Integer division truncating toward zero (Rust/Polars semantics)."""
    pos = F.floor(c / F.lit(n)).cast("bigint")
    neg = -F.floor((-c) / F.lit(n)).cast("bigint")
    return F.when(c < 0, neg).otherwise(pos)


class SetTime(Node):
    """``date @ time`` — set the time-of-day of a date/datetime
    (datetime.py:9-35)."""

    KEY = "set_time"
    SYM = "@"
    N_ARGS = 2

    def out_type(self, ctx: LoweringContext) -> str:
        return DT.DATETIME

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        d = self.args[0].to_column(ctx)
        t = self.args[1].to_column(ctx)  # tagged micros-since-midnight
        midnight = F.to_timestamp(F.to_date(d))
        return F.timestamp_micros(F.unix_micros(midnight) + t.cast("bigint"))


class _DtAccessor(Node):
    """Shared base: one argument, function form ``dt_<key>($x)`` plus a cast
    form ``x::<CAST_NAME>`` (datetime.py:38-100)."""

    N_ARGS = 1
    CAST_NAME: ClassVar[str | None] = None
    #: native function over a date/timestamp column
    SPARK_FN: ClassVar[Callable[[SparkColumn], SparkColumn] | None] = None
    #: micros-since-midnight arithmetic for tagged TIME inputs (None = n/a)
    TIME_MICROS_UNIT: ClassVar[int | None] = None

    def out_type(self, ctx: LoweringContext) -> str:
        return DT.I32

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        node = self.args[0]
        col = node.to_column(ctx)
        if node.out_type(ctx) == DT.TIME and self.TIME_MICROS_UNIT is not None:
            unit = self.TIME_MICROS_UNIT
            per_parent = {
                MICROS["second"]: 60,
                MICROS["minute"]: 60,
                MICROS["hour"]: 24,
            }[unit]
            return (_div_trunc(col, unit) % per_parent).cast("int")
        return type(self).SPARK_FN(col)


class DtYear(_DtAccessor):
    """Calendar year; cast name ``year_of_date`` — ``::year`` is the
    int→date constructor (datetime.py:108-142)."""

    KEY = "dt_year"
    CAST_NAME = "year_of_date"
    SPARK_FN = staticmethod(F.year)


class DtMonthOfYear(_DtAccessor):
    KEY = "dt_month_of_year"
    CAST_NAME = "month_of_year"
    SPARK_FN = staticmethod(F.month)


class DtDayOfMonth(_DtAccessor):
    KEY = "dt_day_of_month"
    CAST_NAME = "day_of_month"
    SPARK_FN = staticmethod(F.dayofmonth)


class DtDayOfWeek(_DtAccessor):
    """1=Monday … 7=Sunday (datetime.py:185-196); ``F.weekday`` is 0=Mon."""

    KEY = "dt_day_of_week"
    CAST_NAME = "day_of_week"
    SPARK_FN = staticmethod(lambda c: F.weekday(c) + F.lit(1))


class DtDayOfYear(_DtAccessor):
    KEY = "dt_day_of_year"
    CAST_NAME = "day_of_year"
    SPARK_FN = staticmethod(F.dayofyear)


class DtHourOfDay(_DtAccessor):
    KEY = "dt_hour_of_day"
    CAST_NAME = "hour_of_day"
    SPARK_FN = staticmethod(F.hour)
    TIME_MICROS_UNIT = MICROS["hour"]


class DtMinuteOfHour(_DtAccessor):
    KEY = "dt_minute_of_hour"
    CAST_NAME = "minute_of_hour"
    SPARK_FN = staticmethod(F.minute)
    TIME_MICROS_UNIT = MICROS["minute"]


class DtSecondOfMinute(_DtAccessor):
    KEY = "dt_second_of_minute"
    CAST_NAME = "second_of_minute"
    SPARK_FN = staticmethod(F.second)
    TIME_MICROS_UNIT = MICROS["second"]


class DtWeekOfYear(_DtAccessor):
    """ISO week (matches ``F.weekofyear``)."""

    KEY = "dt_week_of_year"
    CAST_NAME = "week_of_year"
    SPARK_FN = staticmethod(F.weekofyear)


class DtQuarterOfYear(_DtAccessor):
    KEY = "dt_quarter_of_year"
    CAST_NAME = "quarter_of_year"
    SPARK_FN = staticmethod(F.quarter)


class _DtTotal(_DtAccessor):
    """Duration → total whole units, truncating toward zero
    (datetime.py:314-432)."""

    DIV_MICROS: ClassVar[int] = 1
    MUL: ClassVar[int] = 1

    def out_type(self, ctx: LoweringContext) -> str:
        return DT.I64

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        micros = _interval_micros(self.args[0].to_column(ctx))
        if self.DIV_MICROS == 1:
            return micros * F.lit(self.MUL) if self.MUL != 1 else micros
        return _div_trunc(micros, self.DIV_MICROS)


class DtTotalSeconds(_DtTotal):
    KEY = "dt_total_seconds"
    CAST_NAME = "total_seconds"
    DIV_MICROS = MICROS["second"]


class DtTotalMilliseconds(_DtTotal):
    KEY = "dt_total_milliseconds"
    CAST_NAME = "total_milliseconds"
    DIV_MICROS = 1_000


class DtTotalMicroseconds(_DtTotal):
    KEY = "dt_total_microseconds"
    CAST_NAME = "total_microseconds"
    DIV_MICROS = 1


class DtTotalNanoseconds(_DtTotal):
    """Spark intervals are µs resolution → micros × 1000 (SURVEY §2 #47)."""

    KEY = "dt_total_nanoseconds"
    CAST_NAME = "total_nanoseconds"
    DIV_MICROS = 1
    MUL = 1_000


class DtTotalMinutes(_DtTotal):
    KEY = "dt_total_minutes"
    CAST_NAME = "total_minutes"
    DIV_MICROS = MICROS["minute"]


class DtTotalHours(_DtTotal):
    KEY = "dt_total_hours"
    CAST_NAME = "total_hours"
    DIV_MICROS = MICROS["hour"]


class DtTotalDays(_DtTotal):
    KEY = "dt_total_days"
    CAST_NAME = "total_days"
    DIV_MICROS = MICROS["day"]
