"""Comparison nodes — all null-propagating binary operators.

Reference: /root/reference/src/dftly/nodes/comparison.py.  Spark's ``=``,
``<``, ... are null-propagating like Polars' (NOT ``eqNullSafe`` — SURVEY §2
#20), so every node lowers to the plain Column operator.
"""

from __future__ import annotations

import operator
from typing import Any, Callable, ClassVar

from pyspark.sql import Column as SparkColumn

from .. import dtypes as DT
from .base import LoweringContext, Node


class _Compare(Node):
    N_ARGS = 2
    PY_OP: ClassVar[Callable[[Any, Any], bool]]

    def fold(self) -> Any:
        return self.PY_OP(self.args[0].fold(), self.args[1].fold())

    def out_type(self, ctx: LoweringContext) -> str:
        return DT.BOOL

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        return self.PY_OP(self.args[0].to_column(ctx), self.args[1].to_column(ctx))


class GreaterThan(_Compare):
    KEY = "greater_than"
    SYM = ">"
    PY_OP = operator.gt


class LessThan(_Compare):
    KEY = "less_than"
    SYM = "<"
    PY_OP = operator.lt


class Equal(_Compare):
    KEY = "equal"
    SYM = "=="
    PY_OP = operator.eq

    def fold(self) -> Any:
        return self.args[0].fold() == self.args[1].fold()


class NotEqual(_Compare):
    KEY = "not_equal"
    SYM = "!="
    PY_OP = operator.ne

    def fold(self) -> Any:
        return self.args[0].fold() != self.args[1].fold()


class GreaterThanOrEqual(_Compare):
    KEY = "greater_than_or_equal"
    SYM = ">="
    PY_OP = operator.ge


class LessThanOrEqual(_Compare):
    KEY = "less_than_or_equal"
    SYM = "<="
    PY_OP = operator.le
