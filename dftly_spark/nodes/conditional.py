"""If/then/else node.

Reference: /root/reference/src/dftly/nodes/conditional.py.  A bare
``F.when(cond, then)`` without ``otherwise`` yields null — identical to the
Polars behavior (freebie, SURVEY §4.3 #14).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column as SparkColumn
from pyspark.sql import functions as F

from .. import dtypes as DT
from .base import LoweringContext, Node


class Conditional(Node):
    """``THEN if WHEN [else OTHERWISE]`` (conditional.py:6-63).

    Keyword args ``when``/``then``/``otherwise`` (avoiding Python keywords);
    string form reorders — ``then`` comes first in the text.
    """

    KEY = "conditional"
    ALLOW_KW = True
    REQUIRED_KW = frozenset({"when", "then"})
    OPTIONAL_KW = frozenset({"otherwise"})

    def fold(self) -> Any:
        if self.kwargs["when"].fold():
            return self.kwargs["then"].fold()
        if "otherwise" in self.kwargs:
            return self.kwargs["otherwise"].fold()
        return None

    def out_type(self, ctx: LoweringContext) -> str:
        t = self.kwargs["then"].out_type(ctx)
        if t != DT.UNKNOWN and t != DT.NULL:
            return t
        if "otherwise" in self.kwargs:
            return self.kwargs["otherwise"].out_type(ctx)
        return t

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        branch = F.when(
            self.kwargs["when"].to_column(ctx), self.kwargs["then"].to_column(ctx)
        )
        if "otherwise" in self.kwargs:
            return branch.otherwise(self.kwargs["otherwise"].to_column(ctx))
        return branch

    @classmethod
    def from_str_args(cls, items: Any) -> dict[str, Any]:
        # String form is `THEN if WHEN [else OTHERWISE]` — reorder.
        kwargs = {"when": items[1], "then": items[0]}
        if len(items) == 3:
            kwargs["otherwise"] = items[2]
        return {cls.KEY: kwargs}
