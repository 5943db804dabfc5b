"""Arithmetic / boolean / horizontal n-ary nodes.

Reference: /root/reference/src/dftly/nodes/arithmetic.py.  All operations are
row-wise (horizontal) — ``min``/``max``/``mean``/``and``/``or`` reduce across
*columns within a row*, never down a column (SURVEY.md §0).

Spark-first lowering notes (SURVEY.md §2, §4.3):

* ``add`` dispatches on inferred dtype: any string operand → ``F.concat``
  (Spark ``+`` would coerce strings numerically — §4.3 #1).
* ``hash``/``signed_hash`` → ``F.xxhash64`` with an explicit null-in/null-out
  mask (reference masks Polars' total ``.hash()`` the same way,
  arithmetic.py:10-24).  Hash *values* are engine-specific; the contract is
  determinism + distinctness + null propagation (arithmetic.py:41-44).
* ``mean`` has no horizontal builtin → Σcoalesce / Σnot-null, null when all
  inputs are null (matches ``pl.mean_horizontal``'s ignore-null semantics).
* ``min``/``max`` → ``F.least``/``F.greatest`` (null-skipping — matches).
* ``power`` → ``F.pow`` (Double); recast to long when both operands are
  integral so int**int stays int (§4.3 #8).
"""

from __future__ import annotations

import operator
from functools import reduce
from typing import Any

from pyspark.sql import Column as SparkColumn
from pyspark.sql import functions as F

from .. import dtypes as DT
from .base import LoweringContext, Node, NotConst


def _null_safe_hash(
    src: SparkColumn, hashed: SparkColumn, out_type: str = "bigint"
) -> SparkColumn:
    """null-in → null-out; a missing key must not hash to a shared phantom id
    (reference rationale at arithmetic.py:10-24)."""
    return F.when(src.isNull(), F.lit(None).cast(out_type)).otherwise(hashed)


#: 2**64 as an exact decimal literal, for signed→unsigned wrap in
#: uint64_decimal mode (Python ints > 2**63-1 overflow F.lit).
_TWO_64 = str(DT.U64_MAX + 1)


class Hash(Node):
    """Deterministic 64-bit hash; null-in → null-out (arithmetic.py:27-104).

    Spark has no unsigned ints, so by default the result is a signed
    ``bigint`` from ``xxhash64``; the reference only promises determinism,
    distinctness, and null propagation, not specific values.  Under
    ``LoweringContext(uint64_decimal=True)`` the same 64 bits are presented
    as the true unsigned value (``DECIMAL(20,0)``, signed + 2**64 when
    negative) for reference-exact uint64 semantics.
    """

    KEY = "hash"
    N_ARGS = 1

    def out_type(self, ctx: LoweringContext) -> str:
        return DT.U64

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        src = self.args[0].to_column(ctx)
        h = F.xxhash64(src)
        if ctx.uint64_decimal:
            wrapped = F.when(
                h < 0,
                (h.cast("decimal(20,0)") + F.lit(_TWO_64).cast("decimal(21,0)")),
            ).otherwise(h.cast("decimal(20,0)"))
            return _null_safe_hash(src, wrapped.cast("decimal(20,0)"), "decimal(20,0)")
        return _null_safe_hash(src, h)


class SignedHash(Node):
    """Signed (Int64) variant of :class:`Hash` (arithmetic.py:107-195).

    In Spark ``xxhash64`` already returns a signed long, so the two nodes
    produce the same column; they differ only in declared signedness.
    """

    KEY = "signed_hash"
    N_ARGS = 1

    def out_type(self, ctx: LoweringContext) -> str:
        return DT.I64

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        src = self.args[0].to_column(ctx)
        return _null_safe_hash(src, F.xxhash64(src))


class Not(Node):
    """Logical NOT, Kleene 3-valued (arithmetic.py:198-211)."""

    KEY = "not"
    SYM = ("!", "not")
    N_ARGS = 1

    def fold(self) -> Any:
        return not self.args[0].fold()

    def out_type(self, ctx: LoweringContext) -> str:
        return DT.BOOL

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        return ~self.args[0].to_column(ctx)


class Negate(Node):
    """Arithmetic negation (arithmetic.py:214-230)."""

    KEY = "negate"
    SYM = "-"
    N_ARGS = 1

    def fold(self) -> Any:
        return -self.args[0].fold()

    def out_type(self, ctx: LoweringContext) -> str:
        return self.args[0].out_type(ctx)

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        return -self.args[0].to_column(ctx)


class And(Node):
    """Horizontal n-ary AND, Kleene logic (arithmetic.py:233-244).

    Spark's SQL three-valued AND matches ``pl.all_horizontal`` exactly.
    """

    KEY = "and"
    SYM = ("&&", "and")
    MIN_ARGS = 1

    def fold(self) -> Any:
        return all(a.fold() for a in self.args)

    def out_type(self, ctx: LoweringContext) -> str:
        return DT.BOOL

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        return reduce(operator.and_, (a.to_column(ctx) for a in self.args))


class Or(Node):
    """Horizontal n-ary OR, Kleene logic (arithmetic.py:247-258)."""

    KEY = "or"
    SYM = ("||", "or")
    MIN_ARGS = 1

    def fold(self) -> Any:
        return any(a.fold() for a in self.args)

    def out_type(self, ctx: LoweringContext) -> str:
        return DT.BOOL

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        return reduce(operator.or_, (a.to_column(ctx) for a in self.args))


def _add_result_type(types: list[str]) -> str:
    if any(t == DT.STR for t in types):
        return DT.STR
    if any(t == DT.DATETIME for t in types):
        return DT.DATETIME
    if any(t == DT.DATE for t in types) and any(t == DT.DURATION for t in types):
        return DT.DATE  # Polars: Date + Duration stays Date
    if all(t == DT.DURATION for t in types):
        return DT.DURATION
    if any(DT.is_float(t) for t in types):
        return DT.F64
    if all(DT.is_int(t) for t in types):
        # U64 is contagious: in uint64_decimal mode its physical carrier is
        # decimal, and the strict-cast guard logic must see that (U64 sits
        # above I64 in the widening order, cast.py).
        return DT.U64 if any(t == DT.U64 for t in types) else DT.I64
    return DT.UNKNOWN


class Add(Node):
    """n-ary left-fold ``+`` — numeric add, string concat, datetime+duration
    shift (arithmetic.py:261-305).

    Type-dispatched: if any operand is a string, lowers to ``F.concat`` (which
    null-propagates exactly like ``pl.format``/Polars str ``+``); Spark's own
    ``+`` on strings coerces to double and must not be used (SURVEY §4.3 #1).
    """

    KEY = "add"
    SYM = "+"
    MIN_ARGS = 1

    def fold(self) -> Any:
        vals = [a.fold() for a in self.args]
        return reduce(operator.add, vals)

    def out_type(self, ctx: LoweringContext) -> str:
        return _add_result_type([a.out_type(ctx) for a in self.args])

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        types = [a.out_type(ctx) for a in self.args]
        cols = [a.to_column(ctx) for a in self.args]
        if any(t == DT.STR for t in types):
            return F.concat(*cols)
        if any(t == DT.DATE for t in types) and any(t == DT.DURATION for t in types):
            # Date + Duration stays a Date in Polars; Spark's date + interval
            # promotes to timestamp, so shift through a timestamp and truncate.
            cols = [
                F.to_timestamp(c) if t == DT.DATE else c for c, t in zip(cols, types)
            ]
            return reduce(operator.add, cols).cast("date")
        return reduce(operator.add, cols)


class Subtract(Node):
    """Binary difference; datetime−datetime yields a Duration (interval) just
    as in Polars (arithmetic.py:308-319; Spark 3.3+ timestamp subtraction
    returns DayTimeIntervalType)."""

    KEY = "subtract"
    SYM = "-"
    N_ARGS = 2

    def fold(self) -> Any:
        return self.args[0].fold() - self.args[1].fold()

    def out_type(self, ctx: LoweringContext) -> str:
        lt, rt = (a.out_type(ctx) for a in self.args)
        if lt in (DT.DATETIME, DT.DATE) and rt in (DT.DATETIME, DT.DATE):
            return DT.DURATION
        if lt == DT.DATE and rt == DT.DURATION:
            return DT.DATE
        if lt == DT.DATETIME or rt == DT.DATETIME:
            return DT.DATETIME
        if DT.is_float(lt) or DT.is_float(rt):
            return DT.F64
        if DT.is_int(lt) and DT.is_int(rt):
            return DT.U64 if DT.U64 in (lt, rt) else DT.I64  # U64 contagious
        if lt == DT.DURATION and rt == DT.DURATION:
            return DT.DURATION
        return DT.UNKNOWN

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        lt, rt = (a.out_type(ctx) for a in self.args)
        lc, rc = (a.to_column(ctx) for a in self.args)
        if lt in (DT.DATETIME, DT.DATE) and rt in (DT.DATETIME, DT.DATE):
            # date − date in Spark is datediff (int days); go through
            # timestamps so the result is an interval like Polars' Duration.
            if lt == DT.DATE:
                lc = F.to_timestamp(lc)
            if rt == DT.DATE:
                rc = F.to_timestamp(rc)
        elif lt == DT.DATE and rt == DT.DURATION:
            return (F.to_timestamp(lc) - rc).cast("date")  # Date − Duration stays Date
        return lc - rc


class Multiply(Node):
    """n-ary left-fold ``*`` (arithmetic.py:322-339)."""

    KEY = "multiply"
    SYM = "*"
    MIN_ARGS = 1

    def fold(self) -> Any:
        return reduce(operator.mul, [a.fold() for a in self.args])

    def out_type(self, ctx: LoweringContext) -> str:
        types = [a.out_type(ctx) for a in self.args]
        if any(DT.is_float(t) for t in types):
            return DT.F64
        if all(DT.is_int(t) for t in types):
            return DT.U64 if any(t == DT.U64 for t in types) else DT.I64
        return DT.UNKNOWN

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        return reduce(operator.mul, (a.to_column(ctx) for a in self.args))


class Divide(Node):
    """True division; int/int → float, matching Spark's ``/`` → Double
    (arithmetic.py:342-353; freebie per SURVEY §4.3 #14)."""

    KEY = "divide"
    SYM = "/"
    N_ARGS = 2

    def fold(self) -> Any:
        return self.args[0].fold() / self.args[1].fold()

    def out_type(self, ctx: LoweringContext) -> str:
        return DT.F64

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        return self.args[0].to_column(ctx) / self.args[1].to_column(ctx)


class Power(Node):
    """Exponentiation ``base ** exponent`` (arithmetic.py:356-431).

    ``F.pow`` always returns Double; Polars keeps int for int**int, so both
    operands integral → cast back to long (SURVEY §4.3 #8).
    """

    KEY = "power"
    SYM = "**"
    N_ARGS = 2

    def fold(self) -> Any:
        return self.args[0].fold() ** self.args[1].fold()

    def out_type(self, ctx: LoweringContext) -> str:
        lt, rt = (a.out_type(ctx) for a in self.args)
        if DT.is_int(lt) and DT.is_int(rt):
            return DT.I64
        return DT.F64

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        lt, rt = (a.out_type(ctx) for a in self.args)
        out = F.pow(self.args[0].to_column(ctx), self.args[1].to_column(ctx))
        if DT.is_int(lt) and DT.is_int(rt):
            return out.cast("bigint")
        return out


class Mean(Node):
    """Horizontal mean, ignoring nulls (arithmetic.py:434-444).

    No Spark builtin: Σcoalesce(c,0) / Σ isNotNull, null when every input is
    null — identical to ``pl.mean_horizontal``.
    """

    KEY = "mean"
    MIN_ARGS = 1

    def out_type(self, ctx: LoweringContext) -> str:
        return DT.F64

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        cols = [a.to_column(ctx) for a in self.args]
        num = reduce(operator.add, [F.coalesce(c.cast("double"), F.lit(0.0)) for c in cols])
        den = reduce(operator.add, [c.isNotNull().cast("int") for c in cols])
        return F.when(den > 0, num / den)


class Min(Node):
    """Horizontal min, ignoring nulls → ``F.least`` (arithmetic.py:447-457)."""

    KEY = "min"
    MIN_ARGS = 1

    def out_type(self, ctx: LoweringContext) -> str:
        types = [a.out_type(ctx) for a in self.args]
        return types[0] if len(set(types)) == 1 else DT.UNKNOWN

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        cols = [a.to_column(ctx) for a in self.args]
        return cols[0] if len(cols) == 1 else F.least(*cols)


class Max(Node):
    """Horizontal max, ignoring nulls → ``F.greatest`` (arithmetic.py:460-470)."""

    KEY = "max"
    MIN_ARGS = 1

    def out_type(self, ctx: LoweringContext) -> str:
        types = [a.out_type(ctx) for a in self.args]
        return types[0] if len(set(types)) == 1 else DT.UNKNOWN

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        cols = [a.to_column(ctx) for a in self.args]
        return cols[0] if len(cols) == 1 else F.greatest(*cols)


class Coalesce(Node):
    """First non-null argument; sugar ``a ?? b`` (arithmetic.py:473-515)."""

    KEY = "coalesce"
    MIN_ARGS = 1

    def fold(self) -> Any:
        for a in self.args:
            v = a.fold()
            if v is not None:
                return v
        return None

    def out_type(self, ctx: LoweringContext) -> str:
        types = [a.out_type(ctx) for a in self.args if a.out_type(ctx) != DT.NULL]
        return types[0] if types and len(set(types)) == 1 else DT.UNKNOWN

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        return F.coalesce(*(a.to_column(ctx) for a in self.args))
