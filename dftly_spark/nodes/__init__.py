"""Node registry — the 50 expression node types of the reference engine.

Mirrors /root/reference/src/dftly/nodes/__init__.py:60-111 (the complete node
inventory; SURVEY.md §2.1).
"""

from .base import (
    Column,
    Literal,
    LoweringContext,
    Node,
    NotConst,
    Terminal,
)
from .arithmetic import (
    Add,
    And,
    Coalesce,
    Divide,
    Hash,
    Max,
    Mean,
    Min,
    Multiply,
    Negate,
    Not,
    Or,
    Power,
    SignedHash,
    Subtract,
)
from .comparison import (
    Equal,
    GreaterThan,
    GreaterThanOrEqual,
    LessThan,
    LessThanOrEqual,
    NotEqual,
)
from .conditional import Conditional
from .cast import Cast
from .strings import (
    LenChars,
    RegexExtract,
    RegexMatch,
    Split,
    StringInterpolate,
    Strptime,
    Substring,
)
from .datetimes import (
    DtDayOfMonth,
    DtDayOfWeek,
    DtDayOfYear,
    DtHourOfDay,
    DtMinuteOfHour,
    DtMonthOfYear,
    DtQuarterOfYear,
    DtSecondOfMinute,
    DtTotalDays,
    DtTotalHours,
    DtTotalMicroseconds,
    DtTotalMilliseconds,
    DtTotalMinutes,
    DtTotalNanoseconds,
    DtTotalSeconds,
    DtWeekOfYear,
    DtYear,
    SetTime,
    _DtAccessor,
)

ALL_NODES = [
    Literal,
    Column,
    Hash,
    SignedHash,
    Not,
    Negate,
    And,
    Or,
    Mean,
    Min,
    Max,
    Coalesce,
    Add,
    Subtract,
    Multiply,
    Divide,
    Power,
    GreaterThan,
    LessThan,
    Equal,
    NotEqual,
    GreaterThanOrEqual,
    LessThanOrEqual,
    StringInterpolate,
    RegexExtract,
    RegexMatch,
    LenChars,
    Substring,
    Split,
    Conditional,
    Cast,
    Strptime,
    SetTime,
    DtYear,
    DtMonthOfYear,
    DtDayOfMonth,
    DtDayOfWeek,
    DtDayOfYear,
    DtHourOfDay,
    DtMinuteOfHour,
    DtSecondOfMinute,
    DtWeekOfYear,
    DtQuarterOfYear,
    DtTotalSeconds,
    DtTotalMilliseconds,
    DtTotalMicroseconds,
    DtTotalNanoseconds,
    DtTotalMinutes,
    DtTotalHours,
    DtTotalDays,
]

NODES: dict[str, type[Node]] = {}
for _cls in ALL_NODES:
    if _cls.KEY in NODES:
        raise ValueError(f"duplicate node KEY {_cls.KEY!r}")
    NODES[_cls.KEY] = _cls


def _by_sym(classes) -> dict[str, type[Node]]:
    out: dict[str, type[Node]] = {}
    for cls in classes:
        syms = cls.SYM if isinstance(cls.SYM, tuple) else (cls.SYM,)
        for s in syms:
            if s in out:
                raise ValueError(f"duplicate operator symbol {s!r}")
            out[s] = cls
    return out


#: Symbol → node for infix operators (reference nodes/__init__.py:115-125).
BINARY_OPS = _by_sym(
    [
        Add,
        Subtract,
        Multiply,
        Divide,
        Power,
        GreaterThan,
        LessThan,
        Equal,
        NotEqual,
        GreaterThanOrEqual,
        LessThanOrEqual,
        And,
        Or,
        SetTime,
        Cast,
    ]
)

#: Symbol → node for prefix operators (`not`/`!` and unary `-`).
UNARY_OPS = _by_sym([Not, Negate])

#: Accessor cast names reachable through `::name` / `as name`
#: (reference nodes/__init__.py:131-202).
DT_CAST_ACCESSORS: dict[str, type[Node]] = {}
for _cls in ALL_NODES:
    cast_name = getattr(_cls, "CAST_NAME", None)
    if cast_name is not None:
        if cast_name in DT_CAST_ACCESSORS:
            raise ValueError(f"duplicate accessor cast name {cast_name!r}")
        DT_CAST_ACCESSORS[cast_name] = _cls

from .. import dtypes as _dtypes

_collisions = set(DT_CAST_ACCESSORS) & _dtypes.CAST_TARGETS
if _collisions:
    raise ValueError(
        f"accessor cast names collide with registered types/units: {_collisions}"
    )

__all__ = [c.__name__ for c in ALL_NODES] + [
    "ALL_NODES",
    "NODES",
    "BINARY_OPS",
    "UNARY_OPS",
    "DT_CAST_ACCESSORS",
    "Node",
    "Terminal",
    "NotConst",
    "LoweringContext",
]
