"""dftly AST → DuckDB SQL emitter (the portable subset).

The oracle story inverted: every contract query hand-writes a DuckDB
mirror; this module GENERATES the mirror from the same AST the Spark
lowering consumes, so any expression in the portable subset gets an
external-engine cross-check for free.  The fuzz suites
(``tests/test_fuzz_oracle.py`` / ``test_sqlgen.py``) validate the emitter
the same way the engine itself is validated: value-for-value against
DuckDB on real rows.

Representation conventions (shared with every hand-written oracle):

* **durations** are MICROSECOND BIGINTS — exact integer arithmetic that
  any engine replays bit-for-bit; ``timestamp ± duration`` wraps through
  ``to_microseconds``; ``total_*`` accessors are truncate-toward-zero
  integer division (the engine's Polars-parity semantics — plain ``//``
  floors and is WRONG for negative durations).
* **time** values are micros-since-midnight BIGINTS, mirroring the
  engine's tagged-long representation.
* double→integer casts TRUNCATE (``CAST(TRUNC(x) AS ...)``) — SQL CAST
  rounds, Polars/Spark truncate.

``strptime`` emits directly — DuckDB's strptime speaks the same chrono
%-dialect the reference does, no translation needed (the Spark lowering
is where the chrono→Java work lives); the exact-``%s`` epoch format
emits ``make_timestamp(seconds * 1e6)``, mirroring the engine's
``timestamp_seconds`` special path.  ``split`` emits ``string_split``
(trailing empties kept on both engines; a NULL expression separator is
guarded to NULL because DuckDB would return the unsplit string) — list
results compare value-for-value in Python, and for hash-based harnesses
that cannot digest list cells (the driver's pandas canonicalizer),
``canonical_lists=True`` / :func:`canonicalize_list_columns` project
them to ``chr(31)``-joined strings on BOTH engines, the q20 convention.
Unsupported nodes (``hash``/``signed_hash`` — engine-specific values by
design; empty-separator splits — engines disagree; double-typed
interpolation fields — float formatting is not portable) raise
:class:`SqlGenError` loudly rather than emitting something subtly wrong.

Scope: the emitter mirrors the engine's DEFAULT lowering.  The opt-in
strict-unsigned mode (``uint64_decimal=True``) changes uint64 cast
semantics (out-of-range nulls/raises) and is oracle-checked by its own
hand-written gate query (x145) rather than through this emitter — passing
``uint64_decimal=True`` to the entry points raises :class:`SqlGenError`
naming the mode instead of silently emitting a default-mode mirror; the
``U64 → HUGEINT`` row below corresponds to the default signed-bigint
carrier.
"""

from __future__ import annotations

from typing import Any

from . import dtypes as DT
from .nodes import LoweringContext, Node, NotConst
from .parser import Parser

__all__ = [
    "SqlGenError",
    "to_duckdb_sql",
    "spec_to_duckdb_sql",
    "canonicalize_list_columns",
    "LIST_SEP",
]

#: list-cell join separator for hash-based comparisons (q20 convention):
#: \x1f cannot appear in the data, so element fidelity is preserved.
LIST_SEP = "\x1f"

_US = {
    "total_nanoseconds": None,  # micros * 1000, handled specially
    "total_microseconds": 1,
    "total_milliseconds": 1_000,
    "total_seconds": 1_000_000,
    "total_minutes": 60_000_000,
    "total_hours": 3_600_000_000,
    "total_days": 86_400_000_000,
}

_ACCESSOR_SQL = {
    "dt_year": "year({x})",
    "dt_month_of_year": "month({x})",
    "dt_day_of_month": "day({x})",
    "dt_day_of_week": "isodow({x})",  # both 1=Monday
    "dt_day_of_year": "dayofyear({x})",
    "dt_hour_of_day": "hour({x})",
    "dt_minute_of_hour": "minute({x})",
    "dt_second_of_minute": "CAST(floor(second({x})) AS INTEGER)",
    "dt_week_of_year": "weekofyear({x})",  # ISO weeks on both engines
    "dt_quarter_of_year": "quarter({x})",
}

#: micros-per-parent-unit for accessors applied to tagged TIME values
_TIME_ACC = {
    "dt_hour_of_day": (3_600_000_000, 24),
    "dt_minute_of_hour": (60_000_000, 60),
    "dt_second_of_minute": (1_000_000, 60),
}

_DUCK_TYPE = {
    DT.BOOL: "BOOLEAN",
    DT.I8: "TINYINT",
    DT.I16: "SMALLINT",
    DT.I32: "INTEGER",
    DT.I64: "BIGINT",
    DT.I128: "HUGEINT",
    DT.U8: "SMALLINT",
    DT.U16: "INTEGER",
    DT.U32: "BIGINT",
    DT.U64: "HUGEINT",
    DT.F32: "FLOAT",
    DT.F64: "DOUBLE",
    DT.STR: "VARCHAR",
    DT.DATE: "DATE",
    DT.DATETIME: "TIMESTAMP",
}


class SqlGenError(NotImplementedError):
    """Raised for AST shapes outside the portable-SQL subset."""


def _trunc_div(x: str, u: int) -> str:
    if u == 1:
        return f"({x})"
    return f"(CASE WHEN ({x}) >= 0 THEN ({x}) // {u} ELSE -((-({x})) // {u}) END)"


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _is_dt(tag: str) -> bool:
    return tag == DT.DATETIME or tag == DT.DATE


def to_duckdb_sql(
    expr: Any,
    schema: dict[str, str] | Any | None = None,
    *,
    canonical_lists: bool = False,
    uint64_decimal: bool = False,
) -> str:
    """DuckDB SQL for one dftly expression (string/dict/Node form).

    ``schema`` drives the same dtype dispatch the Spark lowering uses
    (string concat vs numeric add, duration vs timestamp subtract);
    pass the DataFrame or a ``{column: dtype-tag}`` dict.
    ``canonical_lists=True`` projects a list-typed result to a
    ``chr(31)``-joined string (pair with :func:`canonicalize_list_columns`
    on the Spark frame).

    ``uint64_decimal`` exists only to be REJECTED loudly: the emitter
    mirrors the engine's DEFAULT lowering, and the opt-in strict-unsigned
    mode changes uint64 cast semantics (DECIMAL(20,0) carrier, out-of-range
    nulls/raises) that no generated mirror replays — a caller lowering
    Spark columns with ``uint64_decimal=True`` must not silently get a
    default-mode oracle that disagrees on every out-of-range row.  Use a
    hand-written oracle for that mode (the x145 gate is the template).
    """
    if uint64_decimal:
        raise SqlGenError(
            "sqlgen mirrors the engine's DEFAULT lowering only; the opt-in "
            "uint64_decimal mode changes uint64 cast semantics (out-of-range "
            "nulls/raises, DECIMAL(20,0) carrier) — write the oracle for "
            "that mode by hand"
        )
    ctx = _ctx(schema)
    node = expr if isinstance(expr, Node) else Parser()(expr)
    sql = _emit(node, ctx)
    if canonical_lists and node.out_type(ctx) == DT.LIST_STR:
        # NULL list stays NULL (array_to_string propagates); the Spark
        # companion null-guards concat_ws to match.
        return f"array_to_string({sql}, chr(31))"
    return sql


def spec_to_duckdb_sql(
    spec: Any,
    schema: dict[str, str] | Any | None = None,
    *,
    canonical_lists: bool = False,
    uint64_decimal: bool = False,
) -> dict[str, str]:
    """DuckDB SQL for every column of a dftly spec (``{name: expr}``)."""
    return {
        name: to_duckdb_sql(
            e,
            schema,
            canonical_lists=canonical_lists,
            uint64_decimal=uint64_decimal,
        )
        for name, e in dict(spec).items()
    }


def canonicalize_list_columns(df):
    """Project every ``array<string>`` column of a Spark frame to a
    ``chr(31)``-joined string — the Spark companion of
    ``canonical_lists=True`` (NULL array → NULL, matching
    ``array_to_string``; ``concat_ws`` alone would yield ``''``)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, ArrayType) and isinstance(
            f.dataType.elementType, StringType
        ):
            c = F.col(f.name)
            cols.append(
                F.when(c.isNotNull(), F.concat_ws(LIST_SEP, c)).alias(f.name)
            )
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def _ctx(schema) -> LoweringContext:
    if schema is None:
        return LoweringContext()
    if isinstance(schema, dict):
        # accept either internal tags ("f64") or public dtype names
        # ("float64"), matching the cast-target vocabulary
        return LoweringContext(
            {k: DT.NAMED_TYPES.get(v, v) for k, v in schema.items()}
        )
    # DataFrame or StructType
    st = getattr(schema, "schema", schema)
    return LoweringContext.from_spark_schema(st)


def _emit(n: Node, ctx: LoweringContext) -> str:
    key = n.KEY
    fn = _EMITTERS.get(key)
    if fn is None:
        raise SqlGenError(
            f"node {key!r} is outside the portable-SQL subset "
            "(see dftly_spark/sqlgen.py docstring)"
        )
    return fn(n, ctx)


# -- terminals ---------------------------------------------------------------


def _emit_literal(n: Node, ctx: LoweringContext) -> str:
    import datetime as _dt

    v = n.args[0]
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return f"CAST({v} AS BIGINT)"
    if isinstance(v, float):
        return f"CAST({v!r} AS DOUBLE)"
    if isinstance(v, str):
        return _q(v)
    if isinstance(v, _dt.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, _dt.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, _dt.time):
        us = ((v.hour * 60 + v.minute) * 60 + v.second) * 1_000_000 + v.microsecond
        return f"CAST({us} AS BIGINT)"
    raise SqlGenError(f"unsupported literal type {type(v).__name__}")


def _emit_column(n: Node, ctx: LoweringContext) -> str:
    name = n.args[0]
    return '"' + name.replace('"', '""') + '"'


# -- boolean / arithmetic ----------------------------------------------------


def _nary(op: str):
    def emit(n: Node, ctx: LoweringContext) -> str:
        return "(" + f" {op} ".join(_emit(a, ctx) for a in n.args) + ")"

    return emit


def _emit_not(n, ctx):
    return f"(NOT {_emit(n.args[0], ctx)})"


def _emit_negate(n, ctx):
    return f"(- {_emit(n.args[0], ctx)})"


def _emit_add(n, ctx):
    tags = [a.out_type(ctx) for a in n.args]
    if any(t == DT.STR for t in tags):
        return "(" + " || ".join(_emit(a, ctx) for a in n.args) + ")"
    if any(_is_dt(t) for t in tags):
        # datetime + duration(s): shift through to_microseconds
        if len(n.args) != 2:
            raise SqlGenError("datetime add supports exactly two operands")
        a, b = n.args
        if _is_dt(a.out_type(ctx)):
            dt_s, dur_s = _emit(a, ctx), _emit(b, ctx)
        else:
            dt_s, dur_s = _emit(b, ctx), _emit(a, ctx)
        return f"({dt_s} + to_microseconds(CAST({dur_s} AS BIGINT)))"
    return "(" + " + ".join(_emit(a, ctx) for a in n.args) + ")"


def _emit_subtract(n, ctx):
    a, b = n.args
    ta, tb = a.out_type(ctx), b.out_type(ctx)
    if _is_dt(ta) and _is_dt(tb):
        return f"date_diff('microsecond', {_emit(b, ctx)}, {_emit(a, ctx)})"
    if _is_dt(ta) and tb == DT.DURATION:
        return f"({_emit(a, ctx)} - to_microseconds(CAST({_emit(b, ctx)} AS BIGINT)))"
    return f"({_emit(a, ctx)} - {_emit(b, ctx)})"


def _emit_power(n, ctx):
    a, b = n.args
    s = f"POWER({_emit(a, ctx)}, {_emit(b, ctx)})"
    # engine recasts int ** int back to long (q02 convention); exact for
    # results inside the double mantissa
    if DT.is_int(a.out_type(ctx)) and DT.is_int(b.out_type(ctx)):
        return f"CAST({s} AS BIGINT)"
    return s


def _emit_mean(n, ctx):
    parts = [_emit(a, ctx) for a in n.args]
    total = " + ".join(f"coalesce(CAST({p} AS DOUBLE), 0)" for p in parts)
    cnt = " + ".join(f"CAST(({p}) IS NOT NULL AS INTEGER)" for p in parts)
    return f"(({total}) / nullif({cnt}, 0))"


def _minmax(fn: str):
    def emit(n, ctx):
        return f"{fn}(" + ", ".join(_emit(a, ctx) for a in n.args) + ")"

    return emit


def _cmp(op: str):
    def emit(n, ctx):
        return f"({_emit(n.args[0], ctx)} {op} {_emit(n.args[1], ctx)})"

    return emit


def _emit_conditional(n, ctx):
    when = _emit(n.kwargs["when"], ctx)
    then = _emit(n.kwargs["then"], ctx)
    if "otherwise" in n.kwargs:
        other = _emit(n.kwargs["otherwise"], ctx)
        return f"(CASE WHEN {when} THEN {then} ELSE {other} END)"
    return f"(CASE WHEN {when} THEN {then} END)"


# -- strings -----------------------------------------------------------------


def _emit_len_chars(n, ctx):
    return f"length({_emit(n.args[0], ctx)})"


def _emit_substring(n, ctx):
    src = _emit(n.kwargs["source"], ctx)
    start = _emit(n.kwargs["start"], ctx)
    ln = f"length({src})"

    def norm(idx_sql: str) -> str:
        shifted = f"(CASE WHEN ({idx_sql}) < 0 THEN ({idx_sql}) + {ln} ELSE ({idx_sql}) END)"
        return f"GREATEST(LEAST({shifted}, {ln}), 0)"

    lo = norm(start)
    hi = norm(_emit(n.kwargs["stop"], ctx)) if "stop" in n.kwargs else ln
    return f"substr({src}, {lo} + 1, GREATEST({hi} - ({lo}), 0))"


def _stringify(a: Node, ctx: LoweringContext) -> str:
    t = a.out_type(ctx)
    s = _emit(a, ctx)
    if t == DT.STR:
        return s
    if t in (DT.F32, DT.F64) or t == DT.TIME:
        raise SqlGenError(
            f"interpolation of {t} fields is not portable (float/time "
            "formatting differs across engines)"
        )
    return f"CAST({s} AS VARCHAR)"


def _emit_interpolate(n, ctx):
    pattern = n.pattern
    fields = list(n.args[1:])
    segments = pattern.split("{}")
    parts: list[str] = []
    for i, seg in enumerate(segments):
        if seg:
            parts.append(_q(seg))
        if i < len(fields):
            parts.append(_stringify(fields[i], ctx))
    if not parts:
        return "''"
    return "(" + " || ".join(parts) + ")"


def _pattern_sql(p: Node, ctx: LoweringContext) -> str:
    # literal patterns embed directly; expression patterns emit as string
    # expressions (DuckDB's regexp functions accept either)
    return _emit(p, ctx)


def _emit_regex_match(n, ctx):
    src = _emit(n.kwargs["source"], ctx)
    pat = _pattern_sql(n.kwargs["pattern"], ctx)
    return f"regexp_matches({src}, {pat})"


def _emit_regex_extract(n, ctx):
    src = _emit(n.kwargs["source"], ctx)
    pat = _pattern_sql(n.kwargs["pattern"], ctx)
    gi = 0
    if "group_index" in n.kwargs:
        gi_node = n.kwargs["group_index"]
        if gi_node.KEY != "literal":
            raise SqlGenError("regex_extract group_index must be a literal")
        gi = int(gi_node.args[0])
    return (
        f"(CASE WHEN regexp_matches({src}, {pat}) "
        f"THEN regexp_extract({src}, {pat}, {gi}) END)"
    )


# -- casts -------------------------------------------------------------------


def _emit_cast(n, ctx):
    t = n.target
    src_node = n.kwargs["source"]
    src_tag = src_node.out_type(ctx)
    s = _emit(src_node, ctx)

    if t in DT.DURATION_UNIT_SECONDS:
        us = DT.DURATION_UNIT_SECONDS[t] * 1_000_000
        if us == int(us):
            return f"(CAST({s} AS BIGINT) * {int(us)})"
        return f"CAST(CAST({s} AS DOUBLE) * {us!r} AS BIGINT)"
    if t in DT.DATE_UNITS:  # "year"
        return f"make_date(CAST({s} AS INTEGER), 1, 1)"

    tag = DT.NAMED_TYPES[t]
    cast_kw = "CAST" if n.strict else "TRY_CAST"
    if tag == DT.DATETIME and DT.is_int(src_tag):
        return f"make_timestamp(CAST({s} AS BIGINT))"  # µs since epoch
    if tag == DT.DATE and DT.is_int(src_tag):
        return f"(DATE '1970-01-01' + CAST({s} AS INTEGER))"
    if tag == DT.TIME or src_tag == DT.TIME:
        raise SqlGenError("time casts are outside the portable subset")
    if tag == DT.DURATION:
        raise SqlGenError("plain duration casts are outside the portable subset")
    duck = _DUCK_TYPE.get(tag)
    if duck is None:
        raise SqlGenError(f"cast target {t!r} unsupported")
    if DT.is_int(tag) and src_tag in (DT.F32, DT.F64, DT.UNKNOWN):
        return f"{cast_kw}(TRUNC({s}) AS {duck})"  # Polars/Spark truncate
    return f"{cast_kw}({s} AS {duck})"


# -- datetimes ---------------------------------------------------------------


def _emit_accessor(key: str):
    def emit(n, ctx):
        arg = n.args[0]
        s = _emit(arg, ctx)
        if arg.out_type(ctx) == DT.TIME and key in _TIME_ACC:
            unit, per_parent = _TIME_ACC[key]
            return f"(({s}) // {unit} % {per_parent})"
        return _ACCESSOR_SQL[key].format(x=s)

    return emit


def _emit_total(key: str):
    def emit(n, ctx):
        s = _emit(n.args[0], ctx)
        if key == "total_nanoseconds":
            return f"(({s}) * 1000)"
        return _trunc_div(s, _US[key])

    return emit


def _emit_split(n, ctx):
    src = _emit(n.kwargs["source"], ctx)
    by = n.kwargs["by"]
    try:
        sep = by.fold()
    except NotConst:
        sep = None
    if isinstance(sep, str):
        if sep == "":
            raise SqlGenError(
                "split on an empty separator diverges across engines "
                "(Spark keeps a trailing empty element, DuckDB does not)"
            )
        return f"string_split({src}, {_q(sep)})"
    # expression separator: two runtime divergences to guard.  (1) NULL
    # separator: the engine nulls the result (a NULL regex pattern);
    # DuckDB's string_split would return the UNSPLIT string.  (2) EMPTY
    # separator: the engine (split on the empty \\Q\\E regex, limit -1)
    # yields chars PLUS a trailing '' — 'ab' -> [a, b, '']; DuckDB's
    # string_split yields just the chars, so append the trailing '' (with
    # a NULL-source guard: list_append(NULL, '') is [''], not NULL).
    sep_sql = _emit(by, ctx)
    return (
        f"(CASE WHEN ({sep_sql}) IS NULL THEN NULL "
        f"WHEN ({sep_sql}) = '' THEN "
        f"(CASE WHEN ({src}) IS NULL THEN NULL "
        f"ELSE list_append(string_split({src}, ''), '') END) "
        f"ELSE string_split({src}, {sep_sql}) END)"
    )


#: chrono codes DuckDB's strptime lacks (or fixes as ISO where chrono is
#: C-locale) → the component-code expansion both engines parse identically.
_DUCK_CODE = {
    "e": "%-d",
    "k": "%H",  # space pad already stripped by the replayed pad_plan;
    "l": "%I",  # DuckDB's %H/%I accept 1-2 digits
    "x": "%m/%d/%y",
    "X": "%H:%M:%S",
    "r": "%I:%M:%S %p",
    # chrono composites / aliases DuckDB's strptime does not recognize
    "D": "%m/%d/%y",
    "F": "%Y-%m-%d",
    "v": "%-d-%b-%Y",
    "T": "%H:%M:%S",
    "R": "%H:%M",
    "h": "%b",
}


def _emit_strptime(n, ctx):
    fmt = n.format_str
    from . import chrono as _chrono

    if _chrono.has_code(fmt, "s"):
        # the engine's %s special path fires on any format whose CODE SCAN
        # contains %s ('%%s' is a literal, not a hijack) and reads the
        # whole source as epoch seconds; only the exact-'%s' format is
        # honestly portable, so the emitter supports just that.
        if list(_chrono._scan(fmt)) != [("code", "s")]:
            raise SqlGenError(
                "strptime %s is only portable as the exact '%s' format"
            )
        src = _emit(n.kwargs["source"], ctx)
        cast_kw = "CAST" if n.strict else "TRY_CAST"
        # engine: timestamp_seconds(try_cast(src as bigint)) [+ strict
        # raise guard]; DuckDB mirror: micros since epoch via make_timestamp
        return f"make_timestamp({cast_kw}({src} AS BIGINT) * 1000000)"

    # %c expands to its fixed C-locale component codes FIRST (same order as
    # the engine's lowering), with the engine's whitespace normalization
    # replayed on the input below: chrono's %c/%x/%X are C-locale layouts
    # while DuckDB's are ISO layouts, so emitting them verbatim would be
    # subtly wrong.  (A real code scan, not a substring test: '%%c' is a
    # literal.)
    has_c = _chrono.has_code(fmt, "c")
    if has_c:
        fmt, _ = _chrono.rewrite_locale(fmt)
    # DuckDB has no %C; replay the engine's %C..%y → %Y pairing here too.
    # The literal-separated form splices the input with the SAME RE2-safe
    # strip the engine applies ($n group refs become DuckDB's \n).
    cent_strips: list[tuple[str, str]] = []
    cent_plan = _chrono.century_plan(fmt)
    if cent_plan is not None:
        fmt = cent_plan["fmt"]
        cent_strips = cent_plan["strips"]
    fmt_codes = {c for k, c in _chrono._scan(fmt) if k == "code"}
    if "::z" in fmt_codes:
        raise SqlGenError(
            "strptime %::z (offset with seconds) has no DuckDB strptime "
            "equivalent — write the offset arithmetic explicitly"
        )
    # the engine strips the optional space pad of %e/%k/%l/%v before its
    # bare-number Java letters; DuckDB's %-d/%H/%I are bare numbers too, so
    # replay the identical position-anchored strips (computed on the
    # chrono-dialect format, BEFORE the %-d substitution below)
    pad_plan = _chrono.pad_plan(fmt)
    pad_strips = pad_plan["strips"] if pad_plan is not None else []
    if fmt_codes & set(_DUCK_CODE):
        # remaining single-code gaps: DuckDB lacks %e (space-padded day)
        # and %r, and its %x/%X are ISO layouts where chrono's are
        # C-locale — substitute the component codes both engines parse
        # identically (%-d accepts 1-2 digits unpadded; %c's space-pad is
        # gone after the normalization above).
        fmt = "".join(
            (
                _DUCK_CODE.get(item, "%%" if item == "%" else f"%{item}")
                if kind == "code"
                else item
            )
            for kind, item in _chrono._scan(fmt)
        )
    src = _emit(n.kwargs["source"], ctx)
    import re as _re2

    if has_c:
        src = (
            f"regexp_replace(regexp_replace({src}, '^\\s+|\\s+$', '', 'g'), "
            f"'\\s+', ' ', 'g')"
        )
    for rx, repl in cent_strips + pad_strips:
        rx_sql = rx.replace("'", "''")
        repl_sql = _re2.sub(r"\$(\d)", r"\\\1", repl).replace("'", "''")
        src = f"regexp_replace({src}, '{rx_sql}', '{repl_sql}')"
    f = _q(fmt)
    # DuckDB shares chrono's %-code dialect, so the format embeds verbatim;
    # strict -> strptime (errors abort, like the engine's raise_error guard),
    # non-strict -> try_strptime (null on failure)
    base = (
        f"strptime({src}, {f})" if n.strict else f"try_strptime({src}, {f})"
    )
    kind = n.output_type
    if kind == "date":
        return f"CAST({base} AS DATE)"
    if kind == "datetime":
        return f"CAST({base} AS TIMESTAMP)"
    # time -> micros since midnight (the engine's tagged-long convention)
    return (
        f"date_diff('microsecond', date_trunc('day', {base}), {base})"
    )


def _emit_set_time(n, ctx):
    d = _emit(n.args[0], ctx)
    t = _emit(n.args[1], ctx)  # tagged micros
    return (
        f"(CAST(CAST({d} AS DATE) AS TIMESTAMP)"
        f" + to_microseconds(CAST({t} AS BIGINT)))"
    )


_EMITTERS = {
    "literal": _emit_literal,
    "column": _emit_column,
    "not": _emit_not,
    "negate": _emit_negate,
    "and": _nary("AND"),
    "or": _nary("OR"),
    "add": _emit_add,
    "subtract": _emit_subtract,
    "multiply": _nary("*"),
    "divide": _nary("/"),
    "power": _emit_power,
    "mean": _emit_mean,
    "min": _minmax("least"),
    "max": _minmax("greatest"),
    "coalesce": lambda n, ctx: "coalesce("
    + ", ".join(_emit(a, ctx) for a in n.args)
    + ")",
    "greater_than": _cmp(">"),
    "less_than": _cmp("<"),
    "equal": _cmp("="),
    "not_equal": _cmp("!="),
    "greater_than_or_equal": _cmp(">="),
    "less_than_or_equal": _cmp("<="),
    "conditional": _emit_conditional,
    "len_chars": _emit_len_chars,
    "substring": _emit_substring,
    "string_interpolate": _emit_interpolate,
    "regex_match": _emit_regex_match,
    "regex_extract": _emit_regex_extract,
    "cast": _emit_cast,
    "strptime": _emit_strptime,
    "set_time": _emit_set_time,
    "split": _emit_split,
}
for _k in _ACCESSOR_SQL:
    _EMITTERS[_k] = _emit_accessor(_k)
for _k in _US:
    _EMITTERS[f"dt_{_k}"] = _emit_total(_k)


# ---------------------------------------------------------------------------
# Portable aggregate conventions (round 7).
#
# Every contract query that sums money-scale doubles or rounds a float
# aggregate used to hand-copy the same two conventions into BOTH its Spark
# builder and its DuckDB oracle (17 copies by round 6) — every copy a place
# the two engines could agree on the wrong thing, or drift apart.  These
# paired helpers are the ONE definition of each convention; the *_sql form
# emits the DuckDB text, the plain form builds the identical Spark column.
#
# * exact_sum: scale each row to integer units with the one multiply+add
#   every engine performs identically, sum EXACTLY (integer sums are
#   order-independent; double sums of ~1e10 magnitudes wobble ~1e-3 with
#   partition order at sf0.1), rescale once.
# * portable_round: floor-scale rounding — Spark's HALF_UP round() and
#   DuckDB's float-multiply round() differ exactly at the .5*10^-d
#   boundary (~6 rows per 100k on window-fold outputs).
# ---------------------------------------------------------------------------


def exact_sum_sql(expr_sql: str, *, scale: int = 10000) -> str:
    """DuckDB text of the exact integer-scaled sum convention.

    Unguarded-input behavior is LOUD on this side: DuckDB's inner
    ``CAST(floor(...) AS BIGINT)`` raises a conversion error on NaN or a
    per-row magnitude beyond int64, the sum accumulates in HUGEINT, and
    the outer ``CAST(... AS BIGINT)`` raises if the TOTAL leaves int64 —
    nothing silently wraps.  :func:`exact_sum` mirrors that loudness on
    the Spark side (where ``F.floor`` would otherwise return 0 for NaN
    and long sums would wrap), so an unguarded input fails the gate on
    BOTH engines instead of silently diverging.
    """
    return (
        f"CAST(sum(CAST(floor(({expr_sql}) * {scale} + 0.5) AS BIGINT)) "
        f"AS BIGINT) / {scale}.0"
    )


def exact_sum(expr, *, scale: int = 10000):
    """Spark column of the exact integer-scaled sum convention.

    Inputs must be finite with ``|x·scale + 0.5| < 2^63`` and the TOTAL
    must fit int64 — Spark's ``floor`` returns LongType (NaN would
    silently become 0, overflow would wrap) while the DuckDB oracle's
    BIGINT casts raise, so both hazards get LOUD guards here to keep the
    engines agreeing:

    * per row, the guard tests the actual IEEE product (not ``|x| <
      2^63/scale``, which admits a half-ulp sliver where the product
      rounds to exactly 2^63 and the long cast would clamp);
    * the accumulation runs in ``decimal(38,0)`` (long partial sums could
      wrap silently long before the check) and the final total re-checks
      the int64 range that DuckDB's ``CAST(... AS BIGINT)`` enforces.
    """
    from pyspark.sql import functions as F

    x = expr.cast("double")
    prod = x * F.lit(scale) + F.lit(0.5)
    # the loud per-row guard lives in a SEPARATE count aggregate, not in
    # the value path — the summed column stays a plain floor with no
    # branch, and the single post-aggregation check raises if any row was
    # non-finite / out of range (same observable behavior, cheaper rows)
    bad = (~x.isNull()) & (F.isnan(x) | (F.abs(prod) >= F.lit(2.0 ** 63)))
    n_bad = F.sum(bad.cast("int"))
    total = F.sum(F.floor(prod).cast("bigint").cast("decimal(38,0)"))
    in_i64 = total.isNull() | (
        (total >= F.lit(-(2 ** 63))) & (total <= F.lit(2 ** 63 - 1))
    )
    safe = F.when(
        (n_bad > 0) | ~in_i64,
        F.raise_error(
            F.lit("exact_sum: non-finite/out-of-range input or sum exceeds int64")
        ).cast("bigint"),
    ).otherwise(total.cast("bigint"))
    return safe / float(scale)


def portable_round_sql(expr_sql: str, d: int = 6) -> str:
    """DuckDB text of the floor-scale rounding convention.

    Plain double-domain ``floor`` — which is already total: NaN → NaN,
    ±inf → ±inf, and magnitudes past 2^53 are integral so the floor (and
    the 10^-d rounding) is the identity.  :func:`portable_round` computes
    the same total function on Spark via the branch-free pmod form, so
    both engines agree on every input class with no CASE on either side.
    """
    p = 10 ** d
    return f"floor(({expr_sql}) * {p} + 0.5) / {p}"


def portable_round(expr, d: int = 6):
    """Spark column of the floor-scale rounding convention.

    Spark's ``F.floor`` returns LongType — NaN would silently become 0
    and magnitudes past int64 would wrap, diverging from the oracle's
    double ``floor``.  Instead the floor is computed IN the double
    domain, branch-free::

        w = x*10^d + 0.5;  floor(w) = w - nanvl(pmod(w, 1), 0)

    * finite ``w``: ``pmod`` (IEEE fmod, exact) gives the fractional
      part, non-negative, so the subtraction IS floor — bit-exact;
    * ``|w| >= 2^53``: ``pmod`` is 0, result ``w`` — DuckDB's
      ``floor`` is the identity there too;
    * NaN propagates through the subtraction;
    * ±inf: ``pmod(inf, 1)`` is NaN, ``nanvl`` maps it to 0, result
      ``±inf`` — matching ``floor(±inf)``.

    One arithmetic expression, two references to the input — no CASE
    branch (a guarded form would quadruple the input subtree).  Callers
    with EXPENSIVE inputs — window expressions, interpreted array-HOF
    folds (centroid cosine), any non-attribute subtree that costs more
    than an add — must pass an ATTRIBUTE (``.select(expr.alias(...))``
    first): Catalyst neither dedups repeated window expressions
    (rolling_zscore ran its frames 4×) nor collapses the doubled subtree
    back to one evaluation, so an inline expensive input evaluates twice
    per row (centroid_outliers' dim-length fold, fixed in round 10).
    """
    from pyspark.sql import functions as F

    p = float(10 ** d)
    w = expr.cast("double") * p + F.lit(0.5)
    fl = w - F.nanvl(F.pmod(w, F.lit(1.0)), F.lit(0.0))
    return fl / p


def agg_oracle_sql(
    from_sql: str,
    select,
    schema=None,
    *,
    where: str | None = None,
    group_by: tuple[str, ...] | list[str] = (),
    having: str | None = None,
    order_by: str | None = None,
    limit: int | None = None,
) -> str:
    """Assemble a DuckDB oracle for the keyed-aggregate shape.

    The relational skeleton (``from_sql`` — a table name or literal join
    text — plus GROUP BY/ORDER BY/LIMIT) stays declarative data; every
    SCALAR comes out of :func:`to_duckdb_sql`, i.e. the same AST the Spark
    lowering consumes, so the expression layer — where the cast/rounding/
    null-semantics bugs live — is machine-generated instead of
    hand-mirrored.  ``select`` maps output name → one of::

        ("expr",  dftly_expr)           plain scalar (group key or constant)
        ("sum" | "min" | "max" | "avg", dftly_expr)
        ("count", None | dftly_expr)    count(*) / count(expr)
        ("count_distinct", dftly_expr)
        ("exact_sum", dftly_expr)       the integer-scaled money convention
        ("round6_avg", dftly_expr)      avg under portable 1e-6 rounding
        ("raw", sql_text)               escape hatch, used sparingly

    Integer ``sum``/``count`` results are cast to BIGINT so pandas-side
    dtypes match Spark's long (DuckDB widens integer sums to HUGEINT).
    ``where`` is a dftly expression compiled through :func:`to_duckdb_sql`
    like every ``select`` scalar.  ``having`` is RAW DuckDB SQL text,
    interpolated verbatim — it must reference the output aliases emitted
    by ``select`` (e.g. ``"rev > 3"``), which the dftly compiler cannot
    resolve because they are not input-schema columns.
    """
    ctx = _ctx(schema)
    parts = []
    for name, item in dict(select).items():
        kind, arg = item[0], item[1]
        if kind == "raw":
            sql = arg
        elif kind == "expr":
            sql = to_duckdb_sql(arg, schema)
        elif kind == "exact_sum":
            sql = exact_sum_sql(to_duckdb_sql(arg, schema))
        elif kind == "round6_avg":
            sql = portable_round_sql(f"avg({to_duckdb_sql(arg, schema)})")
        elif kind == "count":
            inner = "*" if arg is None else to_duckdb_sql(arg, schema)
            sql = f"CAST(count({inner}) AS BIGINT)"
        elif kind == "count_distinct":
            sql = f"CAST(count(DISTINCT {to_duckdb_sql(arg, schema)}) AS BIGINT)"
        elif kind in ("sum", "min", "max", "avg"):
            node = arg if isinstance(arg, Node) else Parser()(arg)
            sql = f"{kind}({_emit(node, ctx)})"
            if kind == "sum":
                try:
                    tag = node.out_type(ctx)
                except Exception:
                    tag = None
                if tag in (DT.I8, DT.I16, DT.I32, DT.I64):
                    sql = f"CAST({sql} AS BIGINT)"  # DuckDB widens to HUGEINT
        else:
            raise SqlGenError(f"unknown agg kind {kind!r} for {name!r}")
        parts.append(f"{sql} AS {name}")
    out = f"SELECT {', '.join(parts)}\nFROM {from_sql}"
    if where is not None:
        out += f"\nWHERE {to_duckdb_sql(where, schema)}"
    if group_by:
        out += f"\nGROUP BY {', '.join(group_by)}"
    if having is not None:
        out += f"\nHAVING {having}"
    if order_by is not None:
        out += f"\nORDER BY {order_by}"
    if limit is not None:
        out += f"\nLIMIT {limit}"
    return out


def exact_quant_sql(expr_sql: str, *, scale: int = 10000) -> str:
    """DuckDB text of the row-level integer quantization convention
    (floor-scale to 1/scale units — the input form of :func:`exact_sum`,
    used standalone when the integer rides through windows/joins)."""
    return f"CAST(floor(({expr_sql}) * {scale} + 0.5) AS BIGINT)"


def exact_quant(expr, *, scale: int = 10000):
    """Spark column of the row-level integer quantization convention."""
    from pyspark.sql import functions as F

    return F.floor(expr * F.lit(scale) + F.lit(0.5)).cast("bigint")
