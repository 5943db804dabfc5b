"""String operator nodes.

Reference: /root/reference/src/dftly/nodes/str.py.

Spark lowering notes (SURVEY.md §2 #24-30, §4.3):

* ``string_interpolate`` → ``F.concat`` of literal segments and stringified
  fields.  ``concat`` null-propagates exactly like ``pl.format``; neither
  ``concat_ws`` (null-skipping) nor ``format_string`` (renders "null") do.
* ``regex_extract`` → ``regexp_extract`` wrapped in an ``rlike`` guard:
  Spark returns ``''`` on no-match where Polars returns null (§4.3 #3).
* ``strptime`` → ``to_date``/``to_timestamp`` with a chrono→Java pattern
  translation (:mod:`dftly_spark.chrono`); time-only formats produce the
  tagged micros-since-midnight long (§4.3 #6).
* ``substring`` replicates Python slice normalization (negative indices,
  clipping) with ``F.length`` + ``greatest``/``least`` (§4.3 #11; formula
  ported from str.py:947-971).
* ``split`` separators are literals, but Spark's split pattern is a regex —
  constant separators are ``re.escape``d; expression separators are wrapped in
  ``\\Q...\\E`` (§4.3 #12).
"""

from __future__ import annotations

import re
import warnings
from typing import Any

from pyspark.sql import Column as SparkColumn
from pyspark.sql import functions as F

from .. import chrono
from .. import dtypes as DT
from .base import Literal, LoweringContext, Node, NotConst


def stringify(node: Node, ctx: LoweringContext) -> SparkColumn:
    """Render a node as a string column the way Polars' formatter would."""
    col = node.to_column(ctx)
    t = node.out_type(ctx)
    if t == DT.STR:
        return col
    if t == DT.TIME:
        return F.date_format(F.timestamp_micros(col), "HH:mm:ss")
    return col.cast("string")


class StringInterpolate(Node):
    """f-string interpolation: pattern + field expressions (str.py:13-176).

    The pattern must fold to a compile-time string; each ``{}`` placeholder is
    filled by the corresponding field.  Null in any field → null result
    (``F.concat`` semantics, matching ``pl.format``).
    """

    KEY = "string_interpolate"
    MIN_ARGS = 2

    def _validate(self) -> None:
        if len(self.args) <= 1:
            raise ValueError(
                "StringInterpolate requires more than one argument; it takes both the "
                "pattern string (first) and the fields to interpolate into the pattern "
                f"(subsequent). Got {len(self.args)} argument(s): {self.args}."
            )
        super()._validate()
        try:
            pattern = self.args[0].fold()
        except NotConst as e:
            raise ValueError(
                "The pattern argument must be a string, Literal, or Literal-evaluatable "
                "instance. This `NodeBase` instance can't be evaluated to a string literal."
            ) from e
        if not isinstance(pattern, str):
            raise ValueError(
                "The pattern argument must be a string, Literal, or Literal-evaluatable "
                f"instance that evaluates to a string, not a {type(pattern)}."
            )
        self.pattern = pattern

    def out_type(self, ctx: LoweringContext) -> str:
        return DT.STR

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        fields = list(self.args[1:])
        segments = self.pattern.split("{}")
        if len(segments) != len(fields) + 1:
            raise ValueError(
                f"String interpolation pattern {self.pattern!r} has "
                f"{len(segments) - 1} placeholders but {len(fields)} fields."
            )
        parts: list[SparkColumn] = []
        for i, seg in enumerate(segments):
            if seg:
                parts.append(F.lit(seg))
            if i < len(fields):
                parts.append(stringify(fields[i], ctx))
        if not parts:
            parts = [F.lit("")]
        return F.concat(*parts)

    @classmethod
    def from_str_args(cls, items: Any) -> dict[str, Any]:
        from ..strform.interpolation import split_interpolation

        if not isinstance(items, list):
            items = [items]
        if len(items) != 1:
            raise ValueError(
                "StringInterpolate.from_str_args only accepts a single argument, which is "
                f"the pattern string. Got {len(items)} arguments instead: {items}"
            )
        pattern = items[0]
        if isinstance(pattern, dict):
            if not Literal.matches(pattern):
                raise ValueError(
                    "When parsing an interpolation from string form, the pattern must "
                    "resolve to a Literal node."
                )
            pattern = Literal.args_from_value(pattern)[0][0]
        pattern, fields = split_interpolation(pattern)
        # Fields stay raw strings here; the Parser re-enters the grammar on them.
        return {cls.KEY: [{"literal": pattern}] + fields}


def _const_pattern(node: Node) -> str | None:
    try:
        v = node.fold()
    except NotConst:
        return None
    return v if isinstance(v, str) else None


def _rust_to_java(pattern: str) -> str:
    """Bridge the regex dialect gap (reference: Rust regex, str.py:255-258).

    The one Rust spelling with a direct Java equivalent is the Python-style
    named group ``(?P<name>…)`` → Java ``(?<name>…)`` (Rust accepts both,
    Java only the latter).  Remaining divergence is inherent and documented
    (SURVEY §4.3 #4): Java additionally accepts lookarounds/backreferences
    (the reference's Rust engine rejects them), and exotic Unicode class
    names differ.  Pinned in tests/test_lowering.py.
    """
    return pattern.replace("(?P<", "(?<")


def _rust_to_java_col(pat_col: SparkColumn) -> SparkColumn:
    return F.regexp_replace(pat_col, F.lit(r"\(\?P<"), F.lit("(?<"))


#: Java-regex-only constructs the reference's Rust engine REJECTS outright
#: (rust-lang/regex guarantees linear time by excluding them).  Matching is
#: syntactic: each (name, detector) pair fires on the raw pattern text.
_JAVA_ONLY_RE = [
    ("lookahead (?=…)/(?!…)", re.compile(r"\(\?=|\(\?!")),
    ("lookbehind (?<=…)/(?<!…)", re.compile(r"\(\?<=|\(\?<!")),
    ("backreference \\N", re.compile(r"\\[1-9]")),
    ("named backreference \\k<…>", re.compile(r"\\k<")),
    ("atomic group (?>…)", re.compile(r"\(\?>")),
    # brace case must be a NUMERIC quantifier ({2}+, {2,}+, {2,3}+) — a bare
    # \}\+ would false-positive on Unicode classes like \p{L}+
    ("possessive quantifier", re.compile(r"(?:[*+?]|\{\d+(?:,\d*)?\})\+")),
]


def _lint_rust_dialect(pattern: str) -> None:
    """Warn when a pattern uses Java-only regex syntax.

    The reference's Rust engine rejects lookarounds, backreferences, atomic
    groups and possessive quantifiers; Spark's Java engine accepts them — a
    config relying on the reference's rejection silently changes behavior
    here.  Same parse-time-warning contract as the bare-word and
    capture-group warnings; matching is syntactic, so a literal ``\\(?=``
    can rarely false-positive — silence with ``warnings.simplefilter``.
    """
    for name, rx in _JAVA_ONLY_RE:
        if rx.search(pattern):
            warnings.warn(
                f"Regex pattern {pattern!r} uses {name}, which Spark's Java "
                "regex engine accepts but the reference implementation "
                "(Rust regex) rejects.  This expression would FAIL on the "
                "reference — remove the construct for portable configs, or "
                "ignore this warning if Java-only semantics are intended.",
                stacklevel=3,
            )
            return


class RegexExtract(Node):
    """``extract [group N of] /re/ from x`` (str.py:179-433).

    No-match → null (rlike guard — Spark's ``regexp_extract`` returns ``''``).
    ``group_index`` defaults to 0 (whole match); a pattern that writes capture
    groups without naming one warns, exactly as the reference does
    (str.py:360-397).
    """

    KEY = "regex_extract"
    ALLOW_KW = True
    REQUIRED_KW = frozenset({"pattern", "source"})
    OPTIONAL_KW = frozenset({"group_index"})

    def _validate(self) -> None:
        super()._validate()
        if not isinstance(self.group_index, int) or isinstance(self.group_index, bool):
            raise ValueError(
                "The group_index argument must be an integer or a NodeBase instance that "
                f"evaluates to an integer; evaluates to {type(self.group_index)} instead."
            )
        if self.group_index < 0:
            raise ValueError("The group_index argument must be a non-negative integer.")
        self._warn_on_unnamed_capture_groups()
        pattern = _const_pattern(self.kwargs["pattern"])
        if pattern is not None:
            _lint_rust_dialect(pattern)

    def _warn_on_unnamed_capture_groups(self) -> None:
        if "group_index" in self.kwargs:
            return
        pattern = _const_pattern(self.kwargs["pattern"])
        if pattern is None:
            return
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                n_groups = re.compile(pattern).groups
        except Exception:
            return
        if not n_groups:
            return
        warnings.warn(
            f"Regex pattern {pattern!r} has {n_groups} capture "
            f"{'group' if n_groups == 1 else 'groups'} but no group_index, so the whole "
            "match is returned rather than the group. Use "
            f"`extract group 1 of /{pattern}/ from ...` (base form: `group_index: "
            "{literal: 1}`) to select a group; pass `group_index: {literal: 0}` to ask "
            "for the whole match explicitly, or make the group non-capturing -- "
            "`(?:...)` -- to silence this.",
            stacklevel=2,
        )

    @property
    def group_index(self) -> int:
        gi = self.kwargs.get("group_index")
        if gi is None:
            return 0
        try:
            return gi.fold()
        except NotConst as e:
            raise ValueError(
                "The group_index argument must be an integer or a NodeBase instance that "
                "evaluates to an integer."
            ) from e

    def out_type(self, ctx: LoweringContext) -> str:
        return DT.STR

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        src = self.kwargs["source"].to_column(ctx)
        gi = self.group_index
        pat = _const_pattern(self.kwargs["pattern"])
        if pat is not None:
            pat = _rust_to_java(pat)
            matched = src.rlike(pat)
            extracted = F.regexp_extract(src, pat, gi)
        else:
            pat_col = _rust_to_java_col(self.kwargs["pattern"].to_column(ctx))
            matched = F.call_function("rlike", src, pat_col)
            extracted = F.call_function("regexp_extract", src, pat_col, F.lit(gi))
        return F.when(matched, extracted)

    @classmethod
    def from_str_args(cls, items: Any) -> dict[str, Any]:
        if len(items) == 2:
            kwargs = {"pattern": items[0], "source": items[1]}
        else:
            kwargs = {"pattern": items[1], "source": items[2], "group_index": items[0]}
        return {cls.KEY: kwargs}


class RegexMatch(Node):
    """``/re/ in x`` — boolean unanchored contains-match (str.py:436-504).

    ``Column.rlike`` is an unanchored search, matching Polars' ``str.contains``.
    """

    KEY = "regex_match"
    ALLOW_KW = True
    REQUIRED_KW = frozenset({"pattern", "source"})

    def _validate(self) -> None:
        super()._validate()
        pattern = _const_pattern(self.kwargs["pattern"])
        if pattern is not None:
            _lint_rust_dialect(pattern)

    def out_type(self, ctx: LoweringContext) -> str:
        return DT.BOOL

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        src = self.kwargs["source"].to_column(ctx)
        pat = _const_pattern(self.kwargs["pattern"])
        if pat is not None:
            return src.rlike(_rust_to_java(pat))
        return F.call_function(
            "rlike", src, _rust_to_java_col(self.kwargs["pattern"].to_column(ctx))
        )

    @classmethod
    def from_str_args(cls, items: Any) -> dict[str, Any]:
        pattern, source = items
        return {cls.KEY: {"pattern": pattern, "source": source}}


class Strptime(Node):
    """Parse a string into date/time/datetime per a chrono format
    (str.py:507-717).

    Output type is inferred from which ``%`` codes the format contains
    (DATE_PARTS / TIME_PARTS / DATETIME_PARTS — chrono.classify mirrors
    str.py:594-649).  ``strict=False`` nulls unparseable values, which is
    Spark's native ``to_date``/``to_timestamp`` behavior; strict (default)
    adds a raise_error guard.
    """

    KEY = "strptime"
    ALLOW_KW = True
    REQUIRED_KW = frozenset({"format", "source"})
    OPTIONAL_KW = frozenset({"strict"})

    def _validate(self) -> None:
        super()._validate()
        fmt = self.format_str
        if not isinstance(fmt, str):
            raise ValueError(
                "The format argument must be a NodeBase instance that evaluates to a "
                f"string; evaluates to a {type(fmt)} instead."
            )

    @property
    def format_str(self) -> str:
        fmt = self.kwargs["format"]
        if not isinstance(fmt, Node):
            raise ValueError(
                "The format argument must be a NodeBase instance that evaluates to a "
                f"string. Got {type(fmt)} instead."
            )
        try:
            return fmt.fold()
        except NotConst as e:
            raise ValueError(
                "The format argument must be a NodeBase instance that evaluates to a "
                "string. This instance can't be evaluated to a string."
            ) from e

    @property
    def output_type(self) -> str:
        return chrono.classify(self.format_str)

    @property
    def strict(self) -> bool:
        return self.literal_kwarg("strict", bool, default=True)

    def out_type(self, ctx: LoweringContext) -> str:
        return {"date": DT.DATE, "time": DT.TIME, "datetime": DT.DATETIME}[self.output_type]

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        src = self.kwargs["source"].to_column(ctx)
        fmt = self.format_str
        kind = self.output_type

        # %c (fixed C-locale layout — Polars has no unstable-locales) first
        # expands to its component codes so it lowers ANYWHERE in a format;
        # both sides drop to canonical single-space whitespace because %e
        # prints the day space-padded ("Jul  8") and Java's strict 'd'
        # letter will not parse the pad.  Divergences (documented in
        # README): a valid-but-inconsistent weekday name is ignored where
        # chrono rejects it (the %a strip below), and literal whitespace
        # runs elsewhere in a %c-containing format collapse too.
        fmt_orig = fmt
        fmt, has_c = chrono.rewrite_locale(fmt)
        if has_c:
            # regexp end-strip, not F.trim: trim drops ASCII spaces only,
            # so a leading tab would survive as a leading space and break
            # the parse where the \s-based strip (and the DuckDB oracle's
            # replay of it) removes it
            src = F.regexp_replace(
                F.regexp_replace(src, r"^\s+|\s+$", ""), r"\s+", " "
            )
        # %C..%y → %Y pairing (adjacent = pure format rewrite; literal-
        # separated = input splice via century_plan strips), then %a/%A
        # day-name codes anywhere become strip-the-token regexes — the
        # name is redundant for the date.  Both raise loudly for the
        # unsupported residue (%C with no %y pairing at all).
        cent_plan = chrono.century_plan(fmt)
        if cent_plan is not None:
            for rx, repl in cent_plan["strips"]:
                src = F.regexp_replace(src, rx, repl)
            fmt_eff = cent_plan["fmt"]
        else:
            fmt_eff = fmt
        day_plan = chrono.dayname_plan(fmt_eff)
        if day_plan is not None:
            for rx, repl in day_plan["strips"]:
                src = F.regexp_replace(src, rx, repl)
            fmt_eff = day_plan["fmt"]
        # %e/%k/%l/%v space pads: chrono parses an optional leading space,
        # Java's d/H/h letters do not — strip it at the code's position
        pad_plan = chrono.pad_plan(fmt_eff)
        if pad_plan is not None:
            for rx, repl in pad_plan["strips"]:
                src = F.regexp_replace(src, rx, repl)

        week_plan = chrono.week_based_plan(fmt_eff) if kind == "date" else None
        # a real code scan, not a substring test: '%%s' is a literal
        # percent-s, and must parse as text rather than hijack the whole
        # source into the epoch-seconds read
        if chrono.has_code(fmt_eff, "s") and kind == "datetime":
            out = F.timestamp_seconds(src.try_cast("bigint"))
            spark_t = "timestamp"
        elif week_plan is not None:
            out = self._week_based_date(src, week_plan)
            spark_t = "date"
        else:
            java = chrono.to_java(fmt_eff)
            codes = {c for k, c in chrono._scan(fmt_eff) if k == "code"}
            # chrono/POSIX two-digit-year pivot: 69-99 → 19xx, 00-68 → 20xx
            # (%y, and the %D/%x layouts that embed it).  Java's reduced
            # "yy" parses everything into 2000-2099, so post-adjust: a
            # parsed year ≥ 2069 really meant the 1900s.
            needs_pivot = bool(codes & {"y", "D", "x"}) and not (
                codes & {"Y", "G", "F", "v", "+"}
            )

            def _pivot(ts):
                if not needs_pivot:
                    return ts
                return F.when(
                    F.year(ts) >= 2069, ts - F.expr("INTERVAL 100 YEARS")
                ).otherwise(ts)

            if kind == "date":
                out = F.to_date(_pivot(F.try_to_timestamp(src, F.lit(java))))
                spark_t = "date"
            elif kind == "datetime":
                out = _pivot(F.try_to_timestamp(src, F.lit(java)))
                spark_t = "timestamp"
            else:  # time → micros since midnight (tz-invariant: the
                # midnight term cancels the session-timezone offset that
                # unix_micros alone would bake in; mirrors Cast._cast_to_time)
                ts = F.try_to_timestamp(src, F.lit(java))
                out = F.unix_micros(ts) - F.unix_micros(F.to_timestamp(F.to_date(ts)))
                spark_t = "bigint"

        if self.strict:
            err = F.raise_error(
                F.concat(
                    F.lit(f"strptime({fmt_orig!r}) failed for value: "),
                    F.coalesce(src.cast("string"), F.lit("null")),
                )
            ).cast(spark_t)
            return F.when(src.isNotNull() & out.isNull(), err).otherwise(out)
        return out

    @staticmethod
    def _week_based_date(src: SparkColumn, plan: dict) -> SparkColumn:
        """``%U``/``%W``/``%V`` lowering: regex extraction + arithmetic.

        C/Python strptime semantics (``_calc_julian_from_U_or_W``): with
        week-start-based weekday ``dow`` and ``first_wd`` = that basis's
        index of Jan 1,

        * week 0:  ``yday = dow - first_wd`` (0-based; may roll into the
          previous year, e.g. ``"2024 0 0"`` under ``%U`` → 2023-12-31);
        * week ≥1: ``yday = (7 - first_wd) % 7 + 7*(week-1) + dow`` (week 53
          may roll forward).

        ISO-8601 (``%G``/``%V``/``%u``): week 1 contains Jan 4, weeks start
        Monday, so ``date = monday_of_week1(G) + 7*(V-1) + (u-1)`` where
        ``monday_of_week1(G) = jan4 - iso_weekday(jan4) + 1`` — pure
        ``make_date``/``weekday``/``date_add`` JVM expressions, no UDF.

        Pinned against Python's own strptime / ``date.fromisocalendar`` in
        tests/test_chrono.py.
        """
        rx = plan["regex"]
        year = F.regexp_extract(src, rx, plan["year"]).try_cast("int")
        week = F.regexp_extract(src, rx, plan["week"]).try_cast("int")
        wd = F.regexp_extract(src, rx, plan["weekday"]).try_cast("int")
        if plan.get("iso"):
            # %w 0=Sunday maps to ISO 7; %u is already 1=Mon..7=Sun.
            if plan["weekday_code"] == "w":
                iso_wd = F.when(wd == 0, F.lit(7)).otherwise(wd)
                wd_valid = (wd >= 0) & (wd <= 6)
            else:
                iso_wd = wd
                wd_valid = (wd >= 1) & (wd <= 7)
            jan4 = F.make_date(year, F.lit(1), F.lit(4))
            week1_monday = F.date_sub(jan4, F.weekday(jan4))  # weekday: 0=Mon
            date = F.date_add(week1_monday, (week - F.lit(1)) * 7 + iso_wd - F.lit(1))
            ok = (
                year.isNotNull()
                & week.isNotNull()
                & wd.isNotNull()
                & wd_valid
                & (week >= 1)
                & (week <= 53)
            )
            return F.when(ok, date)
        if plan["weekday_code"] == "w":  # 0=Sunday
            sun_idx, mon_idx = wd, (wd + F.lit(6)) % 7
            wd_valid = (wd >= 0) & (wd <= 6)
        else:  # %u: 1=Monday … 7=Sunday
            sun_idx, mon_idx = wd % 7, wd - F.lit(1)
            wd_valid = (wd >= 1) & (wd <= 7)
        jan1 = F.make_date(year, F.lit(1), F.lit(1))
        if plan["sunday_first"]:
            idx, jan1_idx = sun_idx, F.dayofweek(jan1) - F.lit(1)
        else:
            idx, jan1_idx = mon_idx, F.weekday(jan1)
        yday0 = idx - jan1_idx
        ydayn = (F.lit(7) - jan1_idx) % 7 + (week - F.lit(1)) * 7 + idx
        date = F.date_add(jan1, F.when(week == 0, yday0).otherwise(ydayn))
        ok = (
            year.isNotNull()
            & week.isNotNull()
            & wd.isNotNull()
            & wd_valid
            & (week <= 53)
        )
        return F.when(ok, date)

    @classmethod
    def from_str_args(cls, items: Any) -> dict[str, Any]:
        source, fmt = items
        return {cls.KEY: {"format": fmt, "source": source}}


class LenChars(Node):
    """Unicode character count (str.py:720-784) → ``F.length`` (chars)."""

    KEY = "len_chars"
    N_ARGS = 1

    def out_type(self, ctx: LoweringContext) -> str:
        return DT.I32

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        return F.length(self.args[0].to_column(ctx))


class Substring(Node):
    """Python-slice-semantics substring (str.py:787-987).

    ``[start, stop)``, negative indices count from the end, out-of-range
    bounds clip — the normalization formula from str.py:947-971, rebuilt on
    ``F.length`` / ``greatest`` / ``least``, then 1-based ``Column.substr``.
    """

    KEY = "substring"
    ALLOW_KW = True
    REQUIRED_KW = frozenset({"source", "start"})
    OPTIONAL_KW = frozenset({"stop"})

    def out_type(self, ctx: LoweringContext) -> str:
        return DT.STR

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        src = self.kwargs["source"].to_column(ctx)
        start = self.kwargs["start"].to_column(ctx).cast("bigint")
        n = F.length(src).cast("bigint")

        def norm(idx):
            shifted = F.when(idx < 0, idx + n).otherwise(idx)
            return F.greatest(F.least(shifted, n), F.lit(0).cast("bigint"))

        lo = norm(start)
        if "stop" in self.kwargs:
            stop = self.kwargs["stop"].to_column(ctx).cast("bigint")
            hi = norm(stop)
        else:
            hi = n
        length = F.greatest(hi - lo, F.lit(0).cast("bigint"))
        return src.substr(lo.cast("int") + F.lit(1), length.cast("int"))

    @classmethod
    def from_str_args(cls, items: Any) -> dict[str, Any]:
        if len(items) == 2:
            kwargs = {"source": items[0], "start": items[1]}
        elif len(items) == 3:
            kwargs = {"source": items[0], "start": items[1], "stop": items[2]}
        else:
            raise ValueError(
                f"substring expects 2 or 3 positional arguments; got {len(items)}"
            )
        return {cls.KEY: kwargs}


class Split(Node):
    """Split on a *literal* separator → array<string> (str.py:990-1063).

    Spark's split pattern is a regex, so separators — constant and
    expression alike — are quoted with ``\\Q...\\E`` (Pattern.quote
    semantics via :mod:`dftly_spark.javare`, airtight for any separator;
    Python ``re.escape`` was only coincidentally Java-compatible).
    Limit −1 keeps trailing empty strings (matching Polars).
    """

    KEY = "split"
    ALLOW_KW = True
    REQUIRED_KW = frozenset({"source", "by"})

    def out_type(self, ctx: LoweringContext) -> str:
        return DT.LIST_STR

    def to_column(self, ctx: LoweringContext | None = None) -> SparkColumn:
        ctx = ctx or LoweringContext()
        src = self.kwargs["source"].to_column(ctx)
        sep = _const_pattern(self.kwargs["by"])
        if sep is not None:
            from ..javare import java_literal_regex

            return F.split(src, java_literal_regex(sep), -1)
        sep_col = self.kwargs["by"].to_column(ctx)
        # a literal "\E" inside the separator would terminate the \Q...\E
        # quoting early; re-quote it the standard Java way (\E + \\E + \Q)
        safe = F.replace(sep_col, F.lit("\\E"), F.lit("\\E\\\\E\\Q"))
        return F.split(src, F.concat(F.lit("\\Q"), safe, F.lit("\\E")), F.lit(-1))

    @classmethod
    def from_str_args(cls, items: Any) -> dict[str, Any]:
        if not isinstance(items, list) or len(items) != 2:
            n = len(items) if isinstance(items, list) else 1
            raise ValueError(
                f"{cls.KEY} expects exactly 2 positional arguments (source, by); got {n}"
            )
        source, by = items
        return {cls.KEY: {"source": source, "by": by}}
