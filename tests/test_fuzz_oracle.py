"""Randomized expression-level oracle fuzzing.

The contract queries gate ~100 hand-written expressions; this suite gates
the COMPOSITION SPACE: a seeded generator builds random expression trees
over real lineitem columns, emitting the dftly string form and the
equivalent DuckDB SQL together, then compares engine output value-by-value
on 6k real rows.  Any tree the generator can produce is a tree a user can
write — so semantic drift between the Spark lowering and ANSI SQL
(null propagation, Kleene logic, conditional dispatch, coalescing,
horizontal min/max) surfaces here even if no contract query uses that
exact shape.

Deterministic by construction: fixed seed, fixed depth budget, no
hypothesis shrinking — a failure prints the exact dftly/SQL pair to
reproduce.  The operator pool is the portable-arithmetic subset (IEEE
+,-,* and comparisons are correctly rounded and engine-identical;
division, pow and transcendentals are excluded because their cross-engine
parity is handled — and rounded — at the operator level instead).
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from dftly_spark import Parser

SF_DIR = "/root/testdata/sf0.001"

#: (name, nullable) — the fuzz frame's columns.  `dn` is l_discount with
#: deterministic nulls planted so null semantics actually get exercised.
NUM_COLS = [("q", False), ("p", False), ("d", False), ("t", False), ("dn", True)]


def _frames(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    sdf = li.select(
        F.col("l_quantity").cast("double").alias("q"),
        (F.col("l_extendedprice") / F.lit(1000.0)).alias("p"),
        F.col("l_discount").cast("double").alias("d"),
        F.col("l_tax").cast("double").alias("t"),
        F.when(F.col("l_linenumber") % 3 != 0, F.col("l_discount"))
        .cast("double")
        .alias("dn"),
    )
    con = duckdb.connect()
    con.execute(
        f"""
        CREATE VIEW fz AS
        SELECT CAST(l_quantity AS DOUBLE) AS q,
               l_extendedprice / 1000.0 AS p,
               CAST(l_discount AS DOUBLE) AS d,
               CAST(l_tax AS DOUBLE) AS t,
               CAST(CASE WHEN l_linenumber % 3 != 0 THEN l_discount END
                    AS DOUBLE) AS dn
        FROM '{SF_DIR}/lineitem.parquet'
        """
    )
    return sdf, con


class Gen:
    """Paired generator: every production returns (dftly_str, sql_str, kind)
    where kind is 'num' or 'bool'."""

    def __init__(self, rng: random.Random, max_depth: int = 4):
        self.rng = rng
        self.max_depth = max_depth

    def num(self, depth: int = 0) -> tuple[str, str]:
        r = self.rng
        if depth >= self.max_depth or r.random() < 0.25:
            if r.random() < 0.6:
                c, _ = r.choice(NUM_COLS)
                return f"${c}", c
            lit = round(r.uniform(-3, 3), 2)
            # DuckDB types bare decimal literals as DECIMAL; force DOUBLE
            # so both engines do float arithmetic
            return repr(lit), f"CAST({lit!r} AS DOUBLE)"
        choice = r.randrange(6)
        if choice < 3:  # + - *
            op = "+-*"[choice]
            a_d, a_s = self.num(depth + 1)
            b_d, b_s = self.num(depth + 1)
            return f"({a_d} {op} {b_d})", f"({a_s} {op} {b_s})"
        if choice == 3:  # conditional
            c_d, c_s = self.boolean(depth + 1)
            a_d, a_s = self.num(depth + 1)
            b_d, b_s = self.num(depth + 1)
            return (
                f"({a_d} if {c_d} else {b_d})",
                f"(CASE WHEN {c_s} THEN {a_s} ELSE {b_s} END)",
            )
        if choice == 4:
            if r.random() < 0.5:  # coalesce
                a_d, a_s = self.num(depth + 1)
                b_d, b_s = self.num(depth + 1)
                return f"({a_d} ?? {b_d})", f"coalesce({a_s}, {b_s})"
            # double -> int64 cast: Polars/Spark TRUNCATE where SQL CAST
            # rounds — the mirror is CAST(TRUNC(x) AS BIGINT), then back
            # to double so the column type stays uniform
            a_d, a_s = self.num(depth + 1)
            return (
                f"(({a_d})::int64)::float64",
                f"CAST(CAST(TRUNC({a_s}) AS BIGINT) AS DOUBLE)",
            )
        # horizontal min/max (null-skipping on both engines)
        fn, sql_fn = r.choice([("min", "least"), ("max", "greatest")])
        a_d, a_s = self.num(depth + 1)
        b_d, b_s = self.num(depth + 1)
        return f"{fn}({a_d}, {b_d})", f"{sql_fn}({a_s}, {b_s})"

    def boolean(self, depth: int = 0) -> tuple[str, str]:
        r = self.rng
        if depth >= self.max_depth or r.random() < 0.4:
            a_d, a_s = self.num(depth + 1)
            b_d, b_s = self.num(depth + 1)
            op_d, op_s = r.choice(
                [("==", "="), ("!=", "!="), ("<", "<"), ("<=", "<="),
                 (">", ">"), (">=", ">=")]
            )
            return f"({a_d} {op_d} {b_d})", f"({a_s} {op_s} {b_s})"
        choice = r.randrange(3)
        if choice == 0:
            a_d, a_s = self.boolean(depth + 1)
            return f"(not {a_d})", f"(NOT {a_s})"
        op = r.choice(["and", "or"])
        a_d, a_s = self.boolean(depth + 1)
        b_d, b_s = self.boolean(depth + 1)
        return f"({a_d} {op} {b_d})", f"({a_s} {op.upper()} {b_s})"


def _canon(values):
    import decimal

    out = []
    for v in values:
        if isinstance(v, decimal.Decimal):
            out.append(round(float(v), 9))
        elif isinstance(v, float):
            out.append(round(v, 9))
        else:
            out.append(v)
    return sorted(out, key=lambda x: (x is None, str(type(x)), x if x is not None else 0))


@pytest.mark.parametrize("seed", range(20))
def test_fuzzed_expressions_match_duckdb(spark, seed):
    rng = random.Random(1000 + seed)
    gen = Gen(rng)
    sdf, con = _frames(spark)
    spec, sql_cols = {}, []
    for i in range(5):
        if i % 2 == 0:
            d, s = gen.num()
        else:
            d, s = gen.boolean()
        spec[f"c{i}"] = d
        sql_cols.append(f"{s} AS c{i}")
    sql = "SELECT " + ", ".join(sql_cols) + " FROM fz"
    try:
        got = Parser.select(sdf, spec).collect()
    except Exception as ex:  # pragma: no cover - generator bug, show repro
        raise AssertionError(f"spark failed for {spec}\n{ex}") from ex
    want = con.execute(sql).fetchall()
    assert len(got) == len(want)
    for i in range(5):
        g = _canon([r[f"c{i}"] for r in got])
        w = _canon([r[i] for r in want])
        assert g == w, (
            f"column c{i} mismatch (seed {seed})\n"
            f"dftly: {spec[f'c{i}']}\nsql:   {sql_cols[i]}"
        )


# ---------------------------------------------------------------------------
# String / datetime surface: slices (Python semantics), concat, length,
# dt accessors — the composition space of the reference's string nodes.
# ---------------------------------------------------------------------------

STR_COLS = ["pri", "stat", "pn"]  # pn carries planted nulls
DT_ACCESSORS = [
    ("year_of_date", "year({c})"),
    ("month_of_year", "month({c})"),
    ("day_of_month", "day({c})"),
    ("day_of_week", "isodow({c})"),  # both are 1=Monday
    ("quarter_of_year", "quarter({c})"),
]


def _frames2(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    sdf = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("stat"),
        F.when(F.col("o_orderkey") % 5 != 0, F.col("o_orderpriority")).alias("pn"),
        F.col("o_orderdate").alias("dt"),
    )
    con = duckdb.connect()
    con.execute(
        f"""
        CREATE VIEW fz2 AS
        SELECT o_orderpriority AS pri, o_orderstatus AS stat,
               CASE WHEN o_orderkey % 5 != 0 THEN o_orderpriority END AS pn,
               o_orderdate AS dt
        FROM '{SF_DIR}/orders.parquet'
        """
    )
    return sdf, con


def _slice_sql(col: str, a, b) -> str:
    """Python slice s[a:b] in SQL: normalize both bounds against length,
    then substr(start+1, max(stop-start, 0))."""

    def norm(x):
        if x is None:
            return f"length({col})"
        if x < 0:
            return f"GREATEST(length({col}) + {x}, 0)"
        return f"LEAST({x}, length({col}))"

    return (
        f"substr({col}, {norm(a)} + 1, GREATEST({norm(b)} - ({norm(a)}), 0))"
    )


class Gen2(Gen):
    def str_(self, depth: int = 0, in_fstring: bool = False) -> tuple[str, str]:
        r = self.rng
        if depth >= self.max_depth or r.random() < 0.3:
            c = r.choice(STR_COLS)
            return f"${c}", c
        choice = r.randrange(4)
        if choice == 0:  # Python slice on a base column
            c = r.choice(STR_COLS)
            a = r.choice([None, 0, 1, 2, 3, -1, -3, -5])
            b = r.choice([None, 1, 2, 4, 6, 100, -1, -2])
            if a is None:
                a = 0
            d = f"${c}[{a}:{'' if b is None else b}]"
            return d, _slice_sql(c, a, b)
        if choice == 1:
            if r.random() < 0.5 or in_fstring:  # concat via string `+`
                a_d, a_s = self.str_(depth + 1, in_fstring)
                b_d, b_s = self.str_(depth + 1, in_fstring)
                return f"({a_d} + {b_d})", f"(({a_s}) || ({b_s}))"
            # f-string interpolation (null field -> null result, like ||);
            # fields must not nest another same-quote f-string — the flat
            # string grammar cannot express that (same as pre-3.12 Python)
            a_d, a_s = self.str_(depth + 1, True)
            b_d, b_s = self.str_(depth + 1, True)
            sep = r.choice(["|", "-", "::"])
            return (
                f"f\"<{{{a_d}}}{sep}{{{b_d}}}>\"",
                f"('<' || ({a_s}) || '{sep}' || ({b_s}) || '>')",
            )
        if choice == 2:  # conditional
            c_d, c_s = self.boolean2(depth + 1)
            a_d, a_s = self.str_(depth + 1, in_fstring)
            b_d, b_s = self.str_(depth + 1, in_fstring)
            return (
                f"({a_d} if {c_d} else {b_d})",
                f"(CASE WHEN {c_s} THEN {a_s} ELSE {b_s} END)",
            )
        a_d, a_s = self.str_(depth + 1, in_fstring)
        b_d, b_s = self.str_(depth + 1, in_fstring)
        return f"({a_d} ?? {b_d})", f"coalesce({a_s}, {b_s})"

    def num2(self, depth: int = 0) -> tuple[str, str]:
        r = self.rng
        roll = r.random()
        if roll < 0.4:
            a_d, a_s = self.str_(depth + 1)
            return f"len_chars({a_d})", f"length({a_s})"
        if roll < 0.55:
            # non-strict cast of arbitrary text -> double (null on failure)
            a_d, a_s = self.str_(depth + 1)
            return (
                f"(({a_d})::?float64 ?? 0.0)",
                f"coalesce(TRY_CAST({a_s} AS DOUBLE), 0.0)",
            )
        acc, sql_t = r.choice(DT_ACCESSORS)
        return f"$dt::{acc}", sql_t.format(c="dt")

    def boolean2(self, depth: int = 0) -> tuple[str, str]:
        r = self.rng
        if depth >= self.max_depth or r.random() < 0.5:
            if r.random() < 0.5:
                a_d, a_s = self.str_(depth + 1)
                b_d, b_s = self.str_(depth + 1)
            else:
                a_d, a_s = self.num2(depth + 1)
                b_d, b_s = self.num2(depth + 1)
            op_d, op_s = r.choice([("==", "="), ("!=", "!="), ("<", "<"), (">", ">")])
            return f"({a_d} {op_d} {b_d})", f"({a_s} {op_s} {b_s})"
        op = r.choice(["and", "or"])
        a_d, a_s = self.boolean2(depth + 1)
        b_d, b_s = self.boolean2(depth + 1)
        return f"({a_d} {op} {b_d})", f"({a_s} {op.upper()} {b_s})"


@pytest.mark.parametrize("seed", range(20))
def test_fuzzed_string_datetime_match_duckdb(spark, seed):
    rng = random.Random(7000 + seed)
    gen = Gen2(rng, max_depth=3)
    sdf, con = _frames2(spark)
    spec, sql_cols = {}, []
    makers = [gen.str_, gen.num2, gen.boolean2]
    for i in range(6):
        d, s = makers[i % 3]()
        spec[f"c{i}"] = d
        sql_cols.append(f"{s} AS c{i}")
    sql = "SELECT " + ", ".join(sql_cols) + " FROM fz2"
    try:
        got = Parser.select(sdf, spec).collect()
    except Exception as ex:  # pragma: no cover
        raise AssertionError(f"spark failed for {spec}\n{ex}") from ex
    want = con.execute(sql).fetchall()
    assert len(got) == len(want)
    for i in range(6):
        g = _canon([r[f"c{i}"] for r in got])
        w = _canon([r[i] for r in want])
        assert g == w, (
            f"column c{i} mismatch (seed {seed})\n"
            f"dftly: {spec[f'c{i}']}\nsql:   {sql_cols[i]}"
        )


# ---------------------------------------------------------------------------
# Duration / interval surface: timestamp differences (sign included),
# duration arithmetic, unit literals, truncate-toward-zero totals,
# timestamp shifting — the engine's hardest Polars<->Spark shims.
# DuckDB mirror carries durations as MICROSECOND BIGINTS (exact integer
# arithmetic), totals as explicit truncate-toward-zero integer division.
# ---------------------------------------------------------------------------

UNITS_US = {
    "seconds": 1_000_000,
    "minutes": 60_000_000,
    "hours": 3_600_000_000,
    "days": 86_400_000_000,
}
TOTALS = [
    ("total_seconds", 1_000_000),
    ("total_minutes", 60_000_000),
    ("total_hours", 3_600_000_000),
    ("total_days", 86_400_000_000),
    ("total_microseconds", 1),
]


def _frames3(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    shift = (F.col("o_orderkey") % 5000 - 2500) * 60_000_000
    dt = F.col("o_orderdate").cast("timestamp")  # parquet loads NTZ
    sdf = o.select(
        dt.alias("dt1"),
        F.timestamp_micros(F.unix_micros(dt) + shift).alias("dt2"),
    )
    con = duckdb.connect()
    con.execute(
        f"""
        CREATE VIEW fz3 AS
        SELECT o_orderdate AS dt1,
               o_orderdate
                 + to_microseconds((o_orderkey % 5000 - 2500) * 60000000)
                 AS dt2
        FROM '{SF_DIR}/orders.parquet'
        """
    )
    return sdf, con


def _trunc_div(x_sql: str, u: int) -> str:
    if u == 1:
        return f"({x_sql})"
    return (
        f"(CASE WHEN ({x_sql}) >= 0 THEN ({x_sql}) // {u} "
        f"ELSE -((-({x_sql})) // {u}) END)"
    )


class Gen3:
    def __init__(self, rng: random.Random, max_depth: int = 3):
        self.rng = rng
        self.max_depth = max_depth

    def dur(self, depth: int = 0) -> tuple[str, str]:
        r = self.rng
        if depth >= self.max_depth or r.random() < 0.4:
            if r.random() < 0.6:
                a, b = r.sample(["dt1", "dt2"], 2)
                return (
                    f"(${a} - ${b})",
                    f"date_diff('microsecond', {b}, {a})",
                )
            unit, us = r.choice(list(UNITS_US.items()))
            n = r.randrange(1, 200)
            return f"{n}::{unit}", f"(CAST({n} AS BIGINT) * {us})"
        op = r.choice(["+", "-"])
        a_d, a_s = self.dur(depth + 1)
        b_d, b_s = self.dur(depth + 1)
        return f"({a_d} {op} {b_d})", f"(({a_s}) {op} ({b_s}))"

    def num3(self, depth: int = 0) -> tuple[str, str]:
        acc, u = self.rng.choice(TOTALS)
        d_d, d_s = self.dur(depth + 1)
        return f"({d_d})::{acc}", _trunc_div(d_s, u)

    def dt(self, depth: int = 0) -> tuple[str, str]:
        r = self.rng
        base = r.choice(["dt1", "dt2"])
        if depth >= self.max_depth or r.random() < 0.4:
            return f"${base}", base
        op = r.choice(["+", "-"])
        d_d, d_s = self.dur(depth + 1)
        return (
            f"(${base} {op} {d_d})",
            f"({base} {op} to_microseconds(CAST({d_s} AS BIGINT)))",
        )

    def boolean3(self, depth: int = 0) -> tuple[str, str]:
        r = self.rng
        op_d, op_s = r.choice([("<", "<"), (">", ">"), ("==", "="), ("<=", "<=")])
        if r.random() < 0.5:
            a_d, a_s = self.dur(depth + 1)
            b_d, b_s = self.dur(depth + 1)
        else:
            a_d, a_s = self.dt(depth + 1)
            b_d, b_s = self.dt(depth + 1)
        return f"({a_d} {op_d} {b_d})", f"(({a_s}) {op_s} ({b_s}))"


@pytest.mark.parametrize("seed", range(20))
def test_fuzzed_durations_match_duckdb(spark, seed):
    rng = random.Random(31000 + seed)
    gen = Gen3(rng)
    sdf, con = _frames3(spark)
    spec, sql_cols = {}, []
    makers = [gen.num3, gen.dt, gen.boolean3]
    for i in range(6):
        d, s = makers[i % 3]()
        spec[f"c{i}"] = d
        sql_cols.append(f"{s} AS c{i}")
    sql = "SELECT " + ", ".join(sql_cols) + " FROM fz3"
    try:
        got = Parser.select(sdf, spec).collect()
    except Exception as ex:  # pragma: no cover
        raise AssertionError(f"spark failed for {spec}\n{ex}") from ex
    want = con.execute(sql).fetchall()
    assert len(got) == len(want)
    for i in range(6):
        g = _canon([r[f"c{i}"] for r in got])
        w = _canon([r[i] for r in want])
        assert g == w, (
            f"column c{i} mismatch (seed {seed})\n"
            f"dftly: {spec[f'c{i}']}\nsql:   {sql_cols[i]}"
        )


# ---------------------------------------------------------------------------
# Regex surface: generated portable patterns (the Java∩RE2 subset the
# strict-dialect lint enforces) through `extract [group N of] /re/ from`
# and `/re/ in`, against DuckDB's RE2.  Pins the dialect bridge over
# random patterns, not just the hand-written q17/q24 cases.
# ---------------------------------------------------------------------------


def _frames4(spark):
    p = spark.read.parquet(f"{SF_DIR}/part.parquet")
    sdf = p.select(F.col("p_name").alias("name"), F.col("p_type").alias("typ"))
    con = duckdb.connect()
    con.execute(
        f"""
        CREATE VIEW fz4 AS
        SELECT p_name AS name, p_type AS typ
        FROM '{SF_DIR}/part.parquet'
        """
    )
    return sdf, con


class GenRe:
    ATOMS = ["[a-z]", "[0-9]", "[A-Z]", "[aeiou]", "[b-dr-t]", "s", "e", "r", " "]
    QUANTS = ["", "+", "?", "{1,2}", "{2}"]

    def __init__(self, rng: random.Random):
        self.rng = rng

    def pattern(self, with_group: bool = False) -> str:
        r = self.rng
        n = r.randrange(2, 5)
        parts = [
            r.choice(self.ATOMS) + r.choice(self.QUANTS) for _ in range(n)
        ]
        if with_group:
            i = r.randrange(len(parts))
            parts[i] = f"({parts[i]})"
        return "".join(parts)

    def produce(self) -> tuple[str, str]:
        r = self.rng
        col = r.choice(["name", "typ"])
        kind = r.randrange(3)
        if kind == 0:  # search
            pat = self.pattern()
            return f"/{pat}/ in ${col}", f"regexp_matches({col}, '{pat}')"
        if kind == 1:  # whole-match extract
            pat = self.pattern()
            return (
                f"extract /{pat}/ from ${col}",
                f"CASE WHEN regexp_matches({col}, '{pat}') "
                f"THEN regexp_extract({col}, '{pat}') END",
            )
        pat = self.pattern(with_group=True)  # group extract
        return (
            f"extract group 1 of /{pat}/ from ${col}",
            f"CASE WHEN regexp_matches({col}, '{pat}') "
            f"THEN regexp_extract({col}, '{pat}', 1) END",
        )


@pytest.mark.parametrize("seed", range(20))
def test_fuzzed_regex_match_duckdb(spark, seed):
    rng = random.Random(91000 + seed)
    gen = GenRe(rng)
    sdf, con = _frames4(spark)
    spec, sql_cols = {}, []
    for i in range(6):
        d, s = gen.produce()
        spec[f"c{i}"] = d
        sql_cols.append(f"{s} AS c{i}")
    sql = "SELECT " + ", ".join(sql_cols) + " FROM fz4"
    try:
        got = Parser.select(sdf, spec).collect()
    except Exception as ex:  # pragma: no cover
        raise AssertionError(f"spark failed for {spec}\n{ex}") from ex
    want = con.execute(sql).fetchall()
    assert len(got) == len(want)
    for i in range(6):
        g = _canon([r[f"c{i}"] for r in got])
        w = _canon([r[i] for r in want])
        assert g == w, (
            f"column c{i} mismatch (seed {seed})\n"
            f"dftly: {spec[f'c{i}']}\nsql:   {sql_cols[i]}"
        )


# ---------------------------------------------------------------------------
# Keyed-aggregate shape: random shared specs through BOTH engines.
# The x128 pattern (__spark_entry__._agg_spec_query + sqlgen.agg_oracle_sql)
# fuzzed over its composition space: random filters, random scalar exprs
# under each agg kind, 1-2 group keys.  Kinds are restricted to the
# order-independent set (count / count_distinct / min / max / exact_sum)
# plus round6_avg over a BARE column — a fuzzed compound expr under avg
# can reach 1e6 magnitudes where double partial-sum order wobbles past
# the 1e-6 rounding unit, which would fuzz the environment, not the code.
# ---------------------------------------------------------------------------

LI_NUM_COLS = [("l_quantity", False), ("l_extendedprice", False),
               ("l_discount", False), ("l_tax", False)]


def _agg_con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'"
    )
    return con


@pytest.mark.parametrize("seed", range(10))
def test_fuzzed_agg_specs_match_duckdb(spark, seed):
    import __spark_entry__ as entry
    from dftly_spark.sqlgen import agg_oracle_sql

    rng = random.Random(7000 + seed)
    gen = Gen(rng, max_depth=3)
    gen_cols = LI_NUM_COLS
    # Gen draws from the module-level NUM_COLS; re-point it at lineitem's
    # raw numeric columns for this test only
    global NUM_COLS
    saved, NUM_COLS = NUM_COLS, gen_cols
    try:
        keys = rng.choice([("l_returnflag",), ("l_returnflag", "l_linestatus")])
        select = {k: ("expr", f"${k}") for k in keys}
        where_d, _ = gen.boolean()
        kinds = ["count", "count_distinct", "min", "max", "exact_sum",
                 "round6_avg"]
        rng.shuffle(kinds)
        for i, kind in enumerate(kinds[:4]):
            if kind == "count":
                arg = None
            elif kind == "round6_avg":
                arg = f"${rng.choice(gen_cols)[0]}"
            else:
                arg, _ = gen.num()
            select[f"a{i}"] = (kind, arg)
    finally:
        NUM_COLS = saved

    run = entry._agg_spec_query("lineitem", select, where_d, keys)
    got = run(spark, SF_DIR).toPandas()
    sql = agg_oracle_sql(
        "lineitem", select, entry._pq_schema("lineitem"),
        where=where_d, group_by=keys,
    )
    want = _agg_con().execute(sql).df()
    assert list(got.columns) == list(want.columns), (select, where_d)
    key_cols = list(keys)
    got = got.sort_values(key_cols).reset_index(drop=True)
    want = want.sort_values(key_cols).reset_index(drop=True)
    assert len(got) == len(want), (select, where_d, len(got), len(want))
    for c in got.columns:
        g = _canon(list(got[c]))
        w = _canon(list(want[c]))
        assert g == w, (
            f"column {c} mismatch (seed {seed})\n"
            f"spec: {select[c]}\nwhere: {where_d}\nsql:\n{sql}"
        )


# ---------------------------------------------------------------------------
# Op-level model fuzz for the round-12 surface (r12 verdict item 3): each of
# the three newest ops has exactly ONE oracle shape in the contract gates;
# these Hypothesis suites fuzz the input space the gates can't reach —
# separator edge cases, rank ties / duplicate candidates, and the null
# exclusion policies — against pure-Python models of the documented
# semantics.  Batched like test_reshape_assoc's dedup_lines model test:
# one @given function driving many small Spark jobs.
# ---------------------------------------------------------------------------


def _fuzz_examples(default: int = 15) -> int:
    """Example budget for the op-model fuzz suites.  The default keeps CI
    fast; set SPARK_GRAFT_FUZZ_EXAMPLES higher for a deep falsification
    pass (the round-13 deep run used 60 per suite, zero divergence)."""
    import os

    return int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", default))



def test_fuzz_dedup_lines_separators(spark):
    """dedup_lines ≡ Python model under adversarial separators: multi-char,
    CRLF, regex metachars ('.', '*', '||'), a literal '\\E' (the
    Pattern.quote rewrite case), separators at document ends, and sep
    FRAGMENTS inside lines ('|' content with '||' sep).  The model splits
    the joined text with Python's literal str.split — the op's Java
    \\Q…\\E split must agree exactly."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dftly_spark.ops import dedup_lines

    seps = st.sampled_from(["\n", "\r\n", "||", "<EOL>", ".", "*", "\\E"])
    # "|" is a deliberate sep-fragment line for the "||" separator; join-
    # then-split need not round-trip the line LISTS (that ambiguity is
    # inherent to text), so the model operates on the joined TEXT.
    words = st.sampled_from(["a", "bb", "ccc", "dd dd", "boiler plate", "", "|"])
    docs = st.lists(
        st.lists(words, min_size=1, max_size=6), min_size=1, max_size=8
    )

    @settings(max_examples=_fuzz_examples(), deadline=None)
    @given(seps, docs, st.integers(1, 2), st.integers(0, 3))
    def _prop(sep, line_lists, max_df, min_chars):
        texts = [sep.join(lines) for lines in line_lists]
        cnt = Counter()
        for t in texts:
            for ln in t.split(sep):
                if len(ln) >= min_chars:
                    cnt[ln] += 1
        expect = {}
        for i, t in enumerate(texts):
            parts = t.split(sep)
            kept = [
                ln for ln in parts if len(ln) < min_chars or cnt[ln] <= max_df
            ]
            expect[i] = (sep.join(kept), len(kept), len(parts) - len(kept))

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_dropped"])
            for r in dedup_lines(
                df, sep=sep, max_df=max_df, min_dedup_chars=min_chars
            ).collect()
        }
        assert got == expect, (sep, texts)

    _prop()


def test_fuzz_topk_recall_ties_and_duplicates(spark):
    """topk_recall ≡ Python model with rank TIES at the k cutoff and
    DUPLICATE (query, id) rows in the approx frame: duplicates must not
    double-count a hit (left_semi semantics — the r12 advice note), tied
    truth ranks all pass the rank<=k filter, truth-only queries score 0,
    and approx-only queries are absent from the output."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dftly_spark.ops import topk_recall

    truth_rows = st.lists(
        st.tuples(
            st.integers(0, 2),  # query_id
            st.integers(0, 9),  # vec_id
            st.integers(1, 4),  # rank (ties allowed)
        ),
        min_size=1,
        max_size=18,
        unique_by=lambda r: (r[0], r[1]),  # truth ids distinct per query
    )
    approx_rows = st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 9), st.integers(1, 4)),
        min_size=0,
        max_size=18,  # duplicates allowed — the adversarial case
    )
    ks = st.sampled_from([None, 1, 2, 3])

    @settings(max_examples=_fuzz_examples(), deadline=None)
    @given(truth_rows, approx_rows, ks)
    def _prop(t_rows, a_rows, k):
        tk = [r for r in t_rows if k is None or r[2] <= k]
        ak = {(q, v) for q, v, r in a_rows if k is None or r <= k}
        expect = {}
        for q in {r[0] for r in tk}:
            mine = [(qq, v) for qq, v, _ in tk if qq == q]
            hits = sum(1 for key in mine if key in ak)
            expect[q] = (hits, len(mine), hits / len(mine))

        schema = "query_id int, vec_id int, rank int"
        truth = spark.createDataFrame(t_rows, schema)
        approx = (
            spark.createDataFrame(a_rows, schema)
            if a_rows
            else spark.createDataFrame([], schema)
        )
        got = {
            r["query_id"]: (r["n_hits"], r["n_truth"], r["recall"])
            for r in topk_recall(truth, approx, k=k).collect()
        }
        assert got == expect, (t_rows, a_rows, k)

    _prop()


def test_fuzz_token_budget_sample_null_policy(spark):
    """token_budget_sample ≡ Python model across the documented exclusion
    gates: null ids, non-bigint-castable string ids, null groups, groups
    absent from a dict budget, and null/negative token counts — plus the
    LCG order and the budget-crossing-row-included rule."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dftly_spark.ops import token_budget_sample

    _A, _C, _M = 1103515245, 12345, 2**31

    ids = st.lists(
        st.sampled_from(
            [None, "x", "", "0", "1", "2", "3", "5", "7", "11", "12", "40", "99"]
        ),
        min_size=1,
        max_size=12,
        unique=True,
    )
    groups = st.sampled_from(["a", "b", None])
    toks = st.sampled_from([None, -3, 0, 1, 2, 5, 9])
    budgets = st.sampled_from([0, 1, 4, 10, {"a": 3}, {"a": 2, "b": 6}])

    @settings(max_examples=_fuzz_examples(), deadline=None)
    @given(ids, st.data())
    def _prop(id_list, data):
        rows = [
            (i, data.draw(groups), data.draw(toks)) for i in id_list
        ]
        budget = data.draw(budgets)

        def ordk(s):
            try:
                v = int(s)
            except (TypeError, ValueError):
                return None
            return (v * _A + _C) % _M

        by_group = {}
        for i, g, n in rows:
            o = ordk(i)
            if o is None or g is None or n is None or n < 0:
                continue
            if isinstance(budget, dict) and g not in budget:
                continue
            by_group.setdefault(g, []).append((o, i, n))
        expect = set()
        for g, items in by_group.items():
            b = budget[g] if isinstance(budget, dict) else budget
            items.sort()
            cum = 0
            for _, i, n in items:
                if cum >= b:
                    break
                cum += n
                expect.add((i, g, n, cum))

        df = spark.createDataFrame(rows, "doc_id string, src string, n int")
        got = {
            (r["doc_id"], r["src"], r["n_tokens"], r["cum_tokens"])
            for r in token_budget_sample(
                df, "src", budget, id_col="doc_id", n_tokens_col="n", buckets=4
            ).collect()
        }
        assert got == expect, (rows, budget)

    _prop()


def _pr(x: float, d: int) -> float:
    """Python model of the floor-scale rounding convention
    (sqlgen.portable_round): floor in the double domain."""
    import math

    p = 10.0 ** d
    w = x * p + 0.5
    if not math.isfinite(w) or abs(w) >= 2.0 ** 53:
        return w / p
    return math.floor(w) / p


def test_fuzz_rrf_fuse_duplicates_and_nulls(spark):
    """rrf_fuse ≡ Python model with duplicate (query, doc) rows inside one
    list (deduped to best rank, never double-counted), null ranks
    (dropped — absent, no n_lists contribution), single-list input, and
    the rounded-score re-rank with doc-id tie-break."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dftly_spark.ops import rrf_fuse

    row = st.tuples(
        st.integers(0, 1),                       # query_id
        st.integers(0, 5),                       # doc_id
        st.one_of(st.none(), st.integers(1, 5)),  # rank (nulls allowed)
    )
    lists = st.lists(
        st.lists(row, min_size=0, max_size=10), min_size=1, max_size=3
    )

    @settings(max_examples=_fuzz_examples(), deadline=None)
    @given(lists, st.sampled_from([10, 60]), st.sampled_from([None, 1, 3]))
    def _prop(ranking_rows, k, topk):
        per_pair: dict = {}
        for rows in ranking_rows:
            best: dict = {}
            for q, d, r in rows:
                if r is None:
                    continue
                key = (q, d)
                best[key] = r if key not in best else min(best[key], r)
            for key, r in best.items():
                n, terms = per_pair.get(key, (0, []))
                per_pair[key] = (n + 1, terms + [1.0 / (k + r)])
        fused = {
            key: (n, _pr(sum(terms), 9)) for key, (n, terms) in per_pair.items()
        }
        expect = set()
        for q in {key[0] for key in fused}:
            mine = sorted(
                ((d, nl, s) for (qq, d), (nl, s) in fused.items() if qq == q),
                key=lambda t: (-t[2], t[0]),
            )
            for rank, (d, nl, s) in enumerate(mine, start=1):
                if topk is None or rank <= topk:
                    expect.add((q, d, nl, s, rank))

        schema = "query_id int, doc_id int, rank int"
        frames = [
            spark.createDataFrame(rows, schema) if rows
            else spark.createDataFrame([], schema)
            for rows in ranking_rows
        ]
        got = {
            (r["query_id"], r["doc_id"], r["n_lists"], r["rrf"], r["rank"])
            for r in rrf_fuse(frames, k=k, topk=topk).collect()
        }
        assert got == expect, (ranking_rows, k, topk)

    _prop()


def test_fuzz_pair_quality_orientation_and_nulls(spark):
    """pair_quality ≡ Python model across orientation flips, duplicate
    emissions, self-pairs, null members (dropped, never normalized into
    fabricated self-pairs), and empty inputs (null ratios, never 0/0)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dftly_spark.ops import pair_quality

    member = st.one_of(st.none(), st.integers(0, 5))
    pairs = st.lists(st.tuples(member, member), min_size=0, max_size=12)

    @settings(max_examples=_fuzz_examples(), deadline=None)
    @given(pairs, pairs)
    def _prop(pred_rows, truth_rows):
        def norm(rows):
            return {
                (min(a, b), max(a, b))
                for a, b in rows
                if a is not None and b is not None
            }

        p, t = norm(pred_rows), norm(truth_rows)
        hit = len(p & t)
        prec = hit / len(p) if p else None
        rec = hit / len(t) if t else None
        if prec is None or rec is None or prec + rec == 0:
            f1 = None
        else:
            f1 = 2 * prec * rec / (prec + rec)

        schema = "id_l int, id_r int"
        mk = lambda rows: (
            spark.createDataFrame(rows, schema)
            if rows
            else spark.createDataFrame([], schema)
        )
        r = pair_quality(mk(pred_rows), mk(truth_rows)).collect()[0]
        assert (r["n_pred"], r["n_truth"], r["n_hit"]) == (len(p), len(t), hit)
        for got, exp in ((r["precision"], prec), (r["recall"], rec), (r["f1"], f1)):
            if exp is None:
                assert got is None
            else:
                assert got is not None and abs(got - exp) < 1e-12
    _prop()


def test_fuzz_doremi_weights_null_domains_and_extremes(spark):
    """doremi_weights ≡ Python model with all-null-loss domains (excess 0,
    uniform floor share still applies), partial nulls (null-skip mean but
    full n_rows), floor=1 (pure uniform), and extreme temperatures.
    Losses are quarter-multiples so the means are bit-exact in both
    engines; weights compare on the rounded grid."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dftly_spark.ops import doremi_weights

    loss = st.one_of(st.none(), st.integers(0, 16).map(lambda i: i * 0.25))
    rows = st.lists(
        st.tuples(st.sampled_from(["a", "b", "c", None]), loss, loss),
        min_size=1,
        max_size=14,
    )

    @settings(max_examples=_fuzz_examples(), deadline=None)
    @given(rows, st.sampled_from([0.25, 1.0, 4.0]), st.sampled_from([0.0, 0.3, 1.0]))
    def _prop(data_rows, tau, floor):
        import math

        by_dom: dict = {}
        for dom, pl, rl in data_rows:
            if dom is None:
                continue
            n, vals = by_dom.get(dom, (0, []))
            if pl is not None and rl is not None:
                vals = vals + [max(pl - rl, 0.0)]
            by_dom[dom] = (n + 1, vals)
        if not by_dom:
            return
        excess = {
            d: _pr(sum(vals) / len(vals), 6) if vals else 0.0
            for d, (n, vals) in by_dom.items()
        }
        mx = max(excess.values())
        e = {d: math.exp((x - mx) / tau) for d, x in excess.items()}
        z = sum(e[d] for d in sorted(e))
        kk = len(by_dom)
        expect = {
            d: (by_dom[d][0], excess[d], (1.0 - floor) * e[d] / z + floor / kk)
            for d in by_dom
        }

        df = spark.createDataFrame(
            data_rows, "dom string, proxy double, ref double"
        )
        got = {
            r["dom"]: (r["n_rows"], r["excess"], r["weight"])
            for r in doremi_weights(
                df, "dom", "proxy", "ref", temperature=tau, floor=floor
            ).collect()
        }
        assert set(got) == set(expect), data_rows
        for d in expect:
            assert got[d][0] == expect[d][0], (d, data_rows)
            assert got[d][1] == expect[d][1], (d, data_rows)
            assert abs(got[d][2] - expect[d][2]) < 2e-6, (d, data_rows)

    _prop()


def test_fuzz_mixture_kl_zero_mass_and_nulls(spark):
    """mixture_kl ≡ Python model across zero-mass groups (explicit 0
    kl_term — the r14 guard), null weights, negative masses, groups
    absent from the target, and the no-weight-col row-count mode."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dftly_spark.ops import mixture_kl

    w = st.one_of(st.none(), st.sampled_from([-2, 0, 1, 3, 7]))
    rows = st.lists(
        st.tuples(st.sampled_from(["a", "b", "z", None]), w),
        min_size=1,
        max_size=14,
    )
    targets = st.sampled_from(
        [{"a": 0.5, "b": 0.5}, {"a": 0.3, "b": 0.7}, {"a": 1.0}]
    )

    @settings(max_examples=_fuzz_examples(), deadline=None)
    @given(rows, targets, st.booleans())
    def _prop(data_rows, target, use_weight):
        import math

        from hypothesis import assume

        by_grp: dict = {}
        for g, n in data_rows:
            if g is None or g not in target:
                continue
            if use_weight and (n is None or n < 0):
                continue
            mass = float(n) if use_weight else 1.0
            cnt, tot = by_grp.get(g, (0, 0.0))
            by_grp[g] = (cnt + 1, tot + mass)
        total = sum(m for _, m in by_grp.values())
        assume(total > 0)
        expect = {}
        for g, (cnt, m) in by_grp.items():
            p = m / total
            kl = _pr(p * math.log(p / target[g]), 6) if p > 0 else 0.0
            expect[g] = (cnt, m, p, target[g], kl)

        df = spark.createDataFrame(data_rows, "grp string, n int")
        out = mixture_kl(
            df, "grp", target, weight_col="n" if use_weight else None
        ).collect()
        got = {
            r["grp"]: (r["n_rows"], r["mass"], r["observed"], r["target"], r["kl_term"])
            for r in out
        }
        assert set(got) == set(expect), (data_rows, target, use_weight)
        for g in expect:
            ge, ee = got[g], expect[g]
            assert ge[0] == ee[0] and float(ge[1]) == ee[1], (g, data_rows)
            assert abs(ge[2] - ee[2]) < 1e-12 and ge[3] == ee[3]
            assert abs(ge[4] - ee[4]) < 2e-6, (g, data_rows, target)

    _prop()
