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
        if choice == 4:  # coalesce
            a_d, a_s = self.num(depth + 1)
            b_d, b_s = self.num(depth + 1)
            return f"({a_d} ?? {b_d})", f"coalesce({a_s}, {b_s})"
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


@pytest.mark.parametrize("seed", range(12))
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
