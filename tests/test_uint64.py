"""Strict-unsigned uint64 mode (``LoweringContext(uint64_decimal=True)``).

Reference parity target: /root/reference/src/dftly/nodes/types.py:8-12 maps
``uint64`` → pl.UInt64 (true unsigned range, strict cast of negatives raises);
/root/reference/src/dftly/nodes/arithmetic.py:27-104 — Polars ``.hash()``
yields UInt64.  The default engine mode keeps the documented
signed-bigint-with-caveat (SURVEY §1.2); this suite pins the opt-in exact
mode: DECIMAL(20,0) carrier, [0, 2**64-1] range enforcement, unsigned hash.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dftly_spark.parser import Parser

U64_MAX = 2**64 - 1


def _one(df):
    return df.collect()[0][0]


def test_cast_nonstrict_nulls_out_of_range(spark):
    df = spark.createDataFrame(
        [(-5,), (0,), (7,), (2**62,)], "v long"
    )
    col = Parser.expr_to_spark("$v ::? uint64", schema=df, uint64_decimal=True)
    out = df.select(col.alias("u")).orderBy("u")
    assert dict(out.dtypes)["u"] == "decimal(20,0)"
    vals = [r.u for r in out.collect()]
    assert vals[0] is None  # -5 out of unsigned range
    assert [int(v) for v in vals[1:]] == [0, 7, 2**62]


def test_cast_strict_raises_on_negative(spark):
    df = spark.createDataFrame([(-1,)], "v long")
    col = Parser.expr_to_spark("$v :: uint64", schema=df, uint64_decimal=True)
    with pytest.raises(Exception, match="strict cast to uint64"):
        df.select(col).collect()


def test_cast_above_two64_fails(spark):
    # 2**64 is one past UInt64 max: null under ::?, raise under strict.
    df = spark.createDataFrame([("18446744073709551616",)], "v string")
    soft = Parser.expr_to_spark("$v ::? uint64", schema=df, uint64_decimal=True)
    assert _one(df.select(soft)) is None
    hard = Parser.expr_to_spark("$v :: uint64", schema=df, uint64_decimal=True)
    with pytest.raises(Exception, match="strict cast to uint64"):
        df.select(hard).collect()


def test_full_unsigned_range_roundtrips_via_string(spark):
    # Values above 2**63-1 (unrepresentable in bigint) survive exactly.
    df = spark.createDataFrame([(str(U64_MAX),), ("9223372036854775808",)], "v string")
    col = Parser.expr_to_spark("$v :: uint64", schema=df, uint64_decimal=True)
    back = Parser.expr_to_spark("($v :: uint64) :: str", schema=df, uint64_decimal=True)
    rows = df.select(col.alias("u"), back.alias("s")).collect()
    got = {(int(r.u), r.s) for r in rows}
    assert got == {(U64_MAX, str(U64_MAX)), (2**63, "9223372036854775808")}


def test_hash_unsigned_wrap_and_nulls(spark):
    df = spark.createDataFrame([("a",), ("b",), (None,)], "v string")
    signed = Parser.expr_to_spark("signed_hash($v)", schema=df)
    unsigned = Parser.expr_to_spark("hash($v)", schema=df, uint64_decimal=True)
    rows = df.select(
        F.col("v"), signed.alias("s"), unsigned.alias("u")
    ).collect()
    for r in rows:
        if r.v is None:
            assert r.s is None and r.u is None
            continue
        expect = r.s if r.s >= 0 else r.s + 2**64
        assert int(r.u) == expect
        assert 0 <= int(r.u) <= U64_MAX
    out = df.select(unsigned.alias("u"))
    assert dict(out.dtypes)["u"] == "decimal(20,0)"


def test_default_mode_unchanged(spark):
    # Without the opt-in, hash/uint64 stay bigint (the documented default).
    df = spark.createDataFrame([(1,)], "v long")
    h = Parser.expr_to_spark("hash($v)", schema=df)
    c = Parser.expr_to_spark("$v :: uint64", schema=df)
    out = df.select(h.alias("h"), c.alias("c"))
    assert dict(out.dtypes) == {"h": "bigint", "c": "bigint"}


def test_u64_column_feeds_downstream_dispatch(spark):
    # A decimal(20,0) column is tagged U64: integral dispatch — string
    # concat must NOT trigger, int arithmetic stays exact.
    df = spark.createDataFrame([(str(U64_MAX),)], "v string")
    u = Parser.expr_to_spark("$v :: uint64", schema=df, uint64_decimal=True)
    df2 = df.select(u.alias("u"))
    minus = Parser.expr_to_spark("$u - 1", schema=df2, uint64_decimal=True)
    assert int(_one(df2.select(minus))) == U64_MAX - 1


def test_u64_to_i64_is_guarded_narrowing(spark):
    df = spark.createDataFrame([(str(2**63),)], "v string")
    u = Parser.expr_to_spark("$v :: uint64", schema=df, uint64_decimal=True)
    df2 = df.select(u.alias("u"))
    narrow = Parser.expr_to_spark("$u :: int64", schema=df2, uint64_decimal=True)
    with pytest.raises(Exception, match="strict cast to int64"):
        df2.select(narrow).collect()
    soft = Parser.expr_to_spark("$u ::? int64", schema=df2, uint64_decimal=True)
    assert _one(df2.select(soft)) is None


def test_pipeline_options_uint64_decimal(spark, tmp_path):
    # Top-level options apply the mode to every expression step.
    from dftly_spark.pipeline import run_pipeline

    spec = {
        "source": {"table": "lineitem"},
        "options": {"uint64_decimal": True},
        "steps": [
            {"select": {"ok": "$l_orderkey", "u": "($l_orderkey - 50) ::? uint64"}},
            {"filter": "$ok > 0"},
        ],
    }
    out = run_pipeline(spark, spec, sf_dir="/root/testdata/sf0.001")
    assert dict(out.dtypes)["u"] == "decimal(20,0)"
    assert out.count() > 0


def test_pipeline_rejects_unknown_option(spark):
    import pytest as _pytest

    from dftly_spark.pipeline import run_pipeline

    with _pytest.raises(ValueError, match="unknown pipeline options"):
        run_pipeline(
            spark,
            {"source": {"table": "lineitem"}, "options": {"nope": 1}},
            sf_dir="/root/testdata/sf0.001",
        )


def test_float_cast_truncates_not_rounds(spark):
    # Default mode truncates float->int; decimal mode must match (a bare
    # decimal try_cast would round 2.7 half-up to 3).
    df = spark.createDataFrame([(2.7, -2.7)], "a double, b double")
    cols = Parser.to_spark(
        {"a": "$a ::? uint64", "b": "$b ::? uint64"}, schema=df, uint64_decimal=True
    )
    r = df.select(*cols.values()).collect()[0]
    assert int(r.a) == 2
    assert r.b is None  # negative: out of unsigned range


def test_float_half_up_band_truncates(spark):
    # ADVICE r11 regression: at carrier scale 9 a double within 5e-10
    # below an integer (2.9999999999995) would round HALF_UP to 3.0 before
    # the floor; scale 18 keeps the truncation exact.  Decimal mode must
    # agree with the default bigint path (both 2).
    df = spark.createDataFrame([(2.9999999999995, -2.9999999999995)], "a double, b double")
    cols = Parser.to_spark(
        {"a": "$a :: uint64", "b": "$b ::? uint64"}, schema=df, uint64_decimal=True
    )
    dflt = Parser.expr_to_spark("$a :: uint64", schema=df)
    r = df.select(*cols.values(), dflt.alias("c")).collect()[0]
    assert int(r.a) == 2 and r.c == 2
    assert r.b is None  # ceil(-2.999...) = -2, negative: out of range


def test_string_whitespace_trims_like_default(spark):
    # ADVICE r11 regression: try_cast(... as bigint) trims ALL whitespace
    # ('\t42' is 42) while F.trim strips ASCII space only -- the decimal
    # gate must accept the same inputs as the default path.
    df = spark.createDataFrame([("\t42",), ("42\n",), (" \t 7 \n",)], "v string")
    dec = Parser.expr_to_spark("$v :: uint64", schema=df, uint64_decimal=True)
    dflt = Parser.expr_to_spark("$v :: uint64", schema=df)
    rows = df.select(dec.alias("d"), dflt.alias("b")).collect()
    assert [int(r.d) for r in rows] == [r.b for r in rows] == [42, 42, 7]


def test_fractional_string_fails_like_default(spark):
    # try_cast('2.7' as bigint) is NULL in default mode; decimal mode must
    # not silently round it to 3.
    df = spark.createDataFrame([("2.7",), ("42",), (" 17 ",)], "v string")
    soft = Parser.expr_to_spark("$v ::? uint64", schema=df, uint64_decimal=True)
    vals = [r[0] for r in df.select(soft).collect()]
    assert vals[0] is None
    assert int(vals[1]) == 42
    assert int(vals[2]) == 17  # cast trims like Spark's


def test_u64_is_contagious_through_arithmetic(spark):
    # ($v::uint64) - 1 keeps the U64 tag, so a strict narrowing to int64
    # stays guarded and raises on values > 2**63-1 instead of nulling.
    df = spark.createDataFrame([(str(U64_MAX),)], "v string")
    expr = "(($v :: uint64) - 1) :: int64"
    col = Parser.expr_to_spark(expr, schema=df, uint64_decimal=True)
    with pytest.raises(Exception, match="strict cast to int64"):
        df.select(col).collect()


def test_default_mode_hash_to_i64_unguarded(spark):
    # In default mode both carriers are bigint: hash($x) :: int64 must lower
    # to a bare cast, not a try_cast + raise_error guard.
    df = spark.createDataFrame([(1,)], "v long")
    col = Parser.expr_to_spark("hash($v) :: int64", schema=df)
    plan = df.select(col)._jdf.queryExecution().optimizedPlan().toString()
    assert "raise_error" not in plan


def test_make_ctx_does_not_mutate_caller_context(spark):
    from dftly_spark.nodes import LoweringContext

    ctx = LoweringContext({"v": "i64"})
    df = spark.createDataFrame([(5,)], "v long")
    a = Parser.to_spark({"u": "$v :: uint64"}, schema=ctx, uint64_decimal=True)
    assert not ctx.uint64_decimal  # caller's object untouched
    out_a = df.select(*a.values())
    assert dict(out_a.dtypes)["u"] == "decimal(20,0)"
    b = Parser.to_spark({"u": "$v :: uint64"}, schema=ctx)
    out_b = df.select(*b.values())
    assert dict(out_b.dtypes)["u"] == "bigint"  # second call stays default


def test_default_mode_decimal_schema_column_not_retagged():
    # A pre-existing decimal(20,0) column (e.g. JDBC NUMBER(20)) must keep
    # the generic float tag in default mode — only the opt-in mode treats
    # decimal(20,0) as the uint64 carrier.
    from pyspark.sql.types import DecimalType

    from dftly_spark import dtypes as DT

    assert DT.tag_of_spark(DecimalType(20, 0)) == DT.F64
    assert DT.tag_of_spark(DecimalType(20, 0), uint64_decimal=True) == DT.U64
