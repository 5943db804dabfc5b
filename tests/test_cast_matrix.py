"""Strict/non-strict cast parity matrix, under default AND ANSI sessions.

The reference's cast contract (types.py:139-156): strict casts raise on any
non-null value that fails to convert; non-strict (``::?``) casts null it.
Spark's session-level ``spark.sql.ansi.enabled`` flag changes what a *plain*
``CAST`` does, so the engine must behave identically under both settings —
strict lowering uses ``try_cast`` + an explicit ``raise_error`` guard, never
the ANSI-dependent bare cast, for any fallible conversion.
"""

import pytest

# (expr, kwargs, expect) — expect: value, "RAISE", or None
CASES = [
    # string → number
    ("$s::int64", {"s": "42"}, 42),
    ("$s::int64", {"s": "nope"}, "RAISE"),
    ("$s::?int64", {"s": "nope"}, None),
    ("$s::float64", {"s": "1.5"}, 1.5),
    ("$s::float64", {"s": "x"}, "RAISE"),
    ("$s::?float64", {"s": "x"}, None),
    # float → int truncates (Polars), never raises on fractional
    ("$f::int32", {"f": 3.7}, 3),
    ("$f::int32", {"f": -3.7}, -3),
    # overflow: int64 → int8
    ("$i::int8", {"i": 300}, "RAISE"),
    ("$i::?int8", {"i": 300}, None),
    ("$i::int8", {"i": 100}, 100),
    # string → time
    ("$s::time", {"s": "13:45:00"}, (13 * 3600 + 45 * 60) * 1_000_000),
    ("$s::time", {"s": "not a time"}, "RAISE"),
    ("$s::?time", {"s": "not a time"}, None),
    # null passes through strict casts untouched (no raise)
    ("$s::int64", {"s": None}, None),
    ("$s::time", {"s": None}, None),
]


@pytest.fixture(params=[False, True], ids=["default", "ansi"])
def ansi_session(request, spark):
    old = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", str(request.param).lower())
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", old)


@pytest.mark.parametrize("expr, data, want", CASES)
def test_cast_matrix(ansi_session, run1, expr, data, want):
    # None-valued inputs need an explicit schema (type can't be inferred).
    kwargs = {}
    if any(v is None for v in data.values()):
        col = next(iter(data))
        typ = "string" if col == "s" else "bigint"
        got = _run_with_schema(ansi_session, expr, col, typ, want)
        return
    if want == "RAISE":
        with pytest.raises(Exception, match="strict cast|USER_RAISED"):
            run1(expr, **data)
    else:
        got = run1(expr, **data)
        assert got == want


def _run_with_schema(spark, expr, col, typ, want):
    from dftly_spark import Parser

    df = spark.createDataFrame([(None,)], f"{col} {typ}")
    got = df.select(Parser.expr_to_spark(expr, schema=df).alias("v")).collect()[0][0]
    assert got == want
    return got


# ---------------------------------------------------------------------------
# Integer range extremes (SURVEY §1.2 caveats, pinned as contracts):
# int128 lowers to decimal(38,0) — 38 decimal digits, NOT the full 2^127;
# uint64 lowers to bigint — values above 2^63-1 do not fit.
# ---------------------------------------------------------------------------


def test_int128_full_38_digits(run1):
    v = int("9" * 38)
    assert run1("$s::int128", s=str(v)) == v


def test_int128_beyond_decimal38_raises_strict(run1):
    import pytest

    with pytest.raises(Exception, match="strict cast|USER_RAISED"):
        run1("$s::int128", s=str(2**127 - 1))  # 39 digits: reference fits, decimal(38,0) cannot


def test_uint64_up_to_int63_max(run1):
    v = 2**63 - 1
    assert run1("$s::uint64", s=str(v)) == v


def test_uint64_above_long_raises_strict(run1):
    import pytest

    with pytest.raises(Exception, match="strict cast|USER_RAISED"):
        run1("$s::uint64", s=str(2**63))  # reference accepts up to 2^64-1; bigint cannot
