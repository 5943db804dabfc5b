"""AST → DuckDB SQL emitter validation (dftly_spark/sqlgen.py).

The emitter is checked the same way the engine is: value-for-value
against DuckDB on real rows — but with the SQL side GENERATED from the
parsed AST instead of hand-written.  Every fuzz generator from
test_fuzz_oracle.py re-runs here with its hand-paired SQL replaced by
``to_duckdb_sql``, so emitter coverage is exactly the portable subset the
fuzzers already exercise (arithmetic/logic, strings, slices,
interpolation, datetime accessors, durations, casts, regex).
"""

from __future__ import annotations

import random

import pytest

from dftly_spark.sqlgen import SqlGenError, to_duckdb_sql

from test_fuzz_oracle import (  # noqa: E402
    Gen,
    Gen2,
    Gen3,
    GenRe,
    _canon,
    _frames,
    _frames2,
    _frames3,
    _frames4,
)
from dftly_spark import Parser


def test_emitter_exact_forms():
    sql = to_duckdb_sql("$a + $b", {"a": "int64", "b": "int64"})
    assert sql == '("a" + "b")'
    # string add becomes concat under dtype dispatch
    sql = to_duckdb_sql("$a + $b", {"a": "str", "b": "str"})
    assert sql == '("a" || "b")'
    # durations: micros bigints, truncate-toward-zero totals
    sql = to_duckdb_sql("($x - $y)::total_hours", {"x": "datetime", "y": "datetime"})
    assert "date_diff('microsecond'" in sql and "// 3600000000" in sql
    assert "CASE WHEN" in sql  # toward-zero guard
    # double -> int truncates
    sql = to_duckdb_sql("$d::int64", {"d": "float64"})
    assert sql == 'CAST(TRUNC("d") AS BIGINT)'


def test_emitter_rejects_nonportable_nodes():
    with pytest.raises(SqlGenError):
        to_duckdb_sql("hash($a)", {"a": "str"})
    with pytest.raises(SqlGenError):
        to_duckdb_sql('split($a, "")', {"a": "str"})  # empty sep diverges
    with pytest.raises(SqlGenError):
        # %s embedded in a larger format: engine reads the WHOLE source as
        # epoch seconds — only exact-'%s' is honestly portable
        to_duckdb_sql("$a::'t=%s'", {"a": "str"})
    with pytest.raises(SqlGenError):
        to_duckdb_sql("$a::'%Y-%m-%dT%H:%M:%S%::z'", {"a": "str"})


def test_emitter_split_and_epoch_forms():
    sql = to_duckdb_sql('split($a, "-")', {"a": "str"})
    assert sql == 'string_split("a", \'-\')'
    # expression separator: NULL separator must null the result (engine
    # semantics), not return the unsplit string (DuckDB's default)
    sql = to_duckdb_sql("split($a, $b)", {"a": "str", "b": "str"})
    assert "CASE WHEN" in sql and "IS NULL THEN NULL" in sql
    # canonical_lists projects the list to a chr(31)-joined string
    sql = to_duckdb_sql('split($a, "-")', {"a": "str"}, canonical_lists=True)
    assert sql.startswith("array_to_string(") and "chr(31)" in sql
    # exact-%s epoch format
    sql = to_duckdb_sql("$a::'%s'", {"a": "str"})
    assert sql == 'make_timestamp(CAST("a" AS BIGINT) * 1000000)'
    sql = to_duckdb_sql("$a::?'%s'", {"a": "str"})
    assert "TRY_CAST" in sql
    # %C%y rewrites for DuckDB exactly like the engine does
    sql = to_duckdb_sql("$a::'%C%y-%m-%d'", {"a": "str"})
    assert "'%Y-%m-%d'" in sql


def _check(spark, sdf, con, view, spec, seed):
    sql_cols = []
    for name, d in spec.items():
        sql_cols.append(f"{to_duckdb_sql(d, sdf)} AS {name}")
    sql = "SELECT " + ", ".join(sql_cols) + f" FROM {view}"
    got = Parser.select(sdf, spec).collect()
    want = con.execute(sql).fetchall()
    assert len(got) == len(want)
    for i, name in enumerate(spec):
        g = _canon([r[name] for r in got])
        w = _canon([r[i] for r in want])
        assert g == w, (
            f"column {name} mismatch (seed {seed})\n"
            f"dftly: {spec[name]}\nsqlgen: {sql_cols[i]}"
        )


@pytest.mark.parametrize("seed", range(14))
def test_sqlgen_arithmetic_fuzz(spark, seed):
    rng = random.Random(1000 + seed)  # same seeds as the paired fuzzer
    gen = Gen(rng)
    sdf, con = _frames(spark)
    spec = {}
    for i in range(5):
        d, _ = gen.num() if i % 2 == 0 else gen.boolean()
        spec[f"c{i}"] = d
    _check(spark, sdf, con, "fz", spec, seed)


@pytest.mark.parametrize("seed", range(14))
def test_sqlgen_string_datetime_fuzz(spark, seed):
    rng = random.Random(7000 + seed)
    gen = Gen2(rng, max_depth=3)
    sdf, con = _frames2(spark)
    spec = {}
    makers = [gen.str_, gen.num2, gen.boolean2]
    for i in range(6):
        d, _ = makers[i % 3]()
        spec[f"c{i}"] = d
    _check(spark, sdf, con, "fz2", spec, seed)


@pytest.mark.parametrize("seed", range(14))
def test_sqlgen_duration_fuzz(spark, seed):
    rng = random.Random(31000 + seed)
    gen = Gen3(rng)
    sdf, con = _frames3(spark)
    spec = {}
    makers = [gen.num3, gen.dt, gen.boolean3]
    for i in range(6):
        d, _ = makers[i % 3]()
        spec[f"c{i}"] = d
    _check(spark, sdf, con, "fz3", spec, seed)


@pytest.mark.parametrize("seed", range(14))
def test_sqlgen_regex_fuzz(spark, seed):
    rng = random.Random(91000 + seed)
    gen = GenRe(rng)
    sdf, con = _frames4(spark)
    spec = {}
    for i in range(6):
        d, _ = gen.produce()
        spec[f"c{i}"] = d
    _check(spark, sdf, con, "fz4", spec, seed)


def test_sqlgen_strptime_matches_engine(spark):
    """strptime emits verbatim chrono formats; date/datetime/time kinds and
    the non-strict null path all value-match the engine."""
    import duckdb

    from pyspark.sql import functions as F

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    sdf = o.select(
        F.col("o_orderkey").alias("k"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("ds"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("dts"),
        F.date_format("o_orderdate", "HH:mm:ss").alias("ts_s"),
    )
    con = duckdb.connect()
    con.execute(
        """
        CREATE VIEW fz5 AS
        SELECT o_orderkey AS k, strftime(o_orderdate, '%Y-%m-%d') AS ds,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS dts,
               strftime(o_orderdate, '%H:%M:%S') AS ts_s
        FROM '/root/testdata/sf0.001/orders.parquet'
        """
    )
    spec = {
        "d": "$ds::'%Y-%m-%d'",
        "dt": "$dts::'%Y-%m-%d %H:%M:%S'",
        "t_us": "$ts_s::'%H:%M:%S'",
        "bad": "$ds::?'%d/%m/%Y'",
    }
    _check(spark, sdf, con, "fz5", spec, seed="strptime")


def test_sqlgen_strptime_locale_and_pad_codes(spark):
    """C-locale composites (%c anywhere, %x/%X/%r) and space-padded codes
    (%e/%k/%l) emit DuckDB-portable expansions + the engine's replayed
    whitespace/pad strips — value parity on real rows."""
    import duckdb

    from pyspark.sql import functions as F

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    # C-locale print form: "Sun Jul  8 00:34:59 2001" (day space-padded).
    # Build it engine-side with concat so both engines read identical bytes.
    c_form = F.concat(
        F.date_format("o_orderdate", "EEE MMM"),
        F.lit(" "),
        F.lpad(F.date_format("o_orderdate", "d"), 2, " "),
        F.lit(" 10:34:59 "),
        F.date_format("o_orderdate", "yyyy"),
    )
    sdf = o.select(
        F.col("o_orderkey").alias("k"),
        c_form.alias("cs"),
        F.concat(F.lit("["), c_form, F.lit("]")).alias("csb"),
        F.date_format("o_orderdate", "MM/dd/yy").alias("xs"),
        F.lpad(F.date_format("o_orderdate", "d"), 2, " ").alias("es"),
        F.date_format("o_orderdate", "MM/yyyy").alias("my"),
    ).withColumn("eds", F.concat(F.col("es"), F.lit("/"), F.col("my")))
    con = duckdb.connect()
    con.execute(
        """
        CREATE VIEW fz7 AS
        SELECT o_orderkey AS k,
               concat(strftime(o_orderdate, '%a %b '),
                      lpad(strftime(o_orderdate, '%-d'), 2, ' '),
                      ' 10:34:59 ', strftime(o_orderdate, '%Y')) AS cs,
               concat('[', strftime(o_orderdate, '%a %b '),
                      lpad(strftime(o_orderdate, '%-d'), 2, ' '),
                      ' 10:34:59 ', strftime(o_orderdate, '%Y'), ']') AS csb,
               strftime(o_orderdate, '%m/%d/%y') AS xs,
               concat(lpad(strftime(o_orderdate, '%-d'), 2, ' '),
                      strftime(o_orderdate, '/%m/%Y')) AS eds
        FROM '/root/testdata/sf0.001/orders.parquet'
        """
    )
    spec = {
        "c_dt": "$cs::'%c'",
        "c_mid": "$csb::'[%c]'",
        "x_d": "$xs::'%x'",
        "e_d": "$eds::'%e/%m/%Y'",
    }
    _check(
        spark,
        sdf.select("k", "cs", "csb", "xs", "eds"),
        con,
        "fz7",
        spec,
        seed="strptime-locale",
    )


def test_sqlgen_power_int_recast(spark):
    import duckdb

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    sdf = li.select("l_orderkey", "l_linenumber", "l_discount")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW fz6 AS SELECT l_orderkey, l_linenumber, l_discount "
        "FROM '/root/testdata/sf0.001/lineitem.parquet'"
    )
    spec = {
        "sq": "$l_linenumber ** 2",
        "cube": "$l_linenumber ** 3",
        "dsq": "$l_discount ** 2",
    }
    _check(spark, sdf, con, "fz6", spec, seed="power")


def test_sqlgen_literal_percent_x_is_not_locale_code():
    from dftly_spark.parser import Parser
    from dftly_spark.sqlgen import SqlGenError, to_duckdb_sql

    node = Parser()({"strptime": {"source": {"column": "s"},
                                  "format": {"literal": "%H:%M %%x"}}})
    sql = to_duckdb_sql(node, {"s": "str"})
    assert "%%x" in sql  # literal percent survives, not expanded as %x
    # a REAL %x is the C-locale date layout: emitted as its expansion
    # (DuckDB's own %x is an ISO layout, never emitted verbatim)
    real = Parser()({"strptime": {"source": {"column": "s"},
                                  "format": {"literal": "%x"}}})
    assert "%m/%d/%y" in to_duckdb_sql(real, {"s": "str"})


@pytest.mark.parametrize("seed", range(10))
def test_sqlgen_split_fuzz(spark, seed):
    """split / split-of-slice value parity: lists compare value-for-value
    via the chr(31) canonical projection on BOTH engines (q20 convention,
    now owned by the emitter)."""
    from dftly_spark.sqlgen import canonicalize_list_columns

    rng = random.Random(53000 + seed)
    gen = Gen2(rng, max_depth=2)
    sdf, con = _frames2(spark)
    spec = {}
    for i in range(5):
        src_d, _ = gen.str_()
        if i == 4:  # expression separator (status char; appears in data)
            spec[f"c{i}"] = f"split({src_d}, $stat)"
        else:
            sep = rng.choice(["-", "R", "E", " ", "1"])
            spec[f"c{i}"] = f'split({src_d}, "{sep}")'
    sql_cols = [
        f"{to_duckdb_sql(d, sdf, canonical_lists=True)} AS {n}"
        for n, d in spec.items()
    ]
    got = canonicalize_list_columns(Parser.select(sdf, spec)).collect()
    want = con.execute("SELECT " + ", ".join(sql_cols) + " FROM fz2").fetchall()
    assert len(got) == len(want)
    for i, name in enumerate(spec):
        g = _canon([r[name] for r in got])
        w = _canon([r[i] for r in want])
        assert g == w, f"column {name} mismatch (seed {seed})\n{spec[name]}"


def test_sqlgen_epoch_seconds_matches_engine(spark):
    import duckdb

    sdf = spark.createDataFrame(
        [("0",), ("86400",), ("-1",), ("1718409600",), ("not a number",), (None,)],
        "es string",
    )
    spec = {"t": "$es::?'%s'"}
    got = sorted(
        (str(r["t"]) for r in Parser.select(sdf, spec).collect()),
    )
    con = duckdb.connect()
    sql = to_duckdb_sql(spec["t"], sdf)
    want = sorted(
        str(r[0])
        for r in con.execute(
            f"SELECT {sql} AS t FROM (VALUES ('0'), ('86400'), ('-1'), "
            "('1718409600'), ('not a number'), (NULL)) v(es)"
        ).fetchall()
    )
    assert got == want


def test_sqlgen_split_runtime_edge_separators(spark):
    """Expression separators that are '' or contain a literal backslash-E
    at RUNTIME must still value-match: '' yields chars + trailing empty on
    both engines (list_append mirror), backslash-E survives the engine's
    re-quoting, NULL source/separator stay NULL."""
    import duckdb

    from dftly_spark.sqlgen import canonicalize_list_columns

    df = spark.createDataFrame(
        [("ab", ""), ("ab", "a"), ("x\\Ey", "\\E"), (None, "x"), ("ab", None)],
        "s string, sep string",
    )
    spec = {"r": "split($s, $sep)"}
    got = sorted(
        str(r["r"])
        for r in canonicalize_list_columns(Parser.select(df, spec)).collect()
    )
    sql = to_duckdb_sql(spec["r"], df, canonical_lists=True)
    want = sorted(
        str(r[0])
        for r in duckdb.sql(
            "SELECT " + sql + " FROM (VALUES ('ab',''),('ab','a'),"
            "('x\\Ey','\\E'),(NULL,'x'),('ab',NULL)) v(s, sep)"
        ).fetchall()
    )
    assert got == want


def test_portable_convention_pairs_agree(spark):
    """The round-7 convention helpers: the Spark column and DuckDB text of
    each pair must produce IDENTICAL values on the same rows — one
    definition of the exact-sum / quantization / rounding conventions."""
    import duckdb

    from dftly_spark.sqlgen import (
        exact_quant,
        exact_quant_sql,
        exact_sum,
        exact_sum_sql,
        portable_round,
        portable_round_sql,
    )

    from pyspark.sql import functions as F

    vals = [0.12345, 10000.5, -3.14159, 12345.00005, 0.0000005, -0.5]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    con = duckdb.connect()
    rows = ",".join(f"({v!r})" for v in vals)

    s_spark = df.agg(exact_sum(F.col("x")).alias("s")).collect()[0]["s"]
    s_duck = con.sql(
        f"SELECT {exact_sum_sql('x')} FROM (VALUES {rows}) v(x)"
    ).fetchone()[0]
    assert s_spark == s_duck

    q_spark = [r["q"] for r in df.select(exact_quant(F.col("x")).alias("q")).collect()]
    q_duck = [r[0] for r in con.sql(
        f"SELECT {exact_quant_sql('x')} FROM (VALUES {rows}) v(x)"
    ).fetchall()]
    assert sorted(q_spark) == sorted(q_duck)

    r_spark = [r["r"] for r in df.select(portable_round(F.col("x"), 4).alias("r")).collect()]
    r_duck = [r[0] for r in con.sql(
        f"SELECT {portable_round_sql('x', 4)} FROM (VALUES {rows}) v(x)"
    ).fetchall()]
    assert sorted(r_spark) == sorted(r_duck)


def test_agg_oracle_sql_assembles_and_runs(spark):
    """agg_oracle_sql: scalars machine-emitted from dftly expressions,
    skeleton declarative; the assembled SQL must match the Spark frame."""
    import duckdb

    from dftly_spark.sqlgen import agg_oracle_sql, exact_sum

    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    got = sorted(
        map(tuple, li.groupBy("l_returnflag").agg(
            exact_sum(Parser.expr_to_spark(
                "$l_extendedprice * (1 - $l_discount)", schema=li)).alias("rev"),
            F.count(F.lit(1)).alias("n"),
        ).collect())
    )
    sql = agg_oracle_sql(
        "lineitem",
        {
            "l_returnflag": ("expr", "$l_returnflag"),
            "rev": ("exact_sum", "$l_extendedprice * (1 - $l_discount)"),
            "n": ("count", None),
        },
        {"l_returnflag": "str", "l_extendedprice": "float64",
         "l_discount": "float64"},
        group_by=("l_returnflag",),
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_oracle_text_uses_shared_float_conventions():
    """Every contract oracle must use the portable floor-scale rounding
    convention, never round(): Spark HALF_UP and DuckDB's float-multiply
    round disagree exactly at the .5*10^-d boundary (the knife-edge class
    swept out in round 8), and the floor-scale fragments hand-inlined in
    oracle literals must keep the ONE template shape portable_round_sql /
    exact_quant_sql define — this test is the drift guard for them."""
    import re

    import __spark_entry__ as e

    for name, sql in e.oracle_sql().items():
        # round( reintroduction is the regression this guards against;
        # 'portable_round'-style python identifiers never appear in SQL
        assert not re.search(r"(?<![\w.])round\(", sql, re.I), (
            f"{name}: oracle uses round() — use the floor-scale convention"
        )
        # floor-scale fragments must multiply and divide by the SAME
        # power of ten (a mismatched pair silently rescales the output).
        # Two shapes exist: plain portable-round
        #   floor((x) * P + 0.5) / P
        # and the integer exact-sum/quantization wrapper
        #   SUM(CAST(floor(x * P + 0.5) AS BIGINT)) ... / P[.0]
        # In both, the divisor follows within a bounded tail of casts and
        # closing parens — match it and compare.
        for m in re.finditer(
            r"floor\(.*?\*\s*(\d+)\s*\+\s*0\.5\s*\)"       # multiplier
            r"[\sA-Za-z()_,0-9]{0,80}?"                    # cast/paren tail
            r"/\s*(\d+)(?:\.0)?",                          # divisor
            sql,
            re.S | re.I,
        ):
            mul, div = int(m.group(1)), int(m.group(2))
            assert mul == div, (
                f"{name}: floor-scale multiplier {mul} != divisor {div}"
            )
            assert mul in (10, 100, 1000, 10000, 10**5, 10**6, 10**7, 10**8, 10**9), (
                f"{name}: non-power-of-ten floor scale {mul}"
            )


def test_float_convention_guards_on_unguarded_inputs(spark):
    """The shared conventions must not silently diverge on NaN / huge
    magnitudes (Spark's LongType floor maps NaN to 0 and wraps past
    int64; DuckDB's double floor keeps them).  portable_round passes
    them through IDENTICALLY on both engines; exact_sum is LOUD on both
    (DuckDB's BIGINT cast raises, Spark's guard raises)."""
    import math

    import duckdb

    from pyspark.sql import functions as F
    from dftly_spark.sqlgen import (
        exact_sum,
        exact_sum_sql,
        portable_round,
        portable_round_sql,
    )

    vals = [1.2345675, float("nan"), 1e300, -1e300, float("inf"), None, 0.5e-6]
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        r["y"]
        for r in sdf.select(portable_round(F.col("x")).alias("y")).collect()
    ]
    con = duckdb.connect()
    exp = [
        con.execute(
            f"SELECT {portable_round_sql('x')} FROM (SELECT CAST(? AS DOUBLE) x)",
            [v],
        ).fetchone()[0]
        for v in vals
    ]
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        if g is None or e is None:
            assert g is None and e is None
        elif math.isnan(e):
            assert math.isnan(g)
        else:
            assert g == e  # bit-identical double math on both engines
    assert math.isnan(got[1]) and got[2] == 1e300 and math.isinf(got[4])

    # exact_sum: loud on BOTH engines for NaN input
    import pytest as _pytest

    with _pytest.raises(Exception, match="exact_sum"):
        sdf.agg(exact_sum(F.col("x")).alias("s")).collect()
    with _pytest.raises(Exception):
        con.execute(
            f"SELECT {exact_sum_sql('x')} FROM (SELECT 'nan'::DOUBLE x)"
        ).fetchone()
    # ...and still exact on guarded input
    ok = sdf.where(~F.isnan("x") & (F.abs("x") < 1e9))
    s = ok.agg(exact_sum(F.col("x")).alias("s")).collect()[0]["s"]
    assert s == con.execute(
        f"SELECT {exact_sum_sql('x')} FROM (VALUES (1.2345675), (0.0000005)) t(x)"
    ).fetchone()[0]


def test_exact_sum_total_overflow_is_loud(spark):
    """Per-row values can be in range while the TOTAL leaves int64: the
    decimal accumulation must catch it and raise (as DuckDB's outer
    BIGINT cast does), never wrap a long partial sum silently."""
    from pyspark.sql import functions as F
    from dftly_spark.sqlgen import exact_sum

    # 4 rows of 5e9 at scale=1e9 -> scaled rows 5e18 (in range),
    # total 2e19 > 2^63-1
    sdf = spark.createDataFrame([(5.0e9,)] * 4, "x double")
    import pytest as _pytest

    with _pytest.raises(Exception, match="exceeds int64"):
        sdf.agg(exact_sum(F.col("x"), scale=10**9).alias("s")).collect()
    # in-range total still exact
    ok = spark.createDataFrame([(1.5,), (2.25,)], "x double")
    assert ok.agg(exact_sum(F.col("x")).alias("s")).collect()[0]["s"] == 3.75
    # all-null / empty input stays null, not an error
    nl = spark.createDataFrame([(None,)], "x double")
    assert nl.agg(exact_sum(F.col("x")).alias("s")).collect()[0]["s"] is None


def test_sqlgen_rejects_uint64_decimal_mode():
    """The emitter mirrors the DEFAULT lowering only: asking for a
    generated oracle under the opt-in strict-unsigned mode must raise
    loudly naming the mode, never silently emit a default-mode mirror
    (which disagrees on every out-of-range uint64)."""
    from dftly_spark.sqlgen import SqlGenError, spec_to_duckdb_sql

    with pytest.raises(SqlGenError, match="uint64_decimal"):
        to_duckdb_sql("$a :: uint64", {"a": "int64"}, uint64_decimal=True)
    with pytest.raises(SqlGenError, match="uint64_decimal"):
        spec_to_duckdb_sql(
            {"u": "$a :: uint64"}, {"a": "int64"}, uint64_decimal=True
        )
    # default mode unaffected
    assert "CAST" in to_duckdb_sql("$a :: uint64", {"a": "int64"}).upper()
