"""Port of the reference README's executable examples (README-as-test,
SURVEY.md §5 item 2).

Each block mirrors a fixture + ops + expected output from
/root/reference/README.md, re-expressed against Spark.  Expected values are
the reference's printed Polars frames.
"""

import datetime as dt

import pytest

from dftly_spark import Parser


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(1, 3, "5", "2020-01-01", "120/80"), (2, 4, "6", "2021-06-15", "NULL")],
        "col1 long, col2 long, foo string, col3 string, bp string",
    )


def rows(df_out):
    return [tuple(r) for r in df_out.collect()]


def test_flagship_readme_block(df):
    ops = {
        "sum_": "$col1 + $col2",
        "diff": "$foo::int - $col1",
        "compare": "$col1 > ($col2 - 3) * 3",
        "str_interp": 'f"value: {$foo} {$col1}"',
        "max_": "max($col1, $col2)",
        "conditional": '"big" if $col1 > 1 else "small"',
        "sys_bp": r"extract group 1 of /(\d+)\/(\d+)/ from $bp if /(\d+)\/(\d+)/ in $bp",
        "dia_bp": r"(extract group 2 of /(\d+)\/(\d+)/ from $bp if /(\d+)\/(\d+)/ in $bp) as float",
    }
    out = rows(Parser.select(df, ops))
    assert out[0] == (4, 4, True, "value: 5 1", 3, "small", "120", 80.0)
    assert out[1] == (6, 4, False, "value: 6 2", 4, "big", None, None)


def test_date_parsing_block(df):
    ops = {
        "as_date": '$col3::"%Y-%m-%d"',
        "days_later": '($col3 as "%Y-%m-%d") + $col1::days',
        "at_time": '$col3::"%Y-%m-%d" @ 11:30 a.m.',
    }
    out = rows(Parser.select(df, ops))
    assert out[0] == (
        dt.date(2020, 1, 1), dt.date(2020, 1, 2), dt.datetime(2020, 1, 1, 11, 30),
    )
    assert out[1] == (
        dt.date(2021, 6, 15), dt.date(2021, 6, 17), dt.datetime(2021, 6, 15, 11, 30),
    )


def test_power_block(df):
    ops = {
        "squared": "$col1 ** 2",
        "cubed": "$col2 ** 3",
        "hypotenuse": "($col1**2 + $col2**2) ** 0.5",
    }
    out = rows(Parser.select(df, ops))
    assert out[0][:2] == (1, 27)
    assert out[1][:2] == (4, 64)
    assert out[0][2] == pytest.approx(3.162278, abs=1e-6)
    assert out[1][2] == pytest.approx(4.472136, abs=1e-6)


def test_dt_component_block(df):
    ops = {
        "event": '$col3::"%Y-%m-%d"',
        "year": '$col3::"%Y-%m-%d" as year_of_date',
        "month": '$col3::"%Y-%m-%d" as month_of_year',
        "day_of_week": '$col3::"%Y-%m-%d" as day_of_week',
        "quarter": '$col3::"%Y-%m-%d" as quarter_of_year',
    }
    out = rows(Parser.select(df, ops))
    assert out[0] == (dt.date(2020, 1, 1), 2020, 1, 3, 1)
    assert out[1] == (dt.date(2021, 6, 15), 2021, 6, 2, 2)


def test_duration_totals_block(df):
    ops = {
        "days_since_start": '(($col3 as "%Y-%m-%d") - 2020-01-01) as total_days',
        "hours_since_start": '(($col3 as "%Y-%m-%d") - 2020-01-01) as total_hours',
        "age_years": '(2030-01-01 - ($col3 as "%Y-%m-%d"))::total_microseconds / 31557600000000',
    }
    out = rows(Parser.select(df, ops))
    assert out[0][:2] == (0, 0)
    assert out[1][:2] == (531, 12744)
    assert out[0][2] == pytest.approx(10.001369, abs=1e-6)
    assert out[1][2] == pytest.approx(8.54757, abs=1e-5)


def test_subsecond_offsets_block(spark):
    offsets = spark.createDataFrame(
        [(dt.datetime(2020, 1, 1), 1500), (dt.datetime(2021, 6, 15), 90000)],
        "origin timestamp, measuredat long",
    )
    out = rows(Parser.select(offsets, {"measured_time": "$origin + $measuredat::milliseconds"}))
    assert out[0][0] == dt.datetime(2020, 1, 1, 0, 0, 1, 500000)
    assert out[1][0] == dt.datetime(2021, 6, 15, 0, 1, 30)


def test_cast_chain_block(spark):
    years = spark.createDataFrame(
        [("2003-2004",), ("2010-2011",)], "admissionyeargroup string"
    )
    out = rows(
        Parser.select(
            years,
            {"admit_year": "(extract /2003|2010/ from $admissionyeargroup)::int::year::datetime"},
        )
    )
    assert out == [(dt.datetime(2003, 1, 1),), (dt.datetime(2010, 1, 1),)]


def test_nonstrict_block(spark):
    messy = spark.createDataFrame(
        [("25", "2020-06-20"), ("1000 MG", "not a date"), ("1.5E-3", "2021-01-05"), ("", "2019-12-31")],
        "dose string, dod string",
    )
    ops = {
        "numeric_value": "$dose::?float64",
        "death_date": '$dod::?"%Y-%m-%d"',
    }
    out = rows(Parser.select(messy, ops))
    assert out == [
        (25.0, dt.date(2020, 6, 20)),
        (None, None),
        (0.0015, dt.date(2021, 1, 5)),
        (None, dt.date(2019, 12, 31)),
    ]


def test_regex_groups_block(spark):
    bands = spark.createDataFrame([("40-49",), ("80+",)], "agegroup string")
    regex_ops = {
        "whole_match": r"extract /^[0-9]{2}/ from $agegroup",
        "age_lo": r"extract group 1 of /^([0-9]{2})/ from $agegroup",
        "age_hi": r"(extract group 1 of /([0-9]{2}).?$/ from $agegroup)::int",
        "span": r'f"{extract group 1 of /^([0-9]{2})/ from $agegroup} to {extract group 1 of /([0-9]{2}).?$/ from $agegroup}"',
    }
    out = rows(Parser.select(bands, regex_ops))
    assert out == [("40", "40", 49, "40 to 49"), ("80", "80", 80, "80 to 80")]


def test_interpolation_block(spark):
    interp_df = spark.createDataFrame(
        [(3.7, "12345", None)], "dose double, icd string, unit string"
    )
    interp_ops = {
        "rounded": 'f"dose={$dose::int}"',
        "dotted": r'f"{extract group 1 of /^([0-9]{3})/ from $icd}.{$icd[3:]}"',
        "guarded": "f\"{$icd}//{$unit ?? 'UNK'}\"",
        "braced": 'f"{{{$icd}}}"',
    }
    out = rows(Parser.select(interp_df, interp_ops))
    assert out == [("dose=3", "123.45", "12345//UNK", "{12345}")]


def test_substring_block(spark):
    codes_df = spark.createDataFrame([("12345",), ("1",), ("A420",)], "code string")
    substring_ops = {
        "length": "len_chars($code)",
        "first_three": "$code[0:3]",
        "trailing": "$code[3:]",
        "last_two": "$code[-2:]",
        "dotted": 'f"{$code[0:3]}.{$code[3:]}" if len_chars($code) > 3 else $code',
    }
    out = rows(Parser.select(codes_df, substring_ops))
    assert out == [
        (5, "123", "45", "45", "123.45"),
        (1, "1", "", "1", "1"),
        (4, "A42", "0", "20", "A42.0"),
    ]


def test_coalesce_block(spark):
    null_df = spark.createDataFrame(
        [("x", None, None), (None, "y", 5)], "a string, b string, n long"
    )
    coalesce_ops = {
        "filled": "$a ?? 'UNK'",
        "count": "$n ?? 0",
        "first_present": "$a ?? $b ?? 'UNK'",
        "joined": "f\"{$a ?? 'UNK'}//{$b ?? 'UNK'}\"",
    }
    out = rows(Parser.select(null_df, coalesce_ops))
    assert out == [("x", 0, "x", "x//UNK"), ("UNK", 5, "y", "UNK//y")]


def test_literal_columns_block(df):
    ops = {
        "s": '"hello"',
        "i": "42",
        "f": "3.14",
        "b": "true",
        "t": "11:30 a.m.",
        "d": "2024-01-01",
        "ts": "2024-01-01 11:30 a.m.",
    }
    out = rows(Parser.select(df, ops))
    micros_1130 = (11 * 60 + 30) * 60 * 1_000_000
    expected = ("hello", 42, 3.14, True, micros_1130, dt.date(2024, 1, 1), dt.datetime(2024, 1, 1, 11, 30))
    assert out[0] == expected and out[1] == expected


def test_quoted_columns_block(spark):
    wide = spark.createDataFrame(
        [("HR", "bpm", 80), ("SpO2", "%", 97)],
        ["Variable Name", "Unit", "Value 1"],
    )
    quoted_ops = {
        "code": 'f"OBS//{$`Variable Name`}//{$`Unit`}"',
        "numeric_value": "$`Value 1`::float",
    }
    out = rows(Parser.select(wide, quoted_ops))
    assert out == [("OBS//HR//bpm", 80.0), ("OBS//SpO2//%", 97.0)]


def test_bare_words_block(df):
    ops = {
        "code": "MEDS_BIRTH",
        "col_ref": "$col1 + $col2",
        "quoted_str": '"hello"',
        "number": 42,       # YAML-parsed POD passthrough
        "bool_val": True,
    }
    out = rows(Parser.select(df, ops))
    assert out[0] == ("MEDS_BIRTH", 4, "hello", 42, True)
    assert out[1] == ("MEDS_BIRTH", 6, "hello", 42, True)


def test_explicit_dict_forms_block(df):
    ops = {
        "sum_": {"add": [{"column": "col1"}, {"column": "col2"}]},
        "compare": {
            "greater_than": [
                {"column": "col1"},
                {"multiply": [{"subtract": [{"column": "col2"}, {"literal": 3}]}, {"literal": 3}]},
            ]
        },
        "str_interp": {
            "string_interpolate": [
                {"literal": "value: {} {}"},
                {"column": "foo"},
                {"column": "col1"},
            ]
        },
        "sys_bp": {
            "conditional": {
                "when": {
                    "regex_match": {"pattern": {"literal": r"(\d+)\/(\d+)"}, "source": {"column": "bp"}}
                },
                "then": {
                    "regex_extract": {
                        "group_index": {"literal": 1},
                        "pattern": {"literal": r"(\d+)\/(\d+)"},
                        "source": {"column": "bp"},
                    }
                },
            }
        },
    }
    out = rows(Parser.select(df, ops))
    assert out[0] == (4, True, "value: 5 1", "120")
    assert out[1] == (6, False, "value: 6 2", None)
