"""String-form grammar → base-form dict spec.

Expected dicts are the reference's lark-transformer doctest outputs
(/root/reference/src/dftly/str_form/parser.py) — the spec of the string form.
No Spark session needed.
"""

import datetime as dt

import pytest

from dftly_spark.strform.parser import parse_str

CASES = [
    ("1 + 2 * 3", {"add": [{"literal": 1}, {"multiply": [{"literal": 2}, {"literal": 3}]}]}),
    ("2023 - 01 - 01", {"subtract": [{"subtract": [{"literal": 2023}, {"literal": 1}]}, {"literal": 1}]}),
    (
        "1 / (2 + 3) > 0.1",
        {"greater_than": [{"divide": [{"literal": 1}, {"add": [{"literal": 2}, {"literal": 3}]}]}, {"literal": 0.1}]},
    ),
    (
        "5 == 2 + 3 and 4 < 10",
        {
            "and": [
                {"equal": [{"literal": 5}, {"add": [{"literal": 2}, {"literal": 3}]}]},
                {"less_than": [{"literal": 4}, {"literal": 10}]},
            ]
        },
    ),
    (
        "equal(add(1, multiply(2, 3)), 7)",
        {"equal": [{"add": [{"literal": 1}, {"multiply": [{"literal": 2}, {"literal": 3}]}]}, {"literal": 7}]},
    ),
    ("true or false and false", {"or": [{"literal": True}, {"and": [{"literal": False}, {"literal": False}]}]}),
    ("1", {"literal": 1}),
    ("3.14", {"literal": 3.14}),
    ("true", {"literal": True}),
    ("'hello'", {"literal": "hello"}),
    ("11:32 a.m.", {"literal": dt.time(11, 32)}),
    ("2023-01-01", {"literal": dt.date(2023, 1, 1)}),
    ("2023-01-01 12:34:56", {"literal": dt.datetime(2023, 1, 1, 12, 34, 56)}),
    ("$a + $b * 3", {"add": [{"column": "a"}, {"multiply": [{"column": "b"}, {"literal": 3}]}]}),
    ("$`Variable Name`", {"column": "Variable Name"}),
    (
        "$`Variable Name`::float + 1",
        {"add": [{"cast": {"source": {"column": "Variable Name"}, "type": {"literal": "float"}}}, {"literal": 1}]},
    ),
    ('f"OBS//{$`Variable Name`}"', {"string_interpolate": [{"literal": "OBS//{}"}, "$`Variable Name`"]}),
    ("'hello' + ' ' + 'world'", {"add": [{"add": [{"literal": "hello"}, {"literal": " "}]}, {"literal": "world"}]}),
    ("f'hello {$name}'", {"string_interpolate": [{"literal": "hello {}"}, "$name"]}),
    (
        "'big' if $a > 5",
        {"conditional": {"when": {"greater_than": [{"column": "a"}, {"literal": 5}]}, "then": {"literal": "big"}}},
    ),
    (
        "'big' if $a > 5 else 'small'",
        {
            "conditional": {
                "when": {"greater_than": [{"column": "a"}, {"literal": 5}]},
                "then": {"literal": "big"},
                "otherwise": {"literal": "small"},
            }
        },
    ),
    (r"extract /\d+/ from $text", {"regex_extract": {"pattern": {"literal": "\\d+"}, "source": {"column": "text"}}}),
    (r"/\d+/ in $text", {"regex_match": {"pattern": {"literal": "\\d+"}, "source": {"column": "text"}}}),
    ("4 + '3'::int", {"add": [{"literal": 4}, {"cast": {"source": {"literal": "3"}, "type": {"literal": "int"}}}]}),
    (
        "'2023-' + '01-' + '01' as date",
        {
            "cast": {
                "source": {"add": [{"add": [{"literal": "2023-"}, {"literal": "01-"}]}, {"literal": "01"}]},
                "type": {"literal": "date"},
            }
        },
    ),
    (
        "$dosage::?float64",
        {"cast": {"source": {"column": "dosage"}, "type": {"literal": "float64"}, "strict": {"literal": False}}},
    ),
    (
        "$dosage as ?float64",
        {"cast": {"source": {"column": "dosage"}, "type": {"literal": "float64"}, "strict": {"literal": False}}},
    ),
    (
        "$yr::int::year",
        {"cast": {"source": {"cast": {"source": {"column": "yr"}, "type": {"literal": "int"}}}, "type": {"literal": "year"}}},
    ),
    (
        "$dosage::?float64::str",
        {
            "cast": {
                "source": {"cast": {"source": {"column": "dosage"}, "type": {"literal": "float64"}, "strict": {"literal": False}}},
                "type": {"literal": "str"},
            }
        },
    ),
    ("not true", {"not": [{"literal": True}]}),
    ("-5", {"negate": [{"literal": 5}]}),
    ("MEDS_BIRTH", {"bare_word": "MEDS_BIRTH"}),
    ("hello_world", {"bare_word": "hello_world"}),
    ("$col + TYPO", {"add": [{"column": "col"}, {"bare_word": "TYPO"}]}),
    ("min($a, $b, $c)", {"min": [{"column": "a"}, {"column": "b"}, {"column": "c"}]}),
    ("max(1, 2)", {"max": [{"literal": 1}, {"literal": 2}]}),
    (
        "'2023-01-01 12:34:56' as '%Y-%m-%d %H:%M:%S'",
        {"strptime": {"format": {"literal": "%Y-%m-%d %H:%M:%S"}, "source": {"literal": "2023-01-01 12:34:56"}}},
    ),
    (
        "'2023 01 01'::'%Y %m %d'",
        {"strptime": {"format": {"literal": "%Y %m %d"}, "source": {"literal": "2023 01 01"}}},
    ),
    (
        '$dod::?"%Y-%m-%d %H:%M:%S"',
        {"strptime": {"format": {"literal": "%Y-%m-%d %H:%M:%S"}, "source": {"column": "dod"}, "strict": {"literal": False}}},
    ),
    ("$a ?? 'UNK'", {"coalesce": [{"column": "a"}, {"literal": "UNK"}]}),
    (
        "$a ?? $b ?? 'UNK'",
        {"coalesce": [{"coalesce": [{"column": "a"}, {"column": "b"}]}, {"literal": "UNK"}]},
    ),
    ("$x or $y ?? $z", {"coalesce": [{"or": [{"column": "x"}, {"column": "y"}]}, {"column": "z"}]}),
    ("$code[0:3]", {"substring": {"source": {"column": "code"}, "start": {"literal": 0}, "stop": {"literal": 3}}}),
    ("$code[3:]", {"substring": {"source": {"column": "code"}, "start": {"literal": 3}}}),
    ("$code[:3]", {"substring": {"source": {"column": "code"}, "start": {"literal": 0}, "stop": {"literal": 3}}}),
    ("$code[:]", {"substring": {"source": {"column": "code"}, "start": {"literal": 0}}}),
    (
        "$code[-3:-1]",
        {"substring": {"source": {"column": "code"}, "start": {"negate": [{"literal": 3}]}, "stop": {"negate": [{"literal": 1}]}}},
    ),
    (
        "$code[0:5][1:3]",
        {
            "substring": {
                "source": {"substring": {"source": {"column": "code"}, "start": {"literal": 0}, "stop": {"literal": 5}}},
                "start": {"literal": 1},
                "stop": {"literal": 3},
            }
        },
    ),
    (
        "($a + $b)[0:3]",
        {"substring": {"source": {"add": [{"column": "a"}, {"column": "b"}]}, "start": {"literal": 0}, "stop": {"literal": 3}}},
    ),
    ("$code[10:30]", {"substring": {"source": {"column": "code"}, "start": {"literal": 10}, "stop": {"literal": 30}}}),
    ("substring($code, 0, 3)", {"substring": {"source": {"column": "code"}, "start": {"literal": 0}, "stop": {"literal": 3}}}),
    ("substring($code, 3)", {"substring": {"source": {"column": "code"}, "start": {"literal": 3}}}),
    ('split($icd9code, ", ")', {"split": {"source": {"column": "icd9code"}, "by": {"literal": ", "}}}),
    ("split($a, $sep)", {"split": {"source": {"column": "a"}, "by": {"column": "sep"}}}),
    ("$event::hour_of_day", {"dt_hour_of_day": [{"column": "event"}]}),
    ("$event as hour_of_day", {"dt_hour_of_day": [{"column": "event"}]}),
    ("len_chars($code)", {"len_chars": [{"column": "code"}]}),
    (
        "2 ** -3 ** 2",
        {"power": [{"literal": 2}, {"power": [{"negate": [{"literal": 3}]}, {"literal": 2}]}]},
    ),
    (
        "/^a/ in $x and /^1/ in $y",
        {
            "and": [
                {"regex_match": {"pattern": {"literal": "^a"}, "source": {"column": "x"}}},
                {"regex_match": {"pattern": {"literal": "^1"}, "source": {"column": "y"}}},
            ]
        },
    ),
    (
        "/re/ in $a + $b",
        {"regex_match": {"pattern": {"literal": "re"}, "source": {"add": [{"column": "a"}, {"column": "b"}]}}},
    ),
]


@pytest.mark.parametrize("src,expected", CASES, ids=[c[0][:40] for c in CASES])
def test_parse(src, expected):
    assert parse_str(src) == expected


def test_equivalences():
    assert parse_str("$`a`") == parse_str("$a")
    assert parse_str("$yr::int::year") == parse_str("(($yr)::int)::year")
    assert parse_str("$yr as int as year") == parse_str("$yr::int::year")
    assert parse_str("$a ?? 'UNK'") == parse_str("coalesce($a, 'UNK')")


ERROR_CASES = [
    ("???", None),
    ("nonexistent_fn($a)", "Unsupported function"),
    ("$``", None),
    ("$ts::?hour_of_day", "Non-strict casting"),
    ("$code[10:30:45]", "does not support step"),
    ("+5", "Unsupported unary operator"),
    ("1 < 2 < 3", None),  # comparisons are non-associative
]


@pytest.mark.parametrize("src,msg", ERROR_CASES, ids=[c[0] for c in ERROR_CASES])
def test_parse_errors(src, msg):
    with pytest.raises(ValueError) as exc:
        parse_str(src)
    assert "Failed to parse expression" in str(exc.value)
    if msg:
        assert msg in str(exc.value)


def test_parenthesization_is_transparent():
    """Wrapping any full expression in parens yields the identical tree."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    names = st.from_regex(r"[a-z_][a-z0-9_]{0,8}", fullmatch=True).filter(
        lambda s: s not in {"and", "or", "not", "if", "else", "as", "in",
                            "extract", "group", "of", "from", "true", "false"}
    )

    @st.composite
    def exprs(draw, depth=2):
        choice = draw(st.integers(0, 5 if depth > 0 else 1))
        if choice == 0:
            return f"${draw(names)}"
        if choice == 1:
            return str(draw(st.integers(0, 10**6)))
        a = draw(exprs(depth=depth - 1))
        b = draw(exprs(depth=depth - 1))
        if choice == 2:
            op = draw(st.sampled_from(["+", "-", "*", "/", "??", "**"]))
            return f"{a} {op} {b}"
        if choice == 3:
            return f"coalesce({a}, {b})"
        if choice == 4:
            return f"{a}::float64"
        return f"{a} if ({b} > 0)"

    @given(exprs())
    @settings(max_examples=150, deadline=None)
    def check(e):
        assert parse_str(f"({e})") == parse_str(e)

    check()


def test_parser_never_crashes_on_garbage():
    """Arbitrary input either parses or raises ValueError — nothing else."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.text(max_size=40))
    @settings(max_examples=300, deadline=None)
    def check(s):
        try:
            parse_str(s)
        except ValueError:
            pass

    check()


def test_regex_binds_like_comparison():
    tree = parse_str("extract /(a)(b)/ from $bp if /(a)(b)/ in $bp")
    assert list(tree) == ["conditional"]
    assert list(tree["conditional"]["then"]) == ["regex_extract"]
    assert list(parse_str(r"extract /\d+/ from $n::str")) == ["regex_extract"]
    assert list(parse_str(r"extract /\d+/ from $n as str")) == ["cast"]


@pytest.mark.parametrize(
    "expr, start, stop",
    [
        ("$x[3:100]", 3, 100),   # TIME lexer must not eat "3:10" (fuzzer find)
        ("$x[1:234]", 1, 234),
        ("$x[10:30]", 10, 30),   # the classic HH:MM-shaped slice still works
        ("$x[0:59]", 0, 59),
    ],
)
def test_slice_bounds_never_lex_as_time(expr, start, stop):
    from dftly_spark.strform.parser import parse_str

    sub = parse_str(expr)["substring"]
    assert sub["start"] == {"literal": start}
    assert sub["stop"] == {"literal": stop}


def test_time_literal_after_at_still_lexes():
    from dftly_spark.strform.parser import parse_str

    assert "set_time" in parse_str("$d @ 12:30")
