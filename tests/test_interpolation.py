"""Interpolation splitter unit + property tests.

Property suite mirrors the reference's Hypothesis approach
(/root/reference/tests/test_interpolation_properties.py): a field carries its
expression verbatim, and literal text round-trips with ``{{``/``}}`` escapes.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dftly_spark.strform.interpolation import _find_field_end, split_interpolation


@pytest.mark.parametrize(
    "pattern,expected",
    [
        ("hello {$name}", ("hello {}", ["$name"])),
        ("{{literal}} {$a} and {$b}", ("{literal} {} and {}", ["$a", "$b"])),
        ("{$dose::?float64} {$code[0:3]}", ("{} {}", ["$dose::?float64", "$code[0:3]"])),
        ("no fields at all", ("no fields at all", [])),
    ],
)
def test_split(pattern, expected):
    assert split_interpolation(pattern) == expected


@pytest.mark.parametrize(
    "pattern,start,stop",
    [
        ("{$a} rest", 1, 3),
        ("{extract /a{2}/ from $x}", 1, 23),  # regex quantifier brace
        ("{/}/ in $x}", 1, 10),  # brace inside a regex literal
        ("{$a ?? '}'}", 1, 10),  # brace inside a string literal
        ("{$`}`}", 1, 5),  # brace inside a quoted column name
        ("{($a / $a)}{extract /0/ from $x}", 1, 10),  # division is not a regex
    ],
)
def test_find_field_end(pattern, start, stop):
    assert _find_field_end(pattern, start) == stop


@pytest.mark.parametrize(
    "pattern,msg",
    [
        ("{$a", "Unterminated interpolation field"),
        ("{$a $b}", "Invalid expression"),
        ("{$a # 1}", "Cannot lex"),
        ("a } b", "Unmatched `}`"),
        ("a {} b", "Empty interpolation field"),
    ],
)
def test_split_errors(pattern, msg):
    with pytest.raises(ValueError, match=""):
        try:
            split_interpolation(pattern)
        except ValueError as e:
            assert msg in str(e)
            raise


# ---------------------------------------------------------------------------
# Property suite: generated expressions survive interpolation verbatim.
# ---------------------------------------------------------------------------

_names = st.from_regex(r"[a-z_][a-z0-9_]{0,8}", fullmatch=True).filter(
    lambda s: s.lower() not in {"and", "or", "not", "if", "else", "as", "in",
                                "extract", "group", "of", "from", "true", "false"}
)


@st.composite
def exprs(draw, depth=2):
    """Random dftly expression strings from several grammar constructs."""
    choice = draw(st.integers(0, 7 if depth > 0 else 3))
    if choice == 0:
        return f"${draw(_names)}"
    if choice == 1:
        return str(draw(st.integers(0, 10**6)))
    if choice == 2:
        text = draw(st.text(alphabet=st.characters(blacklist_characters="'\\\"\n"), max_size=8))
        return f"'{text}'"
    if choice == 3:
        bt_name = draw(
            st.text(
                alphabet=st.characters(blacklist_characters="`\n"), min_size=1, max_size=8
            )
        )
        return "$`" + bt_name + "`"
    a = draw(exprs(depth=depth - 1))
    b = draw(exprs(depth=depth - 1))
    if choice == 4:
        op = draw(st.sampled_from(["+", "-", "*", "/", "??", "==", "<"]))
        # always parenthesize operands: comparisons are non-associative, and
        # an unparenthesized comparison INSIDE an arithmetic operand would
        # chain through precedence (`a == b + c == d`) and be rejected
        return f"({a}) {op} ({b})"
    if choice == 5:
        return f"coalesce({a}, {b})"
    if choice == 6:
        return f"({a})"
    return f"{a}::float64"


@given(exprs())
@settings(max_examples=200, deadline=None)
def test_field_carries_expression_verbatim(e):
    from dftly_spark.strform.parser import parse_str

    pattern, fields = split_interpolation("{" + e + "}")
    assert pattern == "{}"
    assert fields == [e]
    # and the field means exactly what the expression means alone
    assert parse_str(fields[0]) == parse_str(e)


_literal_text = st.text(
    alphabet=st.characters(blacklist_characters="{}\\\n"), max_size=12
)


@given(st.lists(st.tuples(_literal_text, exprs()), min_size=1, max_size=4), _literal_text)
@settings(max_examples=100, deadline=None)
def test_literal_and_fields_separate_cleanly(pairs, tail):
    pattern = "".join(
        lit.replace("{", "{{").replace("}", "}}") + "{" + e + "}" for lit, e in pairs
    ) + tail.replace("{", "{{").replace("}", "}}")
    out, fields = split_interpolation(pattern)
    assert fields == [e for _, e in pairs]
    assert out == "".join(lit + "{}" for lit, _ in pairs) + tail
