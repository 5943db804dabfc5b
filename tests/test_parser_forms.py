"""Form-matching / registry dispatch behavior of the Parser.

Spec: /root/reference/src/dftly/parser.py doctests.
"""

import warnings

import pytest

from dftly_spark import Parser
from dftly_spark.nodes import (
    Add,
    Cast,
    Column,
    Conditional,
    Literal,
    Multiply,
    SignedHash,
    Subtract,
)


@pytest.fixture
def small_parser():
    return Parser({"add": Add, "multiply": Multiply, "subtract": Subtract, "literal": Literal})


def test_dict_form(small_parser):
    node = small_parser({"add": [1, {"multiply": [2, 3]}]})
    assert repr(node) == "Add(Literal(1), Multiply(Literal(2), Literal(3)))"
    node = small_parser({"subtract": [10, {"add": [2, 3, 4]}]})
    assert repr(node) == "Subtract(Literal(10), Add(Literal(2), Literal(3), Literal(4)))"


def test_class_form_values(small_parser):
    node = small_parser({"add": [1, Literal(2)]})
    assert repr(node) == "Add(Literal(1), Literal(2))"


def test_string_routing(small_parser):
    node = small_parser("1 + 2 * 3")
    assert repr(node) == "Add(Literal(1), Multiply(Literal(2), Literal(3)))"
    assert repr(small_parser("'foo'")) == "Literal('foo')"


def test_resolved_form():
    node = Parser()({"expression": {"type": "add", "arguments": [1, 2]}})
    assert repr(node) == "Add(Literal(1), Literal(2))"


def test_bare_words_and_warning():
    full = Parser()
    assert repr(full("MEDS_BIRTH")) == "Literal('MEDS_BIRTH')"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        node = full("$col + TYPO")
        assert len(w) == 1
        assert "Bare word 'TYPO'" in str(w[0].message)
    assert repr(node) == "Add(Column('col'), Literal('TYPO'))"


def test_nested_string_args(small_parser):
    node = small_parser({"add": ['"foo"', '"bar"']})
    assert repr(node) == "Add(Literal('foo'), Literal('bar'))"
    node = small_parser({"add": ["1 * 2", "2 - 3"]})
    assert repr(node) == "Add(Multiply(Literal(1), Literal(2)), Subtract(Literal(2), Literal(3)))"


def test_no_match_errors(small_parser):
    with pytest.raises(ValueError, match="No matching node found"):
        small_parser({"fake": [2, 3]})
    with pytest.raises(ValueError, match="Errors from attempted matches"):
        small_parser({"add": [1, {"fake": [2, 3]}]})


def test_registry_validation():
    with pytest.raises(TypeError, match="not a subclass"):
        Parser({"add": Add, "sum": "hi there"})
    with pytest.raises(ValueError, match="multiple nodes registered"):
        Parser({"add": Add, "sum": Add})


def test_signed_hash_not_mistaken_for_hash():
    full = Parser()
    assert repr(full(SignedHash(Literal("hello")))) == "SignedHash(Literal('hello'))"
    node = full({"add": [Literal(1), SignedHash(Literal("hello"))]})
    assert repr(node) == "Add(Literal(1), SignedHash(Literal('hello')))"


def test_referenced_columns():
    full = Parser()
    assert full("$a + $b * 3").referenced_columns == {"a", "b"}
    assert full("42").referenced_columns == set()
    assert Conditional(when=Column("x"), then=Column("y")).referenced_columns == {"x", "y"}


def test_cast_positional_sugar():
    node = Cast(Literal("3"), Literal("int"))
    assert repr(node) == "Cast(source=Literal('3'), type=Literal('int'))"
    with pytest.raises(ValueError, match="exactly two positional"):
        Cast(Literal("3"))
    with pytest.raises(ValueError, match="cannot mix"):
        Cast(Literal("3"), Literal("int"), source=Literal("4"))
    with pytest.raises(ValueError, match="Unsupported type"):
        Cast(Literal("3"), Literal("unsupported_type"))
    with pytest.raises(ValueError, match="must evaluate to a string literal"):
        Cast(Literal("3"), Column("x"))
    with pytest.raises(ValueError, match="Non-strict casting is not supported"):
        Cast(source=Literal(3), type=Literal("minutes"), strict=Literal(False))
    with pytest.raises(ValueError, match="strict argument must be a boolean"):
        Cast(source=Literal("3"), type=Literal("int"), strict=Literal("yes"))


def test_kwarg_validation():
    with pytest.raises(ValueError, match="Missing required keys"):
        Conditional(when=Literal(True))
    with pytest.raises(ValueError, match="Extra unallowed keys"):
        Conditional(when=Literal(True), then=Literal(1), bad=Literal(2))
    with pytest.raises(TypeError, match="NodeBase"):
        Add(1, 2)


def test_to_nodes_yaml():
    nodes = Parser.to_nodes("sum_col: '$col1 + $col2'")
    assert repr(nodes["sum_col"]) == "Add(Column('col1'), Column('col2'))"
    with pytest.raises(ValueError, match="dictionary at the top level"):
        Parser.to_nodes("- item1")
    with pytest.raises(TypeError, match="must be a str, Path, or dict"):
        Parser.to_nodes(42)
