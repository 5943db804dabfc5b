"""Recursive-descent parser: string form → base-form dicts.

Implements the reference grammar's 13-level precedence ladder
(/root/reference/src/dftly/str_form/grammar.lark:1-27) by explicit descent:

    expr        → as-cast / `@` / if-else (loop; shift-greedy like the LALR)
    coalesce    → `??` left-assoc
    bool_or     → `or` / `||`
    bool_and    → `and` / `&&`
    comparison  → non-associative  ==  !=  >=  <=  >  <
    additive    → + -
    multiplicative → * /
    power       → `**` right-assoc
    local_cast  → `::` postfix chain
    unary       → not ! -        (`+` is rejected, as in the reference)
    postfix     → [start:stop] substring sugar
    primary     → literals, columns, f-strings, calls, regex forms, parens

Output is the same base-form dict language the reference's lark transformer
produces (str_form/parser.py doctests are the spec), e.g.
``{'add': [{'literal': 1}, {'column': 'x'}]}``.
"""

from __future__ import annotations

from typing import Any

from ..nodes import (
    BINARY_OPS,
    DT_CAST_ACCESSORS,
    NODES,
    UNARY_OPS,
    Cast,
    Coalesce,
    Conditional,
    Strptime,
    StringInterpolate,
)
from .lexer import LexError, Scanner, Token

try:
    from dateutil import parser as _du_parser
except ImportError:  # pragma: no cover
    _du_parser = None


class ParseError(Exception):
    pass


def _lit(v: Any) -> dict:
    return {"literal": v}


def _parse_time_text(text: str):
    if _du_parser is None:
        raise ParseError("dateutil is required to parse time literals")
    try:
        return _du_parser.parse(text)
    except Exception as e:
        raise ParseError(f"Failed to parse literal {text}") from e


_CMP_OPS = {"==", "!=", ">=", "<=", ">", "<"}


class _Parser:
    def __init__(self, text: str):
        self.sc = Scanner(text)

    # -- token helpers -----------------------------------------------------

    def _peek(self, operand: bool) -> Token:
        return self.sc.peek(operand)

    def _next(self, operand: bool) -> Token:
        return self.sc.advance(operand)

    def _accept_op(self, *ops: str) -> Token | None:
        tok = self._peek(False)
        if tok.kind == "OP" and tok.text in ops:
            return self._next(False)
        return None

    def _accept_kw(self, *kws: str) -> Token | None:
        tok = self._peek(False)
        if tok.kind == "KW" and tok.text in kws:
            return self._next(False)
        return None

    def _expect_op(self, op: str) -> None:
        tok = self._next(False)
        if tok.kind != "OP" or tok.text != op:
            raise ParseError(f"Expected {op!r} at position {tok.pos}, got {tok.text!r}")

    # -- precedence ladder -------------------------------------------------

    def parse_expr(self) -> dict:
        node = self._coalesce()
        while True:
            if self._accept_kw("as"):
                node = self._cast_target(node)
            elif self._accept_op("@"):
                tok = self._next(True)
                if tok.kind != "TIME":
                    raise ParseError(
                        f"Expected a time literal after '@' at position {tok.pos}"
                    )
                node = BINARY_OPS["@"].from_str_args([node, self._time_literal(tok)])
            elif self._accept_kw("if"):
                when = self.parse_expr()
                items = [node, when]
                if self._accept_kw("else"):
                    items.append(self.parse_expr())
                node = Conditional.from_str_args(items)
            else:
                return node

    def _coalesce(self) -> dict:
        node = self._bool_or()
        while self._accept_op("??"):
            node = Coalesce.from_str_args([node, self._bool_or()])
        return node

    def _bool_or(self) -> dict:
        node = self._bool_and()
        while self._accept_op("||") or self._accept_kw("or"):
            node = BINARY_OPS["or"].from_str_args([node, self._bool_and()])
        return node

    def _bool_and(self) -> dict:
        node = self._comparison()
        while self._accept_op("&&") or self._accept_kw("and"):
            node = BINARY_OPS["and"].from_str_args([node, self._comparison()])
        return node

    def _comparison(self) -> dict:
        node = self._additive()
        tok = self._peek(False)
        if tok.kind == "OP" and tok.text in _CMP_OPS:
            self._next(False)
            return BINARY_OPS[tok.text].from_str_args([node, self._additive()])
        return node

    def _additive(self) -> dict:
        node = self._multiplicative()
        while True:
            tok = self._accept_op("+", "-")
            if tok is None:
                return node
            node = BINARY_OPS[tok.text].from_str_args([node, self._multiplicative()])

    def _multiplicative(self) -> dict:
        node = self._power()
        while True:
            tok = self._accept_op("*", "/")
            if tok is None:
                return node
            node = BINARY_OPS[tok.text].from_str_args([node, self._power()])

    def _power(self) -> dict:
        node = self._local_cast()
        if self._accept_op("**"):
            return BINARY_OPS["**"].from_str_args([node, self._power()])
        return node

    def _local_cast(self) -> dict:
        node = self._unary()
        while self._accept_op("::"):
            node = self._cast_target(node)
        return node

    def _cast_target(self, left: dict) -> dict:
        """Shared tail of `::` and `as` casts: [?] NAME | [?] STRING."""
        nonstrict = self._accept_op("?") is not None
        tok = self._next(True)
        if tok.kind == "NAME":
            name = tok.text
            if name in DT_CAST_ACCESSORS:
                if nonstrict:
                    raise ParseError(
                        f"Non-strict casting (`::?`) is not supported for accessor "
                        f"{name!r}; `strict` applies only to dtype casts."
                    )
                return DT_CAST_ACCESSORS[name].from_str_args([left])
            out = Cast.from_str_args([left, _lit(name)])
            if nonstrict:
                out[Cast.KEY]["strict"] = _lit(False)
            return out
        if tok.kind == "STRING":
            out = Strptime.from_str_args([left, _lit(tok.text)])
            if nonstrict:
                out[Strptime.KEY]["strict"] = _lit(False)
            return out
        raise ParseError(
            f"Expected a type name or format string after cast at position {tok.pos}"
        )

    def _unary(self) -> dict:
        tok = self._peek(True)
        if tok.kind == "KW" and tok.text == "not":
            self._next(True)
            return UNARY_OPS["not"].from_str_args([self._unary()])
        if tok.kind == "OP" and tok.text in ("!", "-", "+"):
            self._next(True)
            if tok.text not in UNARY_OPS:
                raise ParseError(
                    f"Unsupported unary operator: {tok.text}; allowed: {list(UNARY_OPS)}"
                )
            return UNARY_OPS[tok.text].from_str_args([self._unary()])
        return self._postfix()

    def _postfix(self) -> dict:
        node = self._primary()
        while self._accept_op("["):
            node = {"substring": {"source": node, **self._slice_spec()}}
        return node

    def _slice_spec(self) -> dict:
        tok = self._peek(True)
        if tok.kind == "TIME":
            # `[10:30]` lexes as a TIME token (longest match); decompose it
            # back into integer bounds.  Three parts (`HH:MM:SS`) would be a
            # step request, which substring doesn't support.
            self._next(True)
            parts = tok.text.split()[0].split(":")
            if len(parts) == 2:
                out = {"start": _lit(int(parts[0])), "stop": _lit(int(parts[1]))}
                self._expect_op("]")
                return out
            raise ParseError(
                f"Slice shorthand does not support step (got {tok.text!r}); "
                "use the substring() function form."
            )
        if self._accept_op(":"):
            if self._accept_op("]"):
                return {"start": _lit(0)}
            out = {"start": _lit(0), "stop": self.parse_expr()}
            self._expect_op("]")
            return out
        start = self.parse_expr()
        self._expect_op(":")
        if self._accept_op("]"):
            return {"start": start}
        out = {"start": start, "stop": self.parse_expr()}
        self._expect_op("]")
        return out

    def _primary(self) -> dict:
        tok = self._next(True)

        if tok.kind == "REGEX":
            # `/re/ in <additive>` — binds like a comparison operator.
            kw = self._next(False)
            if not (kw.kind == "KW" and kw.text == "in"):
                raise ParseError(
                    f"Expected 'in' after regex literal at position {kw.pos}"
                )
            return NODES["regex_match"].from_str_args([_lit(tok.text), self._additive()])

        if tok.kind == "KW" and tok.text == "extract":
            return self._regex_extract()

        if tok.kind == "COLUMN":
            return {"column": tok.text}

        if tok.kind == "FSTRING":
            return StringInterpolate.from_str_args([_lit(tok.text)])

        if tok.kind == "STRING":
            return _lit(tok.text)

        if tok.kind == "NUMBER":
            text = tok.text
            return _lit(float(text) if "." in text else int(text))

        if tok.kind == "BOOL":
            return _lit(tok.text == "true")

        if tok.kind == "TIME":
            return self._time_literal(tok)

        if tok.kind == "DATE":
            return _lit(_parse_time_text(tok.text).date())

        if tok.kind == "DATETIME":
            return _lit(_parse_time_text(tok.text))

        if tok.kind == "NAME":
            nxt = self._peek(False)
            if nxt.kind == "OP" and nxt.text == "(":
                return self._call(tok.text)
            return {"bare_word": tok.text}

        if tok.kind == "OP" and tok.text == "(":
            node = self.parse_expr()
            self._expect_op(")")
            return node

        raise ParseError(f"Unexpected token {tok.text!r} at position {tok.pos}")

    def _time_literal(self, tok: Token) -> dict:
        return _lit(_parse_time_text(tok.text).time())

    def _call(self, name: str) -> dict:
        self._expect_op("(")
        if name not in NODES:
            raise ParseError(f"Unsupported function: {name}; allowed: {list(NODES)}")
        if self._accept_op(")"):
            raise ParseError(f"Function {name}() requires at least one argument")
        args = [self.parse_expr()]
        while self._accept_op(","):
            args.append(self.parse_expr())
        self._expect_op(")")
        return NODES[name].from_str_args(args)

    def _regex_extract(self) -> dict:
        items: list[Any] = []
        if self._accept_kw("group"):
            num = self._next(True)
            if num.kind != "NUMBER" or "." in num.text:
                raise ParseError(
                    f"Expected an integer group number at position {num.pos}"
                )
            items.append(_lit(int(num.text)))
            kw = self._next(False)
            if not (kw.kind == "KW" and kw.text == "of"):
                raise ParseError(f"Expected 'of' at position {kw.pos}")
        pat = self._next(True)
        if pat.kind != "REGEX":
            raise ParseError(f"Expected a /regex/ literal at position {pat.pos}")
        kw = self._next(False)
        if not (kw.kind == "KW" and kw.text == "from"):
            raise ParseError(f"Expected 'from' at position {kw.pos}")
        source = self._additive()
        if items:
            return NODES["regex_extract"].from_str_args([items[0], _lit(pat.text), source])
        return NODES["regex_extract"].from_str_args([_lit(pat.text), source])


def _parse_full(text: str) -> dict:
    """Parse ``text`` completely; LexError / ParseError propagate raw."""
    p = _Parser(text)
    node = p.parse_expr()
    tok = p._peek(False)
    if tok.kind != "EOF":
        raise ParseError(f"Unexpected token {tok.text!r} at position {tok.pos}")
    return node


def parse_str(s: str) -> dict:
    """Parse a string-form expression into its base-form dict.

    Raises ``ValueError`` with the reference's error shape
    (str_form/parser.py:267-299) on any failure.
    """
    try:
        return _parse_full(s)
    except (LexError, ParseError, ValueError) as e:
        raise ValueError(f"Failed to parse expression {s!r}: {e}") from e
