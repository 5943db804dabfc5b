"""Tokenizer for the dftly string-form expression language.

Token inventory and precedence semantics follow the reference grammar
(/root/reference/src/dftly/str_form/grammar.lark), re-implemented as a
hand-rolled scanner (no parser-generator dependency).

The single context-sensitive decision the reference solves with lark's
contextual lexer — ``/`` starts a regex literal in operand position but
divides in operator position (grammar.lark:183-199 discussion) — is passed in
explicitly via ``expect_operand``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class LexError(Exception):
    """A character that cannot begin any token."""

    def __init__(self, pos: int, char: str):
        self.pos = pos
        self.char = char
        super().__init__(f"Cannot lex {char!r} at position {pos}")


@dataclass(frozen=True)
class Token:
    kind: str  # STRING REGEX FSTRING NUMBER TIME DATE DATETIME BOOL NAME COLUMN OP KW EOF
    text: str
    pos: int
    end: int


#: Trailing (?!\d) keeps the longest-match rule from eating slice bounds:
#: `$x[3:100]` must lex as NUMBER 3, ':', NUMBER 100 — without the guard,
#: TIME matched "3:10" and left a stray "0" (found by the expression
#: fuzzer).  A real time literal is never directly followed by a digit.
_TIME_BODY = r"[0-2]?\d:[0-5]\d(?::[0-5]\d)?(?:\ [AP]\.?M\.?)?(?!\d)"
RE_DATETIME = re.compile(r"\d{4}-\d{2}-\d{2}[ T]" + _TIME_BODY, re.IGNORECASE)
RE_DATE = re.compile(r"\d{4}-\d{2}-\d{2}")
RE_TIME = re.compile(_TIME_BODY, re.IGNORECASE)
RE_NUMBER = re.compile(r"\d+(?:\.\d+)?")
RE_STRING = re.compile(r"'(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\"")
RE_REGEX = re.compile(r"/(?:[^/\\\n]|\\.)*/")
RE_NAME = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
RE_BACKTICK = re.compile(r"`[^`\n]+`")
RE_WS = re.compile(r"\s+")

KEYWORDS = {
    "and", "or", "not", "if", "else", "as", "in",
    "extract", "group", "of", "from",
}

# Longest first so `**`/`==`/`::`/`??` beat their prefixes.
OPERATORS = [
    "**", "==", "!=", ">=", "<=", "&&", "||", "::", "??",
    "+", "-", "*", "/", ">", "<", "!", "?", "(", ")", "[", "]", ":", ",", "@",
]


class Scanner:
    """Lazy tokenizer with one-token lookahead, keyed by lex mode."""

    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self._cache: tuple[int, bool, Token] | None = None

    def peek(self, operand: bool) -> Token:
        if self._cache is not None and self._cache[0] == self.pos and self._cache[1] == operand:
            return self._cache[2]
        tok = self._lex(self.pos, operand)
        self._cache = (self.pos, operand, tok)
        return tok

    def advance(self, operand: bool) -> Token:
        tok = self.peek(operand)
        self.pos = tok.end
        self._cache = None
        return tok

    # ------------------------------------------------------------------

    def _lex(self, pos: int, operand: bool) -> Token:
        text = self.text
        m = RE_WS.match(text, pos)
        if m:
            pos = m.end()
        if pos >= len(text):
            return Token("EOF", "", pos, pos)
        ch = text[pos]

        if operand and ch == "/":
            m = RE_REGEX.match(text, pos)
            if m:
                return Token("REGEX", m.group()[1:-1], pos, m.end())

        for kind, rx in (("DATETIME", RE_DATETIME), ("DATE", RE_DATE), ("TIME", RE_TIME), ("NUMBER", RE_NUMBER)):
            m = rx.match(text, pos)
            if m:
                return Token(kind, m.group(), pos, m.end())

        if ch in "'\"":
            m = RE_STRING.match(text, pos)
            if m:
                return Token("STRING", m.group()[1:-1], pos, m.end())
            raise LexError(pos, ch)

        if ch == "f" and pos + 1 < len(text) and text[pos + 1] in "'\"":
            m = RE_STRING.match(text, pos + 1)
            if m:
                return Token("FSTRING", m.group()[1:-1], pos, m.end())

        if ch == "$":
            sub = pos + 1
            m = RE_WS.match(text, sub)
            if m:
                sub = m.end()
            m = RE_NAME.match(text, sub)
            if m:
                return Token("COLUMN", m.group(), pos, m.end())
            m = RE_BACKTICK.match(text, sub)
            if m:
                return Token("COLUMN", m.group()[1:-1], pos, m.end())
            nxt = text[sub] if sub < len(text) else ""
            raise LexError(sub, nxt or "$")

        m = RE_NAME.match(text, pos)
        if m:
            word = m.group()
            low = word.lower()
            if low in ("true", "false"):
                return Token("BOOL", low, pos, m.end())
            if low in KEYWORDS:
                return Token("KW", low, pos, m.end())
            return Token("NAME", word, pos, m.end())

        for op in OPERATORS:
            if text.startswith(op, pos):
                return Token("OP", op, pos, pos + len(op))

        raise LexError(pos, ch)
