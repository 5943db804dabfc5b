"""f-string pattern splitting: ``f"a {$x} b"`` → (``"a {} b"``, ``["$x"]``).

Same strategy as the reference (str_form/interpolation.py): field boundaries
are discovered by *parsing*, not brace counting — a ``}`` inside a string
literal, regex literal, or backtick-quoted column name belongs to its token,
so the first ``}`` the lexer cannot consume is exactly the one that closes the
field.  The reference drives lark's interactive parser; here the hand-rolled
parser plays the same role: it raises :class:`LexError` at the first
untokenizable character.
"""

from __future__ import annotations

from .lexer import LexError
from .parser import ParseError, _parse_full


def _find_field_end(pattern: str, start: int) -> int:
    """Index of the ``}`` closing the field whose contents begin at ``start``."""
    try:
        _parse_full(pattern[start:])
    except LexError as e:
        stop = start + e.pos
        if pattern[stop] == "}":
            return stop
        raise ValueError(
            f"Cannot lex {pattern[stop]!r} at position {stop} of {pattern!r}. "
            "Interpolation fields hold dftly expressions; literal text belongs "
            "outside the `{...}`."
        ) from e
    except (ParseError, ValueError) as e:
        raise ValueError(
            f"Invalid expression in the interpolation field starting at position "
            f"{start - 1} of {pattern!r}: {e}"
        ) from e
    raise ValueError(
        f"Unterminated interpolation field starting at position {start - 1} of "
        f"{pattern!r}; every `{{` must be closed by a matching `}}`, or doubled "
        "(`{{`) for a literal brace."
    )


def split_interpolation(pattern: str) -> tuple[str, list[str]]:
    """Split an f-string pattern into a placeholder pattern and field texts.

    Each ``{...}`` becomes ``{}`` and contributes its contents verbatim as a
    field (a full dftly expression — ``:``/``!`` are NOT format specs here).
    ``{{`` / ``}}`` are literal braces.
    """
    out: list[str] = []
    fields: list[str] = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "{":
            if pattern.startswith("{{", i):
                out.append("{")
                i += 2
                continue
            stop = _find_field_end(pattern, i + 1)
            field = pattern[i + 1 : stop]
            if not field.strip():
                raise ValueError(
                    f"Empty interpolation field at position {i} of {pattern!r}; "
                    "each `{...}` must hold a dftly expression."
                )
            fields.append(field)
            out.append("{}")
            i = stop + 1
            continue
        if ch == "}":
            if pattern.startswith("}}", i):
                out.append("}")
                i += 2
                continue
            raise ValueError(
                f"Unmatched `}}` at position {i} of {pattern!r}; write `}}}}` for a "
                "literal brace."
            )
        out.append(ch)
        i += 1
    return "".join(out), fields
