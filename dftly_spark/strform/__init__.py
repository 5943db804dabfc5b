from .interpolation import split_interpolation
from .lexer import LexError, Scanner, Token
from .parser import ParseError, parse_str

__all__ = ["parse_str", "split_interpolation", "Scanner", "Token", "LexError", "ParseError"]
