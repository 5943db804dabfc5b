"""Java-regex literal quoting, shared by the engine and the table ops.

Spark's ``F.split`` / ``rlike`` patterns are java.util.regex, NOT Python
``re`` — Python ``re.escape`` output happens to be Java-compatible for
practical separators, but the coupling is implicit and was flagged twice
(r12 advice on ``dedup_lines``; r13 review on the ``split`` node).  This
helper makes it airtight by construction: ``\\Q…\\E`` literal quoting
with ``java.util.regex.Pattern.quote``'s own ``\\E``-in-literal rewrite,
so ANY separator — multi-char, metachar-heavy, even one containing a
literal ``\\E`` — matches verbatim.
"""

from __future__ import annotations


def java_literal_regex(s: str) -> str:
    """Quote ``s`` as a LITERAL for Java's regex engine (Pattern.quote)."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"
