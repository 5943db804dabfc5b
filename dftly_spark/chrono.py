"""chrono ``%``-format → Java ``DateTimeFormatter`` pattern translation.

The reference's ``strptime`` formats use Rust chrono strftime codes
(/root/reference/src/dftly/nodes/str.py:593-649); Spark's ``to_date`` /
``to_timestamp`` take Java DateTimeFormatter patterns.  This module is the
static translation table (SURVEY.md §4.3 #5 / §7.5 #3): translatable codes map
1:1, untranslatable ones are rejected loudly.

Also classifies which codes are date-like / time-like / datetime-like so
``Strptime`` can infer its output type exactly as the reference does
(str.py:678-696).
"""

from __future__ import annotations

# chrono code → Java pattern fragment. None = recognized but untranslatable.
_CHRONO_TO_JAVA: dict[str, str | None] = {
    "Y": "yyyy",
    "y": "yy",
    # ISO week-based codes: Java has Y/ww/e letters but Spark >= 3.0 rejects
    # week-based pattern letters at runtime (DATETIME_WEEK_BASED_PATTERN), so
    # map to None for a clear lowering-time error instead of an executor crash.
    "G": None,
    "g": None,
    # century — no Java letter, but %C%y (adjacent, the chrono print form
    # "%C%y" == zero-padded 4-digit year) rewrites to %Y before translation
    # (rewrite_century); a %C not immediately followed by %y still rejects.
    "C": None,
    "q": "Q",
    "m": "MM",
    "b": "MMM",
    "h": "MMM",
    "B": "MMMM",
    "d": "dd",
    "e": "d",
    # Day-of-week NAMES: Spark's CORRECTED parser accepts E/EEE only for
    # formatting — using them in a parse pattern throws at runtime — so
    # they map to None here.  But a weekday NAME is redundant for the date,
    # so dayname_plan() lowers leading/trailing %a/%A to a strip-the-token
    # regex + parse-the-remainder plan (the %c fixed-layout plan is the
    # special case); only a MID-format day name still rejects loudly.
    "a": None,
    "A": None,
    "w": None,  # weekday 0=Sun — no parse equivalent
    "u": None,  # ISO weekday — Java 'e' is week-based, rejected by Spark
    "j": "DDD",
    "U": None,
    "W": None,
    "V": None,  # ISO week number — Java 'ww' is week-based, rejected by Spark
    "D": "MM/dd/yy",
    # chrono "locale" codes are FIXED C-locale layouts without the
    # unstable-locales feature (which Polars does not enable), so they
    # expand to their documented equivalents before translation:
    # %c = "%a %b %e %H:%M:%S %Y", %x = %D = "%m/%d/%y", %X = %T.
    "x": "MM/dd/yy",
    "F": "yyyy-MM-dd",
    "v": "d-MMM-yyyy",
    "H": "HH",
    "k": "H",
    "I": "hh",
    "l": "h",
    "M": "mm",
    "S": "ss",
    "f": "SSSSSS",
    "3f": "SSS",
    "6f": "SSSSSS",
    "9f": "SSSSSSSSS",
    "p": "a",
    "P": "a",
    "r": "hh:mm:ss a",
    "R": "HH:mm",
    "T": "HH:mm:ss",
    "X": "HH:mm:ss",
    "z": "xx",
    ":z": "xxx",
    "::z": "xxxxx",  # +HH:MM:SS — Java's five-letter offset-x form
    ":::z": "x",
    "Z": "zzz",
    "c": None,  # fixed C-locale layout; rewrite_locale expands it first
    "+": "yyyy-MM-dd'T'HH:mm:ssxxx",
    "s": None,  # unix seconds — handled as a special case by Strptime
    "%": "%",  # literal percent
}

# Classification sets, verbatim from the reference (str.py:594-649).
DATE_PARTS = {
    "Y", "G", "C", "q", "y", "g", "m", "b", "B", "h", "d", "e", "a", "A",
    "w", "u", "j", "U", "W", "V", "D", "x", "F", "v",
}
TIME_PARTS = {
    "H", "k", "I", "l", "M", "S", "f", "3f", "6f", "9f", "p", "P", "r", "R",
    "T", "X", "z", ":z", "::z", ":::z", "Z",
}
DATETIME_PARTS = {"c", "+", "s"}

_MULTI = sorted((k for k in _CHRONO_TO_JAVA if len(k) > 1), key=len, reverse=True)


def _scan(fmt: str):
    """Yield ("code", c) / ("lit", text) items from a chrono format string."""
    i = 0
    while i < len(fmt):
        if fmt[i] == "%":
            rest = fmt[i + 1 :]
            for code in _MULTI:
                if rest.startswith(code):
                    yield ("code", code)
                    i += 1 + len(code)
                    break
            else:
                if not rest:
                    raise ValueError(f"Trailing '%' in format {fmt!r}")
                yield ("code", rest[0])
                i += 2
        else:
            j = i
            while j < len(fmt) and fmt[j] != "%":
                j += 1
            yield ("lit", fmt[i:j])
            i = j


def has_code(fmt: str, code: str) -> bool:
    """True when the format contains ``%<code>`` as a REAL code.

    The scan-based membership test every special-case branch must use —
    a substring test would misfire on escaped literals (``'%%s'`` contains
    the text ``%s`` but is a literal percent-s).
    """
    return any(k == "code" and c == code for k, c in _scan(fmt))


def classify(fmt: str) -> str:
    """Return "date" / "time" / "datetime" from which chrono codes appear.

    Same inference rule as the reference (str.py:678-696): any datetime code
    or (date and time) → datetime; else date; else time; else error.
    """
    codes = {c for kind, c in _scan(fmt) if kind == "code"}
    has_date = bool(codes & DATE_PARTS)
    has_time = bool(codes & TIME_PARTS)
    has_dt = bool(codes & DATETIME_PARTS)
    if has_dt or (has_date and has_time):
        return "datetime"
    if has_date:
        return "date"
    if has_time:
        return "time"
    raise ValueError(
        "The format string must contain at least one date or time component. "
        "The format string should be in the syntax used by the `chrono` crate: "
        "https://docs.rs/chrono/latest/chrono/format/strftime/index.html"
    )


def _quote_literal(text: str) -> str:
    """Quote literal text for a Java DateTimeFormatter pattern."""
    if not text:
        return ""
    out: list[str] = []
    run: list[str] = []

    def flush() -> None:
        if not run:
            return
        s = "".join(run)
        # a run of ONLY quotes uses the standalone '' escape ('''' would
        # leave an unclosed section); anything else becomes ONE quoted
        # section with internal quotes doubled.  One section, not per-char
        # sections: Java reads adjacent 'a''t' as the literal a't (the ''
        # is an ESCAPED QUOTE inside the first section), not "at".
        out.append("''" * len(s) if set(s) == {"'"} else "'" + s.replace("'", "''") + "'")
        run.clear()

    for ch in text:
        if ch.isalpha() or ch in "[]#{}'":
            # pattern letters; Java's reserved non-letters ([ ] open an
            # OPTIONAL SECTION, # { } reserved for future use — unquoted
            # they corrupt or reject the pattern); quotes ride along so a
            # mixed run stays one section
            run.append(ch)
        else:
            flush()
            out.append(ch)
    flush()
    return "".join(out)


def rewrite_century(fmt: str) -> str:
    """Rewrite ``%C``/``%y`` pairings to ``%Y``, format text only.

    chrono prints ``%C`` as the zero-padded upper two digits of the year
    (year // 100) and ``%y`` as the lower two, so the adjacent pair is
    byte-identical to the zero-padded 4-digit ``%Y`` (reference
    /root/reference/src/dftly/nodes/str.py:594-649 routes both through
    chrono's year_div_100/year_mod_100).  Thin wrapper over
    :func:`century_plan` — ONE implementation of the pairing rules — for
    callers that only need the rewritten format; a pairing separated by
    literal text additionally needs the plan's input strips, so requiring
    them here raises rather than returning a format the input won't match.
    """
    plan = century_plan(fmt)
    if plan is None:
        return fmt
    if plan["strips"]:
        raise ValueError(
            f"chrono format {fmt!r} pairs %C and %y across literal text: "
            "the input must be spliced too — use century_plan's strips"
        )
    return plan["fmt"]


def century_plan(fmt: str) -> dict | None:
    """Full ``%C``/``%y`` pairing plan, or None when ``%C`` is absent.

    Generalizes :func:`rewrite_century` to a ``%C`` separated from its
    ``%y`` by LITERAL text (``"%C|%y"``): the intervening literal is
    removed from the *input* so the two 2-digit fields become the adjacent
    4-digit ``%Y``.  The strip pattern is engine-portable (no lookaround —
    RE2-safe) and POSITION-ANCHORED: ``^`` plus the input shapes of every
    token already emitted (:func:`_prefix_rx` over the rewritten stream, so
    a second pairing sees the first one's spliced ``%Y``) leads up to the
    century digits, so a shape-coincident run EARLIER in the input (e.g.
    ``'%d|%m|%C|%y'`` where ``15|08`` also looks like ``\\d{2}|\\d{2}``)
    cannot be spliced by mistake.  A preceding code with no entry in
    :data:`_CODE_RX` rejects loudly rather than anchoring by guess.

    Returns ``{"fmt": rewritten, "strips": [(pattern, replacement), ...]}``
    with Java-style ``$n`` group references in the replacement (callers
    emitting for RE2 engines translate ``$n`` → ``\\n``).  A ``%C`` with
    no ``%y`` pairing raises the loud translation error.
    """
    import re as _re

    toks = [t for t in _scan(fmt) if t != ("lit", "")]
    if not any(k == "code" and c == "C" for k, c in toks):
        return None
    out: list[str] = []
    done: list[tuple[str, str]] = []  # rewritten tokens emitted so far
    strips: list[tuple[str, str]] = []
    i = 0
    while i < len(toks):
        kind, item = toks[i]
        if kind == "code" and item == "C":
            if i + 1 < len(toks) and toks[i + 1] == ("code", "y"):
                out.append("%Y")
                done.append(("code", "Y"))
                i += 2
                continue
            if (
                i + 2 < len(toks)
                and toks[i + 1][0] == "lit"
                and toks[i + 2] == ("code", "y")
            ):
                lit = toks[i + 1][1]
                prefix = _prefix_rx(done, fmt)
                strips.append(
                    (
                        "^(" + prefix + r"\d{2})" + _re.escape(lit) + r"(\d{2})",
                        "$1$2",
                    )
                )
                out.append("%Y")
                done.append(("code", "Y"))
                i += 3
                continue
            raise ValueError(
                f"chrono format code %C (century) is only supported when "
                f"paired with %y (adjacent, or separated by literal text); "
                f"cannot translate {fmt!r}"
            )
        out.append(f"%{item}" if kind == "code" else item)
        done.append((kind, item))
        i += 1
    return {"fmt": "".join(out), "strips": strips}


# Parse-time day-name token: chrono accepts the short name with an optional
# full-name tail, case-insensitively, for both %a and %A.
_DAYNAME_RX = (
    "(?i:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?"
    "|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)"
)

# Input-shape regex per chrono code, used to ANCHOR a mid-format strip at
# the exact code position: a strip pattern prefixed with the shapes of the
# codes BEFORE it cannot splice at an earlier coincidental match (a lazy
# ``^(.*?)`` prefix can — it grabs the first shape-compatible run in the
# INPUT, e.g. '%d|%m|%C|%y' on '15|08|20|26' spliced at '15|08').  All
# fragments are RE2-safe (no lookaround, no capturing groups) so the same
# pattern runs under Java regex and DuckDB's RE2.  Codes absent here
# (timezones, week numbers, locale layouts) make a prefix un-anchorable
# and the plan rejects loudly instead of guessing.
_CODE_RX: dict[str, str] = {
    "Y": r"\d{4}",
    "y": r"\d{2}",
    "m": r"\d{2}",
    "d": r"\d{2}",
    "e": r"\s?\d{1,2}",
    "q": r"\d",
    "j": r"\d{3}",
    "H": r"\d{2}",
    "k": r"\s?\d{1,2}",
    "I": r"\d{2}",
    "l": r"\s?\d{1,2}",
    "M": r"\d{2}",
    "S": r"\d{2}",
    "f": r"\d+",
    "3f": r"\d{3}",
    "6f": r"\d{6}",
    "9f": r"\d{9}",
    "b": r"[A-Za-z]{3}",
    "h": r"[A-Za-z]{3}",
    "B": r"[A-Za-z]+",
    "p": r"[APap][Mm]",
    "P": r"[APap][Mm]",
    "D": r"\d{2}/\d{2}/\d{2}",
    "x": r"\d{2}/\d{2}/\d{2}",
    "F": r"\d{4}-\d{2}-\d{2}",
    "v": r"\s?\d{1,2}-[A-Za-z]{3}-\d{4}",
    "R": r"\d{2}:\d{2}",
    "T": r"\d{2}:\d{2}:\d{2}",
    "X": r"\d{2}:\d{2}:\d{2}",
    "r": r"\d{2}:\d{2}:\d{2} [APap][Mm]",
    "%": "%",
}


def _prefix_rx(toks: list[tuple[str, str]], fmt: str) -> str:
    """Regex matching exactly the input text the given format tokens print.

    Used to anchor a strip at a code's true position.  Raises the loud
    translation error when a preceding code has no input shape in
    :data:`_CODE_RX` (anchoring would be a guess).
    """
    import re as _re

    parts: list[str] = []
    for kind, item in toks:
        if kind == "lit":
            parts.append(_re.escape(item))
        elif item in ("a", "A"):
            parts.append(_DAYNAME_RX)
        else:
            rx = _CODE_RX.get(item)
            if rx is None:
                raise ValueError(
                    f"chrono format code %{item} before a mid-format %C/%a/%A "
                    f"cannot be position-anchored for the input-splice plan; "
                    f"cannot translate {fmt!r}"
                )
            parts.append(rx)
    return "".join(parts)


def dayname_plan(fmt: str) -> dict | None:
    """Strip plan for ``%a``/``%A`` day-name codes anywhere, or None.

    A weekday name is redundant for the date, so the plan removes the name
    token from the input (only a real day name matches; anything else
    fails the downstream parse and nulls/raises) and parses the remainder
    with the format minus the day code.  A MID-format day name strips via
    a ``^``-anchored POSITION-ANCHORED prefix capture: the group before
    the name is :func:`_prefix_rx` over the tokens preceding the day code
    (minus earlier day codes, which prior strips in the sequence already
    removed), so the strip can only fire at the day code's true position —
    a day-name-shaped word inside an earlier format LITERAL (``'Sunday %d
    %a'``) or text field is never the one removed.  No lookaround, so the
    pattern is RE2-portable; a preceding code with no :data:`_CODE_RX`
    shape rejects loudly.  Divergence shared with the ``%c`` plan (and
    with DuckDB's own ``%a``): a *valid but inconsistent* weekday name is
    ignored, where chrono would reject it.

    Returns ``{"fmt": remainder_format, "strips": [(pattern, repl), ...]}``
    with Java-style ``$n`` replacements.
    """
    toks = [t for t in _scan(fmt) if t != ("lit", "")]
    day_idx = [i for i, (k, c) in enumerate(toks) if k == "code" and c in ("a", "A")]
    if not day_idx:
        return None
    strips: list[tuple[str, str]] = []
    for i in day_idx:
        if i == 0:
            strips.append((f"^{_DAYNAME_RX}", ""))
        elif i == len(toks) - 1:
            strips.append((f"{_DAYNAME_RX}$", ""))
        else:
            prefix = _prefix_rx(
                [t for j, t in enumerate(toks) if j < i and j not in day_idx],
                fmt,
            )
            strips.append((f"^({prefix}){_DAYNAME_RX}", "$1"))
    remainder = "".join(
        (f"%{c}" if k == "code" else c)
        for i, (k, c) in enumerate(toks)
        if i not in day_idx
    )
    return {"fmt": remainder, "strips": strips}


#: codes chrono prints SPACE-PADDED (and parses with an optional leading
#: space): day %e, 24h/12h hour %k/%l, and %v whose embedded %e leads it.
_PAD_CODES = frozenset({"e", "k", "l", "v"})


def pad_plan(fmt: str) -> dict | None:
    """Strip plan for the optional space pad of ``%e``/``%k``/``%l``/``%v``.

    chrono parses these with an OPTIONAL leading space (print form is
    space-padded to width 2: ``"Jul  8"``); their Java letters (``d``,
    ``H``, ``h``) parse bare 1-2 digit numbers only, so the plan removes a
    single space immediately before the digits when one is present —
    position-anchored exactly like :func:`dayname_plan` (``^`` + the input
    shapes of every preceding token), no lookaround, RE2-portable, so a
    space elsewhere in the input can never be the one removed.  Callers
    apply the strips to the input and parse with the format unchanged.

    Returns ``{"strips": [(pattern, repl), ...]}`` or None when the format
    has no pad codes.
    """
    toks = [t for t in _scan(fmt) if t != ("lit", "")]
    pad_idx = [
        i for i, (k, c) in enumerate(toks) if k == "code" and c in _PAD_CODES
    ]
    if not pad_idx:
        return None
    strips: list[tuple[str, str]] = []
    for i in pad_idx:
        if i == 0:
            strips.append((r"^\s(\d)", "$1"))
        else:
            try:
                prefix = _prefix_rx(toks[:i], fmt)
            except ValueError:
                # a preceding code has no anchorable input shape (%z/%Z/…):
                # SKIP this one strip instead of failing the whole lowering
                # — the bare form still parses; only the space-PADDED print
                # form of this code loses support, which is exactly the
                # pre-pad-plan status quo for such formats
                continue
            strips.append((f"^({prefix})\\s(\\d)", "$1$2"))
    return {"strips": strips}


def week_based_plan(fmt: str) -> dict | None:
    """Parse plan for ``%U``/``%W``/``%V`` week-of-year formats, or None.

    Java/Spark reject week-based ``DateTimeFormatter`` letters
    (DATETIME_WEEK_BASED_PATTERN), so these formats are lowered to regex
    extraction + explicit date arithmetic instead:

    * ``%U``/``%W``: C-strptime week-of-year (weeks start Sunday/Monday;
      week 0 holds the days before the year's first week start).  A complete
      date needs ``%Y`` + (``%U``|``%W``) + (``%w``|``%u``).
    * ``%V``: ISO-8601 week date — chrono pairs it with the ISO year ``%G``
      and ISO weekday ``%u`` (``%w`` also accepted; 0=Sunday maps to ISO 7).
      Week 1 is the week containing Jan 4.

    Anything else mixed into a week-based format raises the loud translation
    error.  Returns ``{"regex", "year", "week", "weekday", "weekday_code",
    "sunday_first", "iso"}`` with 1-based capture-group indices.
    """
    import re as _re

    codes = {c for kind, c in _scan(fmt) if kind == "code"}
    has_uw = bool(codes & {"U", "W"})
    has_iso = "V" in codes
    if not has_uw and not has_iso:
        return None
    if has_uw and has_iso:
        raise ValueError(
            f"chrono format {fmt!r} mixes C-strptime week codes (%U/%W) with "
            "the ISO week code %V; pick one week-numbering system"
        )
    parts: list[str] = ["^"]
    roles: dict = {"sunday_first": "U" in codes, "iso": has_iso}
    year_code = "G" if has_iso else "Y"
    gi = 0
    for kind, item in _scan(fmt):
        if kind == "lit":
            parts.append(_re.escape(item))
            continue
        if item == "%":
            parts.append("%")
            continue
        gi += 1
        if item == year_code:
            parts.append(r"(\d{4})")
            roles["year"] = gi
        elif item in (("V",) if has_iso else ("U", "W")):
            parts.append(r"(\d{1,2})")
            roles["week"] = gi
        elif item in ("w", "u"):
            parts.append(r"(\d)")
            roles["weekday"] = gi
            roles["weekday_code"] = item
        else:
            allowed = "%G, %V, %w/%u" if has_iso else "%Y, %U/%W, %w/%u"
            raise ValueError(
                f"chrono format code %{item} cannot be combined with week-based "
                f"parsing (supported there: {allowed}); cannot translate {fmt!r}"
            )
    if not {"year", "week", "weekday"} <= roles.keys():
        need = "%G + %V + %w/%u" if has_iso else "%Y + %U/%W + %w/%u"
        raise ValueError(
            f"week-based format {fmt!r} is incomplete: chrono needs year + week "
            f"+ weekday ({need}) to resolve a date"
        )
    parts.append("$")
    roles["regex"] = "".join(parts)
    return roles


#: chrono's %c without the unstable-locales feature (Polars does not enable
#: it) is the FIXED C-locale layout — component codes, not a locale lookup.
C_LOCALE_DATETIME = "%a %b %e %H:%M:%S %Y"


def rewrite_locale(fmt: str) -> tuple[str, bool]:
    """Expand the fixed C-locale composite ``%c`` into its component codes.

    Expanding lets the existing day-name strip plan (``%a``) and code table
    (``%e`` → Java ``d``) lower ``%c`` ANYWHERE in a format, not just as
    the exact ``"%c"`` — the reference accepts whatever chrono accepts
    (/root/reference/src/dftly/nodes/str.py:594-649), and chrono is happy
    to embed ``%c`` mid-format.

    Returns ``(rewritten, found)``.  When ``found``, the rewritten format
    has ALL literal whitespace runs collapsed to single spaces and is
    stripped at the ends, and the caller must normalize the input the same
    way (``trim`` + ``\\s+`` → one space): ``%e`` prints the day SPACE-
    PADDED (``"Jul  8"``), which Java's strict ``d`` letter will not parse,
    so both sides drop to a canonical single-space form.  Documented
    divergence (shared with the old exact-``"%c"`` plan): a format whose
    OTHER literals contain meaningful whitespace runs collapses with them.
    """
    import re as _re

    out: list[str] = []
    found = False
    for kind, item in _scan(fmt):
        if kind == "code" and item == "c":
            out.append(C_LOCALE_DATETIME)
            found = True
        elif kind == "code":
            out.append("%%" if item == "%" else f"%{item}")
        else:
            out.append(item)
    if not found:
        return fmt, False
    # ASCII-\s class, NOT Python \s or .strip(): the input side normalizes
    # with Java/RE2 \s = [ \t\n\x0B\f\r], and a format literal containing
    # Unicode-only whitespace (NBSP) must NOT collapse here when the input
    # side will leave it untouched — the sides must stay byte-symmetric
    ws = r"[ \t\n\x0b\f\r]"
    collapsed = _re.sub(f"{ws}+", " ", "".join(out))
    return _re.sub(f"^{ws}+|{ws}+$", "", collapsed), True


def to_java(fmt: str) -> str:
    """Translate a chrono format to a Java DateTimeFormatter pattern.

    Raises ``ValueError`` on codes with no Java equivalent (%s is handled by
    the caller before reaching here).
    """
    out: list[str] = []
    for kind, item in _scan(fmt):
        if kind == "lit":
            out.append(_quote_literal(item))
        elif item == "%":
            out.append(_quote_literal("%"))
        else:
            java = _CHRONO_TO_JAVA.get(item)
            if java is None:
                raise ValueError(
                    f"chrono format code %{item} has no Java DateTimeFormatter "
                    f"equivalent supported by Spark; cannot translate {fmt!r} "
                    f"(the full translated / plan-lowered / rejected code "
                    f"table is in README.md, 'strptime' under 'The "
                    f"expression language')"
                )
            out.append(java)
    return "".join(out)
