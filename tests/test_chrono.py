"""chrono→Java translation contract: what translates, what is rejected loudly.

The reference accepts any chrono code Polars supports
(/root/reference/src/dftly/nodes/str.py:594-649).  Spark cannot parse
week-based or locale-dependent patterns (week-based letters raise
DATETIME_WEEK_BASED_PATTERN at runtime since Spark 3.0), so those codes are a
*documented divergence*: `to_java` raises ValueError at lowering time with a
clear message naming the code.  These tests pin that contract.
"""

import pytest

from dftly_spark import chrono

UNSUPPORTED = [
    "%C",   # century: rejected by to_java alone — rewrite_century owns %C%y
    "%w",   # weekday 0=Sun (alone, without %U/%W/%V)
    "%u",   # ISO weekday (alone; supported inside a %G/%V plan)
    "%V",   # ISO week (alone via to_java; supported via the week plan)
    "%G",   # ISO year (alone via to_java; supported via the week plan)
    "%g",   # ISO week-based year, 2-digit
    "%a",   # weekday names: rejected by to_java alone — dayname_plan owns
    "%A",   # leading/trailing positions
    "%c",   # fixed C layout: rejected by to_java alone — rewrite_locale
            # expands %c to component codes before translation
]


@pytest.mark.parametrize("code", UNSUPPORTED)
def test_unsupported_codes_raise_at_lowering(code):
    fmt = f"%Y {code}" if code != "%c" else code
    with pytest.raises(ValueError, match="no Java DateTimeFormatter equivalent"):
        chrono.to_java(fmt)


@pytest.mark.parametrize("code", ["%u", "%g"])
def test_week_based_codes_fail_at_lowering_not_runtime(run1, code):
    # End-to-end: a strptime with an untranslatable code must fail while the
    # plan is being built (ValueError), not as an opaque executor exception.
    with pytest.raises(ValueError, match="no Java DateTimeFormatter equivalent"):
        run1(f"strptime($t, '%Y {code}')", t="2024 1")


def test_partial_iso_formats_fail_at_lowering(run1):
    # %V without the full %G+%V+%u triple: loud lowering-time error from the
    # week plan; %G alone never reaches the plan (no %V) and fails in to_java.
    with pytest.raises(ValueError, match="week-based|incomplete|cannot be combined"):
        run1("strptime($t, '%Y %V')", t="2024 1")
    with pytest.raises(ValueError, match="incomplete"):
        run1("strptime($t, '%G %V')", t="2024 1")
    with pytest.raises(ValueError, match="no Java DateTimeFormatter equivalent"):
        run1("strptime($t, '%Y %G')", t="2024 1")


@pytest.mark.parametrize("fmt", ["%Y %U", "%Y %W", "%U %w"])
def test_incomplete_week_formats_raise(fmt):
    # chrono itself cannot resolve a date from these; we reject at lowering.
    with pytest.raises(ValueError, match="incomplete|week-based"):
        chrono.week_based_plan(fmt)


def test_week_based_plan_shape():
    plan = chrono.week_based_plan("%Y-%U-%w")
    assert plan["regex"] == r"^(\d{4})\-(\d{1,2})\-(\d)$"
    assert (plan["year"], plan["week"], plan["weekday"]) == (1, 2, 3)
    assert plan["sunday_first"] is True
    assert chrono.week_based_plan("%Y-%m-%d") is None


@pytest.mark.parametrize("fmt", ["%Y %U %w", "%Y %W %u", "%Y-%W-%w"])
def test_week_based_roundtrip_matches_python_strptime(run1, fmt):
    """Format a spread of dates with strftime, parse back through the
    engine, compare against Python's own strptime (same C semantics as
    chrono for %U/%W)."""
    import datetime as dt

    d = dt.date(2023, 12, 20)
    for off in range(0, 400, 13):  # crosses a year boundary, hits week 0
        day = d + dt.timedelta(days=off)
        s = day.strftime(fmt)
        want = dt.datetime.strptime(s, fmt).date()
        got = run1(f"strptime($t, '{fmt}')", t=s)
        assert got == want, (s, fmt)


def test_week_based_year_rollover_matches_python(run1):
    import datetime as dt

    # week 0 day before Jan 1 rolls into the previous year (C semantics)
    assert run1("strptime($t, '%Y %U %w')", t="2024 0 0") == dt.date(2023, 12, 31)
    assert dt.datetime.strptime("2024 0 0", "%Y %U %w").date() == dt.date(2023, 12, 31)


def test_iso_week_plan_shape():
    plan = chrono.week_based_plan("%G-W%V-%u")
    assert plan["iso"] is True
    assert plan["regex"] == r"^(\d{4})\-W(\d{1,2})\-(\d)$"
    assert (plan["year"], plan["week"], plan["weekday"]) == (1, 2, 3)
    assert chrono.week_based_plan("%Y-%U-%w")["iso"] is False


def test_iso_week_mixing_rejected():
    with pytest.raises(ValueError, match="mixes"):
        chrono.week_based_plan("%Y %U %V %u")
    # ISO plans key on %G; a %Y inside one is a loud error, not silently read.
    with pytest.raises(ValueError, match="cannot be combined"):
        chrono.week_based_plan("%Y %V %u")
    with pytest.raises(ValueError, match="incomplete"):
        chrono.week_based_plan("%G %V")


@pytest.mark.parametrize("fmt", ["%G-W%V-%u", "%G %V %u"])
def test_iso_week_roundtrip_matches_python(run1, fmt):
    """Format a spread of dates with Python strftime (same ISO-8601
    semantics as chrono), parse back through the engine, compare against
    ``date.fromisocalendar``."""
    import datetime as dt

    d = dt.date(2023, 12, 20)
    for off in range(0, 400, 13):  # crosses the ISO year boundary (week 52/1)
        day = d + dt.timedelta(days=off)
        s = day.strftime(fmt)
        y, w, wd = day.isocalendar()
        assert dt.date.fromisocalendar(y, w, wd) == day
        got = run1(f"strptime($t, '{fmt}')", t=s)
        assert got == day, (s, fmt)


def test_iso_week_boundary_cases(run1):
    import datetime as dt

    # 2021-01-01 is ISO 2020-W53-5; 2024-12-30 is ISO 2025-W01-1.
    assert run1("strptime($t, '%G-W%V-%u')", t="2020-W53-5") == dt.date(2021, 1, 1)
    assert run1("strptime($t, '%G-W%V-%u')", t="2025-W01-1") == dt.date(2024, 12, 30)
    # %w variant: 0=Sunday maps to ISO weekday 7.
    assert run1("strptime($t, '%G %V %w')", t="2024 01 0") == dt.date(2024, 1, 7)


def test_iso_week_invalid_components(run1):
    for bad in ("2023 05 9", "2023 00 3", "2023 60 3", "garbage"):
        with pytest.raises(Exception, match="strptime|USER_RAISED"):
            run1("strptime($t, '%G %V %u')", t=bad)
        assert run1("$t::?'%G %V %u'", t=bad) is None


def test_week_based_invalid_components(run1):
    # weekday out of range / week > 53 / regex mismatch → strict raises,
    # non-strict nulls
    for bad in ("2023 5 9", "2023 60 3", "garbage"):
        with pytest.raises(Exception, match="strptime|USER_RAISED"):
            run1("strptime($t, '%Y %U %w')", t=bad)
        assert run1("$t::?'%Y %U %w'", t=bad) is None


@pytest.mark.parametrize(
    "fmt, java",
    [
        ("%Y-%m-%d", "yyyy-MM-dd"),
        ("%H:%M:%S", "HH:mm:ss"),
        ("%Y-%m-%dT%H:%M:%S%.3f", None),  # unknown %. code → single-char scan
        ("%d/%m/%y %I:%M %p", "dd/MM/yy hh:mm a"),
        # one quoted section per literal run — per-char sections would
        # merge ('o''f' is the literal o'f in Java, not "of")
        ("%j of %Y", "DDD 'of' yyyy"),
    ],
)
def test_supported_translations(fmt, java):
    if java is None:
        with pytest.raises(ValueError):
            chrono.to_java(fmt)
    else:
        assert chrono.to_java(fmt) == java


# ---------------------------------------------------------------------------
# fixed C-locale layouts (%x, %X, %c) and the two-digit-year pivot
# ---------------------------------------------------------------------------


def test_locale_codes_fixed_layouts(run1):
    import datetime as dt

    # chrono without unstable-locales: %x == %D, %X == %T, %c == C layout
    assert run1('strptime($s, "%x")', s="12/31/99") == dt.date(1999, 12, 31)
    assert run1('strptime($s, "%X")', s="23:13:48") == (23 * 3600 + 13 * 60 + 48) * 1_000_000
    assert run1('strptime($s, "%c")', s="Thu Mar  3 23:05:25 2005") == dt.datetime(
        2005, 3, 3, 23, 5, 25
    )
    # %e single-space form parses too
    assert run1('strptime($s, "%c")', s="Sun Mar 3 12:00:00 2024") == dt.datetime(
        2024, 3, 3, 12, 0, 0
    )


def test_two_digit_year_pivot_matches_posix(run1):
    import datetime as dt

    # chrono/POSIX: 69-99 -> 19xx, 00-68 -> 20xx (Python strptime agrees)
    for s, want in [
        ("12/31/99", dt.date(1999, 12, 31)),
        ("01/01/69", dt.date(1969, 1, 1)),
        ("12/31/68", dt.date(2068, 12, 31)),
        ("06/15/00", dt.date(2000, 6, 15)),
    ]:
        got = run1('strptime($s, "%D")', s=s)
        assert got == want, (s, got)
        assert want == dt.datetime.strptime(s, "%m/%d/%y").date()


def test_day_of_week_names_parse_via_strip_plan(run1):
    import datetime as dt

    # Leading / trailing day names are stripped (redundant for the date);
    # the remainder parses natively.  Matches DuckDB's %a: a valid but
    # INCONSISTENT weekday is ignored (chrono would reject — documented).
    cases = [
        ("%a %d %b %Y", "Thu 03 Mar 2005", dt.date(2005, 3, 3)),
        ("%A, %d %B %Y", "Thursday, 03 March 2005", dt.date(2005, 3, 3)),
        ("%Y-%m-%d %a", "2005-03-03 Thu", dt.date(2005, 3, 3)),
        ("%a %d %b %Y", "Mon 03 Mar 2005", dt.date(2005, 3, 3)),  # ignored
        ("%a, %d %b %Y %H:%M:%S", "Thu, 03 Mar 2005 10:30:00",
         dt.datetime(2005, 3, 3, 10, 30)),
    ]
    for fmt, s, want in cases:
        assert run1(f'strptime($s, "{fmt}")', s=s) == want, (fmt, s)
    # a non-day-name word does NOT strip -> strict raises / lax nulls
    assert run1("$s::?'%a %d %b %Y'", s="Xyz 03 Mar 2005") is None


def test_day_name_mid_format_strips(run1):
    import datetime as dt

    # mid-format day name: stripped via the ^-anchored non-greedy prefix
    # capture, remainder parses (was a loud reject through round 6)
    assert run1('strptime($s, "%d %a %b %Y")', s="03 Thu Mar 2005") == dt.date(
        2005, 3, 3
    )
    assert run1('strptime($s, "%d-%A-%m-%Y")', s="28-Friday-02-2020") == dt.date(
        2020, 2, 28
    )
    # two day-name codes: sequential strips consume left to right
    assert run1('strptime($s, "%a %d %a %b %Y")', s="Thu 03 Thu Mar 2005") == dt.date(
        2005, 3, 3
    )
    # a non-day-name word in the mid slot does NOT strip -> lax nulls
    assert run1("$s::?'%d %a %b %Y'", s="03 Xyz Mar 2005") is None


def test_century_pairs_with_two_digit_year(run1):
    import datetime as dt

    assert run1("strptime($s, '%C%y-%m-%d')", s="2024-06-15") == dt.date(2024, 6, 15)
    assert run1("strptime($s, '%C%y%m%d')", s="19991231") == dt.date(1999, 12, 31)
    # century explicit -> NO two-digit-year pivot: 0069 is year 69, not 1969
    assert run1("strptime($s, '%C%y-%m-%d')", s="0069-01-01") == dt.date(69, 1, 1)
    # literal-separated pairing: the separator splices out of the input
    # (was a loud reject through round 6)
    assert run1("strptime($s, '%C|%y')", s="20|24") == dt.date(2024, 1, 1)
    assert run1("strptime($s, '%C|%y-%m-%d')", s="19|99-12-31") == dt.date(
        1999, 12, 31
    )
    import pytest as _pytest

    # %C with no %y pairing anywhere still rejects loudly
    with _pytest.raises(Exception, match="paired with %y"):
        run1("strptime($s, '%C-%m-%d')", s="20-06-15")


def test_offset_with_seconds(run1):
    import datetime as dt

    got = run1(
        "strptime($s, '%Y-%m-%dT%H:%M:%S%::z')", s="2024-06-15T10:30:45+05:30:00"
    )
    assert got == dt.datetime(2024, 6, 15, 5, 0, 45)
    assert chrono.to_java("%::z") == "xxxxx"


def test_dayname_century_roundtrip_property(run1):
    """Property: for a spread of dates, any supported day-name/century
    format produced by Python's own C-locale strftime parses back to the
    same date through the engine's strip/rewrite plans."""
    import datetime as dt
    import locale

    # the engine parses C-locale names; Python strftime follows LC_TIME —
    # pin it so the test is environment-independent
    prev = locale.setlocale(locale.LC_TIME)
    locale.setlocale(locale.LC_TIME, "C")
    try:
        _dayname_century_cases(run1, dt)
    finally:
        locale.setlocale(locale.LC_TIME, prev)


def _dayname_century_cases(run1, dt):
    fmts = [
        "%a %d %b %Y",
        "%A, %d %B %Y",
        "%Y-%m-%d %a",
        "%C%y-%m-%d",
        "%a, %C%y/%m/%d",
    ]
    d0 = dt.date(1999, 11, 20)
    for off in range(0, 700, 37):  # crosses two year boundaries + leap year
        day = d0 + dt.timedelta(days=off)
        for fmt in fmts:
            py_fmt = fmt.replace("%C%y", "%Y")  # CPython lacks %C; equal bytes
            s = day.strftime(py_fmt)
            got = run1(f"strptime($s, '{fmt}')", s=s)
            assert got == day, (fmt, s, got)


def test_c_locale_composite_anywhere(run1):
    """%c is no longer exact-format-only: rewrite_locale expands it to its
    fixed C-locale component codes, so it lowers mid-format too (the
    reference accepts whatever chrono accepts)."""
    import datetime as dt

    want = dt.datetime(2001, 7, 8, 0, 34, 59)
    cases = [
        ("[%c]", "[Sun Jul  8 00:34:59 2001]"),
        ("at %c!", "at Sun Jul  8 00:34:59 2001!"),
        ("%c +0000", "Sun Jul  8 00:34:59 2001 +0000"),
        ("logged %c by admin", "logged Sun Jul  8 00:34:59 2001 by admin"),
        # whitespace canonicalization: pads and stray runs collapse
        ("%c", "\tSun Jul  8   00:34:59  2001 "),
    ]
    for fmt, s in cases:
        assert run1(f'strptime($s, "{fmt}")', s=s) == want, (fmt, s)


def test_space_padded_codes_parse_both_forms(run1):
    """chrono parses %e/%k/%l with an OPTIONAL leading space (their print
    form is space-padded); the pad_plan strip makes Java's bare d/H/h
    letters accept both forms at the code's anchored position."""
    import datetime as dt

    assert run1('strptime($s, "%e/%m/%Y")', s=" 8/07/2001") == dt.date(2001, 7, 8)
    assert run1('strptime($s, "%e/%m/%Y")', s="8/07/2001") == dt.date(2001, 7, 8)
    assert run1('strptime($s, "%e/%m/%Y")', s="18/07/2001") == dt.date(2001, 7, 18)
    for s, want in [("2020-01-02T 9:30", 9), ("2020-01-02T19:30", 19)]:
        got = run1('strptime($s, "%Y-%m-%dT%k:%M")', s=s)
        assert got == dt.datetime(2020, 1, 2, want, 30), s
    h12 = run1('strptime($s, "%l:%M %p")', s=" 3:05 pm")
    assert h12 == (15 * 3600 + 5 * 60) * 1_000_000  # micros since midnight
    # a space NOT at the pad position is still an error, not silently eaten
    assert run1('$s ::? "%e/%m/%Y"', s="8/ 7/2001") is None


def test_quote_literal_runs_are_single_sections():
    """Multi-char literal runs must become ONE quoted section: Java reads
    adjacent per-char sections 'a''t' as the literal a't (escaped quote),
    and unquoted [ ] # { } are reserved pattern syntax."""
    assert chrono.to_java("%j of %Y") == "DDD 'of' yyyy"
    assert chrono.to_java("[%Y]") == "'['yyyy']'"
    assert chrono.to_java("Date[%F]") == "'Date['yyyy-MM-dd']'"
    assert chrono.to_java("%H o'clock") == "HH 'o''clock'"


def test_locale_pad_roundtrip_property(run1):
    """Print with CPython's C-locale strftime, parse back through the
    engine's strip/expansion plans — date/datetime equality across a
    2-year spread for every %c/%e/%k/%l shape (the chrono contract is
    'accept what chrono prints')."""
    import datetime as dt
    import locale

    prev = locale.setlocale(locale.LC_TIME)
    locale.setlocale(locale.LC_TIME, "C")
    try:
        _locale_pad_cases(run1, dt)
    finally:
        locale.setlocale(locale.LC_TIME, prev)


def _locale_pad_cases(run1, dt):
    fmts = ["%c", "[%c]", "log %c end", "%e/%m/%Y", "%Y-%m-%dT%k:%M"]
    t0 = dt.datetime(2019, 12, 25, 0, 5, 9)
    for off in range(0, 700, 53):  # crosses years; hits 1-digit + 2-digit days
        ts = t0 + dt.timedelta(days=off, hours=off % 24, minutes=off % 60)
        for fmt in fmts:
            # CPython lacks %e/%k: emulate their SPACE-PADDED print forms
            # (a leading zero becomes a leading space — the exact shape the
            # pad strip exists for; bare forms are covered by
            # test_space_padded_codes_parse_both_forms)
            py_fmt = fmt.replace("%e", "%d").replace("%k", "%H")
            s = ts.strftime(py_fmt)
            if fmt.startswith("%e") and s.startswith("0"):
                s = " " + s[1:]
            if "%k" in fmt:
                s = s.replace("T0", "T ", 1)
            want = ts if ("%c" in fmt or "%k" in fmt) else ts.date()
            if "%c" in fmt:
                want = ts.replace(microsecond=0)
            elif "%k" in fmt:
                want = ts.replace(second=0, microsecond=0)
            got = run1(f"strptime($s, '{fmt}')", s=s)
            assert got == want, (fmt, s, got, want)


def test_pad_plan_skips_unanchorable_prefixes(run1):
    """A pad code preceded by a shape-less code (%Z has no _CODE_RX entry)
    must not fail the whole lowering: the strip is SKIPPED (bare forms
    still parse — the pre-pad-plan status quo), never a hard reject."""
    assert chrono.pad_plan("%Z %k:%M")["strips"] == []
    # end-to-end: the format lowers and parses the bare form
    got = run1('strptime($s, "%Z %k:%M")', s="UTC 19:30")
    assert got == (19 * 3600 + 30 * 60) * 1_000_000


def test_literal_percent_s_does_not_hijack_epoch(run1):
    """'%%s' is a literal percent-s: the epoch-seconds special path keys on
    a real CODE scan, so such formats parse as text instead of reading the
    whole source as epoch seconds."""
    import datetime as dt

    got = run1('strptime($s, "%Y %H %%s")', s="2024 13 %s")
    assert got == dt.datetime(2024, 1, 1, 13, 0, 0)
    # the exact-'%s' epoch path is unaffected
    assert run1('strptime($s, "%s")', s="0") == dt.datetime(1970, 1, 1)
