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
    "%C",   # century
    "%w",   # weekday 0=Sun (alone, without %U/%W)
    "%u",   # ISO weekday (Java 'e' is week-based → Spark rejects)
    "%V",   # ISO week (Java 'ww' is week-based → Spark rejects)
    "%G",   # ISO week-based year
    "%g",   # ISO week-based year, 2-digit
    "%x",   # locale date
    "%X",   # locale time
    "%c",   # locale datetime
    "%::z",
]


@pytest.mark.parametrize("code", UNSUPPORTED)
def test_unsupported_codes_raise_at_lowering(code):
    fmt = f"%Y {code}" if code not in ("%x", "%X", "%c") else code
    with pytest.raises(ValueError, match="no Java DateTimeFormatter equivalent"):
        chrono.to_java(fmt)


@pytest.mark.parametrize("code", ["%u", "%V", "%G", "%g"])
def test_week_based_codes_fail_at_lowering_not_runtime(run1, code):
    # End-to-end: a strptime with a week-based code must fail while the plan
    # is being built (ValueError), not as an opaque executor exception.
    with pytest.raises(ValueError, match="no Java DateTimeFormatter equivalent"):
        run1(f"strptime($t, '%Y {code}')", t="2024 1")


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
        ("%j of %Y", "DDD 'o''f' yyyy"),
    ],
)
def test_supported_translations(fmt, java):
    if java is None:
        with pytest.raises(ValueError):
            chrono.to_java(fmt)
    else:
        assert chrono.to_java(fmt) == java
