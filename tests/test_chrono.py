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
    "%w",   # weekday 0=Sun
    "%u",   # ISO weekday (Java 'e' is week-based → Spark rejects)
    "%U",   # week of year, Sunday-first
    "%W",   # week of year, Monday-first
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
