"""Execute the repo's own README.

The reference runs its README as a doctest suite
(/root/reference/pyproject.toml:37-43, --doctest-glob=*.md); this repo's
README uses plain fenced blocks, so this suite extracts every ```python
block and executes it, in order, in one shared namespace against the real
testdata — drifted docs fail CI instead of greeting the first new user.

It also pins the README's factual claims that otherwise rot: the declared
query count against the live ``__spark_entry__`` registry.
"""

from __future__ import annotations

import re
from pathlib import Path

README = Path(__file__).resolve().parent.parent / "README.md"


def _python_blocks() -> list[str]:
    text = README.read_text()
    return re.findall(r"```python\n(.*?)```", text, re.S)


def test_readme_python_blocks_execute(spark):
    """Every ```python block runs top to bottom, sharing one namespace
    (later blocks reuse the quick start's ``df``), with the in-repo
    testdata paths it quotes."""
    blocks = _python_blocks()
    assert len(blocks) >= 2, "README lost its python examples"
    ns: dict = {}
    for i, block in enumerate(blocks):
        exec(compile(block, f"README.md[python block {i}]", "exec"), ns)
    # the quick start's result frame computes and carries its columns
    out = ns["out"]
    assert {"revenue", "bucket", "ship_year", "flag_code"} <= set(out.columns)
    assert out.count() > 0
    # the three-forms block left real frames/columns behind
    assert "Add" in ns and "Column" in ns


def test_readme_query_count_matches_registry():
    """The 'declares N queries' / 'N/N hash-match' claims track the live
    registry — bump the README when registering a query."""
    import __spark_entry__ as entry

    n = len(entry.queries())
    text = README.read_text()
    m = re.search(r"declares (\d+) queries", text)
    assert m, "README no longer states the query count"
    assert int(m.group(1)) == n, (
        f"README declares {m.group(1)} queries but the registry has {n} — "
        "update the Correctness & benchmarks paragraph"
    )
    assert f"{n}/{n} hash-match" in text


def test_readme_chrono_error_points_to_table():
    """The loud chrono reject names the README table (the documented
    discovery path for the translated set)."""
    import pytest

    from dftly_spark.chrono import to_java

    with pytest.raises(ValueError, match="README"):
        to_java("%Y %g")
    # and the table really is in the README
    text = README.read_text()
    assert "translated 1:1" in text and "plan-lowered" in text
