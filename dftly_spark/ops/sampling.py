"""Deterministic splits and samples for training-data pipelines.

Train/val/test assignment and per-stratum downsampling must be (a) stable
across reruns and cluster sizes, (b) reproducible from the row's identity
alone — never ``rand()``, whose values depend on partitioning and retries.
Both ops here key off an integer id through a fixed LCG mix, so membership
is a pure row-local expression: no shuffle, no state, trivially pushed into
scans, and exactly reproducible in any engine (the mixer is plain modular
arithmetic, which is how the driver's DuckDB oracles replay it bit-for-bit
— a cryptographic hash would be Spark-only).

The mix is an LCG step (glibc constants) over a 2³¹ modulus: uniform enough
for percentage gates on ids with any distribution, and overflow-free for
``|id| < 2⁶³ / 1103515245 ≈ 8.4e9``.  For adversarial or string ids, hash
to an id first (``xxhash64``) and accept engine-specific membership.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_A, _C, _M = 1103515245, 12345, 2**31


def _mix(id_col: Column, seed: int) -> Column:
    return F.pmod(id_col.cast("bigint") * _A + (_C + seed), F.lit(_M))


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    *,
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split with the given fractions.

    ``fractions`` must sum to 1 (e.g. ``{"train": .9, "val": .05,
    "test": .05}``).  Assignment is ``mix(id) / 2³¹`` against cumulative
    integer thresholds — deterministic, partition-independent, and
    disjoint+exhaustive by construction.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = _mix(F.col(id_col), seed)
    cum = 0.0
    expr = None
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = u < int(cum * _M)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    *,
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows (corpus mixing).

    ``rates`` maps stratum value → keep-fraction; unlisted strata use
    ``default_rate``.  A row survives iff ``mix(id) < rate·2³¹`` — so a
    stratum's sample is NESTED across rates (the 10% sample is a subset of
    the 20% one), which is what you want when re-mixing data: raising a
    source's rate only adds documents.
    """
    for v in list(rates.values()) + [default_rate]:
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rates must be in [0, 1], got {v}")
    u = _mix(F.col(id_col), seed)
    thresh = None
    for value, rate in rates.items():
        cond = F.col(strata_col) == value
        t = F.lit(int(rate * _M))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = (
        F.lit(int(default_rate * _M))
        if thresh is None
        else thresh.otherwise(int(default_rate * _M))
    )
    return df.where(u < thresh)


def mix_sql(id_expr: str, seed: int = 0) -> str:
    """The mixer as ANSI SQL, for oracle parity: ``mix_sql('doc_id')``."""
    return f"(({id_expr} * {_A} + {_C + seed}) % {_M})"
