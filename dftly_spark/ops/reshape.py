"""Wide/long reshaping: pivot and melt (unpivot).

The reference has no table-level reshaping (it is a column-expression
compiler — SURVEY.md §0); these are part of the analytics surface a
warehouse user expects next to ``rollup_stats`` / ``histogram_fixed``.

100 TB design notes:

* ``pivot_wide`` with an explicit ``values`` list compiles to ONE keyed
  aggregation (map-side combine, then a single Exchange on ``keys``);
  the pivoted columns are plain conditional aggregates, so no extra
  shuffle or driver-side pass exists.  Passing ``values=None`` asks
  Spark to infer the pivot domain, which runs a driver-side distinct
  first (bounded by ``spark.sql.pivot.maxValues``, default 10k) — fine
  interactively, but production jobs at scale should always pin
  ``values`` so the plan is one-pass and the output schema is static.
* ``melt`` is row-local (Expand node): each input row fans out to
  ``len(value_cols)`` output rows inside the same task — no shuffle,
  no skew surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["pivot_wide", "melt"]

_AGGS = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
    "mean": F.avg,
}


def pivot_wide(
    df: DataFrame,
    keys: list[str],
    pivot_col: str,
    value_col: str,
    *,
    values: list | None = None,
    agg: str = "sum",
    prefix: str = "",
    fill=None,
) -> DataFrame:
    """Pivot ``pivot_col``'s domain into one aggregated column per value.

    ``values`` pins the pivot domain (recommended: one-pass plan, static
    schema); ``None`` lets Spark infer it with a driver-side distinct.
    ``prefix`` namespaces the generated columns (``prefix + str(value)``);
    ``fill`` replaces the NULL an absent (key, value) combination leaves.
    """
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}, got {agg!r}")
    grouped = df.groupBy(*[F.col(k) for k in keys])
    if values is not None:
        # Pinned domain: compile to conditional aggregates directly.
        # Spark's own `.pivot(col, values)` plans TWO aggregations
        # ((keys, pivot) partial sums, then a pivotfirst regroup by keys —
        # two Exchanges); the when()-guarded form is the one-Exchange plan
        # and is what the SQL oracle replays.
        fn = _AGGS[agg]
        out = grouped.agg(
            *[
                fn(
                    F.when(F.col(pivot_col) == F.lit(v), F.col(value_col))
                ).alias(f"{prefix}{v}")
                for v in values
            ]
        )
    else:
        out = grouped.pivot(pivot_col).agg(_AGGS[agg](F.col(value_col)))
        if prefix:
            for v in out.columns:
                if v not in keys:
                    out = out.withColumnRenamed(v, f"{prefix}{v}")
    if fill is not None:
        out = out.fillna(fill, subset=[c for c in out.columns if c not in keys])
    return out


def melt(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    *,
    var_name: str = "variable",
    value_name: str = "value",
    cast: str | None = "double",
) -> DataFrame:
    """Unpivot ``value_cols`` into (``var_name``, ``value_name``) long form.

    Spark's ``unpivot`` requires a common value dtype; ``cast`` coerces
    every value column first (``None`` to skip when they already agree).
    Row-local Expand — no shuffle.
    """
    src: DataFrame = df
    cols: list[Column | str] = list(value_cols)
    if cast is not None:
        src = df.select(
            *[F.col(c) for c in id_cols],
            *[F.col(c).cast(cast).alias(c) for c in value_cols],
        )
    return src.unpivot(
        [F.col(c) for c in id_cols], [F.col(c) for c in cols], var_name, value_name
    )
