"""Skew and shuffle hygiene utilities for 1000-executor-scale jobs.

Two standard patterns, packaged:

* :func:`salted_agg` — two-phase aggregation for skewed group keys: a random
  salt splits each hot key across ``salt`` partial groups (map-side combine
  still applies), then a second exact-key pass merges partials.  Turns one
  straggler reducer into ``salt`` parallel ones.
* :func:`write_bucketed` / :func:`read_bucketed` — persist a table bucketed
  by its join key so repeated joins on that key are co-located (no Exchange
  in the join plan).  This is the batch analogue of co-partitioned state:
  pay the shuffle once at write time, never again.

AQE (``spark.sql.adaptive.enabled`` + skew-join handling) covers many join
skews automatically; ``salted_agg`` is for the aggregation case AQE doesn't
split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: merge function for each partial-aggregate kind
_MERGE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
_PARTIAL = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    salt: int = 32,
) -> DataFrame:
    """Two-phase (salted) aggregation: exact results, skew-proof shuffle.

    ``aggs`` maps output name → ``(kind, column)`` with kind in
    ``count|sum|min|max`` (the re-aggregable kinds).  Phase 1 groups by
    (keys, random salt in [0, salt)); phase 2 merges partials by the exact
    keys.  Results are identical to a plain ``groupBy(keys).agg(...)``.
    """
    for kind, _ in aggs.values():
        if kind not in _MERGE:
            raise ValueError(f"unsupported re-aggregable kind: {kind}")
    salted = df.withColumn("_salt", (F.rand(seed=0) * salt).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[_PARTIAL[kind](col).alias(name) for name, (kind, col) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE[kind](name).alias(name) for name, (kind, _) in aggs.items()]
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str,
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Joins between two tables bucketed on the same key with the same bucket
    count are co-located: the join plan has no Exchange, so the shuffle is
    paid once at write time instead of on every query.
    """
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
