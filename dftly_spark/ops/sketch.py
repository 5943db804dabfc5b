"""Mergeable sketches as relational aggregations.

Count-min in DataFrame form: the sketch IS a ``(row, bucket) → count``
frame, built by ONE keyed aggregation with map-side combine — so it
inherits everything Spark aggregation already has (mergeability across
partitions, AQE, spill) instead of hiding state in a UDAF.  Point queries
are a broadcast join against the sketch frame.

Two regimes, honestly separated:

* Exact heavy hitters (``key_skew_profile``, ops/profile.py) — the right
  tool when a full ``groupBy key`` is affordable: one shuffle whose width
  is the number of DISTINCT keys.
* Count-min (here) — when key cardinality itself is the problem (billions
  of distinct URLs/ngrams): shuffle width collapses to ``depth × width``
  REGARDLESS of cardinality, at the price of overestimation bounded by
  ``ε ≈ e/width`` of total mass with confidence ``1 - e^-depth``
  (Cormode & Muthukrishnan 2005).  Estimates NEVER undercount.

Hashing uses the engine's LCG mixer family (ops/sampling.py) with one seed
per sketch row — modular arithmetic any engine replays exactly, which is
how the DuckDB oracle checks the whole sketch bit-for-bit.  For string
keys, pre-hash to an id (``xxhash64``) and accept engine-specific buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import _M, _mix


def cms_build(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch of an integer key column: ``(row, bucket, n)``.

    ONE aggregation: each input row lands in ``depth`` (row, bucket) cells
    via a row-local explode, and the keyed count has map-side combine —
    shuffle volume is ``depth × width`` cells no matter how many distinct
    keys exist.  ``weight_col`` switches from counts to weighted mass.
    Sketches over different slices of a table union+re-aggregate into the
    sketch of the whole — the standard mergeability argument, as plain
    relational algebra.
    """
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row")
    mass = (
        F.col(weight_col).cast("double") if weight_col is not None else F.lit(1)
    )
    cells = df.select(
        F.col(key_col).alias("_k"), mass.alias("_m"), rows
    ).select(
        "row",
        F.pmod(_mix(F.col("_k"), F.col("row") * 1000 + 1), F.lit(width)).alias(
            "bucket"
        ),
        "_m",
    )
    return cells.groupBy("row", "bucket").agg(F.sum("_m").alias("n"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query a count-min sketch: ``(key, est)`` per probe key.

    ``est = min over sketch rows of that row's bucket count`` — an upper
    bound on the key's true mass (collisions only ADD).  The probe side is
    expanded row-locally to its ``depth`` cells and joined to the sketch on
    (row, bucket); with a small probe set the join broadcasts.  ``depth``
    and ``width`` must match the build call.
    """
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row")
    cells = probes.select(F.col(key_col).alias("key"), rows).select(
        "key",
        "row",
        F.pmod(_mix(F.col("key"), F.col("row") * 1000 + 1), F.lit(width)).alias(
            "bucket"
        ),
    )
    return (
        cells.join(sketch, ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est"))
    )


def cms_join_size(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches: the
    classic sketch inner product (Cormode & Muthukrishnan 2005, §4.2).

    ``est = min over sketch rows of Σ_bucket n_a·n_b`` — an UPPER bound on
    ``|A ⋈ B|`` (collisions only add), tight to within ``ε·|A|·|B|`` with
    the usual width/depth guarantees.  Both sketches must share depth,
    width, and the seed family (build both with :func:`cms_build`).  The
    row spine derives from the sketch itself — a caller-supplied depth
    mismatching the build would have injected phantom zero rows and
    silently broken the never-undercount guarantee.

    This is the planner's question — "how big would this join be?" —
    answered WITHOUT running the join or shuffling either table: each
    side was compressed to depth×width cells in one pass, and the
    estimate is a cell-aligned join of two tiny frames.  Sketches persist
    and merge (union + re-agg), so per-partition or per-day sketches
    roll up into the estimate for any slice combination.
    """
    a = sketch_a.select("row", "bucket", F.col("n").alias("_na"))
    b = sketch_b.select("row", "bucket", F.col("n").alias("_nb"))
    prods = (
        a.join(b, ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("_na") * F.col("_nb")).alias("_p"))
    )
    spine = sketch_a.select("row").distinct()
    return (
        spine.join(prods, "row", "left")
        .select(F.coalesce(F.col("_p"), F.lit(0)).alias("_p"))
        .agg(F.min("_p").alias("join_size_est"))
    )
