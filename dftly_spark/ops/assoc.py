"""Item co-occurrence / association mining (market-basket style).

Given (group, item) observations — users × event types, sessions ×
products, documents × topics — compute pairwise co-occurrence counts and
the standard association strengths (support, lift, PMI).

100 TB design:

* The input collapses to DISTINCT (group, item) first: one keyed shuffle,
  map-side combine.  All later joins key on ``item`` (the small domain)
  or reuse the group partitioning.
* Pair generation collects each group's (small) item set once and emits
  ordered pairs with two chained generators — NO self-join: the group's
  rows shuffle once into the collect, and each intermediate row holds
  only an O(items_in_group) slice, never the O(C(n,2)) pair set.
  Per-group work is still C(items_in_group, 2), so a
  ``max_items_per_group`` cap (deterministic keep-first-k, same regime
  as LSH's ``max_bucket_size``) bounds monster groups.  The cap is
  surfaced, never silent: capped groups still emit pairs from their
  first k items.
* The scalar total (number of groups) is a 1-row ungrouped aggregate
  broadcast over the pair frame — the sanctioned scalar-attach pattern
  (same as bm25's corpus stats); allowlisted in the plan sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sqlgen import portable_round

__all__ = ["basket_pairs", "cooccurrence_pmi"]


def basket_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    *,
    max_items_per_group: int | None = None,
) -> DataFrame:
    """Ordered item pairs co-occurring in a group: ``(_g, item_a, item_b)``
    with ``item_a < item_b``, one row per distinct (group, pair).

    The basket explode that replaces the classic pair self-join: collect
    each group's sorted distinct items (ONE keyed shuffle, map-side
    combine), then two chained generators — ``posexplode`` picks the
    anchor, ``explode(slice(...))`` emits its later partners — so no join
    build, no second shuffle of the input, and each intermediate row
    carries at most an O(items_in_group) array (the full C(n, 2) pair set
    is never materialized in one row).  Co-purchase edge lists, PMI pair
    counts, and any groupwise-cooccurrence graph build on this.
    """
    g, i = F.col(group_col), F.col(item_col)
    gi = (
        df.select(g.alias("_g"), i.alias("_i"))
        .where(g.isNotNull() & i.isNotNull())
        .distinct()
    )
    gi = _cap_items(gi, max_items_per_group)
    return _pairs_from_distinct(gi)


def _cap_items(gi: DataFrame, max_items_per_group: int | None) -> DataFrame:
    """Deterministic keep-first-k items per group (no-op when uncapped)."""
    if max_items_per_group is None:
        return gi
    w = Window.partitionBy("_g").orderBy("_i")
    return (
        gi.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_items_per_group)
        .drop("_rn")
    )


def _pairs_from_distinct(gi: DataFrame) -> DataFrame:
    """Pair emit over an ALREADY-distinct, already-capped (_g, _i) frame.

    Split out so internal callers that have just built such a frame
    (cooccurrence_pmi) don't pay a redundant exchange+aggregate for a
    semantically no-op second distinct in the hot path.
    """
    return (
        gi.groupBy("_g")
        .agg(F.sort_array(F.collect_list("_i")).alias("_is"))
        .select("_g", F.posexplode("_is").alias("_ix", "item_a"), F.col("_is"))
        .select(
            "_g",
            "item_a",
            F.explode(
                F.slice(F.col("_is"), F.col("_ix") + 2, F.size("_is"))
            ).alias("item_b"),
        )
    )


def cooccurrence_pmi(
    df: DataFrame,
    group_col: str,
    item_col: str,
    *,
    min_pair_count: int = 1,
    max_items_per_group: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Pairwise item association over groups.

    Output: one row per unordered item pair (``item_a < item_b``) with
    ``n_both`` (groups containing both), ``n_a`` / ``n_b`` (marginals),
    ``support`` = n_both / n_groups, ``lift`` = support / (p_a * p_b) and
    ``pmi`` = ln(lift), rounded to ``round_to`` to absorb cross-engine
    float wobble.
    """
    g, i = F.col(group_col), F.col(item_col)
    gi = (
        df.select(g.alias("_g"), i.alias("_i"))
        .where(g.isNotNull() & i.isNotNull())
        .distinct()
    )
    gi = _cap_items(gi, max_items_per_group)

    # Marginals and the group total: small aggregates, broadcast back in.
    item_counts = gi.groupBy("_i").agg(F.count("*").alias("_n_item"))
    totals = gi.agg(F.countDistinct("_g").alias("_n_groups"))

    # Pair emit via the basket explode: gi is already distinct + capped,
    # so use the post-distinct body directly — going through basket_pairs
    # would insert a semantically no-op but physically real second
    # exchange+aggregate into the hot path.
    pairs = (
        _pairs_from_distinct(gi)
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_both"))
        .where(F.col("n_both") >= min_pair_count)
    )

    joined = (
        pairs.join(
            F.broadcast(item_counts.select(F.col("_i").alias("item_a"),
                                           F.col("_n_item").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(item_counts.select(F.col("_i").alias("item_b"),
                                           F.col("_n_item").alias("n_b"))),
            "item_b",
        )
        # Scalar attach: the group total is an ungrouped aggregate — always
        # exactly ONE row — so Catalyst plans a conditionless 1-row
        # BroadcastNestedLoopJoin.  That is the optimal scalar-broadcast
        # plan (the same sanctioned pattern as bm25's corpus stats or
        # tf_idf's corpus size), not an accidental cross join.
        .join(F.broadcast(totals))
    )
    n, na, nb, ng = (
        F.col("n_both").cast("double"),
        F.col("n_a").cast("double"),
        F.col("n_b").cast("double"),
        F.col("_n_groups").cast("double"),
    )
    # portable floor-scale rounding, not round(): Spark HALF_UP and
    # DuckDB's float-multiply round disagree exactly at the .5*10^-d
    # boundary, and regenerated data can land a knife-edge row any round
    lift = n * ng / (na * nb)
    return joined.select(
        "item_a",
        "item_b",
        "n_both",
        "n_a",
        "n_b",
        portable_round(n / ng, round_to).alias("support"),
        portable_round(lift, round_to).alias("lift"),
        portable_round(F.log(lift), round_to).alias("pmi"),
    )
