"""Item co-occurrence / association mining (market-basket style).

Given (group, item) observations — users × event types, sessions ×
products, documents × topics — compute pairwise co-occurrence counts and
the standard association strengths (support, lift, PMI).

100 TB design:

* The input collapses to DISTINCT (group, item) first: one keyed shuffle,
  map-side combine.  All later joins key on ``item`` (the small domain)
  or reuse the group partitioning.
* Pair generation is a self-join keyed on ``group`` — per-group work is
  C(items_in_group, 2), so a ``max_items_per_group`` cap (deterministic
  keep-first-k, same regime as LSH's ``max_bucket_size``) bounds monster
  groups.  The cap is surfaced, never silent: capped groups still emit
  pairs from their first k items.
* The scalar total (number of groups) is a 1-row ungrouped aggregate
  broadcast over the pair frame — the sanctioned scalar-attach pattern
  (same as bm25's corpus stats); allowlisted in the plan sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cooccurrence_pmi"]


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
    if max_items_per_group is not None:
        w = Window.partitionBy("_g").orderBy("_i")
        gi = (
            gi.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_items_per_group)
            .drop("_rn")
        )

    # Marginals and the group total: small aggregates, broadcast back in.
    item_counts = gi.groupBy("_i").agg(F.count("*").alias("_n_item"))
    totals = gi.agg(F.countDistinct("_g").alias("_n_groups"))

    a = gi.select(F.col("_g"), F.col("_i").alias("item_a"))
    b = gi.select(F.col("_g"), F.col("_i").alias("item_b"))
    pairs = (
        a.join(b, "_g")
        .where(F.col("item_a") < F.col("item_b"))
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
    lift = n * ng / (na * nb)
    return joined.select(
        "item_a",
        "item_b",
        "n_both",
        "n_a",
        "n_b",
        F.round(n / ng, round_to).alias("support"),
        F.round(lift, round_to).alias("lift"),
        F.round(F.log(lift), round_to).alias("pmi"),
    )
