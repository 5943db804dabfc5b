"""Graph analytics over relational edge lists.

``dup_clusters`` (ops/dedup.py) already does connected components for the
dedup pipeline; this module adds the other graph primitive a corpus/web
pipeline keeps reaching for — PageRank over a link/affinity graph (host
authority for crawl prioritization, supplier/customer importance, dup-graph
centrality).

Design for 100 TB graphs: every iteration is ONE edge-keyed equi-join plus
ONE destination-keyed aggregation — the standard bulk-synchronous PageRank
data layout (contributions flow along edges; no adjacency lists are ever
collected).  Node/edge frames are plain DataFrames, so AQE handles skewed
hubs the same way it handles any hot aggregation key (the classic
supernode caveat and its salting fix are the same as `salted_agg`).
Dangling nodes get SELF-LOOPS at prep time — the common production choice
(it conserves total rank mass without a second pass over the rank frame per
iteration), and the choice that keeps the update rule a single
relational expression an external engine can replay verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prepare_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Distinct edges + self-loops for dangling nodes: ``(_src, _dst)``.

    A node with no out-edges would leak rank mass every iteration; the
    self-loop repair keeps the transition matrix stochastic with one
    left-anti join, done ONCE before iterating.
    """
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst")).distinct()
    nodes = (
        e.select(F.col("_src").alias("_n"))
        .unionByName(e.select(F.col("_dst").alias("_n")))
        .distinct()
    )
    dangling = nodes.join(
        e.select("_src").distinct(), nodes["_n"] == F.col("_src"), "left_anti"
    )
    return e.unionByName(
        dangling.select(F.col("_n").alias("_src"), F.col("_n").alias("_dst"))
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iters: int = 5,
    damping: float = 0.85,
    decimals: int = 6,
    checkpoint_every: int | None = 8,
) -> DataFrame:
    """Fixed-iteration PageRank: ``(node, rank)`` after ``iters`` rounds.

    Fixed iteration count (not convergence-test) keeps the computation a
    deterministic function of the edge list — replayable by any engine —
    and is how production crawl-frontier ranks run anyway (a known
    iteration budget per refresh).  This is the UNNORMALIZED formulation
    (GraphX's default): ranks start at 1.0 and ``r = (1-d) + d·Σ
    contributions``, so total mass stays N and no corpus-count scalar ever
    needs to meet its own lineage in a join (Spark 4.1's self-join
    disambiguation rejects ``frame.crossJoin(frame.agg(...))`` as
    ambiguous).  Divide by N outside if you want a distribution.  Output
    is rounded to ``decimals`` because per-destination float sums are
    partition-order dependent at ~1e-15 per iteration.

    Each round: contributions = rank/out_degree shipped along edges (edge
    join keyed on ``_src``) and one ``_dst``-keyed sum.  The out-degree
    frame is computed once and reused every round (ReusedExchange).
    ``checkpoint_every`` truncates plan lineage on long runs exactly like
    ``dup_clusters``; at cluster scale point it at a real checkpoint dir.
    """
    e = prepare_edges(edges, src, dst)
    outdeg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
    nodes = e.select(F.col("_src").alias("_n")).distinct()
    ranks = nodes.select("_n", F.lit(1.0).alias("_r"))
    for i in range(iters):
        # distinct column names per join side: the iterated frames all
        # share lineage with `e`, and Spark's self-join resolution is
        # ambiguous for repeated attribute names across iterations
        r_side = ranks.select(
            F.col("_n").alias("_rsrc"), F.col("_r").alias("_rval")
        )
        contrib = (
            e.join(r_side, e["_src"] == r_side["_rsrc"])
            .join(outdeg, "_src")
            .select(
                F.col("_dst").alias("_cn"),
                (F.col("_rval") / F.col("_deg")).alias("_c"),
            )
            .groupBy("_cn")
            .agg(F.sum("_c").alias("_sum"))
        )
        ranks = nodes.join(
            contrib, nodes["_n"] == contrib["_cn"], "left"
        ).select(
            "_n",
            (
                F.lit(1.0 - damping)
                + damping * F.coalesce(F.col("_sum"), F.lit(0.0))
            ).alias("_r"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(F.col("_n").alias("node"), F.round("_r", decimals).alias("rank"))
