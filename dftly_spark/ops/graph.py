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

from .scale import durable_checkpoint

from ..sqlgen import portable_round

# Edge rows per forced-shuffle-hash build task in triangle_count.  The
# build side holds m/partitions (src, dst[, deg]) rows in an in-memory
# hash map that cannot spill; ~150k rows is ~10-15 MB of map — the ratio
# the 19M-edge/128-partition SCALING.md probe ran linear at, with
# comfortable headroom on a 1 GiB executor heap.
_EDGES_PER_BUILD_TASK = 150_000

# Hash buckets for the opt-in ``validate=True`` sampled assertions: the
# checked subset is rows whose key hashes into bucket 0, ~1/32 of keys.
_VALIDATE_BUCKETS = 32


def _validate_distinct(df: DataFrame, cols: list[str], claim: str) -> None:
    """Debug guard for ``assume_distinct``: sampled duplicate detection.

    Hash-BUCKET sampling, not row sampling: every copy of a duplicated key
    carries the same ``xxhash64``, so all copies land in the sampled bucket
    together and any duplicate whose key falls in the bucket IS caught
    (per-duplicate detection probability = 1/``_VALIDATE_BUCKETS``, vs an
    independent-row sample which usually keeps only one copy and sees
    nothing).  Runs one count job eagerly — debug mode, opt-in.
    """
    sampled = df.where(
        F.pmod(F.xxhash64(*cols), F.lit(_VALIDATE_BUCKETS)) == 0
    ).select(*cols)
    n_rows = sampled.count()
    n_keys = sampled.distinct().count()
    if n_rows != n_keys:
        raise ValueError(
            f"validate=True: {claim} is FALSE — the sampled hash bucket holds "
            f"{n_rows} rows over {n_keys} distinct keys; drop the assume_* "
            "flag (or fix the edge build) to avoid silently wrong results"
        )


def _validate_full_in_degree(e: DataFrame) -> None:
    """Debug guard for ``assume_full_in_degree``: sampled in-edge check.

    A node appears among destinations iff it appears among the SAME hash
    bucket's destinations, so both sides of the anti-join are pre-filtered
    to one bucket — the check costs two bucket scans, not a full dedup.
    """
    bucket = lambda c: F.pmod(F.xxhash64(c), F.lit(_VALIDATE_BUCKETS)) == 0  # noqa: E731
    srcs = e.select(F.col("_src").alias("_n")).where(bucket(F.col("_n"))).distinct()
    dsts = e.select(F.col("_dst").alias("_m")).where(bucket(F.col("_m"))).distinct()
    missing = srcs.join(dsts, srcs["_n"] == dsts["_m"], "left_anti").count()
    if missing:
        raise ValueError(
            f"validate=True: assume_full_in_degree is FALSE — {missing} sampled "
            "node(s) have no in-edge; their ranks would silently drop from the "
            "output.  Drop the flag (or symmetrize the graph)."
        )


def prepare_edges(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    weight: str | None = None,
    assume_distinct: bool = False,
    repair_dangling: bool = True,
    validate: bool = False,
) -> DataFrame:
    """Distinct edges + self-loops for dangling nodes: ``(_src, _dst)``.

    A node with no out-edges would leak rank mass every iteration; the
    self-loop repair keeps the transition matrix stochastic with one
    left-anti join, done ONCE before iterating.

    Each guard costs a shuffle over the edge list, so callers that
    GUARANTEE the property can skip it: ``assume_distinct=True`` when the
    edge list is already deduplicated (e.g. built by a distinct),
    ``repair_dangling=False`` when every node provably has an out-edge
    (e.g. a symmetrized/bidirectional graph).  Wrong claims silently skew
    ranks — only pass them when the property is structural.
    """
    if weight is not None:
        e = edges.select(
            F.col(src).alias("_src"), F.col(dst).alias("_dst"),
            F.col(weight).cast("double").alias("_w"),
        )
        # the weighted update divides by out-strength: null or non-positive
        # weights would null contributions (non-ANSI divide) or flip signs,
        # silently destroying rank mass — drop them here (a node whose
        # edges ALL drop becomes dangling and gets the self-loop repair)
        e = e.where(F.col("_w") > 0)
        if assume_distinct and validate:
            _validate_distinct(e, ["_src", "_dst"], "assume_distinct (prepare_edges)")
        if not assume_distinct:
            # parallel weighted edges COMBINE (sum), the weighted analog of
            # the unweighted distinct
            e = e.groupBy("_src", "_dst").agg(F.sum("_w").alias("_w"))
    else:
        e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
        if assume_distinct and validate:
            _validate_distinct(e, ["_src", "_dst"], "assume_distinct (prepare_edges)")
        if not assume_distinct:
            e = e.distinct()
    if not repair_dangling:
        return e
    nodes = (
        e.select(F.col("_src").alias("_n"))
        .unionByName(e.select(F.col("_dst").alias("_n")))
        .distinct()
    )
    dangling = nodes.join(
        e.select("_src").distinct(), nodes["_n"] == F.col("_src"), "left_anti"
    )
    loop_cols = [F.col("_n").alias("_src"), F.col("_n").alias("_dst")]
    if weight is not None:
        loop_cols.append(F.lit(1.0).alias("_w"))
    return e.unionByName(dangling.select(*loop_cols))


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    partitions: int | None = None,
    assume_distinct: bool = False,
    validate: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Per-node triangle counts: ``(node, triangles)`` for an undirected graph.

    ``validate=True`` (debug mode) asserts an ``assume_distinct`` claim on
    a hash-sampled bucket of the canonical edge frame before trusting it —
    one extra count job; a violating edge list raises instead of silently
    double-counting triangles.

    Degree-oriented wedge closing (the MapReduce-classic node-iterator++
    layout): edges are canonicalized undirected, then ORIENTED from the
    lower-(degree, id) endpoint to the higher, so every triangle is
    enumerated exactly once from its lowest-ranked corner AND the oriented
    out-degree is bounded by O(sqrt(m)) — the hub-supernode defense that
    keeps the wedge self-join's fanout polynomial-free at web scale, where
    orienting by raw id would put a celebrity node's full neighbor list on
    one side of the join.  Three shuffles total: degree agg, wedge
    self-join (equi on the wedge corner, the rank predicate rides along),
    and the closing equi-join; per-node counts are one final explode+agg.
    Counts are orientation-invariant, so any engine can replay them with
    plain id-ordered enumeration.
    """
    # ``checkpoint_dir`` mirrors pagerank: durable checkpoint() for
    # cluster runs (survives executor loss); otherwise durable_checkpoint
    # honors a session-level setCheckpointDir, local only as last resort.
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=False)

    else:

        def _ckpt(df: DataFrame) -> DataFrame:
            return durable_checkpoint(df, eager=False)

    ab = edges.select(F.col(src).alias("_a"), F.col(dst).alias("_b")).where(
        F.col(src) != F.col(dst)
    )
    # The canonical edge frame is referenced four times (two degree joins +
    # the orientation) and the oriented frame three times (both wedge sides
    # + the closer) — without lineage truncation the caller's whole edge
    # build re-executes (and re-broadcasts) once per reference, which is
    # both 5× the work and the actual heap blowup on small executors.
    # assume_distinct: the caller GUARANTEES the edge list is already a
    # distinct set of canonical (src < dst) undirected edges (e.g. it just
    # ran .distinct() on basket-explode output) — the canonicalizing
    # projection stays (row-local) but the dedup exchange is skipped.  A
    # wrong claim double-counts triangles through parallel edges.
    und = ab.select(
        F.least("_a", "_b").alias("_u"), F.greatest("_a", "_b").alias("_v")
    )
    if assume_distinct and validate:
        _validate_distinct(und, ["_u", "_v"], "assume_distinct (triangle_count)")
    if not assume_distinct:
        und = und.distinct()
    und = _ckpt(und)
    deg = (
        und.select(F.col("_u").alias("_n"))
        .unionByName(und.select(F.col("_v").alias("_n")))
        .groupBy("_n")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    du = deg.select(F.col("_n").alias("_un"), F.col("_d").alias("_ud"))
    dv = deg.select(F.col("_n").alias("_vn"), F.col("_d").alias("_vd"))
    with_deg = und.join(du, und["_u"] == du["_un"]).join(
        dv, und["_v"] == dv["_vn"]
    )
    # (deg, id) lexicographic order spelled as primitive comparisons, NOT
    # F.struct(a, b) < F.struct(c, d): the struct form allocates two rows
    # per evaluation, and in the wedge join below that is two allocations
    # per PROBED CANDIDATE — round-15 A/B at sf1.0 (12M edges, 411M
    # wedges): struct 72.8 s cold / 5.2-9.3 s warm vs flat 7.4 s cold /
    # 3.7-3.8 s warm.  Fields are non-null (counts and edge endpoints), so
    # the boolean form is exactly the struct ordering.
    u_first = (F.col("_ud") < F.col("_vd")) | (
        (F.col("_ud") == F.col("_vd")) & (F.col("_u") < F.col("_v"))
    )
    oriented = _ckpt(
        with_deg.select(
            F.when(u_first, F.col("_u")).otherwise(F.col("_v")).alias("_s"),
            F.when(u_first, F.col("_v")).otherwise(F.col("_u")).alias("_t"),
            F.when(u_first, F.col("_vd")).otherwise(F.col("_ud")).alias("_td"),
        )
    )
    e1 = oriented.select(
        F.col("_s").alias("_w1s"), F.col("_t").alias("_w1t"), F.col("_td").alias("_w1d")
    )
    e2 = oriented.select(
        F.col("_s").alias("_w2s"), F.col("_t").alias("_w2t"), F.col("_td").alias("_w2d")
    )
    # SHUFFLE_HASH hints building the EDGE side of both joins: the wedge
    # list is O(m·d_max) rows — the dominant intermediate — and must only
    # ever be STREAMED, never sorted and never built into a hash map.  A
    # sort-merge plan here sorts the wedge stream; under a small executor
    # heap that sort degenerates into hundreds of spill files whose merge
    # read-ahead buffers alone exhaust the heap (observed at sf0.1 / 1 GiB
    # heap).  The edge side is m/num_partitions rows per task — a few MB
    # of hash map — so shuffled-hash keeps peak memory flat regardless of
    # wedge count.
    # ``partitions``: the forced-hash build's per-task budget is
    # m/partitions and it CANNOT spill — size partitions so an edge
    # slice fits executor memory (measured: 19M edges over 32 partitions
    # fails the build on an 8 GiB heap; over 128 it runs linear —
    # SCALING.md).  None = DERIVED from the edge count: one count on the
    # already-checkpointed oriented frame (materializes the checkpoint the
    # joins need anyway, so the extra job is a cache scan), targeting
    # ``_EDGES_PER_BUILD_TASK`` edge rows per hash build — never below the
    # session's shuffle.partitions, so small graphs keep full parallelism.
    if partitions is None:
        m = oriented.count()
        try:
            sess = int(
                oriented.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        except (TypeError, ValueError):
            sess = 200
        partitions = max(sess, -(-m // _EDGES_PER_BUILD_TASK))
    e2 = e2.repartition(partitions, "_w2s")
    # rank predicate in primitive-comparison form — see u_first above; this
    # is the hot expression of the whole operator (evaluated once per
    # candidate wedge pair, ~2 per wedge)
    rank_lt = (e1["_w1d"] < e2["_w2d"]) | (
        (e1["_w1d"] == e2["_w2d"]) & (e1["_w1t"] < e2["_w2t"])
    )
    wedges = e1.join(
        e2.hint("shuffle_hash"), (e1["_w1s"] == e2["_w2s"]) & rank_lt
    ).select("_w1s", "_w1t", "_w2t")
    closer = oriented.select(
        F.col("_s").alias("_cs"), F.col("_t").alias("_ct")
    ).repartition(partitions, "_cs", "_ct")
    tris = wedges.join(
        closer.hint("shuffle_hash"),
        (wedges["_w1t"] == closer["_cs"]) & (wedges["_w2t"] == closer["_ct"]),
        "left_semi",
    )
    return (
        tris.select(
            F.explode(F.array("_w1s", "_w1t", "_w2t")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    *,
    max_rounds: int = 8,
    checkpoint_every: int = 3,
    broadcast_survivors: bool = True,
    assume_distinct: bool = False,
    validate: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Nodes of the ``k``-core after ``max_rounds`` of peeling:
    ``(node, degree, converged)`` within the surviving subgraph.

    Iteratively removes nodes of degree < ``k`` (and their edges) from the
    undirected graph — the standard dense-subgraph / spam-farm / community
    filter.  Peeling is run a FIXED ``max_rounds`` times so the result is
    a deterministic function of the edge list that any engine replays
    verbatim (the pagerank convention); ``converged`` (same value on every
    row, a 1-row scalar attach) is TRUE iff no surviving node has degree
    < ``k`` — i.e. the budget sufficed and the output IS the exact
    k-core.  A FALSE flag means the peel was truncated: re-run with a
    larger ``max_rounds`` (cheap: each round is ONE degree agg + ONE
    semi-join per endpoint over the shrinking edge frame).

    Scale shape: the symmetric edge frame is the only data-sized object;
    per round, degrees come from one map-side-combined count on ``_src``
    and survivors from one left-semi hash join per endpoint against the
    (≤ nodes)-sized survivor list.  Lineage is truncated per round
    (durable ``checkpoint_dir`` for clusters, ``localCheckpoint``
    otherwise) so the iterated plan never re-executes the caller's build.
    """
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=False)

    else:

        def _ckpt(df: DataFrame) -> DataFrame:
            return durable_checkpoint(df, eager=False)

    ab = edges.select(F.col(src).alias("_a"), F.col(dst).alias("_b")).where(
        F.col(src) != F.col(dst)
    )
    # assume_distinct: same contract as triangle_count — the edge list is
    # already a distinct canonical undirected set, so the dedup exchange
    # is skipped (a wrong claim inflates degrees via parallel edges).
    und = ab.select(
        F.least("_a", "_b").alias("_u"), F.greatest("_a", "_b").alias("_v")
    )
    if assume_distinct and validate:
        _validate_distinct(und, ["_u", "_v"], "assume_distinct (kcore)")
    if not assume_distinct:
        und = und.distinct()
    # symmetric orientation: node degree == out-degree of _s
    e = _ckpt(
        und.select(F.col("_u").alias("_s"), F.col("_v").alias("_t")).unionByName(
            und.select(F.col("_v").alias("_s"), F.col("_u").alias("_t"))
        )
    )
    # Survivor-list BROADCAST + sparse checkpointing (measured at sf0.1
    # ×4 replicas: 45.6s → 11.7s, growth 6.9× → 2.0× at 4× data): with
    # the survivor list broadcast, each round's two semi-joins are
    # row-local probes — no per-round shuffle of the edge frame — which
    # ALSO makes un-checkpointed rounds cheap to re-derive (a cache scan
    # + broadcast filters), so caching every round is wasteful: the
    # per-round cache generations were the super-linear term (block-store
    # churn + shuffle-file accumulation).  ``broadcast_survivors=False``
    # falls back to shuffle semi-joins + per-round checkpoints for graphs
    # whose per-round survivor list itself exceeds broadcast size
    # (billions of nodes).
    every = checkpoint_every if broadcast_survivors else 1
    # Fixed-point early exit at checkpoint boundaries: surviving-edge
    # counts are monotonically non-increasing, so an UNCHANGED count
    # across a whole checkpoint window proves no round in the window
    # removed anything — every remaining round is the identity and the
    # full-budget output is already in hand (bit-identical result, so
    # oracles replaying the whole budget still match).  The count rides
    # the materialization the checkpoint performs anyway; checking MORE
    # often is a loss (a mid-window count re-derives every agg since the
    # last checkpoint — measured at sf0.1, per-round counts gave back
    # everything they saved), so graphs that die mid-window are only
    # caught at the next boundary.
    prev_edges: int | None = None
    for r in range(max_rounds):
        good = (
            e.groupBy("_s")
            .agg(F.count(F.lit(1)).alias("_d"))
            .where(F.col("_d") >= k)
            .select(F.col("_s").alias("_g"))
        )
        if broadcast_survivors:
            good = F.broadcast(good)
        e = e.join(good, e["_s"] == good["_g"], "left_semi").join(
            good, e["_t"] == good["_g"], "left_semi"
        )
        if (r + 1) % every == 0 and r + 1 < max_rounds:
            e = _ckpt(e)
            cnt = e.count()
            if cnt == prev_edges:
                break
            prev_edges = cnt
    # Final degrees are referenced twice (output rows + the convergence
    # scalar) — truncate lineage once so the peeled plan does not
    # re-execute per reference.  ``converged`` = no surviving node is
    # below k (min over an empty core is NULL → vacuously converged);
    # a (≤1)-row frame, attached by sanctioned broadcast scalar.
    deg = _ckpt(
        e.groupBy("_s")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.col("_s").alias("node"), "degree")
    )
    flag = deg.agg(
        F.coalesce(F.min(F.col("degree") >= F.lit(k)), F.lit(True)).alias(
            "converged"
        )
    )
    return deg.crossJoin(F.broadcast(flag))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iters: int = 5,
    damping: float = 0.85,
    decimals: int = 6,
    weight: str | None = None,
    checkpoint_every: int | None = 8,
    assume_distinct: bool = False,
    repair_dangling: bool = True,
    assume_full_in_degree: bool = False,
    validate: bool = False,
    checkpoint_dir: str | None = None,
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
    join keyed on ``_src``) and one ``_dst``-keyed sum.  The out-degree is
    folded into the checkpointed edge frame once, so an iteration adds no
    degree join.
    ``validate=True`` (debug mode) asserts the ``assume_distinct`` /
    ``assume_full_in_degree`` claims on hash-sampled buckets before
    trusting them — a few extra count jobs; a violating edge list raises
    instead of silently skewing ranks.
    ``checkpoint_every`` truncates plan lineage on long runs exactly like
    ``dup_clusters``.  ``checkpoint_dir`` switches the truncation from
    ``localCheckpoint`` (executor block store — spills when the edge frame
    outgrows the in-memory store, the one-time storage step SCALING.md's
    2× probe recorded) to a DURABLE ``checkpoint()`` against that
    directory: writes land on stable storage, iteration cost stops
    depending on block-store headroom, and executor loss is survivable —
    the cluster-production mode (probed @8×, SCALING.md).
    """
    # Loop-invariant frames are referenced in EVERY iteration's subtree;
    # without truncation Spark re-executes prepare_edges (and the caller's
    # whole edge build) once per reference.  Both checkpoint flavors
    # materialize each once on first use (lazy, so plan introspection
    # still works).  Measured at sf0.1 (1.2M edges, iters=5): 27.5s ->
    # 5.4s steady-state together with the degree fold below and integer
    # node ids.
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=False)

    else:

        def _ckpt(df: DataFrame) -> DataFrame:
            return durable_checkpoint(df, eager=False)

    e = _ckpt(
        prepare_edges(
            edges,
            src,
            dst,
            weight=weight,
            assume_distinct=assume_distinct,
            repair_dangling=repair_dangling,
            validate=validate,
        )
    )
    if assume_full_in_degree and validate:
        _validate_full_in_degree(e)
    # out-degree folded INTO the edge frame ONCE (map-side-combined count +
    # one join here, instead of a count join inside every iteration; not a
    # per-_src window, which would put a hub supernode's whole edge list on
    # one reducer).  Weighted: out-STRENGTH (Σw) replaces the count, and a
    # contribution ships rank·w/strength — the weighted-PageRank update.
    if weight is not None:
        outdeg = e.groupBy("_src").agg(F.sum("_w").alias("_deg"))
    else:
        outdeg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
    e2 = _ckpt(e.join(outdeg, "_src"))
    # ``assume_full_in_degree=True``: the caller GUARANTEES every node has
    # at least one in-edge (structural on symmetrized graphs — both trade-
    # graph queries).  Then every node appears in every iteration's
    # contribution sum, so the per-iteration ``nodes`` LEFT JOIN that only
    # exists to re-attach in-edge-less nodes (and the nodes frame build
    # itself) is a no-op — dropping it removes one join + one node-frame
    # exchange per iteration (round-14: plan 32 → 21 Exchanges at x67's
    # shape), and iteration 1 folds the constant initial rank 1.0 straight
    # into the contribution expression instead of joining a constant frame.
    # A wrong claim silently drops in-edge-less nodes from the output.
    if assume_full_in_degree:
        if iters < 1:
            # parity with the regular path's iters=0 result (the initial
            # rank-1.0 frame) instead of an AttributeError on ranks=None
            return (
                e.select(F.col("_src").alias("node")).distinct()
                .select("node", portable_round(F.lit(1.0), decimals).alias("rank"))
            )
        ranks = None
        for i in range(iters):
            if ranks is None:
                contrib_rows = e2.select(
                    F.col("_dst").alias("_cn"),
                    (
                        (F.lit(1.0) * F.col("_w") / F.col("_deg"))
                        if weight is not None
                        else (F.lit(1.0) / F.col("_deg"))
                    ).alias("_c"),
                )
            else:
                # SHUFFLE_HASH on the rank side: the edge stream is the
                # dominant input and must never be sorted (SMJ sorts BOTH
                # sides per iteration); the build side is nodes/partitions
                # rows of (long, double) — bounded per task at any scale.
                # Round-14 A/B: x123 5.54 -> 3.96 s, x67 -0.3 s.
                r_side = ranks.hint("shuffle_hash").select(
                    F.col("_n").alias("_rsrc"), F.col("_r").alias("_rval")
                )
                contrib_rows = e2.join(
                    r_side, e2["_src"] == r_side["_rsrc"]
                ).select(
                    F.col("_dst").alias("_cn"),
                    (
                        (F.col("_rval") * F.col("_w") / F.col("_deg"))
                        if weight is not None
                        else (F.col("_rval") / F.col("_deg"))
                    ).alias("_c"),
                )
            ranks = (
                contrib_rows.groupBy("_cn")
                .agg(F.sum("_c").alias("_sum"))
                .select(
                    F.col("_cn").alias("_n"),
                    (F.lit(1.0 - damping) + damping * F.col("_sum")).alias("_r"),
                )
            )
            if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iters:
                ranks = _ckpt(ranks)
        return ranks.select(
            F.col("_n").alias("node"),
            portable_round(F.col("_r"), decimals).alias("rank"),
        )
    nodes = _ckpt(e.select(F.col("_src").alias("_n")).distinct())
    ranks = nodes.select("_n", F.lit(1.0).alias("_r"))
    for i in range(iters):
        # distinct column names per join side: the iterated frames all
        # share lineage with `e`, and Spark's self-join resolution is
        # ambiguous for repeated attribute names across iterations
        r_side = ranks.hint("shuffle_hash").select(
            F.col("_n").alias("_rsrc"), F.col("_r").alias("_rval")
        )
        contrib = (
            e2.join(r_side, e2["_src"] == r_side["_rsrc"])
            .select(
                F.col("_dst").alias("_cn"),
                (
                    (F.col("_rval") * F.col("_w") / F.col("_deg"))
                    if weight is not None
                    else (F.col("_rval") / F.col("_deg"))
                ).alias("_c"),
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
            ranks = _ckpt(ranks)
    return ranks.select(
        F.col("_n").alias("node"),
        portable_round(F.col("_r"), decimals).alias("rank"),
    )
