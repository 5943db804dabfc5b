"""Similarity search over embedding columns (array<float>).

``brute_force_topk`` is the exact baseline: broadcast the (small) query set,
score every corpus row, window-rank per query.  Linear in corpus size with no
shuffle of the corpus — the scan-heavy but 100 TB-shaped plan when the query
set fits in a broadcast.

``lsh_bucket_topk`` is the approximate scale path: random-hyperplane bucket
signatures on both sides, candidates from the bucket equi-join (multi-probe
over signature hamming-1 neighbors raises recall), exact cosine re-ranking
within candidates.  An IVF variant is the same plan shape with learned
centroids as the bucketer.

All math is JVM-side (``zip_with`` + ``aggregate`` folds in double precision,
deterministic left-to-right summation — reproducible across engines).
"""

from __future__ import annotations

from pyspark.sql import Column as SparkColumn
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .scale import durable_checkpoint

from ..sqlgen import portable_round


def dot(a: SparkColumn, b: SparkColumn, dim: int | None = None) -> SparkColumn:
    """Elementwise dot product of two array columns (double).

    With ``dim`` given, the sum is statically unrolled over ``element_at``
    lookups.  Measured on local[32] at 64 dims the default ``zip_with`` +
    ``aggregate`` fold is FASTER — the unrolled tree exceeds codegen method
    limits and falls back to per-node interpretation — so hot paths use the
    fold; the unrolled form is kept for narrow vectors.  Both sum
    left-to-right, so results are bit-identical.
    """
    if dim is not None:
        out = F.lit(0.0)
        for i in range(1, dim + 1):
            out = out + F.element_at(a, i) * F.element_at(b, i)
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: SparkColumn, dim: int | None = None) -> SparkColumn:
    return F.sqrt(dot(a, a, dim))


def cosine(a: SparkColumn, b: SparkColumn) -> SparkColumn:
    # try_divide: a zero vector yields NULL instead of an ANSI-mode
    # divide-by-zero job abort (identical bits whenever the norms are
    # non-zero — try_divide IS divide then)
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def unit(a: SparkColumn, dim: int | None = None) -> SparkColumn:
    """L2-normalized copy of an array column.

    Normalizing once per row turns per-pair cosine (three dot products) into
    a single dot product — the difference between 3·n² and n + n² folds in
    any pairwise stage.

    Zero vectors normalize to NULL elements (``try_divide``) instead of
    raising: under Spark 4's default ANSI mode a plain divide would abort
    the whole job on the first zero embedding in the corpus, and the
    NULL elements make every downstream cosine NULL — the row simply
    drops out of thresholds and rankings (non-zero vectors are
    bit-identical: try_divide IS divide when the divisor isn't 0)."""
    if dim is not None:
        n = l2_norm(a, dim)
        return F.array(
            *[F.try_divide(F.element_at(a, i), n) for i in range(1, dim + 1)]
        )
    n = l2_norm(a)
    # the norm rides in as a zip_with ARGUMENT (array_repeat evaluates it
    # once per row), never inside the lambda body: interpreted HOF lambdas
    # re-evaluate captured non-attribute expressions per ELEMENT, so a
    # fold-in-lambda divide is O(dim²) per row — >390 s for 100k rows at
    # dim=768 vs 2.0 s this way (≥200×), bit-identical including the
    # zero-vector (NULL elements) and NULL-vector cases
    return F.zip_with(
        a, F.array_repeat(n, F.size(a)), lambda x, y: F.try_divide(x, y)
    )


def infer_dim(df: DataFrame, vec_col: str) -> int:
    """Vector dimension of an embedding column, with a clear failure mode.

    Spark's ``ArrayType`` carries no length, so this has to look at a row;
    callers that know the dimension should pass ``dim=`` instead and skip the
    plan-build-time job this launches.
    """
    row = df.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    if row is None or row[0] is None or len(row[0]) == 0:
        raise ValueError(
            f"cannot infer vector dimension: column {vec_col!r} has no non-null, "
            "non-empty vectors — pass dim= explicitly"
        )
    return len(row[0])


def random_project(
    df: DataFrame,
    vec_col: str = "embedding",
    *,
    out_dim: int = 16,
    seed: int = 42,
    dim: int | None = None,
    out_col: str = "projection",
) -> DataFrame:
    """Johnson–Lindenstrauss random projection of an embedding column.

    Appends ``out_col``: an ``array<double>`` of ``out_dim`` components,
    each ``dot(vec, g_i)/sqrt(out_dim)`` for seeded Gaussian directions
    ``g_i`` — pairwise distances are preserved within ~ε with out_dim =
    O(log n / ε²), so downstream dedup/ANN can run on 4× smaller vectors.
    Deterministic given the seed (the direction matrix is inlined as
    literals), and the sequential fold keeps components bit-reproducible in
    any engine with a left-to-right list dot product.
    """
    import math

    from .dedup import _hyperplanes

    if dim is None:
        dim = infer_dim(df, vec_col)
    planes = _hyperplanes(dim, out_dim, seed)
    scale = 1.0 / math.sqrt(out_dim)
    v = F.col(vec_col).cast("array<double>")
    comps = [
        (dot(v, F.array(*[F.lit(float(w)) for w in p])) * F.lit(scale)).alias(f"_p{i}")
        for i, p in enumerate(planes)
    ]
    return df.withColumn(out_col, F.array(*comps))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query: ``(query_id, vec_id, cos, rank)``.

    ``queries`` must be small (it is broadcast); the corpus is scanned once,
    never shuffled before the per-query rank.
    """
    scored = _broadcast_cosine_scores(
        corpus, queries, id_col=id_col, vec_col=vec_col, query_id_col=query_id_col
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _broadcast_cosine_scores(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """``(query_id, id, cos)`` for every (query, corpus) pair — the shared
    scoring stage of :func:`brute_force_topk` and :func:`hard_negatives`:
    unit-normalized vectors, the (small) query set broadcast, ONE corpus
    scan, no shuffle.  Any change to the scoring shape (normalization,
    broadcast hints, tie-relevant value forms) lands in both ops here."""
    q = queries.select(
        F.col(query_id_col).alias("_qid"),
        unit(F.col(vec_col).cast("array<double>")).alias("_qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("_cid"),
        unit(F.col(vec_col).cast("array<double>")).alias("_cv"),
    )
    return c.crossJoin(F.broadcast(q)).select(
        F.col("_qid").alias(query_id_col),
        F.col("_cid").alias(id_col),
        dot(F.col("_qv"), F.col("_cv")).alias("cos"),
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    sim_cap: float | None = None,
    sim_floor: float | None = None,
    method: str = "brute",
    n_planes: int = 6,
    seed: int = 42,
    dim: int | None = None,
    exclude_self: bool = False,
) -> DataFrame:
    """Hard-negative mining for retrieval/contrastive training.

    Per query, the ``k`` most-cosine-similar corpus vectors that are NOT
    known positives (``positives`` is a ``(query_id, vec_id)`` frame —
    anti-joined out) and, optionally, sit below ``sim_cap``: the
    near-positive safety band that keeps unlabeled TRUE positives out of
    the negative set (the denoising step of RocketQA, Qu et al. 2021 —
    the single biggest false-negative source in mined negatives).
    ``sim_floor`` drops too-easy negatives from the bottom.  Returns
    ``(query_id, vec_id, cos, rank)`` like :func:`brute_force_topk`.

    ``method`` picks the candidate generator, and with it the scale
    regime — mining runs once per TRAINING QUERY, so the query side is
    usually the big one:

    * ``"brute"`` (default, exact): :func:`_broadcast_cosine_scores` —
      the query set broadcasts, the corpus is scanned once and never
      shuffled before the per-query rank.  Right while the query set
      fits a broadcast (~10⁵ × dim).
    * ``"lsh"`` (the million-query path): candidates come from the LSH
      bucket join (:func:`_lsh_candidate_scores`) with
      ``broadcast_queries=False`` — a keyed bucket equi-join with no
      broadcast of either side, so both the corpus and the query set
      scale out (the default serving hint would try to broadcast the
      exploded query frame, which stops fitting around 10⁶ queries ×
      dim=768).  Recall < 1 as with any LSH retrieval (negatives are
      sampled anyway — a missed candidate is another hard-ish negative,
      not a correctness bug).

    In BOTH methods every eligibility gate (``sim_cap``, ``sim_floor``,
    the positives anti-join, ``exclude_self``) is applied to the full
    candidate set BEFORE the single top-``k`` rank, so a gate can never
    starve the result: whenever ≥ ``k`` eligible candidates exist in
    the candidate pool, ``k`` rows come back.  (Earlier revisions
    truncated LSH candidates to an over-fetch budget before gating and
    could under-fill inside dense near-positive clusters.)

    SELF-MATCH TRAP — when queries are drawn from the corpus itself
    (the typical mining setup), each query's own vector scores
    cos ≈ 1.0 and, unless it is listed in ``positives`` or cut by
    ``sim_cap``, would surface as the #1 "hard negative"; a self-match
    is never a valid negative.  Pass ``exclude_self=True`` to anti-join
    candidates where ``query_id == id`` (requires the two id columns to
    share a namespace, i.e. query ids ARE corpus ids), or keep the
    default and handle it via ``positives``/``sim_cap``.
    """
    if method == "lsh":
        scored = _lsh_candidate_scores(
            corpus,
            queries,
            id_col=id_col,
            vec_col=vec_col,
            query_id_col=query_id_col,
            n_planes=n_planes,
            seed=seed,
            dim=dim,
            broadcast_queries=False,
        )
    elif method == "brute":
        scored = _broadcast_cosine_scores(
            corpus, queries, id_col=id_col, vec_col=vec_col, query_id_col=query_id_col
        )
    else:
        raise ValueError(f"method must be 'brute' or 'lsh', got {method!r}")
    if sim_cap is not None:
        scored = scored.where(F.col("cos") < F.lit(float(sim_cap)))
    if sim_floor is not None:
        scored = scored.where(F.col("cos") >= F.lit(float(sim_floor)))
    if exclude_self:
        scored = scored.where(F.col(query_id_col) != F.col(id_col))
    pos = positives.select(
        F.col(query_id_col), F.col(id_col)
    )
    scored = scored.join(pos, [query_id_col, id_col], "left_anti")
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def kmeans_centroids(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 5,
    init: list[list[float]] | None = None,
    id_col: str = "vec_id",
    seed: int = 42,
    init_strategy: str = "sample",
) -> list[list[float]]:
    """Lloyd's k-means over an embedding column; returns unit centroids.

    Each iteration is two distributed steps — assign (argmax dot against
    the current centroid matrix, attached via 1-row broadcast) and update
    (posexplode + groupBy(cell, dim) avg, a map-side-combinable aggregation
    whose output is ``k×dim`` rows).  Centroid state stays
    DataFrame-RESIDENT across iterations (checkpointed ``k×dim`` frame);
    the driver sees the matrix exactly once, in the final collect — at
    production IVF shapes (k=65k, dim=1k) the ~0.5 GB matrix never rides
    py4j per iteration.  Empty cells keep their previous centroid.

    ``init_strategy`` picks the starting centroids when ``init`` is not
    given: ``"sample"`` (seeded hash-ordered sample — default) or
    ``"first"`` (lowest-id vectors — replayable by an external engine
    without xxhash64, which is what the x56 driver oracle needs).
    """
    if init is None:
        if init_strategy == "first":
            rows = (
                corpus.select(id_col, vec_col).orderBy(id_col).limit(n_centroids).collect()
            )
            init = [[float(x) for x in r[1]] for r in rows]
        elif init_strategy == "sample":
            init = [
                [float(x) for x in r[1]]
                for r in corpus.select(
                    F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h"), vec_col
                )
                .orderBy("_h")
                .limit(n_centroids)
                .collect()
            ]
        else:
            raise ValueError(f"unknown kmeans init_strategy {init_strategy!r}")
    cents = [_unit_list(c) for c in init]
    base = corpus.select(F.col(vec_col).cast("array<double>").alias("_v"))

    # Lloyd refinement with DataFrame-RESIDENT centroid state: the k×dim
    # matrix lives in a checkpointed frame between iterations, reaching the
    # executors via a 1-row broadcast (scalar-attach) instead of plan
    # literals.  Per-iteration driver involvement is job scheduling only —
    # no k×dim py4j transfer until the single final collect — so the fit
    # scales to production IVF shapes (k=65k, dim=1k ≈ 0.5 GB stays
    # cluster-side).  Arithmetic is bit-identical to the literal-based
    # formulation: per-dim means are the same keyed avg; the unit norm is
    # a LEFT FOLD over dim order (F.aggregate), matching Python's
    # sequential sum(v*v) — a window SUM would reorder partial sums.
    spark = corpus.sparkSession
    cdf = spark.createDataFrame(
        [(ci + 1, i, float(x)) for ci, c in enumerate(cents) for i, x in enumerate(c)],
        "_cell int, _i int, _m double",
    ).transform(durable_checkpoint)
    return _collect_centroid_lists(_lloyd(base, cdf, iters))


def _collect_centroid_lists(cdf: DataFrame) -> list[list[float]]:
    """ONE bounded k×dim driver read of a long-form ``(_cell, _i, _m)``
    centroid frame → ``list[list[float]]`` ordered by cell index.  THE
    frame→matrix reconstruction — :func:`kmeans_centroids`'s final read
    and :func:`_cents_numpy` both resolve here, so the cell/dim encoding
    has exactly one decoder."""
    by_cell: dict[int, dict[int, float]] = {}
    for r in cdf.collect():
        by_cell.setdefault(int(r["_cell"]), {})[int(r["_i"])] = float(r["_m"])
    return [
        [by_cell[ci][i] for i in sorted(by_cell[ci])]
        for ci in sorted(by_cell)
    ]


def _matrix_frame(cdf: DataFrame) -> DataFrame:
    """Long-form centroids ``(_cell, _i, _m)`` → ONE row ``(_cm:
    array<array<double>>)`` ordered by cell index (cell ``c`` at position
    ``c``; cells are 1-based and contiguous).  The k×dim matrix is built
    cluster-side and reaches consumers as a 1-row broadcast — never a plan
    literal, never a py4j transfer."""
    return (
        cdf.groupBy("_cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_i", "_m"))),
                lambda s: s["_m"],
            ).alias("_cv")
        )
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_cell", "_cv"))),
                lambda s: s["_cv"],
            ).alias("_cm")
        )
    )


def _lloyd(base: DataFrame, cdf: DataFrame, iters: int) -> DataFrame:
    """``iters`` Lloyd iterations over long-form centroid state.

    ``base`` is the corpus as one ``_v: array<double>`` column; ``cdf`` the
    (checkpointed) ``(_cell, _i, _m)`` centroid frame.  Returns the refined
    centroid frame, checkpointed.  See :func:`kmeans_centroids` for the
    bit-reproducibility argument (left-fold norms, keyed avg means)."""
    dot = lambda a, b: F.aggregate(  # noqa: E731 — shared fold shape
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    for _ in range(iters):
        cmat = _matrix_frame(cdf)
        scores = F.transform(F.col("_cm"), lambda c: dot(F.col("_v"), c))
        assigned = base.crossJoin(F.broadcast(cmat)).select(
            "_v", F.array_position(scores, F.array_max(scores)).alias("_cell")
        )
        means = (
            assigned.select("_cell", F.posexplode("_v").alias("_i", "_x"))
            .groupBy("_cell", "_i")
            .agg(F.avg("_x").alias("_mn"))
        )
        # empty cells emit no mean rows -> keep the previous centroid
        raw = (
            cdf.alias("p")
            .join(
                means.alias("n"),
                (F.col("p._cell") == F.col("n._cell"))
                & (F.col("p._i") == F.col("n._i")),
                "left",
            )
            .select(
                F.col("p._cell").alias("_cell"),
                F.col("p._i").alias("_i"),
                F.coalesce(F.col("n._mn"), F.col("p._m")).alias("_r"),
                F.col("n._mn").isNotNull().alias("_new"),
            )
        )
        # unit-normalize per cell via an ordered left fold (dim order);
        # a kept (empty-cell) centroid is ALREADY unit and must pass
        # through untouched — re-dividing by its ~1.0±ε norm would drift
        # the low bits the oracle hash checks
        per_cell = raw.groupBy("_cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_i", "_r"))), lambda s: s["_r"]
            ).alias("_vr"),
            F.max(F.col("_new")).alias("_had"),
        )
        # materialize the fold into a COLUMN and divide AFTER the
        # posexplode: a divide inside a transform() lambda lets the
        # optimizer inline the O(dim) fold into the per-element body when
        # the array meets the Generate (no subexpression elimination in
        # interpreted HOFs) — O(dim²) per cell; the Generate boundary pins
        # `_norm` as a materialized per-row attribute (same fix as
        # _init_centroid_frame, values bit-identical)
        with_norm = per_cell.withColumn(
            "_norm",
            F.sqrt(
                F.aggregate(
                    F.transform(F.col("_vr"), lambda x: x * x),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ),
        )
        cdf = (
            with_norm.select(
                "_cell", "_norm", "_had", F.posexplode("_vr").alias("_i", "_x")
            )
            .select(
                "_cell",
                "_i",
                F.when(
                    F.col("_had") & (F.col("_norm") > 0),
                    F.col("_x") / F.col("_norm"),
                )
                .otherwise(F.col("_x"))
                .alias("_m"),
            )
            .transform(durable_checkpoint)
        )
    return cdf


def _unit_list(c: list[float]) -> list[float]:
    import math

    n = math.sqrt(sum(v * v for v in c))
    return [x / n for x in c] if n else c


def _cell_scores_col(vec: SparkColumn, cents: list[list[float]]) -> SparkColumn:
    """array<double> of dot(vec, centroid_i) — one expression over a 2-D
    centroid literal, so the plan carries two small trees instead of
    ``n_centroids`` separate fold columns (compiles fast; the fold itself is
    an interpreted HOF either way).  Fold order matches DuckDB's
    ``list_dot_product`` bit-for-bit."""
    cents2d = F.array(*[F.array(*[F.lit(x) for x in c]) for c in cents])
    return F.transform(
        cents2d,
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        ),
    )


def choose_centroids(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    strategy: str = "first",
    seed: int = 42,
    kmeans_iters: int = 5,
    kmeans_init: str = "sample",
) -> list[list[float]]:
    """Unit centroids for cell-based indexes (IVF, semantic dedup).

    * ``"first"`` — the ``n_centroids`` lowest-id corpus vectors; fully
      deterministic and replayable in plain SQL (the driver oracles do).
    * ``"sample"`` — seeded hash-ordered sample, independent of data order.
    * ``"kmeans"`` — :func:`kmeans_centroids` from the ``kmeans_init`` init
      ("sample" default; "first" for external replay); best cell
      balance/recall, costs ``2×iters`` extra jobs at build time.
    """
    if strategy == "first":
        rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(n_centroids).collect()
        return [_unit_list([float(x) for x in r[1]]) for r in rows]
    if strategy == "sample":
        rows = (
            corpus.select(F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h"), vec_col)
            .orderBy("_h")
            .limit(n_centroids)
            .collect()
        )
        return [_unit_list([float(x) for x in r[1]]) for r in rows]
    if strategy == "kmeans":
        return kmeans_centroids(
            corpus,
            vec_col=vec_col,
            n_centroids=n_centroids,
            iters=kmeans_iters,
            id_col=id_col,
            seed=seed,
            init_strategy=kmeans_init,
        )
    raise ValueError(f"unknown centroid strategy {strategy!r}")


def choose_centroid_frame(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    strategy: str = "first",
    seed: int = 42,
    kmeans_iters: int = 5,
    kmeans_init: str = "sample",
) -> DataFrame:
    """Unit centroids as a long-form DataFrame ``(_cell int, _i int, _m
    double)`` — the 100 TB shape of :func:`choose_centroids`.

    The k×dim matrix is selected, normalized, and (for ``"kmeans"``)
    refined entirely CLUSTER-SIDE: the driver never holds it, it never
    rides py4j, and consumers attach it as a 1-row broadcast instead of a
    plan literal.  At the production IVF shape (k=65k, dim=1k ≈ 0.5 GB)
    the literal path breaks the plan/py4j layer; this one is a bounded
    broadcast.  Values are bit-identical to :func:`choose_centroids`: the
    unit norm is the same left fold over dim order (Python's sequential
    ``sum(v*v)`` ≡ ``F.aggregate``; ``math.sqrt`` ≡ JVM sqrt, both
    IEEE-correctly-rounded), so cell assignments and every downstream hash
    are unchanged.  The frame is checkpointed (consumers reference it
    2+ times — once per side of the candidate join)."""
    if strategy in ("first", "sample"):
        return _init_centroid_frame(
            corpus, id_col=id_col, vec_col=vec_col, n=n_centroids,
            strategy=strategy, seed=seed,
        )
    if strategy == "kmeans":
        init = _init_centroid_frame(
            corpus, id_col=id_col, vec_col=vec_col, n=n_centroids,
            strategy=kmeans_init, seed=seed,
        )
        base = corpus.select(F.col(vec_col).cast("array<double>").alias("_v"))
        return _lloyd(base, init, kmeans_iters)
    raise ValueError(f"unknown centroid strategy {strategy!r}")


def _init_centroid_frame(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    n: int,
    strategy: str,
    seed: int,
) -> DataFrame:
    """Cluster-side ``(_cell, _i, _m)`` unit-centroid frame for the
    ``"first"`` / ``"sample"`` selection rules.  The global row_number
    window runs over the already-LIMITed n-row frame (bounded
    SinglePartition, same regime as a top-k collect)."""
    if strategy == "first":
        key = F.col(id_col).alias("_k")
    elif strategy == "sample":
        key = F.xxhash64(F.col(id_col), F.lit(seed)).alias("_k")
    else:
        raise ValueError(f"unknown centroid strategy {strategy!r}")
    sel = (
        corpus.select(key, F.col(vec_col).cast("array<double>").alias("_v0"))
        .orderBy("_k")
        .limit(n)
        .withColumn("_cell", F.row_number().over(Window.orderBy("_k")))
    )
    # left-fold norm over dim order — bit-identical to _unit_list's
    # sequential sum(v*v).  The divide happens AFTER the posexplode, on the
    # carried scalar `_n`: dividing inside a transform() lambda lets the
    # optimizer inline the O(dim) fold into the per-element body once the
    # array meets the Generate (no subexpression elimination in interpreted
    # HOFs), turning the build into O(k·dim²) — 415 s at k=8192×dim=768 vs
    # ~1 s this way (85×, same values: the Generate boundary pins `_n` as a
    # materialized per-row attribute).
    sel = sel.withColumn(
        "_n",
        F.sqrt(
            F.aggregate(
                F.transform(F.col("_v0"), lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
    )
    return (
        sel.select("_cell", "_n", F.posexplode("_v0").alias("_i", "_x"))
        .select(
            "_cell",
            "_i",
            F.when(F.col("_n") > 0, F.col("_x") / F.col("_n"))
            .otherwise(F.col("_x"))
            .alias("_m"),
        )
        .transform(durable_checkpoint)
    )


def _cents_numpy(cents) -> "object":
    """Centroids (list or long frame) → a k×dim float64 numpy matrix.
    One bounded k×dim driver pull for the frame form — the same class of
    collect as :func:`kmeans_centroids`'s final read."""
    import numpy as np

    if isinstance(cents, DataFrame):
        cents = _collect_centroid_lists(cents)
    return np.asarray(cents, dtype=np.float64)


def _assign_cells_arrow(
    corpus: DataFrame, cents, *, id_col: str, vec_col: str
) -> DataFrame:
    """``(_id, _v, _cell)`` via an Arrow-batched numpy matmul.

    The production-shape scorer: the interpreted HOF fold costs ~10 ns per
    multiply-add (358 s for 16 k rows × k=4096 × dim=512, SCALING.md);
    one BLAS matmul over the same batch is hundreds of times faster.  The
    k×dim matrix ships to executors as a TorrentBroadcast variable —
    broadcast VARIABLES are built for 0.5 GB payloads; it was plan
    LITERALS that broke at that size.  Tie rule matches the fold path
    (``argmax`` returns the FIRST maximum = lowest cell).  BLAS reorders
    the per-dot accumulation (blocking/FMA), so scores can differ from
    the sequential fold in the last ulp — argmax flips only on
    effectively-tied cells, which is why this scorer is opt-in and the
    hash-pinned gate queries stay on the fold.  The returned ``_v`` is
    ALSO numpy-normalized (pairwise-summed norm), so downstream cosines
    computed from it carry the same last-ulp caveat; zero-norm vectors
    yield a NULL ``_v`` to match the fold path's NULL-element unit()."""
    import numpy as np
    import pandas as pd

    C = _cents_numpy(cents)
    bc = corpus.sparkSession.sparkContext.broadcast(C)
    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"_id {id_type}, _v array<double>, _cell long"

    def score(batches):
        Cm = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
            )
            S = V @ Cm.T
            cell = S.argmax(axis=1) + 1
            n = np.sqrt((V * V).sum(axis=1))
            zero = n == 0.0
            n[zero] = 1.0
            U = V / n[:, None]
            # zero-norm rows: the fold path's unit() divides by 0 and
            # yields NULLs (downstream cosines go NULL and the row drops
            # out of thresholds/rankings) — emit a null vector so both
            # scorers exclude the row the same way
            vecs = [None if z else u for z, u in zip(zero, U)]
            yield pd.DataFrame(
                {
                    "_id": pdf[id_col].to_numpy(),
                    "_v": vecs,
                    "_cell": cell.astype("int64"),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(score, out_schema)


def _probe_cells_arrow(
    queries: DataFrame, cents, *, id_col: str, vec_col: str, nprobe: int
) -> DataFrame:
    """Exploded ``(_id, _v, _cell)`` rows — each query's ``nprobe`` nearest
    cells — via the same Arrow/numpy matmul as :func:`_assign_cells_arrow`.
    Tie rule matches the fold path's ``(-score, cell)`` struct sort: a
    STABLE descending-score argsort keeps the lower cell first on ties."""
    import numpy as np
    import pandas as pd

    C = _cents_numpy(cents)
    np_probe = min(int(nprobe), C.shape[0])
    bc = queries.sparkSession.sparkContext.broadcast(C)
    id_type = queries.schema[id_col].dataType.simpleString()
    out_schema = f"_id {id_type}, _v array<double>, _cell long"

    def probe(batches):
        Cm = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
            )
            S = V @ Cm.T
            top = np.argsort(-S, axis=1, kind="stable")[:, :np_probe] + 1
            n = np.sqrt((V * V).sum(axis=1))
            zero = n == 0.0
            n[zero] = 1.0
            U = V / n[:, None]
            ids = pdf[id_col].to_numpy()
            # zero-norm rows → null vector, matching the fold path (see
            # _assign_cells_arrow)
            vecs = [
                None if z else u
                for z, u in zip(zero, U)
                for _ in range(np_probe)
            ]
            yield pd.DataFrame(
                {
                    "_id": np.repeat(ids, np_probe),
                    "_v": vecs,
                    "_cell": top.reshape(-1).astype("int64"),
                }
            )

    return queries.select(id_col, vec_col).mapInPandas(probe, out_schema)


#: centroid count above which the interpreted-fold scorer is warned about:
#: at k=1024 the ~10 ns-per-multiply-add HOF fold is already ~order-of-
#: magnitude behind the Arrow matmul (SCALING.md probes 30x at k=4096 x
#: dim=512 and 164x at k=8192 x dim=768).
_FOLD_WARN_CELLS = 1024


def _warn_fold_at_scale(k: int, where: str) -> None:
    """Advise scorer='arrow' when the default fold meets a production k.

    'fold' stays the default because it is hash-exact (oracle-replayable,
    no BLAS last-ulp tie drift) — but a user running the op at its intended
    shape should not have to discover the flag from the docs after a slow
    job, so the mismatch warns once per call site.
    """
    if k >= _FOLD_WARN_CELLS:
        import warnings

        warnings.warn(
            f"{where}: scorer='fold' (default, hash-exact) with {k} "
            f"centroids — the interpreted score fold is 30-160x slower than "
            f"scorer='arrow' at production k×dim; pass scorer='arrow' "
            f"unless bit-identical tie behavior is required",
            RuntimeWarning,
            stacklevel=3,
        )


def _log_auto_arrow(k: int, where: str) -> None:
    """Log (info) that ``scorer="auto"`` picked the Arrow path.

    The arrow matmul diverges from the interpreted fold in the last ulp
    (BLAS accumulation order), which can flip effectively-tied cell
    assignments — a hash-pinned pipeline silently flipped onto it by the
    round-12 default change should see WHY its hashes moved without
    turning on debug logging."""
    import logging

    logging.getLogger(__name__).info(
        "%s: scorer='auto' resolved to 'arrow' at %d centroids "
        "(>= %d); pass scorer='fold' for bit-exact tie behavior",
        where,
        k,
        _FOLD_WARN_CELLS,
    )


def _resolve_scorer(scorer: str, k: int | None, where: str) -> str:
    """Resolve the ``scorer`` option against the centroid count.

    ``"auto"`` (the default on every centroid consumer) picks
    ``"arrow"`` at k ≥ ``_FOLD_WARN_CELLS`` — the shape where the
    interpreted fold is 30–160× behind the Arrow matmul (SCALING.md) —
    and the hash-exact ``"fold"`` below it, so gate-scale runs stay
    oracle-replayable with zero Python-on-data while production shapes
    get the fast path without knowing the flag.  Explicit ``"fold"`` is
    honored always (bit-exact ties) but warns at production k; explicit
    ``"arrow"`` is honored always.

    .. note:: *changed in round 12* — the default on every centroid
       consumer moved from ``"fold"`` to ``"auto"``, so callers at
       k ≥ 1024 now ride the Arrow/BLAS path by default.  Its last-ulp
       score divergence can flip effectively-tied cell assignments; a
       hash-pinned pipeline that needs the old bit-exact ties must pass
       ``scorer="fold"`` explicitly.  When auto resolves to arrow an
       informational log line is emitted so pinned pipelines notice."""
    if scorer == "auto":
        if k is not None and k >= _FOLD_WARN_CELLS:
            _log_auto_arrow(k, where)
            return "arrow"
        return "fold"
    if scorer == "fold":
        if k is not None:
            _warn_fold_at_scale(k, where)
        return "fold"
    if scorer == "arrow":
        return "arrow"
    raise ValueError(f"scorer must be 'auto', 'fold', or 'arrow', got {scorer!r}")


def assign_cells(
    corpus: DataFrame,
    cents: list[list[float]] | DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scorer: str = "auto",
    n_centroids: int | None = None,
) -> DataFrame:
    """``(_id, _v, _cell)`` — unit-normalized vectors with their nearest
    centroid cell (argmax dot; first/lowest cell wins ties).  Centroids are
    unit vectors, so argmax(dot) ≡ argmax(cosine) with no per-row norm.

    ``cents`` is either a Python list (small k — the matrix rides the plan
    as literals) or a long-form ``(_cell, _i, _m)`` DataFrame from
    :func:`choose_centroid_frame` (the scale path — the matrix rides a
    1-row broadcast).  Scores fold identically either way.

    ``scorer`` — ``"auto"`` (default) resolves by centroid count: the
    hash-exact interpreted ``"fold"`` below ``_FOLD_WARN_CELLS``,
    ``"arrow"`` at production k (30–160× on the SCALING.md probes).
    With DataFrame centroids the count comes from the ``n_centroids``
    hint; WITHOUT the hint auto resolves to ``"fold"`` (with a warning)
    rather than counting the frame, because counting would run an eager
    Spark job at plan-build time — re-executing a lazily-built centroid
    pipeline.  ``"arrow"`` switches the k×dim score computation
    to an Arrow-batched numpy matmul (:func:`_assign_cells_arrow`), at
    the cost of last-ulp score differences (BLAS accumulation order), so
    tie-sensitive hash-pinned comparisons should pass ``"fold"``
    explicitly.  The production-k warning for an explicit ``"fold"``
    fires once, at the resolving call site (the public ops, or
    :func:`_resolve_scorer` for direct use)."""
    if scorer == "auto":
        # DataFrame centroids WITHOUT an n_centroids hint: resolve to the
        # hash-exact fold rather than counting the frame — counting would
        # run an eager Spark action at plan-BUILD time, silently executing
        # the whole upstream pipeline (e.g. a kmeans fit) an extra time for
        # a lazily-built frame.  Callers at production k pass the hint (or
        # scorer='arrow') to get the fast path; the warning says so.
        k = (
            len(cents)
            if not isinstance(cents, DataFrame)
            else n_centroids
        )
        if k is None:
            import warnings

            warnings.warn(
                "assign_cells: scorer='auto' with DataFrame centroids and "
                "no n_centroids hint resolves to the hash-exact 'fold' "
                "scorer (counting the frame would run an eager job at "
                "plan-build time); pass n_centroids= or scorer='arrow' "
                "for the fast path at k >= 1024",
                RuntimeWarning,
                stacklevel=2,
            )
            scorer = "fold"
        elif k >= _FOLD_WARN_CELLS:
            _log_auto_arrow(k, "assign_cells")
            scorer = "arrow"
        else:
            scorer = "fold"
    if scorer == "arrow":
        return _assign_cells_arrow(corpus, cents, id_col=id_col, vec_col=vec_col)
    if scorer != "fold":
        raise ValueError(f"scorer must be 'auto', 'fold', or 'arrow', got {scorer!r}")
    # alias the cast vector to an ATTRIBUTE before any fold captures it:
    # expressions captured by interpreted HOF lambdas re-evaluate per outer
    # element, so a captured cast would re-materialize the array once per
    # CELL (k× per row) instead of once per row
    v = F.col(vec_col).cast("array<double>")
    if isinstance(cents, DataFrame):
        # eager 1-row checkpoint: the k×dim aggregation runs once at build
        # time and the consumer plan sees a 1-row scan (no Exchange rides
        # into every downstream plan)
        c = (
            corpus.crossJoin(F.broadcast(_matrix_frame(cents).transform(durable_checkpoint)))
            .select(F.col(id_col).alias("_id"), v.alias("_v"), "_cm")
            .select(
                "_id",
                "_v",
                F.transform(
                    F.col("_cm"),
                    lambda cv: F.aggregate(
                        F.zip_with(F.col("_v"), cv, lambda x, y: x * y),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    ),
                ).alias("_s"),
            )
        )
    else:
        c = corpus.select(F.col(id_col).alias("_id"), v.alias("_v")).select(
            "_id",
            "_v",
            _cell_scores_col(F.col("_v"), cents).alias("_s"),
        )
    # Separate select so `_s` is computed once, not inlined per reference.
    return c.select(
        "_id",
        unit(F.col("_v")).alias("_v"),
        F.array_position(F.col("_s"), F.array_max(F.col("_s"))).alias("_cell"),
    )


def topic_assign(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_topics: int = 16,
    strategy: str = "first",
    seed: int = 42,
    kmeans_iters: int = 5,
    kmeans_init: str = "sample",
    centroids_as: str = "broadcast_join",
    scorer: str = "auto",
) -> DataFrame:
    """Assign every embedding to a centroid cell: ``(id_col, topic)``.

    The corpus-bucketing primitive behind cluster-balanced sampling and
    topic-level accounting (the DoReMi / cluster-reweighting recipe's first
    step): rows join their nearest of ``n_topics`` centroids — a row-local
    argmax against a broadcast centroid matrix, NO shuffle at all — and
    downstream mixture ops (``mixture_sample``, ``rollup_stats``,
    ``cap_per_group``) treat the topic like any other group column.
    ``strategy`` as in :func:`choose_centroids`; ``"kmeans"`` gives the
    balanced cells a real deployment wants.  ``centroids_as`` picks how
    the matrix reaches the executors: ``"broadcast_join"`` (default — a
    cluster-resident 1-row broadcast, the 100 TB shape) or ``"literal"``
    (inlined plan literals; fine for small k, breaks at k×dim ≈ 0.5 GB).
    Assignments are bit-identical either way.  ``scorer`` — ``"auto"``
    (default) resolves by ``n_topics``: the hash-exact fold below 1024
    cells, the Arrow/numpy matmul path above (see :func:`assign_cells`);
    last-ulp score divergence documented there — pass ``"fold"``
    explicitly for hash-pinned comparisons.
    """
    # resolve (and fail fast on a typo) BEFORE the centroid fit — a
    # kmeans build at production k runs minutes of jobs
    scorer = _resolve_scorer(scorer, n_topics, "topic_assign")
    cents = _centroids_for(
        corpus,
        centroids_as,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_topics,
        strategy=strategy,
        seed=seed,
        kmeans_iters=kmeans_iters,
        kmeans_init=kmeans_init,
    )
    return assign_cells(
        corpus,
        cents,
        id_col=id_col,
        vec_col=vec_col,
        scorer=scorer,
        n_centroids=n_topics,
    ).select(F.col("_id").alias(id_col), F.col("_cell").alias("topic"))


def _centroids_for(
    corpus: DataFrame, centroids_as: str, **kwargs
) -> list[list[float]] | DataFrame:
    """Dispatch ``centroids_as`` → list (literal plan) or long frame
    (1-row broadcast).  Shared by every cell-index consumer."""
    if centroids_as == "broadcast_join":
        return choose_centroid_frame(corpus, **kwargs)
    if centroids_as == "literal":
        return choose_centroids(corpus, **kwargs)
    raise ValueError(
        f"centroids_as must be 'broadcast_join' or 'literal', got {centroids_as!r}"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    strategy: str = "first",
    kmeans_iters: int = 5,
    kmeans_init: str = "sample",
    centroids_as: str = "broadcast_join",
    scorer: str = "auto",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index.

    Every corpus row is assigned to its nearest centroid cell; each query
    probes its ``nprobe`` nearest cells and re-ranks candidates with the
    exact cosine.  The candidate join is a keyed equi-join on cell id — the
    100 TB shape — scanning ~``nprobe/n_centroids`` of the corpus per query
    instead of all of it.  Recall < 1 by design.

    ``strategy`` picks the centroids:

    * ``"first"`` — the ``n_centroids`` lowest-id corpus vectors,
      unit-normalized.  Fully deterministic and expressible in plain SQL, so
      an external engine can replay the whole index (the x12 driver oracle
      does); centroid quality is whatever the data order gives.
    * ``"sample"`` — deterministic hash-ordered sample (seeded; spreads
      centroids independent of data order).
    * ``"kmeans"`` — :func:`kmeans_centroids` from the sample init
      (``kmeans_iters`` Lloyd iterations); best cell balance/recall,
      costs ``2×iters`` extra distributed jobs at build time.

    ``centroids_as`` picks how the k×dim matrix reaches the executors:
    ``"broadcast_join"`` (default) keeps it cluster-resident end-to-end —
    :func:`choose_centroid_frame` builds/refines it as a DataFrame, and
    both the corpus assignment and the query probing attach it as a 1-row
    broadcast — the shape that survives k=65k×dim=1k (≈ 0.5 GB), where
    plan literals break the plan/py4j layer.  ``"literal"`` inlines it
    (small k only).  Cell assignments, probes, and cosines are
    bit-identical between the modes (same left folds).

    ``scorer`` — ``"auto"`` (default) resolves by ``n_centroids``: the
    hash-exact ``"fold"`` below 1024 cells (gate/oracle scale), the
    Arrow matmul above (production scale — 30-160× on the SCALING.md
    probes).  ``"arrow"`` computes BOTH the corpus cell assignment and the
    query nprobe ranking as Arrow-batched numpy matmuls — the throughput
    path at production k×dim (the interpreted fold is ~10 ns per
    multiply-add; see :func:`assign_cells`).  The candidate re-rank stays
    the JVM-side exact-cosine fold either way (per-pair, k-independent).
    Last-ulp score divergence from BLAS accumulation order means
    effectively-tied cells/probes can differ from the fold path — pass
    ``"fold"`` explicitly for hash-pinned comparisons.
    """
    scorer = _resolve_scorer(scorer, n_centroids, "ivf_topk")
    cents = _centroids_for(
        corpus,
        centroids_as,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_centroids,
        strategy=strategy,
        seed=seed,
        kmeans_iters=kmeans_iters,
        kmeans_init=kmeans_init,
    )

    if scorer == "arrow":
        c = _assign_cells_arrow(
            corpus, cents, id_col=id_col, vec_col=vec_col
        ).select(
            F.col("_id").alias("_cid"), F.col("_v").alias("_cv"), "_cell"
        )
        q = _probe_cells_arrow(
            queries, cents, id_col=query_id_col, vec_col=vec_col, nprobe=nprobe
        ).select(
            F.col("_id").alias("_qid"), F.col("_v").alias("_qv"), "_cell"
        )
        scored = c.join(F.broadcast(q), "_cell").select(
            F.col("_qid").alias(query_id_col),
            F.col("_cid").alias(id_col),
            dot(F.col("_qv"), F.col("_cv")).alias("cos"),
        ).dropDuplicates([query_id_col, id_col])
        w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
        return scored.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= k
        )

    # Centroids are unit vectors, so argmax(dot) == argmax(cosine): no
    # per-row normalization needed for cell assignment/probing.
    if isinstance(cents, DataFrame):
        # eager 1-row checkpoint: referenced by BOTH the corpus-assignment
        # and query-probe sides — without it the k×dim aggregation would
        # execute twice and ride both plans as an Exchange
        cmat = _matrix_frame(cents).transform(durable_checkpoint)

        def with_scores(df: DataFrame, id_expr, id_alias: str, v_alias: str) -> DataFrame:
            # cast aliased to an attribute BEFORE the fold captures it — a
            # captured cast re-materializes the array once per cell
            v = F.col(vec_col).cast("array<double>")
            return (
                df.crossJoin(F.broadcast(cmat))
                .select(id_expr.alias(id_alias), v.alias(v_alias), "_cm")
                .select(
                    id_alias,
                    v_alias,
                    F.transform(
                        F.col("_cm"),
                        lambda cv: F.aggregate(
                            F.zip_with(F.col(v_alias), cv, lambda x, y: x * y),
                            F.lit(0.0),
                            lambda a, x: a + x,
                        ),
                    ).alias("_s"),
                )
            )

    else:

        def with_scores(df: DataFrame, id_expr, id_alias: str, v_alias: str) -> DataFrame:
            v = F.col(vec_col).cast("array<double>")
            return df.select(id_expr.alias(id_alias), v.alias(v_alias)).select(
                id_alias,
                v_alias,
                _cell_scores_col(F.col(v_alias), cents).alias("_s"),
            )

    c = with_scores(corpus, F.col(id_col), "_cid", "_cv")
    # Separate select so `_s` is computed once, not inlined per reference.
    c = c.select(
        "_cid",
        unit(F.col("_cv")).alias("_cv"),
        F.array_position(F.col("_s"), F.array_max(F.col("_s"))).alias("_cell"),
    )

    q = with_scores(queries, F.col(query_id_col), "_qid", "_qv")
    # top-nprobe cells per query: sort (−score, cell-index) structs, slice.
    ranked = F.array_sort(
        F.zip_with(
            F.col("_s"),
            F.sequence(F.lit(1), F.size(F.col("_s"))),
            lambda s, i: F.struct((-s).alias("neg"), i.alias("cell")),
        )
    )
    probes = F.transform(F.slice(ranked, 1, nprobe), lambda st: st["cell"].cast("long"))
    q = q.select("_qid", unit(F.col("_qv")).alias("_qv"), F.explode(probes).alias("_cell"))

    scored = c.join(F.broadcast(q), "_cell").select(
        F.col("_qid").alias(query_id_col),
        F.col("_cid").alias(id_col),
        dot(F.col("_qv"), F.col("_cv")).alias("cos"),
    ).dropDuplicates([query_id_col, id_col])
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def topk_recall(
    truth: DataFrame,
    approx: DataFrame,
    *,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    rank_col: str = "rank",
    k: int | None = None,
) -> DataFrame:
    """Per-query recall of an approximate top-k against the exact one.

    The index-tuning harness: feed :func:`brute_force_topk` output as
    ``truth`` and any approximate ranking (:func:`lsh_bucket_topk`,
    :func:`ivf_topk`) as ``approx``; returns ``(query_id, n_hits,
    n_truth, recall)`` with ``recall = |approx ∩ truth| / |truth|`` at
    ``rank ≤ k`` (``k=None`` uses the frames as given).  Queries with no
    approximate results (empty probes) score 0, not a missing row.

    100 TB: both inputs are already per-query top-k frames — tiny
    relative to the corpus — so this is two map-side-combined keyed
    aggregations and one semi-join on ``(query, id)``; no corpus-sized
    work.  Recall is an exact small-int ratio: both engines compute the
    identical double from the identical ints, no rounding shim needed.
    """
    t = truth if k is None else truth.where(F.col(rank_col) <= k)
    a = approx if k is None else approx.where(F.col(rank_col) <= k)
    hits = (
        t.select(query_id_col, id_col)
        .join(a.select(query_id_col, id_col), [query_id_col, id_col], "left_semi")
        .groupBy(query_id_col)
        .agg(F.count(F.lit(1)).alias("_h"))
    )
    return (
        t.groupBy(query_id_col)
        .agg(F.count(F.lit(1)).alias("_t"))
        .join(hits, query_id_col, "left")
        .select(
            F.col(query_id_col),
            F.coalesce(F.col("_h"), F.lit(0)).cast("int").alias("n_hits"),
            F.col("_t").cast("int").alias("n_truth"),
            (F.coalesce(F.col("_h"), F.lit(0)) / F.col("_t")).alias("recall"),
        )
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
    dim: int | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k via random-hyperplane buckets + exact re-rank.

    Candidates are corpus rows sharing the query's bucket or any hamming-1
    neighbor bucket (multi-probe).  Returns the same schema as
    :func:`brute_force_topk`; recall < 1 by design — the candidate join is a
    keyed join instead of a full scan per query.

    ``broadcast_queries`` (default True) hints the exploded query side of
    the bucket join into a broadcast — right for the serving shape (a
    bounded query set against a huge corpus; the corpus never shuffles).
    Pass False for query sets too large to broadcast (the exploded side
    is ``|queries| × (n_planes + 1)`` rows of ``dim`` doubles — Spark's
    8 GB broadcast-table limit lands around 10⁶ × dim=768): the join
    becomes a plain keyed shuffle on the bucket id, both sides scale
    out, and AQE still auto-broadcasts when the runtime size allows.
    :func:`hard_negatives` with ``method="lsh"`` — the
    millions-of-training-queries regime — passes False.
    """
    scored = _lsh_candidate_scores(
        corpus,
        queries,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        n_planes=n_planes,
        seed=seed,
        dim=dim,
        broadcast_queries=broadcast_queries,
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _lsh_candidate_scores(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    n_planes: int,
    seed: int,
    dim: int | None,
    broadcast_queries: bool,
) -> DataFrame:
    """Exact-scored LSH candidates ``(query_id, id, cos)``, deduped, with
    NO per-query truncation — the shared candidate stage of
    :func:`lsh_bucket_topk` and :func:`hard_negatives`'s LSH leg.
    Exposing the un-truncated frame lets callers apply their own
    eligibility gates (similarity caps, anti-joins) BEFORE any top-k cut,
    so a gate can never be starved by an earlier truncation."""
    from .dedup import _hyperplanes, _plane_signature

    if dim is None:
        dim = infer_dim(corpus, vec_col)
    planes = _hyperplanes(dim, n_planes, seed)

    c = corpus.select(
        F.col(id_col).alias("_cid"), F.col(vec_col).cast("array<double>").alias("_cv")
    ).withColumn("_bucket", _plane_signature(F.col("_cv"), planes)).withColumn(
        "_cv", unit(F.col("_cv"))
    )

    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).cast("array<double>").alias("_qv")
    ).withColumn("_b0", _plane_signature(F.col("_qv"), planes)).withColumn(
        "_qv", unit(F.col("_qv"))
    )
    # multi-probe: own bucket + flip each of the n_planes bits
    probes = F.array_union(
        F.array(F.col("_b0")),
        F.array(
            *[
                F.col("_b0").bitwiseXOR(F.lit(1 << i).cast("long"))
                for i in range(n_planes)
            ]
        ),
    )
    q = q.select("_qid", "_qv", F.explode(probes).alias("_bucket"))

    return c.join(F.broadcast(q) if broadcast_queries else q, "_bucket").select(
        F.col("_qid").alias(query_id_col),
        F.col("_cid").alias(id_col),
        dot(F.col("_qv"), F.col("_cv")).alias("cos"),
    ).dropDuplicates([query_id_col, id_col])


def centroid_outliers(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 50,
    decimals: int = 6,
) -> DataFrame:
    """The ``k`` embeddings farthest (lowest cosine) from the corpus centroid.

    The embedding-space triage view: mislabeled points, encoder failures,
    and out-of-domain contamination all land in the far tail of
    centroid similarity.  Output: ``(id, centroid_cos)`` for the ``k``
    lowest, ranked ascending (ties broken by id on the ROUNDED score, so
    the selected set is stable across engines and runs).

    Plan: ONE per-dimension aggregation (posexplode → groupBy(dim) —
    shuffle width is ``dim`` rows, not data), the 1-row centroid rides the
    sanctioned tiny broadcast back over the corpus (same shape as BM25's
    corpus stats), and the cut is a TakeOrdered — no full sort.  The
    centroid's float sums are partition-order dependent at the 1e-13
    level, hence scoring to ``decimals`` BEFORE ranking.
    """
    from pyspark.sql import Window

    exploded = emb.select(
        F.col(id_col), F.posexplode(F.col(vec_col).cast("array<double>")).alias("_pos", "_v")
    )
    cent = (
        exploded.groupBy("_pos")
        .agg(F.avg("_v").alias("_c"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_c"))),
                lambda s: s["_c"],
            ).alias("_cent")
        )
    )
    # alias the interpreted-HOF cosine into an attribute FIRST:
    # portable_round references its input twice, and Catalyst will not
    # collapse a non-cheap multiply-referenced alias back inline — without
    # this the dim-length fold would evaluate twice per row
    scored = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            F.col(id_col),
            cosine(F.col(vec_col).cast("array<double>"), F.col("_cent")).alias("_cos"),
        )
        .select(
            F.col(id_col),
            portable_round(F.col("_cos"), decimals).alias("centroid_cos"),
        )
    )
    return scored.orderBy(F.col("centroid_cos").asc(), F.col(id_col).asc()).limit(k)


def pool_embeddings(
    emb: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    *,
    how: str = "mean",
    decimals: int = 6,
) -> DataFrame:
    """Per-group pooled embedding in long form: ``(group, pos, val)``.

    Mean/max pooling over a group's vectors — class prototypes, document
    embeddings from chunk embeddings, topic centroids for hand-off to the
    IVF/topic ops.  Long (one row per dimension) rather than an array
    column so downstream joins stay columnar and external engines can
    replay it row-for-row.

    ONE shuffle keyed on ``(group, dim)`` with map-side combine — shuffle
    width is |groups|×dims rows regardless of corpus size.  Mean values are
    rounded to ``decimals`` (float sum order); max pooling is order-free
    and exact.
    """
    aggs = {"mean": F.avg, "max": F.max}
    if how not in aggs:
        raise ValueError(f"how must be one of {sorted(aggs)}, got {how!r}")
    exploded = emb.select(
        F.col(group_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "_v"),
    )
    out = exploded.groupBy(group_col, "pos").agg(aggs[how]("_v").alias("_val"))
    val = portable_round(F.col("_val"), decimals) if how == "mean" else F.col("_val")
    return out.select(group_col, "pos", val.alias("val"))


def fit_scalar_quantizer(
    df: DataFrame, vec_col: str, *, dim: int | None = None
) -> tuple[list[float], list[float]]:
    """Per-dimension (mins, maxs) for scalar quantization — ONE agg pass.

    2·dim aggregate expressions over ``element_at`` (no explode, no
    shuffle beyond the single global agg); the collected result is
    2·dim doubles — a bounded plan-build action in the same sanctioned
    regime as ``kmeans_centroids`` / ``approxQuantile``, never O(rows).
    """
    d = dim or infer_dim(df, vec_col)
    v = F.col(vec_col)
    # try_element_at instead of ANSI element_at so the short-vector count
    # below owns the error (descriptive, names the row count) — but the
    # check must be LOUD per-corpus, not skipped per-row: min/max silently
    # ignoring a truncated vector would fit the quantizer to corrupt data.
    aggs = [
        F.sum(
            (F.coalesce(F.size(v), F.lit(-1)) < d).cast("bigint")
        ).alias("_short")
    ]
    for i in range(d):
        aggs.append(F.min(F.try_element_at(v, F.lit(i + 1))).alias(f"_mn{i}"))
        aggs.append(F.max(F.try_element_at(v, F.lit(i + 1))).alias(f"_mx{i}"))
    row = df.agg(*aggs).collect()[0]
    if row["_short"]:
        raise ValueError(
            f"fit_scalar_quantizer: {row['_short']} row(s) have a null "
            f"vector or fewer than dim={d} elements — clean the corpus or "
            f"pass the true dim"
        )
    bad = [i for i in range(d) if row[f"_mn{i}"] is None or row[f"_mx{i}"] is None]
    if bad:
        raise ValueError(
            f"fit_scalar_quantizer: no non-null values for dimension(s) "
            f"{bad[:5]}{'...' if len(bad) > 5 else ''} of {d} — empty corpus "
            f"or all-null column"
        )
    mins = [float(row[f"_mn{i}"]) for i in range(d)]
    maxs = [float(row[f"_mx{i}"]) for i in range(d)]
    return mins, maxs


def _quant_params(mins, maxs, bits):
    levels = (1 << bits) - 1
    scales = [
        (levels / (mx - mn)) if mx > mn else 0.0 for mn, mx in zip(mins, maxs)
    ]
    invs = [
        ((mx - mn) / levels) if mx > mn else 0.0 for mn, mx in zip(mins, maxs)
    ]
    return levels, scales, invs


def quantize_embeddings(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    mins: list[float],
    maxs: list[float],
    *,
    bits: int = 8,
) -> DataFrame:
    """Scalar-quantize vectors to ``bits``-bit codes: ``(id, codes)``.

    ``code_i = clamp(floor((x_i − min_i)·scale_i + 0.5), 0, 2^bits−1)``
    — floor(+0.5) instead of round() because banker's-rounding conventions
    differ across engines while floor is universal.  At 8 bits this cuts
    an embedding store 4× (int8 codes vs float32) with the (mins, maxs)
    codebook as 2·dim floats of metadata — the standard first rung of the
    ANN memory ladder (IVF cells + scalar codes).  Constant-dimension
    degenerate dims (max = min) encode 0 and decode to the constant.

    Row-local ``zip_with`` transforms against literal codebook arrays —
    codegen, no shuffle, no UDF; fully replayable by the oracle because
    the codebook is inlined as literals.
    """
    levels, scales, _ = _quant_params(mins, maxs, bits)
    m_arr = F.array(*[F.lit(m) for m in mins])
    s_arr = F.array(*[F.lit(s) for s in scales])
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), m_arr, lambda x, m: x - m
    )
    codes = F.zip_with(
        centered,
        s_arr,
        lambda d, s: F.least(
            F.greatest(F.floor(d * s + 0.5).cast("int"), F.lit(0)),
            F.lit(levels),
        ),
    )
    return df.select(F.col(id_col), codes.alias("codes"))


def quantization_fidelity(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    mins: list[float],
    maxs: list[float],
    *,
    bits: int = 8,
    decimals: int = 6,
) -> DataFrame:
    """Reconstruction cosine per vector: ``(id, recon_cos)``.

    Encodes, decodes (``min_i + code_i·inv_i``), and scores the
    dequantized vector against the original — the per-item fidelity
    audit run before committing a corpus to quantized storage.  Zero
    vectors emit null (no direction to preserve).
    """
    levels, scales, invs = _quant_params(mins, maxs, bits)
    m_arr = F.array(*[F.lit(m) for m in mins])
    i_arr = F.array(*[F.lit(i) for i in invs])
    codes = quantize_embeddings(df, id_col, vec_col, mins, maxs, bits=bits)
    joined = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).join(codes, id_col)
    deq = F.zip_with(
        F.zip_with(F.col("codes"), i_arr, lambda c, i: c * i),
        m_arr,
        lambda d, m: d + m,
    )
    withd = joined.select(F.col(id_col), F.col("_v"), deq.alias("_d"))
    num = dot(F.col("_v"), F.col("_d"))
    den = l2_norm(F.col("_v")) * l2_norm(F.col("_d"))
    # attribute-alias each interpreted fold BEFORE any multi-reference:
    # `den` is referenced by both the guard and the value (CaseWhen branch
    # values sit outside codegen subexpression elimination), and the
    # rounded ratio is referenced twice by portable_round — same
    # discipline as centroid_outliers
    return (
        withd.select(F.col(id_col), num.alias("_num"), den.alias("_den"))
        .select(
            F.col(id_col),
            F.when(F.col("_den") > 0, F.col("_num") / F.col("_den")).alias("_rc"),
        )
        .select(
            F.col(id_col),
            portable_round(F.col("_rc"), decimals).alias("recon_cos"),
        )
    )
