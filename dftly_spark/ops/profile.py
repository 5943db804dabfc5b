"""Dataset profiling: one-pass per-column quality stats for pipeline triage.

``profile_table`` answers the first questions asked of any new 100 TB drop —
null rates, cardinalities, value ranges, value widths — in a single
aggregation over one scan.  No reference counterpart (the reference is
row-wise expressions only); this is extension scope for the
training-data-pipeline side.

Plan shape: every stat for every column is computed in ONE ``agg`` (Spark
rewrites the multiple exact ``count(distinct)``s with an Expand — one
shuffle whose width is #profiled-columns, the standard exact-NDV plan),
then the single wide row is exploded into one row per column, all
JVM-side.  For quick triage at extreme scale pass ``approx=True``: HLL
sketches replace the exact NDVs and the Expand disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .scale import durable_checkpoint

from ..sqlgen import portable_round


def _fresh(df: DataFrame, *bases: str) -> list[str]:
    """Temp column names guaranteed absent from ``df`` (public ops take
    arbitrary user frames — a caller's own ``_m`` must survive)."""
    out = []
    taken = set(df.columns)
    for b in bases:
        name = b
        while name in taken:
            name = "_" + name
        taken.add(name)
        out.append(name)
    return out


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    approx: bool = False,
) -> DataFrame:
    """Per-column stats: ``(column, n_rows, n_nulls, n_distinct, min_str,
    max_str, avg_len)``.

    ``min_str``/``max_str`` are the native min/max rendered as strings
    (numeric order, not lexicographic); ``avg_len`` is the mean rendered
    width — a cheap proxy for payload size skew.  ``approx=True`` swaps the
    exact distinct counts for ``approx_count_distinct`` (±~2%).
    """
    cols = cols or df.columns
    ndv = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            ndv(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
            F.avg(F.length(F.col(c).cast("string"))).alias(f"__len_{c}"),
        ]
    wide = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_str"),
            F.col(f"__max_{c}").alias("max_str"),
            F.col(f"__len_{c}").alias("avg_len"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*entries)).alias("p")).select("p.*")


def rollup_stats(
    df: DataFrame,
    dims: list[str],
    metrics: dict[str, "F.Column"] | None = None,
    *,
    count_col: str = "n_rows",
) -> DataFrame:
    """Hierarchical subtotals over ``dims`` (``ROLLUP``) in one aggregation.

    The corpus-accounting query behind every mixing decision — "tokens by
    (lang, source), with per-lang subtotals and a grand total" — computed
    with Spark's native ``rollup`` so all levels share one scan + one
    shuffle (an Expand feeds each row to its ⌈levels⌉ groups) instead of
    ``len(dims)+1`` separate aggregations.  ``metrics`` maps output name →
    aggregate Column (default: row count only).  Returns the dims (null =
    subtotal row), ``grouping_id`` (bit i set = dim i rolled up — the
    standard disambiguator between a genuine null dim value and a
    subtotal), the count, and the metric columns.
    """
    return _grouped_stats(df.rollup(*dims), dims, metrics, count_col)


def cube_stats(
    df: DataFrame,
    dims: list[str],
    metrics: dict[str, "F.Column"] | None = None,
    *,
    count_col: str = "n_rows",
) -> DataFrame:
    """All-subsets subtotals over ``dims`` (``CUBE``) in one aggregation.

    :func:`rollup_stats`' sibling for NON-hierarchical dimensions — "rows
    by lang, by source, by (lang, source), and overall" — where rollup's
    prefix levels would miss the by-source-alone cut.  Native ``cube``:
    one scan + one shuffle, the Expand fanning each row to its 2^|dims|
    grouping sets; same ``grouping_id`` disambiguation contract as
    rollup_stats.  Keep |dims| small (fanout is 2^|dims| — at 100 TB
    three dims means an 8× Expand, the knob to watch).
    """
    return _grouped_stats(df.cube(*dims), dims, metrics, count_col)


def _grouped_stats(grouped, dims, metrics, count_col) -> DataFrame:
    """Shared agg/select tail of rollup_stats and cube_stats."""
    aggs = [F.count(F.lit(1)).alias(count_col)]
    for name, col in (metrics or {}).items():
        aggs.append(col.alias(name))
    return (
        grouped.agg(F.grouping_id().alias("grouping_id"), *aggs)
        .select(*dims, "grouping_id", count_col, *(metrics or {}))
    )


def histogram_fixed(
    df: DataFrame,
    value_col: str,
    *,
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """Fixed-width histogram over ``[lo, hi)``: ``(bin, bin_lo, bin_hi, n)``.

    One scan + one keyed aggregation (map-side combinable; the shuffle
    carries ≤ ``nbins`` rows per task).  Values outside ``[lo, hi)`` are
    dropped — count them separately if the tails matter; empty bins are
    absent from the output (join against ``sequence(0, nbins-1)`` to
    densify).  Bin edges are ``lo + bin·w`` in double arithmetic, exactly
    reproducible in any engine.
    """
    if not hi > lo:
        raise ValueError("hi must be greater than lo")
    w = (hi - lo) / nbins
    x = F.col(value_col).cast("double")
    b = F.floor((x - F.lit(lo)) / F.lit(w)).cast("int")
    return (
        df.where((x >= lo) & (x < hi))
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(w)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(w)).alias("bin_hi"),
            "n",
        )
    )


def ks_drift(
    df: DataFrame,
    value_col: str,
    group_col: str,
    a,
    b,
    *,
    buckets: int = 64,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between two slices.

    The distribution-drift check run between corpus versions (did this
    release shift the document-length / quality / score distribution?):
    ``KS = max_x |F_a(x) - F_b(x)|`` over the empirical CDFs of
    ``value_col`` in the ``group_col == a`` vs ``== b`` rows.  Returns one
    row ``(ks, n_a, n_b)``.  Exact, not sampled.

    Scale shape: per-value counts (one keyed aggregation over the rows),
    then CDFs via :func:`~dftly_spark.ops.scale.partitioned_cumsum` over
    the DISTINCT-value frame — the two-level scan, so no single-reducer
    global window even when the value domain is large.  The (n_a, n_b)
    totals ride along as a one-row broadcast.
    """
    from .scale import partitioned_cumsum

    tagged = df.where(F.col(group_col).isin(a, b)).select(
        F.col(value_col).alias("_v"),
        (F.col(group_col) == a).cast("bigint").alias("_ia"),
        (F.col(group_col) == b).cast("bigint").alias("_ib"),
    )
    counts = tagged.groupBy("_v").agg(
        F.sum("_ia").alias("_ca"), F.sum("_ib").alias("_cb")
    )
    cums = partitioned_cumsum(counts, "_v", ["_ca", "_cb"], buckets=buckets)
    totals = tagged.groupBy().agg(
        F.sum("_ia").alias("_na"), F.sum("_ib").alias("_nb")
    )
    scored = cums.crossJoin(F.broadcast(totals))
    diff = F.abs(
        F.col("cum__ca") / F.col("_na") - F.col("cum__cb") / F.col("_nb")
    )
    return scored.agg(
        F.max(diff).alias("ks"),
        F.any_value("_na").alias("n_a"),
        F.any_value("_nb").alias("n_b"),
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    group_col: str,
    a,
    b,
    *,
    lo: float,
    hi: float,
    n_buckets: int = 10,
    smooth: float = 0.5,
    decimals: int = 6,
) -> DataFrame:
    """Population Stability Index contributions between two slices.

    The model-monitoring companion to :func:`ks_drift` (PSI is what credit
    /ranking pipelines alarm on: <0.1 stable, 0.1-0.25 moderate, >0.25
    shifted): ``value_col`` is bucketed into ``n_buckets`` uniform buckets
    over ``[lo, hi)`` (out-of-range values clamp into the end buckets —
    the standard PSI treatment of range drift; nulls drop), and each
    bucket row carries ``psi = (p_a - p_b) · ln(p_a / p_b)`` with
    Laplace-smoothed proportions ``p = (c + smooth) / (N + smooth·k)`` so
    empty buckets stay finite.  Total PSI = ``sum(psi)`` — left to the
    caller's report layer: the emitted rows are per-bucket and
    per-row-deterministic (a cross-bucket float sum would be
    partial-order dependent).  ``psi`` is rounded by the convention-free
    floor-scale (``ln`` differs between engines in the last ulp; division
    and subtraction are correctly rounded and stay full-precision).

    Scale shape: ONE keyed aggregation over the tagged rows (bucket index
    is row-local arithmetic), a ``k``-row spine outer join, totals as a
    1-row broadcast — no window, no shuffle beyond the single groupBy.
    """
    if n_buckets < 1:
        raise ValueError(f"psi_drift needs n_buckets >= 1, got {n_buckets}")
    if not hi > lo:
        raise ValueError(
            f"psi_drift needs hi > lo, got lo={lo!r} hi={hi!r} (a zero-width "
            "range would silently clamp every row into the top bucket)"
        )
    width = (hi - lo) / n_buckets
    idx = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("bigint")
    bucket = F.greatest(F.lit(0).cast("bigint"), F.least(F.lit(n_buckets - 1).cast("bigint"), idx))
    tagged = df.where(
        F.col(group_col).isin(a, b) & F.col(value_col).isNotNull()
    ).select(
        bucket.alias("bucket"),
        (F.col(group_col) == a).cast("bigint").alias("_ia"),
        (F.col(group_col) == b).cast("bigint").alias("_ib"),
    )
    counts = tagged.groupBy("bucket").agg(
        F.sum("_ia").alias("_ca"), F.sum("_ib").alias("_cb")
    )
    spine = df.sparkSession.range(n_buckets).select(F.col("id").alias("bucket"))
    # totals fold the <= k bucket-count rows, NOT the tagged frame — a
    # second full scan would double the op's I/O; coalesce keeps an
    # all-empty slice finite (smoothed proportions, psi 0), as documented
    totals = counts.agg(
        F.coalesce(F.sum("_ca"), F.lit(0)).alias("_na"),
        F.coalesce(F.sum("_cb"), F.lit(0)).alias("_nb"),
    )
    full = (
        spine.join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("_ca"), F.lit(0)).alias("n_a"),
            F.coalesce(F.col("_cb"), F.lit(0)).alias("n_b"),
        )
        .crossJoin(F.broadcast(totals))
    )
    p_a = (F.col("n_a") + F.lit(smooth)) / (F.col("_na") + F.lit(smooth * n_buckets))
    p_b = (F.col("n_b") + F.lit(smooth)) / (F.col("_nb") + F.lit(smooth * n_buckets))
    psi_raw = (p_a - p_b) * F.log(p_a / p_b)
    scale = float(10 ** decimals)
    return full.select(
        "bucket",
        "n_a",
        "n_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        (F.floor(psi_raw * scale + F.lit(0.5)) / scale).alias("psi"),
    )


def quantile_stats(
    df: DataFrame,
    value_col: str,
    *,
    by: str | None = None,
    probs: tuple = (0.1, 0.25, 0.5, 0.75, 0.9),
    approx: bool = False,
) -> DataFrame:
    """Distribution stats per group: count, mean, and the given quantiles.

    Exact mode uses Spark's ``percentile`` (linear interpolation — the same
    definition as ANSI ``quantile_cont``, bit-identical on integer inputs),
    which buffers each group's values: right for profiling runs and
    bounded-cardinality groups.  At open-ended scale pass ``approx=True``
    for ``percentile_approx`` (KLL-style sketch, constant memory, rank
    error ≤ 1/accuracy) — approximate values are engine-specific, so only
    the exact mode carries a value oracle.

    Quantiles come back as one column per prob (``q10``, ``q25``, …) —
    scalar columns, not an array.
    """
    fn = "percentile_approx" if approx else "percentile"
    arr = ", ".join(repr(float(p)) for p in probs)
    extra = ", 10000" if approx else ""
    agg = [
        F.count(value_col).alias("n"),
        F.avg(value_col).alias("mean"),
        F.expr(f"{fn}({value_col}, array({arr}){extra})").alias("__q"),
    ]
    g = df.groupBy(by) if by else df.groupBy()
    wide = g.agg(*agg)
    qcols = [
        F.element_at("__q", i + 1).alias(f"q{int(p * 100)}")
        for i, p in enumerate(probs)
    ]
    keep = ([F.col(by)] if by else []) + [F.col("n"), F.col("mean")] + qcols
    return wide.select(*keep)


def rolling_zscore(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    *,
    lookback: int = 100,
    z_threshold: float = 3.0,
    min_obs: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Per-key rolling z-score anomaly flags over an ordered stream.

    Each row's value is scored against the mean/stddev of its own key's
    previous ``lookback`` rows (the row itself EXCLUDED — the score is a
    pure one-step-ahead residual, so an outlier can't mask itself), and
    flagged when ``|z| > z_threshold``.  Rows with fewer than ``min_obs``
    predecessors emit a null score: an honest cold-start, not a fake zero.
    Appends ``zscore`` (rounded) and ``is_anomaly``.

    ONE keyed window shuffle; the frame is rows-bounded (``lookback``
    PRECEDING .. 1 PRECEDING), so per-row state is O(lookback) within a
    sorted partition and nothing grows with key cardinality or history
    length.  ``stddev_samp``'s accumulation differs across engines in the
    last ulps — rounding to ``decimals`` keeps scores engine-portable,
    and flag knife-edges would need a score within 1e-12 of the
    threshold.
    """
    from pyspark.sql import Window

    order = [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*order).rowsBetween(-lookback, -1)
    # Materialize the window outputs as ATTRIBUTES before any arithmetic
    # references them: Catalyst does NOT deduplicate syntactically repeated
    # window expressions, so building z inline and handing it to
    # portable_round (2 refs) + is_anomaly (2 more) would run every
    # mean/stddev/count frame FOUR times — measured ~2x end-to-end on this
    # op.  As attributes they're computed once and re-referenced for free.
    c_m, c_sd, c_np = _fresh(df, "_m", "_sd", "_np")
    scored = df.select(
        "*",
        F.mean(F.col(value_col)).over(w).alias(c_m),
        F.stddev_samp(F.col(value_col)).over(w).alias(c_sd),
        F.count(F.col(value_col)).over(w).alias(c_np),
    )
    z = F.when(
        (F.col(c_np) >= min_obs) & (F.col(c_sd) > 0),
        (F.col(value_col) - F.col(c_m)) / F.col(c_sd),
    )
    return (
        scored.withColumn("zscore", portable_round(z, decimals))
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col("zscore")) > z_threshold, F.lit(False)),
        )
        .drop(c_m, c_sd, c_np)
    )


def ntile_features(
    df: DataFrame,
    key_col: str,
    value_col: str,
    order_cols: list[str] | None = None,
    *,
    buckets: int = 10,
) -> DataFrame:
    """Per-key rank features: ``ntile`` bucket, ``percent_rank``,
    ``cume_dist`` over the value within each key.

    The feature-engineering staple for monotone-invariant models (a value's
    *standing* within its group, not its magnitude): appends three columns,
    all from ONE keyed window shuffle.  Ties are broken by ``order_cols``
    (pass the row id) so the ordering is total and every engine ranks
    identically; percent_rank and cume_dist are ratios of row counts —
    exact rationals, bit-identical everywhere.
    """
    from pyspark.sql import Window

    order = [F.col(value_col).asc()] + [
        F.col(c).asc() for c in (order_cols or [])
    ]
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        df.withColumn("bucket", F.ntile(buckets).over(w))
        .withColumn("pct_rank", F.percent_rank().over(w))
        .withColumn("cume", F.cume_dist().over(w))
    )


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    *,
    top_k: int = 25,
) -> DataFrame:
    """Heavy-hitter report for a join/aggregation key: the diagnostic read
    BEFORE picking a salting factor or an AQE skew threshold.

    Output: the ``top_k`` keys by row count with each key's ``share`` of
    total rows and the running ``cum_share`` — the '3 keys own 40% of the
    table' table that decides whether a shuffle needs a skew plan at all.

    Plan: keyed count with map-side combine (the only data-sized shuffle),
    TakeOrdered for the top-k cut (never a full sort), then the 1-row total
    joins the k survivors by broadcast — the same sanctioned 1-row
    nested-loop as BM25's corpus stats.  The final window ranks ``top_k``
    rows, not data.  Shares are count ratios: exact rationals, engine-exact.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("_total"))
    top = counts.orderBy(F.col("n").desc(), F.col("key").asc()).limit(top_k)
    w = Window.orderBy(F.col("n").desc(), F.col("key").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n",
            (F.col("n").cast("double") / F.col("_total")).alias("share"),
            (F.sum("n").over(w).cast("double") / F.col("_total")).alias(
                "cum_share"
            ),
        )
    )


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    lower: float = 0.01,
    upper: float = 0.99,
    decimals: int = 6,
) -> DataFrame:
    """Per-group percentile clamping (winsorization) with an audit flag.

    The standard heavy-tail repair before scaling/averaging: values below
    the group's ``lower`` or above its ``upper`` exact percentile clamp to
    that percentile; ``was_clamped`` keeps the intervention auditable.
    Appends ``clamped`` and ``was_clamped``.

    One keyed percentile aggregation (map-side partial) over ≤|groups|
    rows joined back to the frame — AQE broadcasts the tiny bounds side.
    The percentile BOUNDS are quantized on the floor-scale grid
    (``decimals``) before clamping: Spark's exact ``percentile`` and
    DuckDB's ``quantile_cont`` interpolate the same fractional rank with
    differently-associated arithmetic, and the r14 sf1.0 gate caught a
    real 1-ulp divergence (2.52 vs 2.52+4.4e-16 on a 1M-row group) that
    smaller scales never hit — so the bounds follow the same rounding
    convention as every other cross-engine float in the repo.  Unclamped
    values pass through exactly.
    """
    from ..sqlgen import portable_round

    v = F.col(value_col)
    bounds = df.groupBy(F.col(group_col).alias("_wg")).agg(
        portable_round(F.percentile(v, F.lit(lower)), decimals).alias("_lo"),
        portable_round(F.percentile(v, F.lit(upper)), decimals).alias("_hi"),
    )
    joined = df.join(bounds, df[group_col] == bounds["_wg"], "left").drop("_wg")
    clamped = F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    return (
        joined.withColumn("clamped", clamped)
        .withColumn(
            "was_clamped", F.coalesce(v != F.col("clamped"), F.lit(False))
        )
        .drop("_lo", "_hi")
    )


def impute_nulls(
    df: DataFrame,
    group_col: str,
    strategy: dict[str, str],
    *,
    decimals: int = 6,
) -> DataFrame:
    """Group-wise null imputation: ``{column: "mean" | "median" | "mode"}``.

    Nulls in each listed column fill from the column's own group statistic
    (a group whose statistic is itself null — all-null group — stays
    null: inventing a global fallback silently crosses group semantics;
    do that explicitly if wanted).  ``mode`` ties break on the smallest
    value, so imputation is deterministic in every engine.

    mean/median compute in ONE keyed aggregation; each mode column adds
    one (group, value) count agg with a tiny rank window over distinct
    values.  Everything joins back on the group key (broadcast-sized).
    Mean fills are rounded to ``decimals`` (float sum order); median and
    mode fills are engine-exact as-is.
    """
    from pyspark.sql import Window

    agg_exprs = []
    for c, how in strategy.items():
        if how == "mean":
            agg_exprs.append(
                portable_round(F.avg(F.col(c)), decimals).alias(f"_fill_{c}")
            )
        elif how == "median":
            agg_exprs.append(
                F.percentile(F.col(c), F.lit(0.5)).alias(f"_fill_{c}")
            )
        elif how != "mode":
            raise ValueError(f"unknown strategy {how!r} for column {c!r}")
    stats = None
    if agg_exprs:
        stats = df.groupBy(F.col(group_col).alias("_ig")).agg(*agg_exprs)
    for c, how in strategy.items():
        if how != "mode":
            continue
        w = Window.partitionBy("_ig").orderBy(
            F.col("_cnt").desc(), F.col(f"_fill_{c}").asc()
        )
        mode_c = (
            df.where(F.col(c).isNotNull())
            .groupBy(F.col(group_col).alias("_ig"), F.col(c).alias(f"_fill_{c}"))
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .drop("_cnt", "_rk")
        )
        stats = mode_c if stats is None else stats.join(mode_c, "_ig", "left")
    out = df.join(stats, df[group_col] == stats["_ig"], "left").drop("_ig")
    for c in strategy:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"_fill_{c}")))
    return out.drop(*[f"_fill_{c}" for c in strategy])


def group_trend(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    *,
    decimals: int = 6,
) -> DataFrame:
    """Per-key OLS trend of ``y`` over ``x``: ``(key, n, slope, intercept,
    r2)``.

    The trend feature every activity/quality dashboard wants ("is this
    user's engagement rising?"), computed closed-form from one keyed
    aggregation of sufficient statistics — no iteration, no ML library.
    ``x`` is CENTERED on the key's min before the sums (the classic
    conditioning fix: epoch-scale x values square into 1e23 and eat the
    double mantissa; slope/r2 are translation-invariant so results are
    unchanged, just computable).  Keys with fewer than 2 points or zero x
    variance report null slope/intercept/r2 rather than fake zeros.

    All five sums come from ONE map-side-combined shuffle; the final
    expressions are identical in the oracle, so after rounding (float sum
    order) the numbers replay exactly.
    """
    x_raw = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.select(F.col(key_col), x_raw.alias("_x"), y.alias("_y"))
    xmin = base.groupBy(key_col).agg(F.min("_x").alias("_x0"))
    c = base.join(xmin, key_col).select(
        F.col(key_col), (F.col("_x") - F.col("_x0")).alias("_x"), "_y"
    )
    sums = c.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    n = F.col("n").cast("double")
    den = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    slope = F.when((F.col("n") >= 2) & (den > 0), num / den)
    intercept = (F.col("_sy") - slope * F.col("_sx")) / n
    syy_c = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    r2 = F.when((F.col("n") >= 2) & (den > 0) & (syy_c > 0),
                (num * num) / (den * syy_c))
    return sums.select(
        key_col,
        "n",
        portable_round(slope, decimals).alias("slope"),
        portable_round(intercept, decimals).alias("intercept"),
        portable_round(r2, decimals).alias("r2"),
    )


def corr_matrix(
    df: DataFrame,
    cols: list[str],
    *,
    decimals: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlations in long form: ``(col_x, col_y, corr)``.

    The feature-redundancy triage view, computed from ONE aggregation of
    sufficient statistics (k sums + k² cross-sums in a single map-side-
    combined pass — never k² scans, never a driver-side loop over
    ``df.stat.corr``).  Pairs with zero variance on either side report
    null.  Only the upper triangle (``col_x < col_y`` by list order)
    is emitted.

    The formula is spelled from raw sums rather than a builtin ``corr``
    so the oracle replays the exact expression structure; output rounds
    below the float-sum wobble.
    """
    if len(cols) < 2:
        raise ValueError("corr_matrix needs at least two columns")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        v = F.col(c).cast("double")
        aggs.append(F.sum(v).alias(f"_s_{c}"))
        aggs.append(F.sum(v * v).alias(f"_ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(
                F.sum(F.col(a).cast("double") * F.col(b).cast("double")).alias(
                    f"_sp_{a}_{b}"
                )
            )
    wide = df.agg(*aggs)
    n = F.col("_n").cast("double")
    parts = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            cov = n * F.col(f"_sp_{a}_{b}") - F.col(f"_s_{a}") * F.col(f"_s_{b}")
            va = n * F.col(f"_ss_{a}") - F.col(f"_s_{a}") * F.col(f"_s_{a}")
            vb = n * F.col(f"_ss_{b}") - F.col(f"_s_{b}") * F.col(f"_s_{b}")
            corr = F.when((va > 0) & (vb > 0), cov / F.sqrt(va * vb))
            parts.append(
                F.struct(
                    F.lit(a).alias("col_x"),
                    F.lit(b).alias("col_y"),
                    portable_round(corr, decimals).alias("corr"),
                )
            )
    return wide.select(F.explode(F.array(*parts)).alias("_p")).select("_p.*")


def group_entropy(
    df: DataFrame,
    key_col: str,
    cat_col: str,
    *,
    decimals: int = 6,
) -> DataFrame:
    """Shannon entropy of a categorical distribution per key (nats):
    ``(key, n_rows, n_cats, entropy)``.

    Behavioral-diversity / label-balance feature: 0 for single-category
    keys, ``ln(n_cats)`` at uniform.  Null categories count as a category
    of their own (they are a real outcome; silently dropping them skews
    the distribution).

    Two keyed aggregations on the same key — (key, cat) counts with
    map-side combine, then the per-key fold — no windows, no data-sized
    state.  ``p·ln p`` sums are rounded below cross-engine ``ln`` ulp
    wobble.
    """
    cat = F.coalesce(F.col(cat_col).cast("string"), F.lit("\x00null"))
    counts = df.groupBy(F.col(key_col), cat.alias("_cat")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    return (
        counts.groupBy(key_col)
        .agg(
            F.sum("_c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_cats"),
            F.sum(F.col("_c") * F.log(F.col("_c").cast("double"))).alias("_clogc"),
        )
        .select(
            key_col,
            "n_rows",
            "n_cats",
            # H = ln(N) - (1/N)·Σ c·ln c  (exact algebra of -Σ p ln p)
            portable_round(
                F.log(F.col("n_rows").cast("double"))
                - F.col("_clogc") / F.col("n_rows"),
                decimals,
            ).alias("entropy"),
        )
    )


def distinct_counts(
    df: DataFrame,
    by: str | list[str] | None,
    cols: list[str],
    *,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Cardinality accounting: distinct values of each ``cols`` per group.

    The dataset-accounting staple (distinct users per event type, distinct
    URLs per source) in two modes sharing one code path:

    * exact (default): ``count(DISTINCT col)`` — Spark plans one Expand +
      keyed aggregation with partial (map-side) distinct, the same shape
      the oracle replays.  Exact distinct over N keys shuffles the
      (key, value) pairs once; fine whenever that set fits the cluster.
    * ``approx=True``: HyperLogLog++ (``approx_count_distinct``, relative
      error ``rsd``) — constant memory per group, ONE ordinary keyed agg
      with partial sketches merged map-side.  At 100 TB this is the
      default: sketches are mergeable, so the shuffle carries
      O(groups × sketch_size), independent of value cardinality.
      Estimates are engine-specific → no value oracle; tests pin the
      relative error against the exact twin instead.

    Returns the group keys + ``n_rows`` + one ``nd_<col>`` per input col.
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    fn = (
        (lambda c: F.approx_count_distinct(c, rsd))
        if approx
        else F.countDistinct
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        fn(F.col(c)).alias(f"nd_{c}") for c in cols
    ]
    g = df.groupBy(*[F.col(k) for k in keys]) if keys else df.groupBy()
    return g.agg(*aggs)


def ewma(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    *,
    alpha: float = 0.2,
    lookback: int = 50,
    out_col: str = "ewma",
    decimals: int = 6,
) -> DataFrame:
    """Per-key exponentially-weighted moving average over an ordered stream.

    The standard recursive smoother ``y_i = α·x_i + (1-α)·y_{i-1}``
    seeded at the window's first value, evaluated EXACTLY over each row's
    last ``lookback`` observations (its own value included) — the
    truncation is principled: weights beyond the window are
    ``(1-α)^lookback`` (≈1e-5 at the defaults), and bounding the frame is
    what keeps per-row state O(lookback) instead of O(history).

    Not a UDF: the window's values are gathered with ``collect_list``
    over a rows-bounded frame and folded with the higher-order
    ``aggregate`` — a left fold inside codegen, bit-replayable by any
    engine with list folds (the oracle uses DuckDB's ``list_reduce``).
    ONE keyed window shuffle, shared with any other feature on the same
    (key, order).

    NULL observations: ``collect_list`` drops them, so a null-valued row
    smooths over its window's non-null values (and a window of all nulls
    yields null).  The frame stays ROWS-based — null rows still consume
    lookback slots — mirrored exactly by the oracle's pre-fold
    ``list_filter``.
    """
    from pyspark.sql import Window

    order = [F.col(c).asc() for c in order_cols]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-(lookback - 1), 0)
    )
    # window output materialized as an ATTRIBUTE first: Catalyst does not
    # dedup syntactically repeated window expressions, and the fold below
    # references the collected list three times (slice, size, seed) — as
    # an attribute the collect_list window runs once, not thrice
    (c_xs,) = _fresh(df, "_xs")
    staged = df.withColumn(c_xs, F.collect_list(F.col(value_col).cast("double")).over(w))
    xs = F.col(c_xs)
    folded = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))),
        F.get(xs, 0),  # null-tolerant seed: all-null window -> null EWMA
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
    )
    # floor(x·10^d + 0.5) instead of round(): the fold is bit-identical
    # across engines, but round() conventions differ exactly AT the
    # half-boundary (Spark HALF_UP on the decimal expansion vs DuckDB's
    # float-multiply round) — measured 6 knife-edge rows per 100k.  The
    # floor form is one double multiply+add both engines do identically.
    scale = float(10 ** decimals)
    rounded = F.floor(folded * scale + 0.5) / scale
    return staged.withColumn(out_col, rounded).drop(c_xs)


def mad_outliers(
    df: DataFrame,
    key_col: str | None,
    value_col: str,
    *,
    k: float = 3.5,
    consistency: float = 1.4826,
    decimals: int = 6,
) -> DataFrame:
    """Robust per-group outlier flags via median absolute deviation.

    The order-free, heavy-tail-safe cousin of :func:`rolling_zscore`:
    score = (x − median) / (consistency · MAD) with MAD the median of
    |x − median| per group; ``|score| > k`` flags.  Median/MAD shrug off
    the very outliers a mean/stddev detector lets poison its own
    baseline; 1.4826 rescales MAD to σ under normality (the standard
    consistency constant), ``k=3.5`` is the textbook threshold.

    Two exact-percentile aggregations (median, then MAD of the residuals)
    joined back — both keyed on the group (broadcast when groups are few),
    exact ``percentile`` ≡ ``quantile_cont``.  Groups with MAD = 0 (over
    half the values identical) emit null scores and never flag — an
    honest "scale-free" verdict, not a division blow-up.

    Appends ``mad_score`` (rounded) and ``is_outlier``.
    """
    keys = [key_col] if key_col else []
    v = F.col(value_col).cast("double")

    def _attach(base, agg):
        # null-SAFE key equality: groupBy puts null keys in their own
        # group, so the join back must match them too — a plain equi-join
        # would silently DROP null-key rows (SQL null never equals null).
        if not keys:
            return base.crossJoin(F.broadcast(agg))
        cond = [base[k].eqNullSafe(agg[f"_k_{k}"]) for k in keys]
        return base.join(F.broadcast(agg), cond).drop(*[f"_k_{k}" for k in keys])

    med = df.groupBy(*[F.col(k).alias(f"_k_{k}") for k in keys]).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    with_med = _attach(df, med)
    mad = with_med.groupBy(*[F.col(k).alias(f"_k_{k}") for k in keys]).agg(
        F.expr(f"percentile(abs(cast({value_col} as double) - _med), 0.5)").alias(
            "_mad"
        )
    )
    full = _attach(with_med, mad)
    score = F.when(
        F.col("_mad") > 0, (v - F.col("_med")) / (F.lit(consistency) * F.col("_mad"))
    )
    return (
        full.withColumn("mad_score", portable_round(score, decimals))
        .withColumn(
            "is_outlier",
            F.coalesce(F.abs(F.col("mad_score")) > k, F.lit(False)),
        )
        .drop("_med", "_mad")
    )


def pareto_front(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    by: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """Rows on the maximize-(x, y) Pareto frontier, per ``by`` group.

    A row survives iff NO other row in its group strictly dominates it
    (``>=`` in both dimensions and ``>`` in at least one).  Duplicated
    frontier points all survive (neither copy dominates the other).  The
    pipeline use: pick the quality-vs-length (or score-vs-cost) frontier
    of a corpus instead of a single-metric top-k.

    100 TB plan shape — never the O(n²) dominance self-join:

    1. one keyed aggregation to ``max(y)`` per ``(by, x)`` (map-side
       combine; the frame shrinks to #distinct-x rows per group);
    2. a cumulative ``max(y)`` window in descending ``x`` over that
       AGGREGATED frame — a row's x-ties share the aggregate row, so a
       grouped window partition holds at most #distinct-x rows per group,
       not n.  For the UNGROUPED case with numeric ``x`` (where
       distinct-x ~ n would funnel one window partition), the cumulative
       max runs two-level instead (the ``partitioned_cumsum`` shape):
       rows bucket by ``x`` range (boundaries from a one-shot
       ``approxQuantile`` — placement affects only partition sizes,
       never results), each bucket computes its local descending-x
       running max in parallel, and per-bucket maxima (``buckets`` rows)
       contribute a broadcast prefix-max offset.  A non-numeric
       ungrouped ``x`` (no quantile support) falls back to the single
       window.
    3. an equi-join back on ``(by, x, y = max_y)`` returns the surviving
       input rows with all their columns.

    NOTE (plan-build-time work): the ungrouped numeric-``x`` path runs
    eager Spark jobs AT CALL TIME — ``approxQuantile`` is an action, and
    it materializes the lazily-checkpointed ``(x, max_y)`` aggregate it
    quantiles (which stays pinned in executor storage; see
    ``_two_level_desc_cummax``).  Callers composing plans fully lazily
    should expect those jobs before their own first action on this path;
    the grouped and non-numeric paths stay lazy.
    """
    from pyspark.sql.types import NumericType

    by = list(by)
    x, y = F.col(x_col), F.col(y_col)
    # collision-proof temp names: public op, arbitrary caller frames
    fx, fy, ymax_c, prev_c, pid_c, loc_c, tot_c, off_c, *fby = _fresh(
        df, "_f_x", "_f_y", "_ymax", "_prev", "_pid", "_loc", "_tot", "_off",
        *[f"_f_{c}" for c in by],
    )
    per_x = (
        df.where(x.isNotNull() & y.isNotNull())
        .groupBy(*by, x_col)
        .agg(F.max(y).alias(ymax_c))
    )
    # survivor iff y strictly exceeds every y seen at strictly larger x
    # (an equal y at larger x dominates; equal x-ties were pre-aggregated)
    if by or not isinstance(df.schema[x_col].dataType, NumericType):
        w = (
            Window.partitionBy(*by)
            .orderBy(F.desc(x_col))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        ranked = per_x.withColumn(prev_c, F.max(ymax_c).over(w))
    else:
        ranked = _two_level_desc_cummax(
            per_x, x_col, ymax_c, prev_c, pid_c, loc_c, tot_c, off_c
        )
    frontier = (
        ranked.where(F.col(prev_c).isNull() | (F.col(ymax_c) > F.col(prev_c)))
        .select(
            *[F.col(c).alias(a) for c, a in zip(by, fby)],
            F.col(x_col).alias(fx),
            F.col(ymax_c).alias(fy),
        )
    )
    # null-SAFE equality on the group keys: groupBy kept a null group all
    # the way through, so the join back must match it too (x/y are
    # non-null by the input filter, but a name-based semi join would
    # silently drop every row whose `by` key is null)
    cond = (F.col(x_col) == F.col(fx)) & (F.col(y_col) == F.col(fy))
    for c, a in zip(by, fby):
        cond = cond & F.col(c).eqNullSafe(F.col(a))
    return df.join(frontier, cond, "left_semi")


def _two_level_desc_cummax(
    per_x: DataFrame,
    x_col: str,
    ymax_c: str,
    prev_c: str,
    pid_c: str,
    loc_c: str,
    tot_c: str,
    off_c: str,
    *,
    buckets: int = 64,
) -> DataFrame:
    """``per_x`` + ``prev_c`` = max(ymax) over all STRICTLY-larger-x rows,
    computed without a single global window partition.

    Range-bucket by ``x`` (distinct per row in ``per_x``, so equal x never
    straddles buckets and cross-bucket order is strict), local descending
    cummax per bucket, then a broadcast prefix-max over the tiny
    per-bucket totals (the only unpartitioned window runs over <=
    ``buckets`` rows — the partitioned_cumsum exception).
    """
    # referenced by the quantile ACTION below and twice in the result plan:
    # truncate lineage so the aggregation runs once, not three times.
    # Retention note: this pins the (x, max_y) frame — TWO numeric columns
    # at distinct-x cardinality, NOT the input — in executor storage until
    # the driver GCs the RDD reference (ContextCleaner); the trade is that
    # bounded storage against three executions of the full input scan +
    # aggregation.  Long-lived sessions frontier-ing many huge frames can
    # force release early via spark.catalog.clearCache()-adjacent GC or by
    # bucketing x upstream.
    per_x = per_x.transform(durable_checkpoint, eager=False)
    probs = [i / buckets for i in range(1, buckets)]
    bounds = per_x.stat.approxQuantile(x_col, probs, 0.01)
    pid = F.lit(0)
    for b in sorted(set(bounds)):
        pid = pid + (F.col(x_col) > F.lit(b)).cast("int")
    keyed = per_x.withColumn(pid_c, pid)
    w_loc = (
        Window.partitionBy(pid_c)
        .orderBy(F.desc(x_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = keyed.withColumn(loc_c, F.max(ymax_c).over(w_loc))
    totals = keyed.groupBy(pid_c).agg(F.max(ymax_c).alias(tot_c))
    w_off = Window.orderBy(F.desc(pid_c)).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(pid_c, F.max(tot_c).over(w_off).alias(off_c))
    return (
        local.join(F.broadcast(offsets), pid_c)
        # greatest() skips nulls: null iff no larger-x row exists anywhere
        .withColumn(prev_c, F.greatest(loc_c, off_c))
        .drop(pid_c, loc_c, off_c)
    )
