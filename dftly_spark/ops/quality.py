"""Declarative data-quality expectations (Great-Expectations-lite).

A rule list compiles to ONE aggregation pass over the frame (row-local
rules become conditional-count aggregate columns — no per-rule scans)
plus one keyed aggregation per ``unique`` rule; the output is a tidy
violations report, not an exception, so pipelines can gate on it, write
it to a monitoring table, or ``where: "$passed"`` it in YAML.

Rule forms (each a mapping):

* ``{rule: not_null, col: c}`` — null values violate.
* ``{rule: in_range, col: c, min: x, max: y}`` — outside [x, y] (either
  bound optional) violates; nulls are NOT violations (compose with
  not_null to forbid them).
* ``{rule: in_set, col: c, values: [...]}`` — value outside the set
  violates; nulls pass.
* ``{rule: matches, col: c, pattern: re}`` — non-matching non-null
  strings violate (Java/RE2-shared subset recommended).
* ``{rule: unique, cols: [a, b]}`` — rows whose key occurs more than
  once ALL count as violations (so n_violations is the number of rows
  involved in duplicates).
* ``{rule: expr, name: label, expr: "$a > $b"}`` — any dftly boolean
  expression; rows where it is false or null violate.  The reference's
  expression language IS the custom-rule language.

100 TB: the row-local rules share one scan with map-side combine; each
``unique`` rule adds one keyed aggregation on its columns.  Nothing
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["expect", "expect_observed", "roc_auc", "roc_auc_by_group"]


def _rule_cols(df: DataFrame, rules: list[dict]):
    """(label, violation-indicator Column) per row-local rule."""
    out = []
    for i, r in enumerate(rules):
        kind = r.get("rule")
        if kind == "unique":
            continue
        if kind == "not_null":
            c = F.col(r["col"])
            out.append((f"not_null({r['col']})", c.isNull()))
        elif kind == "in_range":
            c = F.col(r["col"])
            bad = F.lit(False)
            if "min" in r:
                bad = bad | (c < F.lit(r["min"]))
            if "max" in r:
                bad = bad | (c > F.lit(r["max"]))
            out.append((f"in_range({r['col']})", F.coalesce(bad, F.lit(False))))
        elif kind == "in_set":
            c = F.col(r["col"])
            bad = ~c.isin(*r["values"]) & c.isNotNull()
            out.append((f"in_set({r['col']})", bad))
        elif kind == "matches":
            c = F.col(r["col"])
            # FULL-match semantics (as documented): rlike alone is a
            # substring search, which would silently pass partial matches
            bad = c.isNotNull() & ~c.rlike(f"^(?:{r['pattern']})$")
            out.append((f"matches({r['col']})", bad))
        elif kind == "expr":
            from ..parser import Parser

            col = Parser.expr_to_spark(r["expr"], schema=df)
            name = r.get("name") or f"expr_{i}"
            out.append((f"expr({name})", ~F.coalesce(col, F.lit(False))))
        else:
            raise ValueError(
                f"unknown rule {kind!r} (rules: not_null, in_range, in_set, "
                "matches, unique, expr)"
            )
    return out


def expect(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate expectation ``rules``; return one report row per rule:
    ``(rule, n_rows, n_violations, passed)``."""
    row_rules = _rule_cols(df, rules)
    frames = []
    if row_rules:
        # coalesce: sum over an EMPTY frame is null — an empty input must
        # report 0 violations / passed, not a null verdict
        aggs = [F.count(F.lit(1)).alias("n_rows")] + [
            F.coalesce(F.sum(ind.cast("bigint")), F.lit(0)).alias(f"_v{i}")
            for i, (_, ind) in enumerate(row_rules)
        ]
        wide = df.agg(*aggs)
        stacked = " , ".join(
            # labels embed user text (rule names, column names) in SQL —
            # escape backslashes FIRST (Spark string literals treat '\' as
            # an escape char, so a label ending in '\' would swallow the
            # closing quote), then quotes
            "'{}', _v{}".format(
                label.replace("\\", "\\\\").replace("'", "\\'"), i
            )
            for i, (label, _) in enumerate(row_rules)
        )
        frames.append(
            wide.selectExpr(
                "n_rows", f"stack({len(row_rules)}, {stacked}) AS (rule, n_violations)"
            ).select("rule", "n_rows", "n_violations")
        )
    for r in rules:
        if r.get("rule") != "unique":
            continue
        cols = r["cols"] if isinstance(r["cols"], list) else [r["cols"]]
        label = f"unique({','.join(cols)})"
        dup = (
            df.groupBy(*[F.col(c) for c in cols])
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(
                F.coalesce(F.sum("_n"), F.lit(0)).alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("_n") > 1, F.col("_n")).otherwise(0)),
                    F.lit(0),
                ).alias("n_violations"),
            )
            .select(F.lit(label).alias("rule"), "n_rows", "n_violations")
        )
        frames.append(dup)
    if not frames:
        raise ValueError("expect() needs at least one rule")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select(
        "rule",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_violations").cast("bigint").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def roc_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    *,
    buckets: int = 64,
) -> DataFrame:
    """Exact distributed ROC-AUC of a binary ``label_col`` against
    ``score_col`` — the quality-classifier evaluation at corpus scale.

    Rank-sum (Mann-Whitney) formulation with average ranks for ties,
    carried in ALL-INTEGER arithmetic: doubling the rank sum makes every
    per-score-group term ``n⁺_g · (2·before_g + n_g + 1)`` an integer,
    summed as ``decimal(38,0)`` — exact and order-independent at any
    corpus size, finished by ONE double division:
    ``AUC = (2S − n⁺(n⁺+1) · … ) / (2·n⁺·n⁻)`` — so any engine reproduces
    the value bit-for-bit; no sampling, no sketch.

    Scale shape: one keyed aggregation to per-distinct-score (n_pos,
    n_tot) counts, cumulative positions via
    :func:`~dftly_spark.ops.scale.partitioned_cumsum` (two-level scan —
    never a single-reducer global window), one tiny final agg.  Rows with
    a null label or score are dropped.  Returns one row
    ``(auc, n_pos, n_neg)``; ``auc`` is null when either class is empty.
    """
    from .scale import partitioned_cumsum

    tagged = df.where(
        F.col(label_col).isNotNull() & F.col(score_col).isNotNull()
    ).select(
        F.col(score_col).cast("double").alias("_s"),
        F.col(label_col).cast("boolean").cast("bigint").alias("_y"),
    )
    grp = tagged.groupBy("_s").agg(
        F.sum("_y").alias("_np"), F.count(F.lit(1)).alias("_nt")
    )
    cum = partitioned_cumsum(grp, "_s", ["_nt"], buckets=buckets)
    # twice the rank-sum contribution of a tied score group: positives ×
    # (2·rows-before + group-size + 1) — integer, summed exactly.  BOTH
    # factors go to decimal BEFORE the multiply: their bigint product
    # overflows int64 near ~4e9 rows on a degenerate (constant-score)
    # column — exactly the broken-classifier case this op must survive.
    contrib = cum.select(
        "_np",
        "_nt",
        (
            F.col("_np").cast("decimal(38,0)")
            * (
                2 * (F.col("cum__nt") - F.col("_nt"))
                + F.col("_nt")
                + F.lit(1)
            ).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("_rs2"),
    )
    agg = contrib.agg(
        F.sum("_rs2").alias("_ranksum2"),
        F.sum("_np").alias("n_pos"),
        (F.sum("_nt") - F.sum("_np")).alias("n_neg"),
    )
    num = (
        F.col("_ranksum2")
        - (
            F.col("n_pos").cast("decimal(38,0)")
            * (F.col("n_pos") + F.lit(1)).cast("decimal(38,0)")
        )
    ).cast("double")
    den = 2.0 * F.col("n_pos").cast("double") * F.col("n_neg").cast("double")
    return agg.select(
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), num / den).alias(
            "auc"
        ),
        "n_pos",
        "n_neg",
    )


def roc_auc_by_group(
    df: DataFrame,
    group_col: str,
    label_col: str,
    score_col: str,
) -> DataFrame:
    """Per-slice exact ROC-AUC: one row ``(group, auc, n_pos, n_neg)`` per
    ``group_col`` value — the per-source / per-language model-eval shape
    (a global AUC hides a slice where the classifier is broken).

    Same all-integer Mann-Whitney formulation as :func:`roc_auc` (doubled
    rank sums are integers, summed as ``decimal(38,0)`` — bit-exact in
    any engine).  Cumulative ranks come from ONE keyed window over the
    per-(group, score) distinct counts: the window partition carries a
    group's DISTINCT scores (bounded by value cardinality, not row count
    — dedup happens in the keyed aggregation before the window), so a
    hot group costs its score cardinality, not its row count, on one
    reducer.  For a single global slice use :func:`roc_auc`, whose
    two-level cumsum avoids even that.
    """
    from pyspark.sql import Window

    tagged = df.where(
        F.col(group_col).isNotNull()
        & F.col(label_col).isNotNull()
        & F.col(score_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"),
        F.col(score_col).cast("double").alias("_s"),
        F.col(label_col).cast("boolean").cast("bigint").alias("_y"),
    )
    grp = tagged.groupBy("_g", "_s").agg(
        F.sum("_y").alias("_np"), F.count(F.lit(1)).alias("_nt")
    )
    w = Window.partitionBy("_g").orderBy("_s")
    cum = grp.select(
        "_g",
        "_np",
        "_nt",
        F.sum("_nt").over(w).alias("_cum"),
    )
    contrib = cum.select(
        "_g",
        "_np",
        "_nt",
        (
            F.col("_np").cast("decimal(38,0)")
            * (2 * (F.col("_cum") - F.col("_nt")) + F.col("_nt") + F.lit(1)).cast(
                "decimal(38,0)"
            )
        )
        .cast("decimal(38,0)")
        .alias("_rs2"),
    )
    agg = contrib.groupBy("_g").agg(
        F.sum("_rs2").alias("_ranksum2"),
        F.sum("_np").alias("n_pos"),
        (F.sum("_nt") - F.sum("_np")).alias("n_neg"),
    )
    num = (
        F.col("_ranksum2")
        - (
            F.col("n_pos").cast("decimal(38,0)")
            * (F.col("n_pos") + F.lit(1)).cast("decimal(38,0)")
        )
    ).cast("double")
    den = 2.0 * F.col("n_pos").cast("double") * F.col("n_neg").cast("double")
    return agg.select(
        F.col("_g").alias(group_col),
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), num / den).alias(
            "auc"
        ),
        "n_pos",
        "n_neg",
    )


import itertools as _itertools

_OBS_COUNTER = _itertools.count()


def expect_observed(df: DataFrame, rules: list[dict], *, name: str = "expect"):
    """Attach expectation metrics to the CALLER'S job via ``df.observe``.

    Returns ``(df_observed, observation)``: run any action on
    ``df_observed`` (typically the production write), then
    ``observation.get`` holds ``n_rows`` and one violation counter per
    rule — quality metrics for FREE on the pass the pipeline already
    pays for, where :func:`expect` costs a second full scan.  This is
    the 100 TB form of the quality gate: validate-while-writing instead
    of validate-then-write.

    Row-local rules only (``unique`` needs its own aggregation — use
    :func:`expect` for it; passing one here raises).  Aggregates inside
    ``observe`` are computed per task and merged, so counters are exact
    regardless of partitioning.  BATCH frames only: PySpark's
    ``Observation`` does not support streaming datasets (a streaming
    quality feed would use the string-name ``observe`` +
    ``StreamingQueryListener`` pair, not this helper) — a streaming
    input raises here rather than at plan time.  Each call gets a
    unique metrics name, so several observed frames can meet in one
    query (Spark requires per-query uniqueness).
    """
    from pyspark.sql import Observation

    if df.isStreaming:
        raise ValueError(
            "expect_observed is batch-only (pyspark Observation does not "
            "support streaming datasets); use expect() per micro-batch or "
            "a StreamingQueryListener"
        )
    if any(r.get("rule") == "unique" for r in rules):
        raise ValueError(
            "expect_observed is row-local; 'unique' needs its own "
            "aggregation — check it with expect()"
        )
    row_rules = _rule_cols(df, rules)
    obs = Observation(f"{name}_{next(_OBS_COUNTER)}")
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.coalesce(F.sum(ind.cast("bigint")), F.lit(0)).alias(f"violations_{i}")
        for i, (_, ind) in enumerate(row_rules)
    ]
    observed = df.observe(obs, *metrics)
    labels = [label for label, _ in row_rules]
    return observed, _ObservedExpectations(obs, labels)


class _ObservedExpectations:
    """Reader for :func:`expect_observed` metrics: ``.report()`` after the
    caller's action returns ``[(rule, n_rows, n_violations, passed)]``."""

    def __init__(self, observation, labels):
        self.observation = observation
        self.labels = labels

    def report(self) -> list[tuple]:
        got = self.observation.get
        n = got["n_rows"]
        return [
            (label, n, got[f"violations_{i}"], got[f"violations_{i}"] == 0)
            for i, label in enumerate(self.labels)
        ]


def calibration_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Reliability diagram: per score-bin counts vs observed positive rate.

    Buckets ``score_col`` into ``bins`` equal-width bins over ``[lo, hi)``
    (scores at ``hi`` land in the last bin) and reports, per bin:
    ``n``, ``n_pos``, ``mean_score`` and ``frac_pos``.  Out-of-range
    scores are CLAMPED into the edge bins (below ``lo`` → bin 0, above
    ``hi`` → bin ``bins-1``), the same convention as :func:`psi_drift` —
    they count toward the edge bins' ``n``/``mean_score``/``frac_pos``
    rather than being dropped (contrast :func:`histogram_fixed`, which
    EXCLUDES out-of-range values); pre-filter if exclusion is wanted.
    A well-calibrated scorer has ``mean_score ≈ frac_pos`` per bin — the
    standard companion diagnostic to :func:`roc_auc` (AUC is rank-only;
    calibration is not).

    One scan, one keyed aggregation (map-side combine over ≤ ``bins``
    keys).  ``mean_score`` inherits exact_sum's loud contract: a bin whose
    SCALED score sum leaves int64 (≳ 10^10 rows of [0,1] scores at the
    default 10^-8 grid) raises on both engines rather than wrapping.

    Cross-engine float discipline: the bin index is the single expression
    ``floor(((s - lo) / (hi - lo)) * bins)`` (identical IEEE ops in any
    engine); ``mean_score`` uses the shared exact integer-scaled sum
    convention (order-independent — a raw double sum over millions of rows
    wobbles with partition order beyond 6-decimal rounding); ``frac_pos``
    is a ratio of exact integers.
    """
    s, y, b, aggs = calibration_exprs(score_col, label_col, bins, lo, hi)
    return (
        df.where(s.isNotNull() & y.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(*aggs)
    )


def calibration_exprs(score_col, label_col, bins, lo, hi):
    """The ONE definition of the calibration conventions: ``(s, y, bin,
    aggs)`` shared by :func:`calibration_curve` and the streaming twin
    (``dftly_spark.streaming.windowed_calibration``) — a convention tweak
    lands in both or neither, so the documented bin-for-bin batch↔stream
    equality cannot silently drift."""
    from ..sqlgen import exact_sum, portable_round

    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("boolean")
    b = F.floor(((s - F.lit(float(lo))) / F.lit(float(hi - lo))) * F.lit(bins))
    b = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1)).cast("int")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(y.cast("bigint")).alias("n_pos"),
        portable_round(
            exact_sum(s, scale=10**8) / F.count(F.lit(1))
        ).alias("mean_score"),
        portable_round(
            F.sum(y.cast("bigint")).cast("double") / F.count(F.lit(1))
        ).alias("frac_pos"),
    ]
    return s, y, b, aggs


def spearman_corr(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    *,
    decimals: int = 6,
) -> DataFrame:
    """Per-group Spearman rank correlation of two numeric columns.

    The scorer-agreement metric: when two quality signals (a heuristic
    score and a model score, two rounds of an LLM judge, …) are candidates
    for the same filtering decision, their rank agreement — not their raw
    value agreement — is what predicts whether swapping them changes the
    kept set.  Spearman ρ = Pearson correlation of the two AVERAGE ranks
    (fractional ranks, the standard tie treatment), computed per group.

    Output: ``(group, n, spearman)`` — ``n`` is the pairs used (rows where
    BOTH columns are non-null; others are excluded, the complete-case
    convention), and ``spearman`` is null when ``n < 2`` or either column
    is constant within the group (undefined, never NaN).

    Plan shape: average ranks come from two window functions per column —
    ``rank()`` over the group plus a count over ``(group, value)`` — all
    partitioned by the group key (no unpartitioned windows), then ONE
    keyed aggregation computes the correlation from its moment sums.  The
    correlation is assembled from ``avg``/``covar_pop``/``var_pop`` and
    quantized on the floor-scale grid (``decimals``) because moment
    accumulation order differs across engines.
    """
    from ..sqlgen import portable_round
    from pyspark.sql import Window

    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.where(x.isNotNull() & y.isNotNull()).select(
        F.col(group_col), x.alias("_x"), y.alias("_y")
    )

    def avg_rank(col_name: str, out: str):
        # fractional (average) rank: rank() gives 1 + count(strictly less);
        # adding (ties - 1)/2 centers equal values on their shared rank.
        w_rank = Window.partitionBy(group_col).orderBy(F.col(col_name))
        w_ties = Window.partitionBy(group_col, col_name)
        return (
            F.rank().over(w_rank).cast("double")
            + (F.count(F.lit(1)).over(w_ties).cast("double") - 1.0) / 2.0
        ).alias(out)

    ranked = base.select(
        group_col, avg_rank("_x", "_rx"), avg_rank("_y", "_ry")
    )
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.covar_pop("_rx", "_ry").alias("_cov"),
        F.var_pop("_rx").alias("_vx"),
        F.var_pop("_ry").alias("_vy"),
    )
    rho = F.col("_cov") / F.sqrt(F.col("_vx") * F.col("_vy"))
    return agg.select(
        group_col,
        "n",
        F.when(
            (F.col("n") >= 2) & (F.col("_vx") > 0) & (F.col("_vy") > 0),
            portable_round(rho, decimals),
        ).alias("spearman"),
    )
