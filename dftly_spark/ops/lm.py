"""Corpus n-gram language-model scoring (KenLM-style quality signal).

Pretraining pipelines score every document's fluency against an n-gram LM
and filter/bucket on the result (the CCNet / Gopher-rules recipe).  The
container has no LM runtime, and none is needed: an add-k-smoothed bigram
model estimated from the corpus itself is pure relational algebra —

* ONE tokenization pass; bigram instances come from ``slice``+``arrays_zip``
  (codegen'd collection expressions, no lambdas, no window);
* model estimation is two keyed aggregations (bigram counts, then their
  per-prefix sums — map-side combined, counts shrink before every shuffle);
* scoring joins the instances back to the counts on the SAME ``(w1, w2)``
  key the counts were aggregated on, so the instance exchange is reused,
  exactly like the BM25 postings⋈df join in ``retrieval.py``;
* per-document log-probabilities fold in token order (deterministic
  sequential sum → bit-reproducible, DuckDB replays it with
  ``list_reduce(list(... ORDER BY pos))``).

At 100 TB the bigram-count table is itself large; both joins are plain
shuffle equi-joins (AQE broadcasts them when they are small), and hot
prefixes (stop words) are exactly the skew AQE's skew-join splitting
handles.  No UDFs, no driver-side model object.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import doc_tokens, normalize_text, tokens


def bigram_frame(
    df: DataFrame, id_col: str, text_col: str, tokens_col: str | None = None
) -> DataFrame:
    """``(_id, _pos, _w1, _w2)`` — position-indexed bigram instances of the
    normalized whitespace tokens; documents with fewer than two tokens have
    no rows."""
    base = df.select(
        F.col(id_col).alias("_id"),
        doc_tokens(df, text_col, tokens_col).alias("_w"),
    ).where(F.size("_w") >= 2)
    pairs = F.arrays_zip(
        F.slice(F.col("_w"), 1, F.size("_w") - 1).alias("_w1"),
        F.slice(F.col("_w"), 2, F.size("_w") - 1).alias("_w2"),
    )
    return base.select(
        "_id", F.posexplode(pairs).alias("_pos", "_bg")
    ).select("_id", "_pos", F.col("_bg._w1").alias("_w1"), F.col("_bg._w2").alias("_w2"))


def bigram_lm_scores(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 1.0,
    tokens_col: str | None = None,
) -> DataFrame:
    """Score each document under an add-``k`` bigram LM fit on the corpus.

    ``p(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k·V)`` with ``V`` the
    corpus unigram vocabulary size.  Returns ``(id_col, n_bigrams,
    logprob, avg_logprob)`` for every document with ≥2 tokens;
    ``avg_logprob`` (mean token log-likelihood, the usual pseudo-perplexity
    signal) is what quality filters threshold on.

    Self-scoring on the training corpus is the standard one-corpus setup;
    to score against a held-out reference model, fit the counts on the
    reference frame and join this frame's instances against them.
    """
    inst = bigram_frame(df, id_col, text_col, tokens_col)
    c2 = inst.groupBy("_w1", "_w2").agg(F.count(F.lit(1)).alias("_c2"))
    c1 = c2.groupBy("_w1").agg(F.sum("_c2").alias("_c1"))
    vocab = (
        df.select(F.explode(doc_tokens(df, text_col, tokens_col)).alias("_t"))
        .agg(F.count_distinct("_t").alias("_v"))
    )
    lp = F.log(
        (F.col("_c2") + F.lit(k))
        / (F.col("_c1") + F.lit(k) * F.col("_v"))
    )
    scored = (
        inst.join(c2, ["_w1", "_w2"])
        .join(c1, "_w1")
        .crossJoin(F.broadcast(vocab))
        .select("_id", "_pos", lp.alias("_lp"))
    )
    return scored.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_lp"))),
                lambda st: st["_lp"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("logprob"),
    ).select(
        F.col("_id").alias(id_col),
        "n_bigrams",
        "logprob",
        (F.col("logprob") / F.col("n_bigrams")).alias("avg_logprob"),
    )


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    target_filter,
    n_buckets: int = 1024,
    tokens_col: str | None = None,
) -> DataFrame:
    """Hashed-bigram importance weights for data selection (DSIR).

    Scores every document by ``log p_target(x) − log p_raw(x)`` under two
    add-1-smoothed hashed bag-of-bigrams models: the target model fit on
    the rows matching ``target_filter``, the raw model on the whole frame
    — the importance-resampling recipe of Xie et al. 2023 ("Data Selection
    for Language Models via Importance Resampling"), where raw documents
    are then resampled proportionally to ``exp(logw)`` to match a target
    distribution (a high-quality or in-domain corpus).  Output:
    ``(id_col, n_bigrams, logw)``; documents with <2 tokens get no row.

    Scale shape: bigram instances hash into ``n_buckets`` via the portable
    60-bit md5 (so any engine replays the exact bucket ids), doc-bucket
    counts are ONE keyed agg (map-side combined), and both models are
    aggregates OF THAT FRAME — B-bounded, so the log-ratio table is tiny
    and BROADCASTS onto the per-doc counts regardless of corpus size.  The
    model totals attach to the B-row frame as a 1-row scalar (never to
    data-sized frames).  No UDFs, no driver-side model state: the whole
    fit+score is five keyed aggs and one broadcast join.
    """
    from .textops import _md5_60

    bg = bigram_frame(df, id_col, text_col, tokens_col)
    inst = bg.select(
        "_id",
        F.pmod(
            _md5_60(F.concat_ws(" ", "_w1", "_w2")), F.lit(n_buckets)
        ).alias("_b"),
    )
    dc = inst.groupBy("_id", "_b").agg(F.count(F.lit(1)).alias("_c"))
    raw = dc.groupBy("_b").agg(F.sum("_c").alias("_rc"))
    target_ids = df.where(target_filter).select(F.col(id_col).alias("_tid"))
    tgt = (
        dc.join(target_ids, dc["_id"] == F.col("_tid"), "left_semi")
        .groupBy("_b")
        .agg(F.sum("_c").alias("_tc"))
    )
    model = raw.join(tgt, "_b", "left").select(
        "_b", "_rc", F.coalesce("_tc", F.lit(0)).alias("_tc")
    )
    totals = model.agg(
        F.sum("_rc").alias("_R"), F.sum("_tc").alias("_T")
    )
    # The per-bucket log-ratio is QUANTIZED (floor-scale, 1e-6) at the
    # B-row model table: engines disagree on ln() in the last ulp on ~7%
    # of inputs, so every downstream float op must start from a shared
    # grid value or doc-level sums drift past any rounding convention.
    # Quantizing B values once bounds the cross-engine risk to the model
    # table (~1e-9 per bucket) instead of every document.
    scale = F.lit(1_000_000.0)
    lr = model.crossJoin(F.broadcast(totals)).select(
        "_b",
        (
            F.floor(
                (
                    F.log((F.col("_tc") + 1.0) / (F.col("_T") + F.lit(float(n_buckets))))
                    - F.log((F.col("_rc") + 1.0) / (F.col("_R") + F.lit(float(n_buckets))))
                )
                * scale
                + F.lit(0.5)
            )
            / scale
        ).alias("_lr"),
    )
    # Deterministic per-doc fold: terms sorted by bucket id and summed
    # sequentially (a groupBy float sum is partition-order dependent; the
    # ordered fold is bit-reproducible and DuckDB replays it with
    # list_reduce(list(... ORDER BY b))).  Arrays are ≤ n_buckets long.
    return (
        dc.join(F.broadcast(lr), "_b")
        .groupBy("_id")
        .agg(
            F.sum("_c").alias("n_bigrams"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("_b"), (F.col("_c") * F.col("_lr")).alias("_t"))
                    )
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["_t"],
            ).alias("logw"),
        )
        .select(F.col("_id").alias(id_col), "n_bigrams", "logw")
    )


def _dsir_buckets(df: DataFrame, id_col: str, text_col: str, n_buckets: int,
                  tokens_col: str | None = None) -> DataFrame:
    """Per-document hashed-bigram bucket counts ``(_id, _b, _c)``."""
    from .textops import _md5_60

    bg = bigram_frame(df, id_col, text_col, tokens_col)
    inst = bg.select(
        "_id",
        F.pmod(
            _md5_60(F.concat_ws(" ", "_w1", "_w2")), F.lit(n_buckets)
        ).alias("_b"),
    )
    return inst.groupBy("_id", "_b").agg(F.count(F.lit(1)).alias("_c"))


def dsir_model(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    target_filter,
    n_buckets: int = 1024,
    tokens_col: str | None = None,
) -> DataFrame:
    """Fit the DSIR log-ratio model: ``(_b, _lr)``, B rows.

    The fit half of :func:`dsir_weights`, separated so the deployment
    shape works: fit on a SAMPLE (or a reference corpus), persist the
    B-row frame like any other model artifact, then :func:`dsir_score`
    the full corpus — the fit never has to touch the 100 TB side.  Same
    quantized-ln arithmetic as the fused op.
    """
    dc = _dsir_buckets(df, id_col, text_col, n_buckets, tokens_col)
    raw = dc.groupBy("_b").agg(F.sum("_c").alias("_rc"))
    target_ids = df.where(target_filter).select(F.col(id_col).alias("_tid"))
    tgt = (
        dc.join(target_ids, dc["_id"] == F.col("_tid"), "left_semi")
        .groupBy("_b")
        .agg(F.sum("_c").alias("_tc"))
    )
    model = raw.join(tgt, "_b", "left").select(
        "_b", "_rc", F.coalesce("_tc", F.lit(0)).alias("_tc")
    )
    totals = model.agg(F.sum("_rc").alias("_R"), F.sum("_tc").alias("_T"))
    scale = F.lit(1_000_000.0)
    return model.crossJoin(F.broadcast(totals)).select(
        "_b",
        (
            F.floor(
                (
                    F.log((F.col("_tc") + 1.0) / (F.col("_T") + F.lit(float(n_buckets))))
                    - F.log((F.col("_rc") + 1.0) / (F.col("_R") + F.lit(float(n_buckets))))
                )
                * scale
                + F.lit(0.5)
            )
            / scale
        ).alias("_lr"),
    )


def dsir_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame,
    *,
    n_buckets: int = 1024,
    tokens_col: str | None = None,
    unseen_penalty: float = 0.0,
) -> DataFrame:
    """Score any frame against a fitted :func:`dsir_model`.

    ``(id_col, n_bigrams, logw)`` with the same deterministic bucket-order
    fold as :func:`dsir_weights`; ``n_buckets`` must match the fit.

    The fit-on-sample deployment shape means buckets unseen at fit time
    are the NORM at score time, so the model join is a LEFT join: every
    document keeps its row, ``n_bigrams`` is always the document's true
    bigram count, and each unseen bucket contributes
    ``count * unseen_penalty`` to ``logw`` (default 0.0 — neutral
    evidence; pass a negative value to down-weight out-of-model mass).
    With ``unseen_penalty=0.0``, scoring the fit corpus against its own
    model reproduces :func:`dsir_weights` exactly.
    """
    dc = _dsir_buckets(df, id_col, text_col, n_buckets, tokens_col)
    lr = F.coalesce(F.col("_lr"), F.lit(float(unseen_penalty)))
    return (
        dc.join(F.broadcast(model), "_b", "left")
        .groupBy("_id")
        .agg(
            F.sum("_c").alias("n_bigrams"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("_b"), (F.col("_c") * lr).alias("_t"))
                    )
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["_t"],
            ).alias("logw"),
        )
        .select(F.col("_id").alias(id_col), "n_bigrams", "logw")
    )


def doremi_weights(
    df: DataFrame,
    domain_col: str,
    proxy_loss_col: str,
    ref_loss_col: str,
    *,
    temperature: float = 1.0,
    floor: float = 0.0,
    decimals: int = 6,
) -> DataFrame:
    """Excess-loss domain mixture weights (the DoReMi recipe, Xie et al.
    2023 "Doremi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining" — the weight-computation step, given per-example losses).

    Each domain's signal is its mean CLIPPED excess loss
    ``avg(max(proxy − ref, 0))`` — how much worse the small proxy model
    does than the reference on that domain, the "learnable headroom".
    Weights are the temperature softmax of the excess means, floor-mixed
    with uniform: ``w_d = (1 − floor)·softmax(excess/τ)_d + floor/K`` so
    no domain starves (DoReMi's smoothing).  Returns one row per domain:
    ``(domain_col, n_rows, excess, weight)``; weights sum to 1.

    Null policy: rows with a null domain are excluded (a mixture weight
    must name its domain); rows where either loss is null contribute
    nothing to the mean (``avg`` null-skip) but still count toward
    ``n_rows``.  Domains whose every loss is null get excess 0 (they
    still receive the uniform floor share).

    Cross-engine floats: the excess means are quantized on the
    floor-scale grid BEFORE the softmax (exp diverges in the last ulp
    between engines; starting from a shared grid bounds the drift to the
    K-row table), and the final weights are rounded at ``decimals`` —
    the same two-stage convention as the DSIR log-ratio table.

    Scale shape: ONE keyed aggregation over the data (map-side
    combined) to a K-row domain table; the softmax normalizer attaches
    as a 1-row broadcast scalar.  No windows, no driver-side state.
    """
    from ..sqlgen import portable_round

    if not (0.0 <= floor <= 1.0):
        raise ValueError(f"floor must be in [0, 1], got {floor}")
    if temperature <= 0.0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    # NULL-propagating clip: greatest() SKIPS nulls in both engines, so a
    # bare greatest(diff, 0.0) would silently turn a null-loss row into a
    # zero-excess observation; the when() keeps the row out of the mean
    # (avg null-skip), matching the documented policy
    diff = (
        F.col(proxy_loss_col).cast("double") - F.col(ref_loss_col).cast("double")
    )
    excess = F.when(diff.isNotNull(), F.greatest(diff, F.lit(0.0)))
    dom = (
        df.where(F.col(domain_col).isNotNull())
        .groupBy(domain_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            portable_round(
                F.coalesce(F.avg(excess), F.lit(0.0)), decimals
            ).alias("excess"),
        )
    )
    # max-shifted softmax (the standard overflow guard): exp((e - max)/τ)
    # is mathematically identical and keeps every argument <= 0, so a
    # small temperature or large excess can never push exp() to inf and
    # the weights to NaN.  The max attaches as a second 1-row broadcast
    # over the K-row table (cheap; both scalars are K-row aggregates).
    mx = dom.agg(F.max("excess").alias("_mx"))
    scored = dom.crossJoin(F.broadcast(mx)).withColumn(
        "_e",
        F.exp((F.col("excess") - F.col("_mx")) / F.lit(float(temperature))),
    )
    totals = scored.agg(
        F.sum("_e").alias("_Z"), F.count(F.lit(1)).alias("_K")
    )
    return scored.crossJoin(F.broadcast(totals)).select(
        domain_col,
        "n_rows",
        "excess",
        portable_round(
            F.lit(1.0 - floor) * F.col("_e") / F.col("_Z")
            + F.lit(floor) / F.col("_K"),
            decimals,
        ).alias("weight"),
    )
