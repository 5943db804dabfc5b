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
