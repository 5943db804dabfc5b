"""Fuzzy entity-resolution join: exact set-similarity join across two tables.

The missing shape between the one-corpus pair generators (minhash / simhash /
ngram_jaccard — self-join style) and the probabilistic cross-corpus ops
(``cross_corpus_dup_pairs``): join TWO arbitrary tables on a string column by
token-set Jaccard with an EXACT threshold guarantee — every qualifying pair
is returned (recall 1 by construction, not by LSH luck), the classic
entity-resolution / record-linkage primitive.

The scale path is **prefix filtering** (the AllPairs / PPJoin family —
Bayardo et al. WWW'07, Xiao et al. WWW'08, Vernica et al. SIGMOD'10 for the
MapReduce formulation; all public):

* For Jaccard ``J(A,B) >= t``, the overlap obeys ``|A ∩ B| >= ceil(t·|A|)``
  (and symmetrically for B): ``i >= t(a+b-i)`` gives ``i >= t·a`` since
  ``b >= i``.
* Under ANY global total order on tokens, if ``|A ∩ B| >= α`` then the first
  ``|A|-α+1`` tokens of A and the first ``|B|-α+1`` tokens of B must share
  an element (pigeonhole).  So indexing only each set's PREFIX — a
  ``(1-t)`` fraction of its tokens — finds every qualifying pair.
* Candidates from the prefix equi-join are verified with the exact Jaccard
  on the full token arrays, so hash collisions or over-long prefixes only
  cost work, never correctness.

100 TB design:

* The global token order here is **xxhash64 order** — needs no corpus
  statistics and decorrelates from token frequency, so stop-word-ish tokens
  don't systematically land in every prefix (lexicographic order would put
  the same hot tokens first for every row).  The classical refinement —
  ascending document-frequency order, which provably minimizes candidate
  count — needs one extra token-count aggregate + join per side; worth it
  when corpus stats are already materialized, not by default.
* The prefix join keys are the 8-byte token hashes, not the token strings:
  a hash collision can only ADD a candidate (verification is exact), and
  8-byte shuffle keys beat variable-length shingle strings.
* Everything is native Catalyst: ``sort_array`` over (hash, token) structs,
  ``slice`` for the prefix, one equi-join, one distinct, verification via
  ``array_intersect`` — no Python on data, no cartesian product.
* ``best_match`` resolves each left entity to its single best right match
  with a keyed window (jaccard desc, id asc tie-break) — one extra shuffle
  on ``id_l``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import word_shingles

__all__ = ["fuzzy_join"]


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    id_col_l: str,
    text_col_l: str,
    id_col_r: str | None = None,
    text_col_r: str | None = None,
    *,
    n: int = 3,
    threshold: float = 0.5,
    best_match: bool = False,
) -> DataFrame:
    """All (or best) cross-table pairs with token-set Jaccard >= threshold.

    Tokens are distinct lowercased word ``n``-grams (``n=1`` → plain words,
    the entity-name case; ``n=3`` → document near-dup case).  Returns
    ``(id_l, id_r, jaccard)`` — every pair meeting the threshold (exact
    recall via prefix filtering), or with ``best_match=True`` only each
    left row's best match (highest jaccard, lowest ``id_r`` tie-break).

    ``threshold`` must be in (0, 1]: at 0 the result is the cross product
    (prefix filtering degenerates to indexing every token).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    id_col_r = id_col_r if id_col_r is not None else id_col_l
    text_col_r = text_col_r if text_col_r is not None else text_col_l

    lt = _tokenized(left, id_col_l, text_col_l, "id_l", n)
    rt = _tokenized(right, id_col_r, text_col_r, "id_r", n)

    cand = (
        _prefix_hashes(lt, "id_l", threshold)
        .join(_prefix_hashes(rt, "id_r", threshold), "_h")
        .select("id_l", "id_r")
        .distinct()
    )

    inter = F.size(F.array_intersect(F.col("_gl"), F.col("_gr")))
    union = F.size("_gl") + F.size("_gr") - inter
    # integer-derived division: both engines compute the identical double
    out = (
        cand.join(lt, "id_l")
        .join(rt, "id_r")
        .withColumn("jaccard", inter.cast("double") / union)
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("id_l", "id_r", "jaccard")
    )
    if best_match:
        w = Window.partitionBy("id_l").orderBy(F.desc("jaccard"), F.asc("id_r"))
        out = out.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") == 1).drop("_rk")
    return out


def _tokenized(df: DataFrame, id_col: str, text_col: str, out_id: str, n: int) -> DataFrame:
    """(out_id, _g<side>) with the distinct-shingle array, empty sets dropped."""
    side = out_id[-1]  # 'l' / 'r'
    return (
        df.select(
            F.col(id_col).alias(out_id),
            word_shingles(F.col(text_col), n).alias(f"_g{side}"),
        )
        .where(F.size(f"_g{side}") > 0)
    )


def _prefix_hashes(toks: DataFrame, id_out: str, threshold: float) -> DataFrame:
    """Explode each row's prefix under xxhash64 order to (id, _h) keys.

    Prefix length ``p = s - ceil(t·s) + 1``; the tiny epsilon inside the
    ceil guards the float product at exact-integer boundaries (a too-SMALL
    ceil only lengthens the prefix — safe; a float-noise too-large ceil
    would shorten it and could drop a qualifying pair).
    """
    g_col = [c for c in toks.columns if c != id_out][0]
    hs = F.sort_array(
        F.transform(
            F.col(g_col),
            lambda t: F.struct(F.xxhash64(t).alias("h"), t.alias("g")),
        )
    )
    s = F.size(g_col)
    p = s - F.ceil(F.lit(threshold) * s - F.lit(1e-9)).cast("int") + 1
    return toks.select(
        F.col(id_out),
        F.explode(F.transform(F.slice(hs, F.lit(1), p), lambda x: x["h"])).alias("_h"),
    )
