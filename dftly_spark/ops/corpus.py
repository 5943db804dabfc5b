"""Session-scoped tokenized-corpus cache shared by the text-op family.

Eight operators (n-gram Jaccard, BM25, dup-span mining, contamination,
bigram LM, affix stats, sparse cosine, the corpus-clean pipeline) all start
from the same primitive: the per-document lowercase whitespace token array.
Built independently, each query re-reads the text column and re-runs the
regex split — the dominant constant factor of the text cluster at any scale.

:func:`tokenized_docs` builds that token array ONCE per (session, corpus
key) and persists it (``MEMORY_AND_DISK``), so every op that accepts a
``tokens_col=`` reuses the cached arrays instead of re-tokenizing.  This is
the session-scoped analog of the ``minhash_index`` pattern
(``dedup.py``): at 100 TB you would write the tokenized/postings frame to a
term- or id-bucketed table once and point every downstream job at it; on a
shared SparkSession ``persist`` is the same trade expressed in cluster
memory.  The cache holds the slim ``(ids…, tokens)`` projection, not the
raw text.

The token definition (``tokens(lower(text))``) is byte-identical to the
``tokens(normalize_text(text))`` form retrieval/lm use — both split on
``\\s+`` after lowercasing, so whitespace collapsing is a no-op for the
split — which is what makes one cache serve both families (pinned by
``tests/test_ops.py::test_token_canons_agree``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import doc_tokens, tokens

__all__ = ["TOKENS_COL", "tokenized_docs", "clear_token_cache", "doc_tokens"]

import os

#: Storage level NAME for the session caches ("MEMORY_AND_DISK", ...), or
#: None to memoize the LAZY frame only (plan sharing without
#: materialization — consumers fuse it into their own codegen pipelines).
#: Default None: measured at sf0.1/local[32], pinned storage blocks
#: degraded every later query in the session (InMemoryScan beats the fused
#: pipeline only in isolation), while lazy sharing kept the wins.  On a
#: real cluster with repeated queries over one corpus, set
#: SPARK_GRAFT_CACHE_PERSIST=MEMORY_AND_DISK — or better, write the
#: tokenized/postings frame to a bucketed table once (ops/scale.py) and
#: read that.
PERSIST_LEVEL: str | None = os.environ.get("SPARK_GRAFT_CACHE_PERSIST") or None


def _maybe_persist(df: DataFrame) -> DataFrame:
    if PERSIST_LEVEL:
        from pyspark import StorageLevel

        return df.persist(getattr(StorageLevel, PERSIST_LEVEL))
    return df

#: Conventional name for the precomputed token-array column.
TOKENS_COL = "__tokens"

_CACHE: dict[tuple[int, str], DataFrame] = {}


def tokenized_docs(
    docs: DataFrame,
    cache_key: str | None = None,
    *,
    text_col: str = "text",
    tokens_col: str = TOKENS_COL,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """``docs`` plus a ``tokens_col`` array<string> column, optionally cached.

    With ``cache_key`` (e.g. the corpus path), the tokenized frame is
    persisted and memoized per SparkSession, so repeated calls — different
    queries over the same corpus in one session — hit the cache instead of
    re-tokenizing.  ``keep_cols`` narrows the cached projection (default:
    every column, so any downstream op finds what it needs).
    """
    if cache_key is not None:
        key = (id(docs.sparkSession), cache_key)
        hit = _CACHE.get(key)
        if hit is not None:
            return hit
    out = docs.withColumn(tokens_col, tokens(F.lower(F.col(text_col))))
    if keep_cols is not None:
        out = out.select(*keep_cols, tokens_col)
    if cache_key is not None:
        out = _maybe_persist(out)
        _CACHE[key] = out
    return out


def memo_persist(spark, key: str, make):
    """Generic per-session memo+persist for shared derived frames.

    The text-op cluster's real shared cost is not the raw token arrays but
    the frames derived from them — shingle-hash instances (n-gram dedup
    family) and the term-frequency frame (retrieval family).  ``make`` is
    called once per (session, key); the result is persisted and returned on
    every later call.  Same 100 TB story as :func:`tokenized_docs`: these
    are exactly the frames you would write to a bucketed table once.
    """
    k = (id(spark), f"frame:{key}")
    hit = _CACHE.get(k)
    if hit is None:
        hit = _maybe_persist(make())
        _CACHE[k] = hit
    return hit


def clear_token_cache(spark=None) -> None:
    """Unpersist and drop cached token frames (all sessions, or one)."""
    for key in list(_CACHE):
        if spark is None or key[0] == id(spark):
            try:
                _CACHE[key].unpersist()
            except Exception:
                pass
            del _CACHE[key]
