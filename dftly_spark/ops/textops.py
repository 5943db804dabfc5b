"""Text-analysis scalar operators (language-ID, quality, tokens, fingerprint).

All pure ``pyspark.sql.functions`` expressions — JVM-side, codegen-friendly,
no UDFs — so they run at full scan speed over a 100 TB documents table.
Each has an exact SQL mirror used by the DuckDB oracles (the *heuristics* are
the contract; they are deliberately simple, deterministic formulas).
"""

from __future__ import annotations

from pyspark.sql import Column as SparkColumn
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword language heuristic.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
    "de": ("der", "die", "und", "das", "ist", "ein", "zu", "den", "mit", "nicht"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "du", "est", "pour"),
}

#: BPE-ish token pattern: letter runs, digit runs, or single non-space symbols.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def normalize_text(col: SparkColumn) -> SparkColumn:
    """Lowercase + collapse whitespace + trim (canonical form for dedup)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: SparkColumn) -> SparkColumn:
    """Whitespace tokens (array<string>); empty/blank text → empty array."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: SparkColumn) -> SparkColumn:
    """Whitespace token count (bigint)."""
    return F.size(tokens(col)).cast("bigint")


def bpe_token_count(col: SparkColumn) -> SparkColumn:
    """Sub-word-ish token count via the BPE-ish regex (bigint)."""
    return F.regexp_count(col, F.lit(BPE_PATTERN)).cast("bigint")


def stopword_ratio(col: SparkColumn, lang: str = "en") -> SparkColumn:
    """Fraction of whitespace tokens that are stopwords of ``lang``."""
    toks = tokens(F.lower(col))
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def punct_ratio(col: SparkColumn) -> SparkColumn:
    """Fraction of characters that are neither word characters nor spaces."""
    n = F.length(col)
    punct = F.regexp_count(col, F.lit(r"[^A-Za-z0-9_\s]")).cast("double")
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def quality_score(col: SparkColumn) -> SparkColumn:
    """Heuristic document quality in [0, 1].

    Deterministic linear blend (the exact formula is the contract, mirrored
    in the oracle SQL):

    * length credit  — ``least(len, 400)/400 * 0.4``
    * stopword credit — ``least(stopword_ratio*5, 1) * 0.3``
    * punctuation penalty — ``(1 - least(punct_ratio*4, 1)) * 0.3``
    """
    length_credit = F.least(F.length(col).cast("double"), F.lit(400.0)) / 400.0 * 0.4
    sw_credit = F.least(stopword_ratio(col) * 5.0, F.lit(1.0)) * 0.3
    punct_credit = (F.lit(1.0) - F.least(punct_ratio(col) * 4.0, F.lit(1.0))) * 0.3
    return length_credit + sw_credit + punct_credit


def language_id(col: SparkColumn) -> SparkColumn:
    """Stopword/character-class language heuristic.

    CJK characters dominate → ``zh``; otherwise the stopword list with the
    highest hit ratio wins (ties broken in en > es > de > fr order); no hits
    at all → ``und``.
    """
    n = F.length(col)
    cjk = F.regexp_count(col, F.lit(r"[一-鿿]")).cast("double")
    scores = {lang: stopword_ratio(col, lang) for lang in STOPWORDS}
    best = F.greatest(*scores.values())
    out = F.when((n > 0) & (cjk / n > 0.2), F.lit("zh"))
    out = out.when(best <= 0.0, F.lit("und"))
    for lang in ("en", "es", "de", "fr"):  # deterministic tie-break order
        out = out.when(scores[lang] == best, F.lit(lang))
    return out.otherwise(F.lit("und"))


def doc_fingerprint(col: SparkColumn, n: int = 3, k: int = 8) -> SparkColumn:
    """Winnowing-style document fingerprint: the ``k`` smallest hashes of the
    document's word ``n``-gram shingles (array<bigint>, sorted ascending).

    Rolling-hash flavored: each shingle is hashed with ``xxhash64`` and the
    minimum-k set is order-invariant and stable under small edits — two
    documents sharing most shingles share most fingerprint slots.  Hash
    values are engine-specific (like the ``hash`` node), so oracles compare
    cardinalities, not values.
    """
    from .dedup import word_shingles

    sh = word_shingles(col, n)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    return F.slice(F.array_sort(hashes), 1, k)
