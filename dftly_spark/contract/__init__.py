"""Driver contract for the spark-graft builder (PySpark target).

Every query here runs THROUGH the dftly-spark engine (``Parser.select`` /
``Parser.expr_to_spark``) — the DuckDB oracles check the engine end-to-end,
not hand-written Spark.  Coverage maps 1:1 onto SURVEY.md §2's 50-node
inventory; query names say which nodes they exercise.

Caller-side operations the expression language deliberately lacks (joins,
aggregation — SURVEY.md §2.3) are done with plain Spark around the engine's
expressions, exactly how the reference is used with Polars.

Package layout (split out of the 8.5k-line ``__spark_entry__.py`` in
round 13; the repo-root file is now a thin re-export shim):

* ``common``  — the ``_DEFS`` registry, ``_q`` registration, shared
  fixtures (``_prep``/``_t``/``_docs_tok``/spec helpers);
* ``qseries`` — the reference-surface q01–q26;
* ``ext1``–``ext8`` — the extension-operator waves in original source
  (= registration) order; each wave module's docstring says which query
  range it holds (``ext8`` is the first post-split wave, added round 13).

IMPORT ORDER below IS the pre-priority registration order — do not
reorder the wave imports.  ``_PRIORITY`` then rotates the driver's
~50-query sampling window (rule in the comment on the list).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import _DEFS, _TOK, _docs_tok, _pq_schema, _prep
from . import qseries as _wave_q  # noqa: F401  (registers q01-q26)
from . import ext1 as _wave_1  # noqa: F401
from . import ext2 as _wave_2  # noqa: F401
from . import ext3 as _wave_3  # noqa: F401
from . import ext4 as _wave_4  # noqa: F401
from . import ext5 as _wave_5  # noqa: F401
from . import ext6 as _wave_6  # noqa: F401
from . import ext7 as _wave_7  # noqa: F401
from . import ext8 as _wave_8  # noqa: F401
from . import ext9 as _wave_9  # noqa: F401
from .ext3 import _x54_corpus
from .ext6 import _agg_spec_query  # re-exported: the x128 fuzz harness

# ---------------------------------------------------------------------------
# Registration order: riskiest-first.
#
# The driver's correctness gate verifies a PREFIX of the registered queries
# (~50 in round 2), so insertion order decides what gets a driver-issued
# correctness row.  Source order above groups queries by topic for
# readability; this list re-orders the registry so that (a) queries added or
# materially changed this round and (b) queries that have never had a
# driver-issued row come first, while the long-stable q01-q24 / x01-x13 /
# x15-x27 block (driver-green in both r01 and r02) fills the tail.
# ---------------------------------------------------------------------------
_PRIORITY = [
    # ROTATION RULE (applies every round): the driver samples only the
    # first ~50 entries of this list, so order = (1) queries ADDED or
    # MATERIALLY CHANGED this round, (2) queries with NO driver-issued
    # CORRECTNESS row yet, (3) the rest of the window back-filled with the
    # LEAST-RECENTLY-sampled green queries as regression canaries.
    # Veterans holding >= 3 consecutive driver-green rows rotate OUT of
    # the window (to the tail) to make room -- adding a query without
    # displacing one leaves it permanently unsampled.
    #
    # -- round-13 changed: x150's oracle gained DISTINCT on the approx
    #    subquery (left_semi parity); x148/x79 now split on the Java
    #    \Q...\E-quoted separator (textops._java_literal_regex); the
    #    centroid scorer auto-resolution no longer counts DataFrame
    #    centroids at plan-build time (x12/x46/x50/x56 consumers); and
    #    the WHOLE registry moved to dftly_spark/contract/ (structural;
    #    registration order verified byte-identical).  x147/x149 and the
    #    r11 cohort (x142-x146) keep their slots until they hold 3 rows.
    #    Round-13 ADDED: x155 mixture-KL drift report, x154
    #    pair-quality metric, x151 RRF fusion, x152 hard-negative
    #    mining, x153 DoReMi weights -- never sampled, very front;
    #    x09/x10/x11/x13/x15 drop from the back-fill to hold the
    #    window at 50 --
    #
    # -- round-14 ADDED: x156 alpha-sampling weights, x157 tokenizer
    #    fertility, x158 vocab coverage / OOV, x159 Spearman rank
    #    correlation, x160 cluster-balanced sampling -- never sampled,
    #    very front.  The r13 cohort (x151-x155, one green row each)
    #    keeps its slots; x04-x08 (3 green rows: r01, r02, r13) rotate
    #    OUT to the tail to hold the window at 50.  x155's oracle gained
    #    the 0-mass CASE guard and x152's LSH leg moved its gates before
    #    the top-k cut (brute path byte-identical) -- both already in
    #    the front block. --
    "x156_alpha_sampling",
    "x157_token_fertility",
    "x158_vocab_coverage",
    "x159_spearman_corr",
    "x160_cluster_balanced",

    "x155_mixture_kl",
    "x154_pair_quality",
    "x151_rrf_fusion",
    "x152_hard_negatives",
    "x153_doremi_weights",

    "x150_ann_recall",
    "x148_line_dedup",
    "x79_line_filter",
    "x12_ivf_topk",
    "x46_semantic_dedup",
    "x50_topic_mix",
    "x56_ivf_kmeans_topk",
    "x147_chrono_locale",
    "x149_bpe_sampled",
    "x142_dup_spans_char",
    "x143_stream_fuzzy_join",
    "x144_dedup_chars",
    "x145_uint64_decimal",
    "x146_token_budget",
    #
    # -- back-fill: the contract split structurally touched every query,
    #    so the 36 LEAST-RECENTLY-sampled entries (last driver row r02)
    #    fill the window as structural canaries: the full reference
    #    q-series plus the wave-1 dedup/ANN/text block --
    "q01_project_arith",
    "q02_power",
    "q03_unary_bool",
    "q04_comparisons",
    "q05_minmax_mean",
    "q06_conditional_coalesce",
    "q07_casts",
    "q08_year_date",
    "q09_duration_units",
    "q10_dt_components",
    "q11_time_components",
    "q12_set_time",
    "q13_ts_diff_totals",
    "q14_add_duration",
    "q16_time_type",
    "q17_regex",
    "q18_substring",
    "q19_interp_len",
    "q20_split",
    "q21_hash",
    "q22_flagship",
    "q23_casts_extended",
    "q24_dynamic_patterns",
    "x01_exact_dedup",
    "x02_ngram_jaccard_pairs",
    "x03_minhash_lsh_pairs",
    #
    # -- tail: multi-round green veterans; sampled again only if the
    #    window widens or they change --
    "x04_simhash_pairs",
    "x05_embedding_neardup",
    "x06_cosine_topk",
    "x07_text_analysis",
    "x08_fingerprint",
    "x09_multimodal_decode",
    "x10_frame_sample",
    "x11_ann_lsh_topk",
    "x13_sessionize",
    "x15_repetition_signals",
    "q15_strptime",
    "x114_bpe_learn",
    "x115_bpe_encode",
    "x138_dup_substring_spans",
    "x139_dedup_substrings",
    "x140_contamination_spans",
    "x141_decontaminate",
    "x129_fuzzy_join",
    "x130_pareto_front",
    "x131_calibration",
    "x137_windowed_calibration",
    "x132_cheapest_supplier",
    "x135_waiting_suppliers",
    "x136_fuzzy_best_match",
    "x128_agg_spec",
    "q30_chrono_midformat",
    "x89_pricing_summary",
    "x118_pca_project",
    "x48_pipeline_yaml",
    "x127_basket_pairs",
    "x80_basket_pmi",
    "x21_bloom_pruned_join",
    "x49_analytics_join",
    "x62_centroid_outliers",
    "x123_weighted_pagerank",
    "x69_pool_embeddings",
    "x76_group_entropy",
    "x77_pivot_events",
    "x82_group_quantiles",
    "x87_mad_outliers",
    "x88_quantization_fidelity",
    "x124_media_dup_pairs",
    "x125_expect_observed",
    "x126_session_window_spans",
    "x122_important_stock",
    "x109_dsir_weights",
    "q28_chrono_residue",
    "q29_sqlgen_arrays",
    "x92_doc_keywords",
    "x96_windowed_quantiles",
    "x97_psi_drift",
    "x98_rolling_features",
    "x99_roc_auc",
    "x100_group_auc",
    "x107_triangle_count",
    "x111_kcore",
    "x112_novelty",
    "x113_source_overlap",
    "x58_rolling_zscore",
    "x64_time_weighted_avg",
    "x67_pagerank",
    "x73_group_trend",
    "x75_corr_matrix",
    "x105_large_orders",
    "x116_cube_stats",
    "x110_interval_join",
    "x104_supplier_diversity",
    "x106_dormant_accounts",
    "x108_resample_ffill",
    "x101_shipping_priority",
    "x102_order_priority",
    "x103_returned_items",
    "x117_join_size_sketch",
    "x119_session_stats",
    "x120_scd2_snapshot",
    "x121_top_supplier",
    "q27_sqlgen_oracle",
    "q26_native_time",
    "q25_iso_week",
    "x93_debounce",
    "x94_expectations",
    "x95_url_canonical_dedup",
    "x86_edit_distance_pairs",
    "x83_windowed_heavy_hitters",
    "x84_windowed_cardinality",
    "x78_melt_lineitem",
    "x91_nearest_join",
    "x90_regional_revenue",
    "x85_ewma",
    "x81_distinct_counts",
    "x74_cms_heavy_hitters",
    "x70_salted_join",
    "x71_winsorize",
    "x72_impute_nulls",
    "x68_ranking_metrics",
    "x57_merge_intervals",
    "x59_scd2_history",
    "x60_weighted_sample",
    "x61_distinctive_terms",
    "x63_ntile_features",
    "x65_key_skew",
    "x66_transition_matrix",
    "x14_corpus_clean_pipeline",
    "x28_chunk_text",
    "x29_scrub_text",
    "x30_dup_clusters",
    "x31_bm25_topk",
    "x32_dup_ngram_spans",
    "x33_cap_per_group",
    "x34_rollup_stats",
    "x35_contamination_containment",
    "x36_incremental_embedding_dedup",
    "x37_remove_dup_spans",
    "x38_tumbling_agg",
    "x53_hopping_agg",
    "x54_sparse_cosine",
    "x55_cohort_retention",
    "x39_lag_features",
    "x40_ks_drift",
    "x41_histogram",
    "x42_funnel",
    "x43_merge_upsert",
    "x44_mixture_sample",
    "x45_bigram_lm",
    "x47_snapshot_diff",
    "x51_gopher_rules",
    "x52_shared_affixes",
    "x16_incremental_dedup",
    "x17_random_projection",
    "x18_audio_chunks",
    "x19_asof_join",
    "x20_range_join",
    "x22_table_profile",
    "x23_json_extract",
    "x24_vocab_topk",
    "x25_split_and_sample",
    "x26_pack_sequences",
    "x27_quantile_stats",
]


def _apply_priority_order() -> None:
    # Fail fast on a stale/typo'd priority name: a silent skip would quietly
    # demote the query out of the driver's ~50-entry sampling window and the
    # rotation rule would operate on a list that no longer matches reality.
    missing = [name for name in _PRIORITY if name not in _DEFS]
    if missing:
        raise RuntimeError(
            f"_PRIORITY names not in the registry: {missing} — "
            "fix the rotation list in contract/__init__.py"
        )
    dupes = {name for name in _PRIORITY if _PRIORITY.count(name) > 1}
    if dupes:
        raise RuntimeError(
            f"_PRIORITY contains duplicates: {sorted(dupes)} — "
            "fix the rotation list in contract/__init__.py"
        )
    ordered: dict[str, tuple[Callable, str | None]] = {}
    for name in _PRIORITY:
        ordered[name] = _DEFS[name]
    for name, val in _DEFS.items():
        if name not in ordered:
            ordered[name] = val
    _DEFS.clear()
    _DEFS.update(ordered)


_apply_priority_order()


def warm_caches(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the session-scoped shared corpus caches for ``sf_dir``.

    The text-op cluster shares four persisted frames (ops/corpus.py): the
    tokenized documents, the n=3 and n=13 shingle-hash instance frames, and
    the per-document term-frequency frames.  In a long-lived session these
    are built once and amortized across every query — the same offline-index
    regime as ``minhash_index`` or a bucketed postings table.  ``bench.py``
    calls this up front and reports the build time separately
    (``cache_warm_sec``), so per-query numbers reflect the steady state
    while the build cost stays visible.
    """
    from dftly_spark.ops import corpus
    from dftly_spark.ops.dedup import _shingle_instance_frames
    from dftly_spark.ops.retrieval import _term_frame

    _prep(spark)
    if not corpus.PERSIST_LEVEL:
        # Lazy-memo mode (the default): the shared frames are plan
        # fragments, not materialized state — running actions here would
        # compute results nobody stores.  Measured at sf0.1/local[32],
        # pinned storage degraded every later query in the session, so
        # materialization is opt-in via SPARK_GRAFT_CACHE_PERSIST.
        return
    docs = _docs_tok(spark, sf_dir)
    key = f"documents:{sf_dir}"
    frames = [docs]
    # Only the wide-window span families cache their shingle frames: the
    # 13- and 20-lead window constructions are expensive enough to
    # amortize (n=13 x32/x37; n=20 x138-x141), while the n=3
    # minhash/jaccard consumers measured FASTER recomputing the fused
    # pipeline than scanning a persisted instance frame at sf0.1.
    for n in (13, 20):
        li, sr = _shingle_instance_frames(
            docs, "doc_id", "text", n, tokens_col=_TOK, cache_key=key
        )
        frames += [li, sr]
    frames.append(_term_frame(docs, "doc_id", "text", _TOK, key))
    frames.append(
        _term_frame(
            _x54_corpus(spark, sf_dir),
            "doc_id",
            "text",
            _TOK,
            f"documents+copies:{sf_dir}",
        )
    )
    for f in frames:
        f.count()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _DEFS["q22_flagship"][0](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator group from SURVEY.md §2."""
    return {name: builder for name, (builder, _) in _DEFS.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (the t2 correctness gate).

    Callable oracles resolve here (lazily), so sf-dependent literals are
    fitted against the gate's actual data dir
    (``SPARK_GRAFT_GATE_SF_DIR``, default sf0.01).
    """
    return {
        name: (sql() if callable(sql) else sql)
        for name, (_, sql) in _DEFS.items()
        if sql is not None
    }
