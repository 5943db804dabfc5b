"""End-to-end pretraining-data pipeline built from dftly-spark operators.

Shows how the pieces compose into the standard corpus-preparation flow:

    read → quality filter (engine expressions) → exact dedup → near-dedup
    (MinHash-LSH) → exact-substring span removal → benchmark
    decontamination (doc-level drop + span-level scrub) →
    DSIR target-likeness gate → per-source cap → language mix (stratified
    sample) → train/val/test split → sequence packing → partitioned shard
    layout → rollup accounting + learned-BPE token budget

Every stage is a DataFrame transformation — the whole pipeline is ONE lazy
plan per output split, so Catalyst fuses the row-local stages (filters,
split gates) into the scan and the only shuffles are the ones the
algorithms require (dedup's hash groups, MinHash's band join, packing's
shard window).

Run:  python examples/pretraining_pipeline.py [sf_dir] [out_dir]
Test: tests/test_example_pipeline.py runs it end-to-end at sf0.001.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dftly_spark import Parser
from dftly_spark.ops import (
    bpe_encode_counts,
    bpe_learn,
    cap_per_group,
    containment_pairs,
    dsir_weights,
    dedup_lines,
    exact_dedup,
    hash_split,
    dedup_substring_spans,
    decontaminate_substrings,
    minhash_dup_pairs,
    pack_sequences,
    rollup_stats,
    stratified_sample,
    token_budget_sample,
    write_partitioned,
)
from dftly_spark.ops.textops import token_count


def build_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaning plan: filter → dedup → near-dedup → mix → split."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. Quality gate — dftly expressions compiled to native Catalyst
    #    columns; the filter pushes into the parquet scan.
    scored = Parser.with_columns(
        docs,
        {
            "n_tokens": "$n_chars / 6",  # crude chars-per-token prior
            "keep": "($n_chars >= 64) and ($n_chars <= 100000)",
        },
    )
    clean = scored.where(F.col("keep")).drop("keep")

    # 1b. Corpus-level line dedup (the CCNet boilerplate pass): drop every
    #     occurrence of a line repeated across more than 2 documents —
    #     headers, nav bars, license blocks.  The synthetic corpus is
    #     single-line, so here this reduces to capping exact whole-text
    #     frequency; real corpora split on '\n' and the plan is one
    #     map-side-combined line count plus a hot-set-only join back.
    delined = dedup_lines(clean, "doc_id", "text", max_df=2, min_dedup_chars=20)
    clean = (
        clean.drop("text")
        .join(delined.select("doc_id", "text"), "doc_id")
        .where(F.length("text") > 0)
    )

    # 2. Exact dedup: keep one survivor per normalized text.
    survivors = exact_dedup(clean, "text", "doc_id").select("doc_id")
    clean = clean.join(survivors, "doc_id", "left_semi")

    # 3. Near-dedup: MinHash-LSH candidate pairs, verified by exact Jaccard;
    #    drop the higher id of each verified pair.
    pairs = minhash_dup_pairs(clean, "doc_id", "text", n=3, k=32, bands=16,
                              threshold=0.7)
    victims = pairs.select(F.col("id_r").alias("doc_id")).distinct()
    clean = clean.join(victims, "doc_id", "left_anti")

    # 4. Exact-substring dedup (ExactSubstr): cut any verbatim run of
    #    >= 13 tokens occurring twice anywhere in the surviving corpus —
    #    including twice inside ONE doc (whole-doc dedup misses shared
    #    boilerplate; distinct-doc-df span removal misses internal
    #    repetition).
    despanned = dedup_substring_spans(clean, "doc_id", "text", min_len=13)
    clean = (
        clean.drop("text")
        .join(despanned.select("doc_id", F.col("clean_text").alias("text")), "doc_id")
        .where(F.length("text") > 0)
    )

    # 5. Benchmark decontamination: drop any doc containing ≥80% of a
    #    held-out probe's n-grams (probes stand in for eval-set items).
    probes = docs.where(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 9_000_000).alias("doc_id"),
        F.concat_ws(" ", F.slice(F.split("text", r"\s+"), 1, 15)).alias("text"),
    )
    contaminated = containment_pairs(
        probes, clean, "doc_id", "text", n=3, threshold=0.8
    ).select(F.col("doc_id")).distinct()
    clean = clean.join(contaminated, "doc_id", "left_anti")
    #    ... and scrub the survivors span-level: docs below the 80% drop
    #    gate can still carry a verbatim probe run — cut any shared run
    #    of >= 10 tokens instead of dropping the whole doc.
    scrubbed = decontaminate_substrings(clean, probes, "doc_id", "text", min_len=10)
    clean = (
        clean.drop("text")
        .join(scrubbed.select("doc_id", F.col("clean_text").alias("text")), "doc_id")
        .where(F.length("text") > 0)
    )

    # Lineage checkpoint at the dedup/selection boundary: the scoring
    # stages below reference the cleaned frame several times, and
    # re-optimizing (let alone re-executing) the whole dedup plan per
    # reference is both slow and a driver plan-tree blowup.
    clean = clean.localCheckpoint(eager=False)

    # 6. DSIR target-likeness gate: score every survivor against the
    #    English subcorpus as the target distribution and drop the
    #    bottom tail (the importance-resampling selection step; here a
    #    hard floor keeps the example deterministic).
    w = dsir_weights(clean, "doc_id", "text",
                     target_filter=F.col("lang") == "en", n_buckets=512)
    floor_w = w.approxQuantile("logw", [0.05], 0.001)[0]
    # anti-join the DROP list: documents with no weight row (<2 tokens)
    # are NOT dsir-scorable and must pass through, not vanish
    drop_ids = w.where(F.col("logw") < floor_w).select("doc_id")
    clean = clean.join(drop_ids, "doc_id", "left_anti")

    # 7. Per-source cap — no host dominates the token budget.  Document
    # count first (cheap gate on monster hosts), then an exact per-source
    # TOKEN fill: deterministic shuffled order to the budget, crossing doc
    # included (mixtures are specified in tokens, and per-document caps
    # over-represent short docs).
    clean = cap_per_group(clean, "source", k=100_000, order_col="doc_id")
    clean = token_budget_sample(
        clean, "source", 1_000_000, n_tokens_col="n_tokens", seed=13
    ).drop("cum_tokens")

    # 8. Language mix, then deterministic splits — both row-local gates.
    mixed = stratified_sample(
        clean, "lang", {"en": 1.0, "de": 0.8, "fr": 0.8}, "doc_id",
        default_rate=0.5, seed=13,
    )
    return hash_split(mixed, "doc_id", {"train": 0.98, "val": 0.01, "test": 0.01},
                      seed=13)


def pack_and_write(corpus: DataFrame, out_dir: str, context_len: int = 2048) -> None:
    """Pack each split into fixed-length windows and lay out shards."""
    with_len = corpus.withColumn("n_tok", token_count(F.col("text")))
    for split in ("train", "val", "test"):
        part = with_len.where(F.col("split") == split)
        packed = pack_sequences(part, "doc_id", "n_tok",
                                context_len=context_len, shards=16, seed=13)
        # chunk index joins back to the text payload for the loader
        out = packed.join(part.select("doc_id", "lang", "text"), "doc_id")
        write_partitioned(
            out, f"{out_dir}/{split}", partition_by=["shard"],
            sort_within=["chunk_id", "chunk_offset"],
        )


def main(sf_dir: str = "/root/testdata/sf0.001", out_dir: str = "/tmp/corpus") -> None:
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    corpus = build_corpus(spark, sf_dir)
    pack_and_write(corpus, out_dir)
    # Corpus accounting: docs/tokens by (split, lang) with subtotals.
    acct = rollup_stats(
        corpus.withColumn("n_tok", token_count(F.col("text"))),
        ["split", "lang"],
        {"tokens": F.sum("n_tok")},
    )
    acct.orderBy("grouping_id", "split", "lang").show(30, truncate=False)
    # Token budget under a LEARNED tokenizer: fit BPE merges on the train
    # split, then report real token counts (whitespace/char proxies
    # under-count multi-byte scripts and over-count English).
    # read the train split BACK from the written shards: deriving it from
    # the lazy corpus plan would re-run everything past the checkpoint
    # (DSIR scoring, caps, sampling) once per BPE aggregation below
    # (shards hold one row per chunk — dedupe back to documents)
    train = (
        spark.read.parquet(f"{out_dir}/train")
        .select("doc_id", "text")
        .dropDuplicates(["doc_id"])
    )
    merges = bpe_learn(train, "text", n_merges=16)
    bpe_tok = bpe_encode_counts(train, "doc_id", "text", merges)
    bpe_tok.agg(
        F.sum("n_tokens").alias("bpe_tokens"), F.sum("n_words").alias("words")
    ).show()
    stats = (
        spark.read.parquet(f"{out_dir}/train")
        .agg(
            F.countDistinct("doc_id").alias("docs"),
            F.countDistinct("shard", "chunk_id").alias("chunks"),
            F.sum("n_tokens").alias("tokens"),
        )
        .collect()[0]
    )
    print(f"train: {stats.docs} docs → {stats.chunks} chunks, {stats.tokens} tokens")


if __name__ == "__main__":
    main(*sys.argv[1:])
