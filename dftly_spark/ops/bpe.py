"""Distributed BPE merge-rule learning (tokenizer induction).

Training-data pipelines learn a byte-pair-encoding vocabulary from the
corpus before tokenizing it (Sennrich et al. 2016, the GPT-2/LLaMA
tokenizer recipe).  The classic implementation is a single-machine loop
over a word-count dictionary; this is the same algorithm as relational
algebra over a DataFrame of (symbol-sequence, count) rows:

* the word-count table is built ONCE (tokens explode → keyed agg) and is
  corpus-compressed: iteration cost scales with |vocab|, not corpus size;
* each merge round is ONE Spark job: a pair-count aggregation (adjacent
  symbol pairs weighted by word count, map-side combined) topped by a
  deterministic bounded TakeOrdered read (count desc, then lexicographic
  — tokenizer-metadata-sized, the bpe_encode class of driver object),
  followed by a row-local literal rewrite of the sequences whose lazy
  checkpoint materializes inside the NEXT round's job;
* sequences live as separator-joined STRINGS, and the merge rewrite is
  ``replace_passes`` passes of plain ``replace(SEP+a+SEP+b+SEP →
  SEP+ab+SEP)``.  Plain leftmost non-overlapping replace is identical in
  every engine, which is what lets an external engine replay the whole
  fit exactly; P passes equal greedy BPE except on runs of the same
  merged pair longer than 2^P — vanishing at word granularity.

At 100 TB the vocab table is still tiny (≤ millions of distinct words);
the only corpus-sized work is the initial word count.  The merge loop's
1-row rule frames attach via broadcast (the sanctioned scalar-attach
pattern) and the vocab lineage is checkpointed so round N's plan does not
replay rounds 0..N-1.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .scale import durable_checkpoint

from .textops import tokens

SEP = "\x1f"

# serializes the fit loops' session-conf pin/restore (see _bpe_learn_batched)
_FIT_CONF_LOCK = threading.Lock()


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, count) over the normalized whitespace tokens; empty words
    dropped."""
    return (
        df.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(tokens(F.lower(F.col(text_col)))).alias("_w"))
        # the 0x1f unit separator is the sequence delimiter; a word
        # containing it would corrupt its own symbol encoding
        .where((F.col("_w") != "") & ~F.col("_w").contains(SEP))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_c"))
    )


def bpe_learn(
    df: DataFrame,
    text_col: str,
    *,
    n_merges: int = 8,
    replace_passes: int = 3,
    checkpoint_every: int = 2,
    batch: int | str = 1,
    max_batch: int = 1024,
    batch_gap: float = 0.5,
    sample_frac: float | None = None,
    id_col: str | None = None,
    sample_seed: int = 0,
) -> DataFrame:
    """Learn the top ``n_merges`` BPE merge rules from a text column.

    Returns ``(rank, merge_left, merge_right, pair_count)`` — rule ``rank``
    merged the adjacent symbol pair (left, right) that was most frequent
    (weighted by word count; ties broken lexicographically) AFTER applying
    rules ``0..rank-1``.  Symbols start as single characters, so rule
    outputs compose exactly like the reference algorithm.

    **Vocabulary ceiling.**  ``batch=1`` (the default) is EXACT greedy
    BPE at ONE fused Spark job per merge: the round's candidate collect
    (a bounded TakeOrdered read — the pair-count agg and argmax in a
    single job) also materializes the previous round's lazily-
    checkpointed rewrite.  The ~0.5 s/job round floor on a warm local
    session (SCALING.md) still makes a production vocabulary (30k-50k
    merges) hours of driver-sequential latency, which is what batching
    is for.  ``batch=K`` amortizes the floor: per round the top
    candidates are collected (a ≤4K-row merge-table read, the bpe_encode
    class of driver object) and a maximal SYMBOL-DISJOINT prefix of up
    to K pairs is applied simultaneously — disjoint symbols mean no
    selected merge can create or destroy another selected pair's
    occurrences, so all K counts from the shared snapshot are
    individually exact.  The batch ranking can differ from pure
    greedy's (a batch member would not see an earlier member's effect on
    the NEXT round's counts in true greedy), which is the standard
    parallel-BPE approximation; the gate queries pin ``batch=1``.  The
    loop STOPS when the corpus runs out of mergeable pairs instead of
    idling through the remaining budget.

    ``batch="auto"`` sizes each round by the PAIR-COUNT GAP instead of a
    fixed K: the round applies every symbol-disjoint candidate whose
    snapshot count is ≥ ``batch_gap`` × the round's top count (capped at
    ``max_batch``).  The gap is the staleness bound that makes big
    batches safe: any pair a batch merge CREATES has count ≤ its creating
    pair's occurrences ≤ the round top, so nothing applied in-batch was
    more than ``1/batch_gap`` away from what true greedy could have
    preferred at that point.  Early rounds (Zipfian head, steep gaps)
    stay small and near-greedy; tail rounds (flat counts) batch by the
    hundreds — exactly where a production 30k–50k-merge fit spends its
    time — keeping total driver rounds ~O(log) in practice instead of
    ``n_merges / K``.

    **Sample-then-learn (the production recipe).**  Even at
    ``batch="auto"``'s ~0.16 jobs/merge floor, a 32k-merge vocabulary is
    thousands of driver-sequential rounds, each a pass over the word-count
    frame — the one cost that scales with CORPUS size.  Merge rules depend
    only on RELATIVE pair frequencies, which are Zipf-stable under
    document sampling, so the standard recipe is: learn the merge table on
    a deterministic sample, then :func:`bpe_encode_counts` the FULL corpus
    with it (encoding is one distributed pass, corpus-sized work where it
    belongs).  ``sample_frac`` + ``id_col`` applies that sample here —
    the same LCG id-gate as ``ops.sampling.hash_split`` (reproducible
    across reruns, partitionings, and engines; never ``rand()``) — e.g.
    ``sample_frac=0.01`` learns from ~1% of documents.  Choose the
    fraction so the sample still covers the tail pairs you care about
    (≥ ~10⁶ words is the usual rule of thumb).
    """
    if batch != "auto" and not (isinstance(batch, int) and batch >= 1):
        raise ValueError(f'batch must be a positive int or "auto", got {batch!r}')
    if sample_frac is not None:
        if id_col is None:
            raise ValueError(
                "bpe_learn(sample_frac=...) needs id_col: the sample gate is "
                "keyed on a reproducible row id, never rand()"
            )
        if not (0.0 < sample_frac <= 1.0):
            raise ValueError(f"sample_frac must be in (0, 1], got {sample_frac}")
        from .sampling import _M, _mix

        df = df.where(
            _mix(F.col(id_col), sample_seed) < F.lit(int(sample_frac * _M))
        )
    return _bpe_learn_batched(
        df, text_col, n_merges=n_merges, replace_passes=replace_passes,
        batch=batch, max_batch=max_batch, batch_gap=batch_gap,
        checkpoint_every=checkpoint_every,
    )


def _bpe_learn_batched(
    df: DataFrame,
    text_col: str,
    *,
    n_merges: int,
    replace_passes: int,
    batch: int | str,
    max_batch: int = 1024,
    batch_gap: float = 0.5,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Disjoint-batch merge loop (see :func:`bpe_learn` ``batch=``).

    One Spark job per ROUND: the candidate collect (a bounded TakeOrdered
    read — the bpe_encode class of driver object) also materializes the
    previous round's lazily-checkpointed vocab rewrite, and the chosen
    rules rewrite the sequences as inlined literals, so jobs-per-merge is
    ~1 at ``batch=1`` (exact greedy) and ~1/K batched.  ``checkpoint_every``
    spaces the lazy vocab checkpoints; un-checkpointed rounds replay their
    predecessors' ``replace`` chains inside the next job (cheap, row-local)
    instead of costing block-store generations."""
    if batch == "auto" and not (0.0 < batch_gap <= 1.0):
        raise ValueError(f"batch_gap must be in (0, 1], got {batch_gap!r}")
    spark = df.sparkSession
    wc = _word_counts(df, text_col)
    # EAGER first checkpoint: the one corpus-sized job (tokens explode →
    # keyed agg) runs under the session's normal config, AQE included
    vocab = wc.select(
        F.array_join(F.split(F.col("_w"), ""), SEP).alias("_s"), F.col("_c")
    ).transform(durable_checkpoint)
    # the merge rounds are known-tiny single-shuffle queries over the
    # vocab-compressed table; AQE's stage-by-stage execution would double
    # the driver job count per round (its only effect here), so pin it off
    # for the loop and restore after
    # (AQE would coalesce the tiny shuffle itself, but only by paying the
    # extra per-round job; with it off, size the loop's shuffle directly —
    # the pair agg is map-side combined, so the reduce side sees at most
    # the distinct-pair table, MBs even at a production vocabulary)
    #
    # CONTRACT: SQL confs are SESSION-scoped, so the pin is visible to any
    # query PLANNED in this SparkSession while the fit loop runs — run
    # long fits in their own session (spark.newSession()) when sharing a
    # session with concurrent queries/streams.  The process-wide lock
    # below serializes concurrent bpe_learn calls so one fit's restore
    # can never snapshot another fit's pinned values as "previous".
    with _FIT_CONF_LOCK:
        _pins = {"spark.sql.adaptive.enabled": "false",
                 "spark.sql.shuffle.partitions": "4"}
        _prev = {k: spark.conf.get(k, None) for k in _pins}
        for k, v in _pins.items():
            spark.conf.set(k, v)
        try:
            return _bpe_merge_rounds(
                spark, vocab, n_merges=n_merges, replace_passes=replace_passes,
                batch=batch, max_batch=max_batch, batch_gap=batch_gap,
                checkpoint_every=checkpoint_every,
            )
        finally:
            for k, v in _prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


def _bpe_merge_rounds(
    spark,
    vocab: DataFrame,
    *,
    n_merges: int,
    replace_passes: int,
    batch: int | str,
    max_batch: int,
    batch_gap: float,
    checkpoint_every: int,
) -> DataFrame:
    """The driver-round loop of :func:`_bpe_learn_batched` (split out so
    the AQE pin wraps exactly the rounds)."""
    out_rows: list[tuple] = []
    rounds = 0
    while len(out_rows) < n_merges:
        cap = max_batch if batch == "auto" else batch
        k = min(cap, n_merges - len(out_rows))
        sp = F.split(F.col("_s"), SEP)
        pairs = F.arrays_zip(
            F.slice(sp, 1, F.size(sp) - 1).alias("_pa"),
            F.slice(sp, 2, F.size(sp) - 1).alias("_pb"),
        )
        cands = (
            vocab.where(F.size(sp) >= 2)
            .select(F.col("_c"), F.explode(pairs).alias("_p"))
            .groupBy(F.col("_p._pa").alias("_pa"), F.col("_p._pb").alias("_pb"))
            .agg(F.sum("_c").alias("_cnt"))
            .orderBy(F.col("_cnt").desc(), F.col("_pa"), F.col("_pb"))
            .limit(max(4 * k, 16))
            .collect()
        )
        if not cands:
            break  # corpus fully merged — no pairs left anywhere
        # auto mode: this round applies only pairs within batch_gap of the
        # round's top count (the staleness bound) — pairs below the floor
        # wait for the next round's fresh counts
        floor_cnt = cands[0]["_cnt"] * batch_gap if batch == "auto" else None
        chosen: list = []
        used: set[str] = set()
        for r in cands:
            if len(chosen) >= k:
                break
            if floor_cnt is not None and r["_cnt"] < floor_cnt:
                break
            # the NEW symbol participates in the disjointness check too: a
            # later candidate mentioning the just-created string would
            # collide with it under the string encoding
            syms = {r["_pa"], r["_pb"], r["_pa"] + r["_pb"]}
            if used & syms:
                continue
            used |= syms
            chosen.append(r)
        # cands[0] always survives (used is empty on its iteration), so
        # chosen is never empty here
        assert chosen, "disjoint-batch selection must keep the top candidate"
        merged = F.concat(F.lit(SEP), F.col("_s"), F.lit(SEP))
        for r in chosen:
            pat = F.lit(f"{SEP}{r['_pa']}{SEP}{r['_pb']}{SEP}")
            rep = F.lit(f"{SEP}{r['_pa']}{r['_pb']}{SEP}")
            for _ in range(replace_passes):
                merged = F.replace(merged, pat, rep)
        vocab = vocab.select(
            merged.substr(F.lit(2), F.length(merged) - 2).alias("_s"), "_c"
        )
        rounds += 1
        if rounds % max(checkpoint_every, 1) == 0:
            vocab = vocab.transform(durable_checkpoint, eager=False)
        out_rows += [
            (len(out_rows) + i, r["_pa"], r["_pb"], r["_cnt"])
            for i, r in enumerate(chosen)
        ]
    return spark.createDataFrame(
        out_rows,
        "rank int, merge_left string, merge_right string, pair_count bigint",
    )


def bpe_encode_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges,
    *,
    replace_passes: int = 3,
) -> DataFrame:
    """Per-document token counts under a learned BPE vocabulary.

    ``merges`` is the frame :func:`bpe_learn` returns (or a pre-collected
    ``[(rank, left, right), ...]`` list).  Rules are applied in rank order
    to every word; the output is ``(id_col, n_words, n_tokens)`` — the
    real sequence-length/cost metric for packing and budgeting, as opposed
    to the whitespace/regex proxies in ``token_count``.

    The merge table is tokenizer METADATA (n_merges rows — the same class
    as the scalar-quantizer codebook), so it materializes once into a
    LITERAL expression tree: encoding is R×P nested ``replace`` calls,
    fully codegen'd and row-local.  The only shuffle is the final per-doc
    count aggregation.
    """
    if isinstance(merges, DataFrame):
        rows = merges.select("rank", "merge_left", "merge_right").collect()
        rules = [(r["rank"], r["merge_left"], r["merge_right"]) for r in rows]
    else:
        # accept bare (rank, left, right) tuples AND the 4-field rows a
        # caller gets from bpe_learn(...).collect()
        rules = [(t[0], t[1], t[2]) for t in merges]
    rules.sort(key=lambda t: t[0])
    words = (
        df.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("_w"),
        )
        .where((F.col("_w") != "") & ~F.col("_w").contains(SEP))
    )
    enc = F.concat(
        F.lit(SEP), F.array_join(F.split(F.col("_w"), ""), SEP), F.lit(SEP)
    )
    for _, pa, pb in rules:
        pat = F.lit(f"{SEP}{pa}{SEP}{pb}{SEP}")
        rep = F.lit(f"{SEP}{pa}{pb}{SEP}")
        for _ in range(replace_passes):
            enc = F.replace(enc, pat, rep)
    # tokens in a word = separators - 1 on the wrapped form
    n_tok = F.length(enc) - F.length(F.replace(enc, F.lit(SEP), F.lit(""))) - 1
    return (
        words.select("_id", n_tok.alias("_n"))
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_n").alias("n_tokens"),
        )
        .select(F.col("_id").alias(id_col), "n_words", "n_tokens")
    )
