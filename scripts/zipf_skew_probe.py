#!/usr/bin/env python
"""Zipf-token growth probe for fuzzy_join (r12 verdict item 4).

The boilerplate probe (skew_probe.py) plants ONE shared header; real ER
corpora have a Zipf token distribution — many moderately-hot tokens
("inc", "ltd", city names) instead of one degenerate key.  This probe
synthesizes such a corpus and measures, at 1x/4x/8x growth:

* CANDIDATE volume under token_order="hash" vs "df" — the df order keeps
  hot tokens out of prefixes, which is the lever that bounds candidate
  GROWTH; the max_prefix_df salt reroute changes the shuffle LAYOUT of
  whatever candidates remain (no single-reducer key fan-out), not their
  count;
* end-to-end wall time for plain / capped / capped+df configurations;
* pair-set equality across all configurations (the losslessness contract).

Corpus model: B = 400*g base entities, each with three entity-unique
tokens plus two hot tokens drawn from a 50-token Zipf(1.07) vocabulary;
each side holds 1-2 variants per entity (token dropped or noise added).
True matches are linear in g; any super-linear candidate growth comes
from hot-token collisions — exactly the production failure mode.

Usage: python scripts/zipf_skew_probe.py [growth ...]   (default: 1 4 8)
"""

from __future__ import annotations

import sys
import time

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

GROWTHS = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
BASE_ENTITIES = 400
HOT_VOCAB = 50
ZIPF_S = 1.07
THRESHOLD = 0.5


def make_corpus(g: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    n_ent = BASE_ENTITIES * g
    p = 1.0 / np.arange(1, HOT_VOCAB + 1) ** ZIPF_S
    p /= p.sum()
    left, right = [], []
    for e in range(n_ent):
        uniq = [f"e{e}a", f"e{e}b", f"e{e}c"]
        hot = [f"h{h:02d}" for h in rng.choice(HOT_VOCAB, size=2, p=p)]
        base = uniq + hot
        for side, rows in (("l", left), ("r", right)):
            for v in range(1 + int(rng.rand() < 0.5)):
                toks = list(base)
                r = rng.rand()
                if r < 0.3 and len(toks) > 3:
                    toks.pop(rng.randint(len(toks)))  # variant: token dropped
                elif r < 0.6:
                    toks.append(f"h{rng.choice(HOT_VOCAB, p=p):02d}")  # noise
                rng.shuffle(toks)
                rows.append((e * 10 + v, " ".join(toks)))
    return left, right


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("zipf-skew-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from dftly_spark.ops import fuzzy_join
    from dftly_spark.ops.entity import _prefix_cand, _prefix_rows, _shingle_rows

    def cand_count(left, right, order):
        sh_l = _shingle_rows(left, "doc_id", "text", "id_l", 1)
        sh_r = _shingle_rows(right, "doc_id", "text", "id_r", 1)
        if order == "df":
            dfc = (
                sh_l.select("_g").unionByName(sh_r.select("_g"))
                .groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
            )
            pl = _prefix_rows(sh_l.join(dfc, "_g"), "id_l", THRESHOLD, order=("_df", "_g"))
            pr = _prefix_rows(sh_r.join(dfc, "_g"), "id_r", THRESHOLD, order=("_df", "_g"))
        else:
            pl = _prefix_rows(sh_l, "id_l", THRESHOLD)
            pr = _prefix_rows(sh_r, "id_r", THRESHOLD)
        return _prefix_cand(pl, pr, THRESHOLD).count()

    history: dict[int, dict] = {}
    for g in GROWTHS:
        lrows, rrows = make_corpus(g)
        left = spark.createDataFrame(lrows, "doc_id long, text string").localCheckpoint()
        right = spark.createDataFrame(rrows, "doc_id long, text string").localCheckpoint()
        nl, nr = left.count(), right.count()
        stats: dict = {"left": nl, "right": nr}

        for order in ("hash", "df"):
            stats[f"cand_{order}"] = cand_count(left, right, order)

        pair_sets = {}
        for label, kwargs in [
            ("plain", {}),
            ("capped", {"max_prefix_df": 500}),
            ("capped+df", {"max_prefix_df": 500, "token_order": "df"}),
        ]:
            t0 = time.perf_counter()
            out = fuzzy_join(
                left, right, "doc_id", "text", n=1, threshold=THRESHOLD, **kwargs
            )
            pairs = {(r["id_l"], r["id_r"]) for r in out.collect()}
            stats[f"wall_{label}"] = round(time.perf_counter() - t0, 2)
            pair_sets[label] = pairs
        assert pair_sets["capped"] == pair_sets["plain"], "cap changed pairs!"
        assert pair_sets["capped+df"] == pair_sets["plain"], "cap+df changed pairs!"
        stats["pairs"] = len(pair_sets["plain"])
        history[g] = stats
        print(f"g={g}: {stats}", flush=True)

    print("\ngrowth ratios (vs g=1):")
    base = history[GROWTHS[0]]
    for g in GROWTHS[1:]:
        s = history[g]
        print(
            f"  g={g}: cand_hash x{s['cand_hash']/base['cand_hash']:.1f}, "
            f"cand_df x{s['cand_df']/base['cand_df']:.1f}, "
            f"pairs x{s['pairs']/base['pairs']:.1f}, "
            f"wall capped+df x{s['wall_capped+df']/base['wall_capped+df']:.1f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
