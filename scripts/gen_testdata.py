#!/usr/bin/env python
"""Deterministic sf1.0 testdata: a 10x FK-consistent scale-up of sf0.1.

The driver ships sf0.001/0.01/0.1; the growth probes stop at 4x of sf0.1.
This generator builds the next regime (sf1.0 ~= 6M lineitem rows, 10x the
bench SF) so the full oracle gate and bench can be certified where AQE
broadcast decisions, shuffle spill, and the heavy graph/text ops change
behavior.  Pure deterministic transforms of the read-only driver data —
no RNG, so re-running reproduces byte-identical values.

Replica conventions (scripts/scale_probe.py, extended to FK integrity):

- ``region``/``nation`` are fixed dimensions — copied once (a 10x corpus
  does not grow the country list).
- Fact/dim keys get per-replica strides well above the sf0.1 max key, and
  every foreign key is offset by the SAME stride as its dimension, so
  joins land exactly as in the original: each replica is a disjoint,
  internally-consistent shard of the same distribution.
- ``documents`` text gets a per-replica token suffix (disjoint vocab):
  per-term df is UNCHANGED while the corpus grows 10x — inverted indexes
  and shingle joins grow linearly, and no cross-replica exact/near dups
  are fabricated (10 verbatim copies of every doc would turn the dedup
  pair sets quadratic, which a real 10x corpus does not do).  n_chars is
  recomputed to stay equal to len(text).
- ``embeddings`` replicas are dimension-rotated (orthogonal transform:
  replica i rotates the 64-dim vector by i positions), reproducing the
  original pairwise-cosine structure per replica without cross-replica
  near-dups.
- ``events`` replicas get disjoint user spaces: key count grows, per-key
  history does not — how a larger event stream actually behaves.

Single-file parquet per table (DuckDB views read '<dir>/<t>.parquet'
directly).  Output dir defaults to /root/repo/localdata/sf1.0 (gitignored).

Usage: python scripts/gen_testdata.py [factor] [out_dir]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# strides: far above each key's sf0.1 max, multiplied by replica index.
STRIDE = {
    "c_custkey": 10_000_000,
    "s_suppkey": 10_000_000,
    "p_partkey": 10_000_000,
    "o_orderkey": 100_000_000,
    "o_custkey": 10_000_000,
    "l_orderkey": 100_000_000,
    "l_partkey": 10_000_000,
    "l_suppkey": 10_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    # doc_id/vec_id stride 100M: several contract queries PLANT copies at
    # +1M / +10M of existing ids (x124, x54, x05/x36) — replica ids must
    # stay clear of every planted id, i.e. (replica stride) cannot divide
    # or collide with (corpus id + plant offset).  100M > 9 * plant-max
    # keeps all plants in open space at factor 10.
    "doc_id": 100_000_000,
    "vec_id": 100_000_000,
}


def _offset(tbl: pa.Table, i: int, cols: list[str]) -> pa.Table:
    for c in cols:
        idx = tbl.schema.get_field_index(c)
        shifted = pc.add(tbl.column(c), pa.scalar(STRIDE[c] * i, type=pa.int64()))
        tbl = tbl.set_column(idx, c, shifted.cast(tbl.schema.field(c).type))
    return tbl


def _replicate(tbl: pa.Table, factor: int, cols: list[str]) -> pa.Table:
    return pa.concat_tables([_offset(tbl, i, cols) for i in range(factor)])


def _documents(tbl: pa.Table, factor: int) -> pa.Table:
    import pandas as pd

    df = tbl.to_pandas()
    out = [df]
    for i in range(1, factor):
        rep = df.copy()
        rep["doc_id"] = rep["doc_id"] + STRIDE["doc_id"] * i
        # per-replica token suffix: disjoint vocab, per-term df unchanged
        rep["text"] = rep["text"].str.replace(r"(\S+)", rf"\1c{i}", regex=True)
        rep["n_chars"] = rep["text"].str.len().astype("int64")
        out.append(rep)
    return pa.Table.from_pandas(pd.concat(out, ignore_index=True), schema=tbl.schema)


def _embeddings(tbl: pa.Table, factor: int) -> pa.Table:
    import numpy as np
    import pandas as pd

    df = tbl.to_pandas()
    mat = np.stack(df["embedding"].to_numpy())
    out = [df]
    for i in range(1, factor):
        rep = df.copy()
        rep["vec_id"] = rep["vec_id"] + STRIDE["vec_id"] * i
        rot = np.concatenate([mat[:, i:], mat[:, :i]], axis=1)
        rep["embedding"] = list(rot)
        out.append(rep)
    return pa.Table.from_pandas(pd.concat(out, ignore_index=True), schema=tbl.schema)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/localdata/sf1.0"
    os.makedirs(out_dir, exist_ok=True)
    plans: dict[str, list[str] | None] = {
        "region": None,
        "nation": None,
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
    }
    for name, cols in plans.items():
        tbl = pq.read_table(f"{SRC}/{name}.parquet")
        big = tbl if cols is None else _replicate(tbl, factor, cols)
        pq.write_table(big, f"{out_dir}/{name}.parquet")
        print(f"{name}: {tbl.num_rows} -> {big.num_rows}")
    for name, fn in (("documents", _documents), ("embeddings", _embeddings)):
        tbl = pq.read_table(f"{SRC}/{name}.parquet")
        big = fn(tbl, factor)
        pq.write_table(big, f"{out_dir}/{name}.parquet")
        print(f"{name}: {tbl.num_rows} -> {big.num_rows}")


if __name__ == "__main__":
    main()
