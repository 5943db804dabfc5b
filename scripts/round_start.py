#!/usr/bin/env python
"""Round-start ritual: verify the regenerated testdata before writing code.

The driver regenerates ``/root/testdata`` every round and has already
flipped dtypes once (events.ts TIMESTAMP(NANOS) → MICROS, round 2).  This
script is the first command of a round:

1. dump every table's schema at every sf (so a diff against the committed
   snapshot in ``gate_logs/`` shows any drift immediately), and
2. run the FULL driver-faithful correctness gate at sf0.01.

Exit code 0 = all green; anything else = fix the environment delta before
building.  Usage::

    python scripts/round_start.py [round_tag] [--deep]   # --deep adds the sf0.1 gate
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SFS = ["0.001", "0.01", "0.1"]


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "round"
    out_dir = Path("gate_logs")
    out_dir.mkdir(exist_ok=True)

    schema_lines = []
    for sf in SFS:
        for t in TABLES:
            path = f"/root/testdata/sf{sf}/{t}.parquet"
            try:
                rows = duckdb.sql(f"DESCRIBE SELECT * FROM '{path}'").fetchall()
                n = duckdb.sql(f"SELECT count(*) FROM '{path}'").fetchone()[0]
            except Exception as ex:  # table missing/unreadable IS the finding
                schema_lines.append(f"sf{sf}/{t}: ERROR {ex}")
                continue
            cols = ", ".join(f"{r[0]}:{r[1]}" for r in rows)
            schema_lines.append(f"sf{sf}/{t} rows={n}: {cols}")
    schema_path = out_dir / f"{tag}_schemas.txt"
    schema_path.write_text("\n".join(schema_lines) + "\n")
    print(f"wrote {schema_path} ({len(schema_lines)} lines)")

    prev = sorted(out_dir.glob("*_schemas.txt"))
    if len(prev) > 1:
        import difflib

        old, new = prev[-2].read_text(), schema_path.read_text()
        diff = list(difflib.unified_diff(old.splitlines(), new.splitlines(), lineterm=""))
        if diff:
            print(f"SCHEMA DRIFT vs {prev[-2].name}:")
            print("\n".join(diff[:40]))
        else:
            print(f"schemas identical to {prev[-2].name}")

    gate_log = out_dir / f"{tag}_start_gate.log"
    with gate_log.open("w") as fh:
        rc = subprocess.call(
            [sys.executable, "scripts/driver_gate.py"], stdout=fh, stderr=subprocess.STDOUT
        )
    tail = gate_log.read_text().strip().splitlines()[-1:]
    print(f"gate: {tail[0] if tail else '(no output)'} -> {gate_log}")

    if "--deep" in sys.argv and rc == 0:
        # sf0.1 pass too: the 10x run is what catches round()/big-sum
        # float knife-edges invisible at sf0.01 (see round-3 x85/x89/x90)
        import os

        deep_log = out_dir / f"{tag}_start_gate_sf0.1.log"
        env = dict(os.environ, SPARK_GRAFT_GATE_SF_DIR="/root/testdata/sf0.1")
        with deep_log.open("w") as fh:
            rc = subprocess.call(
                [sys.executable, "scripts/driver_gate.py"],
                stdout=fh, stderr=subprocess.STDOUT, env=env,
            )
        tail = deep_log.read_text().strip().splitlines()[-1:]
        print(f"deep gate (sf0.1): {tail[0] if tail else '(no output)'} -> {deep_log}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
