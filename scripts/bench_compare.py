#!/usr/bin/env python
"""Round-over-round bench regression check.

Compares a fresh ``bench.py`` JSON line (stdin or file) against a recorded
baseline (default: the NEWEST ``BENCH_r*.json`` in the working directory,
i.e. the previous round); any query slower than ``RATIO``× its baseline
time is flagged RED and fails the run (the round-3 verdict's tripwire —
x12/x09/x49 drifted +30% unnoticed because nothing was watching
round-over-round).  Suite-total improvements don't excuse per-query
regressions.  Queries new since the baseline are listed informationally.

Usage:
    python bench.py | python scripts/bench_compare.py
    python scripts/bench_compare.py fresh.json [baseline.json] [ratio]
"""

from __future__ import annotations

import glob
import json
import sys

RATIO = 1.5
#: Ignore regressions below this absolute time — sub-second queries are
#: dominated by fixed job-submission overhead, not plan quality.
MIN_SECONDS = 1.0


def load(path_or_stream) -> dict:
    text = (
        sys.stdin.read()
        if path_or_stream == "-"
        else open(path_or_stream).read()
    )
    # Accept a whole-file JSON document (BENCH_r*.json wraps the metrics
    # under "parsed") or bench.py terminal output ending in one JSON line.
    try:
        obj = json.loads(text)
        return obj.get("parsed", obj)
    except json.JSONDecodeError:
        pass
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            return obj.get("parsed", obj)
    raise SystemExit(f"no JSON found in {path_or_stream}")


def latest_round_baseline() -> str:
    # Prefer the builder's own full bench snapshots (gate_logs/*_bench_
    # snapshot.json): the driver's BENCH_r*.json truncates the JSON line
    # into "tail" and may carry parsed=null, which has no per-query data.
    snaps = sorted(glob.glob("gate_logs/*bench_snapshot*.json"))
    if snaps:
        return snaps[-1]
    rounds = sorted(glob.glob("BENCH_r*.json"))
    if not rounds:
        raise SystemExit("no bench baseline found; pass one explicitly")
    return rounds[-1]


def main() -> int:
    fresh_src = sys.argv[1] if len(sys.argv) > 1 else "-"
    base_src = sys.argv[2] if len(sys.argv) > 2 else latest_round_baseline()
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else RATIO
    fresh, base = load(fresh_src), load(base_src)
    fq, bq = fresh["queries"], base["queries"]

    regressions, improved, new = [], [], []
    for name, t in sorted(fq.items()):
        if name not in bq:
            new.append((name, t))
            continue
        t0 = bq[name]
        if t > ratio * t0 and t > MIN_SECONDS:
            regressions.append((name, t0, t))
        elif t < t0 / ratio:
            improved.append((name, t0, t))

    for name, t0, t in improved:
        print(f"improved  {name}: {t0:.2f}s -> {t:.2f}s")
    for name, t in new:
        print(f"new       {name}: {t:.2f}s (no baseline)")
    for name, t0, t in regressions:
        # RED so the line is unmissable in a gate log
        print(f"\033[31mREGRESSED {name}: {t0:.2f}s -> {t:.2f}s (> {ratio}x)\033[0m")
    print(
        f"suite: baseline {base_src} {base['value']:.1f}s ({len(bq)} queries) -> "
        f"fresh {fresh['value']:.1f}s ({len(fq)} queries); "
        f"{len(regressions)} regression(s) at {ratio}x"
    )
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
