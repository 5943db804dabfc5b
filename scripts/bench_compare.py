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


def _with_queries(obj) -> dict | None:
    """The metrics dict with per-query data, or None."""
    if not isinstance(obj, dict):
        return None
    parsed = obj.get("parsed", obj)
    if isinstance(parsed, dict) and "queries" in parsed:
        return parsed
    # driver BENCH_r*.json files can carry parsed: null — not usable
    if "queries" in obj:
        return obj
    return None


def load(path_or_stream) -> dict:
    text = (
        sys.stdin.read()
        if path_or_stream == "-"
        else open(path_or_stream).read()
    )
    # Accept a whole-file JSON document (BENCH_r*.json wraps the metrics
    # under "parsed") or bench.py terminal output ending in one JSON line.
    try:
        got = _with_queries(json.loads(text))
        if got is not None:
            return got
    except json.JSONDecodeError:
        pass
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                got = _with_queries(json.loads(line))
            except json.JSONDecodeError:
                continue
            if got is not None:
                return got
    raise SystemExit(
        f"no bench JSON with per-query data found in {path_or_stream} "
        "(driver BENCH_r*.json files may carry parsed: null — use a "
        "gate_logs/*bench_snapshot*.json instead)"
    )


def latest_round_baseline() -> str:
    # Prefer the builder's own full bench snapshots (gate_logs/*_bench_
    # snapshot.json): the driver's BENCH_r*.json truncates the JSON line
    # into "tail" and may carry parsed=null, which has no per-query data.
    # "Round-over-round" means the PREVIOUS round: once the current round
    # has written its own snapshots, naively taking the newest file would
    # compare the round against itself and incremental drift would never
    # trip — so group by the rNN prefix and take the newest file of the
    # second-highest round when two or more rounds are present.
    import os
    import re

    snaps = sorted(glob.glob("gate_logs/*bench_snapshot*.json"))
    if snaps:
        by_round: dict[int, list[str]] = {}
        for s in snaps:
            m = re.search(r"r(\d+)", os.path.basename(s))
            if m:  # filenames with no rNN tag have no round to group by
                by_round.setdefault(int(m.group(1)), []).append(s)
        if by_round:
            rounds = sorted(by_round)  # numeric: r9 < r10 < r100
            pick = rounds[-2] if len(rounds) >= 2 else rounds[-1]
            return by_round[pick][-1]
    # Fallback: driver BENCH_rNN.json files.  NUMERIC sort (a lexicographic
    # sort puts r100 before r99).  Unlike the builder's own snapshots above
    # (written MID-round, so the newest is the current round), the driver
    # writes BENCH_rNN at round N's CLOSE — during round N+1 the highest-
    # numbered file already IS the previous round, so take it directly.
    by_n: dict[int, str] = {}
    for s in glob.glob("BENCH_r*.json"):
        m = re.search(r"BENCH_r(\d+)\.json$", os.path.basename(s))
        if m:
            by_n[int(m.group(1))] = s
    if not by_n:
        raise SystemExit("no bench baseline found; pass one explicitly")
    return by_n[max(by_n)]


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
