#!/usr/bin/env python
"""Compare two bench JSON outputs (bench.py lines or driver BENCH_r{N}.json
wrappers) and flag per-query regressions.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold]

Prints the common-query totals, every query slower by more than
``threshold`` (default 1.25x, ignoring sub-0.5s noise), and the queries
added/removed — the round-over-round sanity check the per-query medians
are meant to make reliable (see bench.py's methodology note).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    if "queries" in data:
        return data
    # driver wrapper: one JSON line embedded in a captured "tail"
    tail = data.get("tail", "")
    return json.loads(tail[tail.index('{"metric"'):])


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    tot_o = sum(oq[q] for q in common)
    tot_n = sum(nq[q] for q in common)
    print(f"common {len(common)} queries: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({tot_n / tot_o:.2f}x)")
    regressions = [
        (nq[q] / oq[q], q)
        for q in common
        if nq[q] > 0.5 and oq[q] > 0 and nq[q] / oq[q] > threshold
    ]
    for ratio, q in sorted(regressions, reverse=True):
        print(f"  REGRESSION {ratio:.2f}x  {q}: {oq[q]}s -> {nq[q]}s")
    if not regressions:
        print(f"  no regressions > {threshold}x (ignoring sub-0.5s)")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print("  added:", ", ".join(f"{q} ({nq[q]}s)" for q in added))
    if removed:
        print("  removed:", ", ".join(removed))


if __name__ == "__main__":
    main()
