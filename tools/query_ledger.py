"""Report best-of-trials per-query minima from the bench.py trial ledger.

This host is multi-tenant and noisy (identical runs vary up to 3x);
contention only SLOWS a run, so the minimum wall per query over many
trials converges to the uncontended number. bench.py appends one ledger
entry per run (tools/.query_trials.json); this tool prints the minima as
a markdown table for BENCH.md, optionally against reference columns from
prior-round driver benches (BENCH_r*.json single-trial numbers).

Usage: python tools/query_ledger.py [sf] [cpus]
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
LEDGER = os.path.join(HERE, ".query_trials.json")
REPO = os.path.dirname(HERE)


def load_round_bench(n: int) -> dict:
    path = os.path.join(REPO, f"BENCH_r{n:02d}.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f).get("parsed", {}).get("queries", {})


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    with open(LEDGER) as f:
        ledger = json.load(f)
    trials = [t for t in ledger if t.get("sf") == sf and t.get("cpus") == cpus]
    if not trials:
        print(f"no trials for sf={sf} cpus={cpus}")
        return

    minima: dict[str, float] = {}
    for t in trials:
        for q, w in t["queries"].items():
            minima[q] = min(minima.get(q, float("inf")), w)

    r1, r2 = load_round_bench(1), load_round_bench(2)
    print(f"Per-query best-of-{len(trials)}-trials minima "
          f"(sf={sf}, local[{cpus}]):\n")
    print("| query | min (s) | r01 driver (s) | r02 driver (s) |")
    print("|---|---|---|---|")
    for q in sorted(minima):
        f1 = f"{r1[q]:.2f}" if q in r1 else "–"
        f2 = f"{r2[q]:.2f}" if q in r2 else "–"
        print(f"| {q} | {minima[q]:.2f} | {f1} | {f2} |")
    tot = sum(minima.values())
    print(f"| **total** | **{tot:.2f}** | "
          f"{sum(r1.values()):.2f} | {sum(r2.values()):.2f} |")

    docs = [t.get("docs_per_sec") for t in trials if t.get("docs_per_sec")]
    if docs:
        print(f"\nkg docs/sec best-of-trials: {max(docs):.0f}")


if __name__ == "__main__":
    main()
