"""Load-gated scaling-trial sniper.

The host shares ~16 physical cores (32 SMT threads) with noisy
neighbors; a trial started under load measures the neighbors, not the
code. This loop fires single scaling legs (tools/scaling_bench.py
`level` mode) only when the 1-minute loadavg is under the gate, and
alternates parallelism levels with a bias toward the contention-exposed
high-core leg. Minima-only discipline: polluted trials waste time but
can only bias the ledger DOWN, never up.

Usage: python tools/sniper.py [n_low] [rep] [sf_dir] [max_legs]
Stop with SIGTERM / kill; the ledger is append-per-leg so nothing is
lost mid-loop.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

GATE = float(os.environ.get("SNIPER_GATE", "2.0"))


def wait_quiet() -> float:
    """Block until the 1-minute loadavg is under the gate.

    Never fires into a loud window: a leg started under load measures
    the neighbors, so waiting longer is strictly cheaper than running a
    doomed 10-35 min trial (the earlier timeout-then-fire-anyway
    behavior burned whole quiet windows on polluted legs). Requires two
    consecutive sub-gate readings 15 s apart so a single transient dip
    between neighbor bursts doesn't trigger a leg."""
    quiet_streak = 0
    while True:
        la = os.getloadavg()[0]
        if la < GATE:
            quiet_streak += 1
            if quiet_streak >= 2:
                return la
        else:
            quiet_streak = 0
        time.sleep(15)


def main() -> None:
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    max_legs = int(sys.argv[4]) if len(sys.argv) > 4 else 40
    # low legs converge fast (least contention-sensitive); high legs need
    # many attempts to catch a quiet window -> 1:2 pattern
    pattern = [n_low, 4 * n_low, 4 * n_low]
    for i in range(max_legs):
        cpus = pattern[i % len(pattern)]
        la = wait_quiet()
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "tools/scaling_bench.py", "level",
             str(cpus), str(rep), sf_dir, "pipeline"],
            capture_output=True, text=True, timeout=7200)
        tail = (r.stdout.strip().splitlines() or [""])[-1]
        print(f"leg {i}: cpus={cpus} load_at_start={la:.2f} "
              f"wall={time.time() - t0:.0f}s -> {tail}", flush=True)


if __name__ == "__main__":
    main()
