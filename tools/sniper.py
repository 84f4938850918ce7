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
# A leg only contends for `cpus` of the ~16 physical cores, so the gate
# scales with how much headroom the leg needs: a 2-thread leg is near-clean
# under neighbor load 4 (12 cores idle), while an 8-thread leg needs a
# genuinely quiet box. Without this, the low-core legs — which are the
# denominator of the efficiency ratio and the least contention-sensitive —
# starve waiting for windows they don't need.
GATE_LOW = float(os.environ.get("SNIPER_GATE_LOW", "4.0"))


def wait_quiet(gate: float) -> float:
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
        if la < gate:
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
    # Interleave the full pipeline with the fused extraction scan
    # (pass 1+2 — the path that dominates at 100 TB). Extract legs are
    # 3-5x shorter, so they catch clean windows the long pipeline legs
    # miss; the ledger keys on mode so minima never mix. High-core
    # pipeline legs lead the rotation: they are the most
    # contention-sensitive floor (4x the threads competing with
    # neighbors) and therefore the one the ledger is furthest from.
    pattern = [(4 * n_low, "pipeline"), (n_low, "extract"),
               (4 * n_low, "extract"), (4 * n_low, "pipeline"),
               (n_low, "pipeline"), (4 * n_low, "extract")]
    for i in range(max_legs):
        cpus, mode = pattern[i % len(pattern)]
        la = wait_quiet(GATE_LOW if cpus == n_low else GATE)
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "tools/scaling_bench.py", "level",
             str(cpus), str(rep), sf_dir, mode],
            capture_output=True, text=True, timeout=7200)
        tail = (r.stdout.strip().splitlines() or [""])[-1]
        print(f"leg {i}: cpus={cpus} mode={mode} load_at_start={la:.2f} "
              f"wall={time.time() - t0:.0f}s -> {tail}", flush=True)


if __name__ == "__main__":
    main()
