"""Focused per-head benchmark for optimization work (guide §1.4).

bench.py is FROZEN for round-over-round measurement; this harness exists
so individual heads can be timed in isolation (noop sink, labeled jobs,
N trials) while iterating. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        decontaminate dedup_simhash [--trials 3]

Prints one JSON line: {"queries": {name: [trial_secs...]}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    trials = 3
    if "--trials" in sys.argv:
        trials = int(sys.argv[sys.argv.index("--trials") + 1])

    from gitnexus_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="gitnexus-bench-extra",
                      master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 16))
    qs = entrymod.queries()
    out: dict[str, list[float]] = {}
    for name in args:
        for t in range(trials):
            spark.sparkContext.setJobDescription(f"{name} trial {t}")
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop") \
                .mode("overwrite").save()
            out.setdefault(name, []).append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            print(f"# {name} trial {t}: {out[name][-1]}s", flush=True)
    print(json.dumps({"queries": out, "sf": SF_DIR, "cpus": CPUS}))
    spark.stop()


if __name__ == "__main__":
    main()
