"""Job-level decomposition of the pipeline run: where does the N->4N
scaling gap live?

Runs the IDENTICAL pipeline job at one parallelism level with the Spark
event log enabled (tmpfs), then parses SparkListenerJobStart/JobEnd to
split the wall time into

- in-job time (executor work — expected to shrink ~linearly with cores)
- inter-job driver gaps (plan analysis, codegen, commit bookkeeping —
  a per-RUN fixed cost independent of executor count)
- pre-first-job time (session + input materialization)

VERDICT r02 gate: if the 2-core vs 8-core efficiency shortfall is fully
explained by the (constant) gap+startup terms while in-job time scales,
the pipeline meets the north rule on a real cluster where per-run cost
is noise against hours of scan time.

Usage: python tools/job_breakdown.py CPUS REP [sf_dir]
Prints one JSON line; run at two CPU levels and compare.
"""

from __future__ import annotations

import json
import subprocess
import sys

RUNNER = r"""
import glob, json, os, shutil, sys, time
sys.path.insert(0, ".")
cpus, rep, sf_dir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
from gitnexus_spark.session import get_spark
from gitnexus_spark.synthetic import synth_pages, alias_dictionary, replicate_pages
from gitnexus_spark.plans.pipeline import KGPipeline
out_dir = f"/dev/shm/jb_kg_{cpus}"
evt_dir = f"/dev/shm/jb_evt_{cpus}"
local_dir = f"/dev/shm/jb_local_{cpus}"
for d in (out_dir, evt_dir, local_dir):
    shutil.rmtree(d, ignore_errors=True)
os.makedirs(evt_dir, exist_ok=True)
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=32,
                  app_name=f"jb-{cpus}",
                  extra_conf={"spark.driver.memory": "24g",
                              "spark.local.dir": local_dir,
                              "spark.eventLog.enabled": "true",
                              "spark.eventLog.compress": "false",
                              "spark.eventLog.rolling.enabled": "false",
                              "spark.eventLog.dir": evt_dir})
pages = replicate_pages(synth_pages(spark, sf_dir), rep).repartition(64).persist()
n_docs = pages.count()
t0 = time.time()
t0_ms = t0 * 1000.0
pipe = KGPipeline(spark, out_dir, alias_dict=alias_dictionary(spark))
out = pipe.run(pages)
n_triples = out["triples_resolved"].count()
wall = time.time() - t0
spark.stop()

jobs = {}
app_t0 = None
paths = [os.path.join(r, f) for r, _, fs in os.walk(evt_dir) for f in fs]
for path in paths:
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            if e.get("Event") == "SparkListenerApplicationStart":
                app_t0 = e["Timestamp"]
            elif e.get("Event") == "SparkListenerJobStart":
                jobs.setdefault(e["Job ID"], {})["start"] = e["Submission Time"]
            elif e.get("Event") == "SparkListenerJobEnd":
                jobs.setdefault(e["Job ID"], {})["end"] = e["Completion Time"]
# only jobs inside the measured pipeline window (corpus materialization
# and its persist job run before t0 and are not part of the wall time)
spans = sorted((j["start"], j["end"]) for j in jobs.values()
               if "start" in j and "end" in j and j["start"] >= t0_ms)
# the pipeline submits independent jobs CONCURRENTLY -> overlapping spans;
# in-job time is the UNION coverage ("some job is running"), the gap is
# the driver-only remainder of the first-start..last-end window
merged = []
for s, e in spans:
    if merged and s <= merged[-1][1]:
        merged[-1][1] = max(merged[-1][1], e)
    else:
        merged.append([s, e])
in_job = sum(e - s for s, e in merged) / 1000.0
gaps = ((spans[-1][1] - spans[0][0]) / 1000.0 - in_job) if spans else 0.0
print(json.dumps({
    "cpus": cpus, "docs": n_docs, "triples": n_triples,
    "wall_sec": round(wall, 2), "n_jobs": len(spans),
    "in_job_sec": round(in_job, 2),
    "inter_job_gap_sec": round(gaps, 2),
    "docs_per_sec": round(n_docs / wall, 1),
}))
for d in (out_dir, evt_dir, local_dir):
    shutil.rmtree(d, ignore_errors=True)
"""


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(cpus), str(rep), sf_dir],
        capture_output=True, text=True, timeout=3600, cwd=".",
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr[-2000:])
        sys.exit(1)
    print(lines[-1])


if __name__ == "__main__":
    main()
