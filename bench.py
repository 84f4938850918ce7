"""Headline benchmark: one JSON line for the driver.

Runs the KG-construction pipeline (the BASELINE.json headline metric —
docs/sec and triples/sec) plus the heaviest relational / training-data
operators at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS].

The KG corpus is replicated deterministically (REP distinct url variants
per source doc) so throughput is measured over a meaningfully sized input
rather than the raw 5k synthetic docs.

Scaling-efficiency evidence (N -> 4N cores on identical input) is produced
by tools/scaling_bench.py and recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REP = int(os.environ.get("SPARK_GRAFT_KG_REP", "4"))
# This host is contention-noisy (the r4 ledger spans 19-196 s for the SAME
# kg_pipeline run). Each head therefore runs TRIALS times in-process and the
# published number is the MIN — the only round-over-round comparable figure.
TRIALS = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
KG_TRIALS = int(os.environ.get("SPARK_GRAFT_KG_TRIALS", "2"))
SF = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]


from gitnexus_spark.synthetic import replicate_pages  # noqa: E402  (re-export: scaling_bench + jobs import it from here historically)


def main() -> None:
    from gitnexus_spark.session import get_spark
    from gitnexus_spark.synthetic import alias_dictionary, synth_pages

    spark = get_spark(app_name="gitnexus-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 16))
    timings: dict[str, float] = {}      # published: min over trials
    trials: dict[str, list] = {}        # every trial, for the ledger
    extras: dict[str, float] = {}

    def timed(name: str, fn, n_trials: int = TRIALS):
        out = None
        for _ in range(max(1, n_trials)):
            t0 = time.time()
            out = fn()
            trials.setdefault(name, []).append(round(time.time() - t0, 3))
        timings[name] = min(trials[name])
        return out

    # ---- KG pipeline (headline) -------------------------------------------
    from gitnexus_spark.plans.pipeline import KGPipeline

    out_dir = "/tmp/gitnexus_bench_kg"
    pages = replicate_pages(synth_pages(spark, SF_DIR), REP).persist()
    n_docs = pages.count()

    def run_kg():
        # fresh output dir per trial: the pipeline resumes from committed
        # tables, which would turn trial 2 into a ~2 s no-op
        shutil.rmtree(out_dir, ignore_errors=True)
        pipe = KGPipeline(spark, out_dir, alias_dict=alias_dictionary(spark))
        return pipe.run(pages)

    kg = timed("kg_pipeline", run_kg, KG_TRIALS)
    n_triples = kg["triples_resolved"].count()
    pages.unpersist()
    extras["kg_docs"] = n_docs
    extras["kg_triples"] = n_triples
    extras["docs_per_sec"] = round(n_docs / timings["kg_pipeline"], 1)
    extras["triples_per_sec"] = round(n_triples / timings["kg_pipeline"], 1)

    # ---- relational / training-data headliners ----------------------------
    import __spark_entry__ as entrymod

    heads = [
        "agg_pricing_summary", "top_customers", "window_top_orders",
        "interval_join", "events_sessionize", "dedup_exact",
        "dedup_minhash_pairs", "dedup_clusters", "decontaminate",
        "dedup_simhash", "text_stats",
        "similarity_topk", "similarity_ann_ivf",
        "stratified_sample", "pack_sequences",
        "bloom_decontaminate", "sketch_distinct_rollup",
        "asof_join_events", "asof_join_bucketed",
        "kg_scc",
    ]
    qs = entrymod.queries()
    # kg_scc is iterative (FW-BW coloring rounds) and an order of magnitude
    # heavier than the other heads — two trials keep the suite wall bounded
    # while still ledgering a contention-resistant min.
    per_head_trials = {"kg_scc": min(TRIALS, 2)}
    for name in heads:
        timed(name, lambda n=name: qs[n](spark, SF_DIR)
              .write.format("noop").mode("overwrite").save(),
              per_head_trials.get(name, TRIALS))

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF,
        "trials_per_head": TRIALS,
        **extras,
    }))
    _ledger_append(timings, extras, trials)
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


QUERY_LEDGER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tools", ".query_trials.json")


def _ledger_append(timings: dict, extras: dict,
                   trials: dict | None = None) -> None:
    """Per-query trial ledger: this host is noisy (3x run-to-run swings),
    so round-over-round comparisons must be over best-of-trials minima —
    every bench run appends its per-query walls; tools/query_ledger.py
    reports the minima (same discipline as tools/scaling_bench.py)."""
    try:
        with open(QUERY_LEDGER) as f:
            ledger = json.load(f)
    except (OSError, json.JSONDecodeError):
        ledger = []
    ledger.append({"ts": round(time.time(), 1), "sf": SF, "cpus": CPUS,
                   "rep": REP, "queries": timings,
                   **({"trials": trials} if trials else {}), **extras})
    try:
        with open(QUERY_LEDGER, "w") as f:
            json.dump(ledger, f, indent=1)
    except OSError:
        pass  # bench output matters more than the ledger


if __name__ == "__main__":
    main()
