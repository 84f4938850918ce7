"""spark-submit entry point for corpus profile tables.

Builds (or incrementally folds into) the at-rest sketch profile tables
of a corpus — the artifacts dashboards roll up WITHOUT rescanning the
corpus (operators/sketches.py):

    <output>/distinct/   per-group HLL sketches of a value column
    <output>/quantiles/  per-group KLL sketches of a numeric column

Both land as SnapshotWriter tables (snapshot history, time travel), so
every run is a new commit: --mode rebuild re-sketches the input whole,
--mode fold merges the input AS A DELTA into the existing profiles (the
batch twin of streaming/profiles.py — use it for daily partitions).

Prints one JSON line: commit ids, group counts, and the profile's own
rollup (global distinct estimate + requested quantiles) as a smoke
check.

Cluster usage:

    spark-submit --py-files gitnexus_spark.zip jobs/build_profiles.py \
        --input <parquet> --group lang,source --distinct-col text \
        --quantile-col n_chars --output <dir>

Local smoke:

    python jobs/build_profiles.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --group lang,source --distinct-col text --quantile-col n_chars \
        --output /tmp/profiles
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="input parquet path")
    ap.add_argument("--group", required=True,
                    help="comma-separated grouping columns (finest grain)")
    ap.add_argument("--distinct-col", default=None,
                    help="column to sketch distinct counts of")
    ap.add_argument("--quantile-col", default=None,
                    help="bigint-castable column to sketch quantiles of")
    ap.add_argument("--output", required=True)
    ap.add_argument("--mode", choices=["rebuild", "fold"], default="rebuild",
                    help="rebuild: sketch the whole input; fold: merge the "
                         "input as a delta into the existing profiles")
    ap.add_argument("--lg-k", type=int, default=12)
    ap.add_argument("--kll-k", type=int, default=200)
    ap.add_argument("--ranks", default="0.5,0.9,0.99")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if args.distinct_col is None and args.quantile_col is None:
        ap.error("at least one of --distinct-col / --quantile-col required")

    from gitnexus_spark.operators.sketches import (distinct_profile,
                                                   quantile_profile,
                                                   rollup_distinct,
                                                   rollup_quantiles)
    from gitnexus_spark.session import get_spark
    from gitnexus_spark.sources.snapshots import SnapshotWriter
    from gitnexus_spark.streaming.profiles import (
        merge_profile_into, merge_quantile_profile_into)

    t0 = time.time()
    spark = get_spark(app_name="gitnexus-profiles", master=args.master)
    writer = SnapshotWriter(spark)
    df = spark.read.parquet(args.input)
    groups = args.group.split(",")
    ranks = [float(r) for r in args.ranks.split(",")]
    report: dict = {"mode": args.mode, "groups": groups}

    if args.distinct_col is not None:
        path = os.path.join(args.output, "distinct")
        delta = distinct_profile(df, groups, args.distinct_col, args.lg_k)
        if args.mode == "fold" and writer.exists(path):
            snap = merge_profile_into(writer, path, delta, groups)
        else:
            snap = writer.write(delta, path, op="profile")
        prof = writer.read(path)
        report["distinct"] = {
            "snapshot_id": snap,
            "n_groups": prof.count(),
            "global_estimate": rollup_distinct(prof, [])
            .collect()[0]["approx_distinct"],
        }

    if args.quantile_col is not None:
        path = os.path.join(args.output, "quantiles")
        delta = quantile_profile(df, groups, args.quantile_col, args.kll_k)
        if args.mode == "fold" and writer.exists(path):
            snap = merge_quantile_profile_into(writer, path, delta, groups)
        else:
            snap = writer.write(delta, path, op="profile")
        prof = writer.read(path)
        glob = rollup_quantiles(prof, [], ranks).collect()[0].asDict()
        report["quantiles"] = {
            "snapshot_id": snap,
            "n_groups": prof.count(),
            "global": glob,
        }

    report["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
