"""spark-submit entry point for training-corpus preparation.

Runs the composed hygiene pipeline (operators/corpus_prep.py) over a
documents table and materializes three artifacts under --output:

    decisions/   per-doc decision table (every signal + kept + reason)
    corpus/      the kept documents (id + text), partition-pruned reads
    loss report  one JSON line on stdout: kept/dropped counts per gate

Cluster usage (the production shape):

    spark-submit --py-files gitnexus_spark.zip jobs/run_corpus_prep.py \
        --input <documents parquet> --eval <eval parquet> --output <dir>

Local smoke (eval set carved from the corpus by id residue, the same
convention as the driver oracle):

    python jobs/run_corpus_prep.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --eval-residue 20 --output /tmp/prep
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
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--eval", default=None,
                    help="eval-set parquet path (doc_id, text)")
    ap.add_argument("--eval-residue", type=int, default=None,
                    help="carve eval set as doc_id %% N == 0 instead of "
                         "--eval (test/smoke convenience)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-quality", type=float, default=0.30)
    ap.add_argument("--max-top-gram", type=float, default=0.10)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if (args.eval is None) == (args.eval_residue is None):
        ap.error("exactly one of --eval / --eval-residue is required")

    from pyspark.sql import functions as F

    from gitnexus_spark.operators.corpus_prep import prepare_corpus
    from gitnexus_spark.session import get_spark

    spark = get_spark(app_name="corpus-prep", master=args.master)
    docs = spark.read.parquet(args.input)
    if args.eval_residue:
        eval_df = docs.filter(F.col("doc_id") % args.eval_residue == 0)
        docs = docs.filter(F.col("doc_id") % args.eval_residue != 0)
    else:
        eval_df = spark.read.parquet(args.eval)

    t0 = time.time()
    # idempotent resume, same discipline as the KG pipeline: a committed
    # stage (parquet _SUCCESS) is read back, not recomputed
    dec_path = f"{args.output}/decisions"
    if not os.path.exists(os.path.join(dec_path, "_SUCCESS")):
        prepare_corpus(
            docs, eval_df, min_quality=args.min_quality,
            max_top_gram=args.max_top_gram,
        ).write.mode("overwrite").parquet(dec_path)

    dec = spark.read.parquet(dec_path)  # at-rest reuse
    corpus_path = f"{args.output}/corpus"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        (docs.join(dec.filter("kept = 1").select("doc_id"), "doc_id")
             .write.mode("overwrite").parquet(corpus_path))

    losses = {r["drop_reason"] or "kept": r["n"]
              for r in dec.groupBy("drop_reason")
                          .agg(F.count("*").alias("n")).collect()}
    wall = time.time() - t0
    n_in = sum(losses.values())
    print(json.dumps({
        "wall_sec": round(wall, 2),
        "docs_in": n_in,
        "docs_kept": losses.get("kept", 0),
        "kept_frac": round(losses.get("kept", 0) / max(n_in, 1), 4),
        "losses": {k: v for k, v in sorted(losses.items()) if k != "kept"},
        "output": args.output,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
