"""Triple precision/recall vs the reference-semantics oracle on a
HELD-OUT shard (north rule: P/R >= 0.95).

The golden triple set is recomputed from the synthetic corpus's generation
arithmetic (gitnexus_spark/synthetic.py) — the same reference-semantics
oracle the correctness gate uses — restricted to the held-out shard
doc_id % 10 == HOLDOUT (documents never used to tune rule packs). The
pipeline runs on the FULL corpus; scoring compares its resolved triples on
the shard against the golden set.

Usage: python tools/score_pr.py [sf_dir] [holdout_mod10]
Prints one JSON line: {"precision": p, "recall": r, "f1": f, ...}
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    holdout = int(sys.argv[2]) if len(sys.argv) > 2 else 9

    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from gitnexus_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="score-pr")

    # pipeline output (full corpus), sharded to held-out docs
    got = entry.q_kg_triples_resolved(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    urls = entry.synth_pages_urls(spark, sf_dir) \
        .filter(F.col("doc_id") % 10 == holdout)
    got_shard = got.join(urls.select(F.col("url").alias("doc_url")), "doc_url") \
        .select("doc_url", "subj", "pred", "obj").dropDuplicates()

    # golden set from generation arithmetic (reference semantics)
    preds = ["founded", "acquired", "endorsed", "criticized", "visited"]
    rows = [(r["doc_id"], r["url"]) for r in
            urls.select("doc_id", "url").collect()]
    golden = set()
    for d, url in rows:
        k1, k2, k3 = d % 97, (d * 7 + 13) % 97, (d * 31 + 5) % 97
        golden.add((url, f"E{k1}", preds[d % 5], f"E{k2}"))
        if d % 3 == 0:
            golden.add((url, f"E{k1}", "acquired", f"E{k2}"))
            golden.add((url, f"E{k1}", "acquired", f"E{k3}"))

    got_set = {(r["doc_url"], r["subj"], r["pred"], r["obj"])
               for r in got_shard.collect()}
    tp = len(got_set & golden)
    precision = tp / len(got_set) if got_set else 0.0
    recall = tp / len(golden) if golden else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    print(json.dumps({
        "sf_dir": sf_dir, "holdout_mod10": holdout,
        "golden": len(golden), "emitted": len(got_set), "tp": tp,
        "precision": round(precision, 4), "recall": round(recall, 4),
        "f1": round(f1, 4),
        "meets_north_rule": precision >= 0.95 and recall >= 0.95,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
