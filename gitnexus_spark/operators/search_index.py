"""At-rest trigram search index for node full-text lookup.

The reference serves search from an in-memory trie over names/paths
(src/core/search, trie.ts); `graph_queries.search_nodes` answers the
same query with a full scan. At 10^10 nodes the scan is wrong and a
single-heap trie is impossible — the lakehouse shape is an at-rest
posting-list index over CHARACTER TRIGRAMS (the pg_trgm design, which
word tokens cannot replicate: a needle ending in a word PREFIX, e.g.
"a/p7" matching "a/p70.html", has no word-level posting to hit):

- build: one (trigram, id) row per distinct trigram of the lowercased
  searchable text, written partitioned by ``crc32(gram) % n_buckets``;
- lookup: any true substring match contains EVERY trigram of the
  needle, so ANDing the needle's trigram posting lists yields a strict
  superset of the answer — read only those grams' bucket partitions
  (static partition pruning), intersect, and verify the original
  substring predicate on the candidates alone.

The verify step keeps results EXACTLY equal to the scan-based
`search_nodes` (the index narrows, never decides), so both paths share
one oracle. Needles shorter than 3 characters have no trigram and fall
back to the scan (documented contract, same results). crc32 is the
bucket fold because Python's ``zlib.crc32`` and Spark's ``crc32``
agree — the driver computes the needle's buckets without a job, and
the fold is persisted in the index metadata so a lookup can never
silently disagree with the build.
"""

from __future__ import annotations

import json
import os
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64
#: searchable fields, in search_nodes' haystack order
FIELDS = ("name", "url")


def _hay() -> F.Column:
    return F.lower(F.concat_ws(
        " ", *[F.coalesce(F.col(c), F.lit("")) for c in FIELDS]))


def _trigrams(text: str) -> list[str]:
    t = text.lower()
    return sorted({t[i:i + 3] for i in range(len(t) - 2)})


def _bucket_of(gram: str, n_buckets: int) -> int:
    return zlib.crc32(gram.encode("utf-8")) % n_buckets


def build_search_index(nodes: DataFrame, out_dir: str,
                       n_buckets: int = DEFAULT_BUCKETS) -> None:
    """Write the trigram posting lists: (gram, id) partitioned by
    bucket. One scan + one distinct shuffle; ~|hay| rows per node."""
    grams = F.array_distinct(F.expr(
        "transform(sequence(1, greatest(length(_hay) - 2, 0)), "
        "i -> substring(_hay, i, 3))"))
    posts = (nodes.select("id", _hay().alias("_hay"))
             .filter(F.length("_hay") >= 3)
             .select("id", F.explode(grams).alias("gram"))
             .withColumn("bucket",
                         F.pmod(F.crc32(F.col("gram").cast("binary")),
                                F.lit(n_buckets))))
    posts.write.mode("overwrite").partitionBy("bucket").parquet(out_dir)
    with open(os.path.join(out_dir, "_index_meta.json"), "w") as f:
        json.dump({"n_buckets": n_buckets, "fields": list(FIELDS)}, f)


def search_with_index(spark: SparkSession, nodes: DataFrame,
                      index_dir: str, needle: str) -> DataFrame:
    """Index-accelerated `search_nodes`: identical results; the index
    scan reads only the needle trigrams' bucket partitions and the node
    table is touched only for intersected candidates."""
    with open(os.path.join(index_dir, "_index_meta.json")) as f:
        n_buckets = json.load(f)["n_buckets"]
    grams = _trigrams(needle)
    needle_pred = _hay().contains(needle.lower())
    if not grams:
        # sub-trigram needle: no posting list can narrow it — scan
        return nodes.filter(needle_pred)
    buckets = sorted({_bucket_of(g, n_buckets) for g in grams})
    idx = (spark.read.parquet(index_dir)
           .filter(F.col("bucket").isin(buckets))
           .filter(F.col("gram").isin(grams)))
    cand = (idx.groupBy("id")
            .agg(F.count_distinct("gram").alias("_ng"))
            .filter(F.col("_ng") == len(grams))
            .select("id"))
    return nodes.join(cand, "id", "left_semi").filter(needle_pred)
