"""Exact heavy hitters (terms with frequency >= phi * N) with a
bounded shuffle — the two-pass pigeonhole scheme.

The naive plan shuffles the full distinct-term dimension (vocabulary x
partitions partial rows — at web scale, billions of rows for a query
whose answer has a few hundred). The pigeonhole bound fixes it: if a
term's GLOBAL count is >= phi*N over P partitions, then in at least one
partition its LOCAL count is >= phi*N/P. So:

1. pass 1 (scan-local, zero shuffle): exact per-partition counts in an
   Arrow batch hash map; emit only terms whose local count clears the
   per-partition threshold — a candidate set with NO false negatives,
   at most P/phi terms total (each partition can clear the bar at most
   n_p/(phi*N/P) times);
2. pass 2: exact global counts for the candidates only — the shuffle
   carries candidate terms, not the vocabulary — then filter to the
   true threshold.

Results are EXACT (the candidate superset is repaired by exact
counting), so the oracle is plain GROUP BY ... HAVING. Same
narrow-then-verify shape as operators/bloom.py, applied to frequency
instead of membership.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(df: DataFrame, col: str, phi: float) -> DataFrame:
    """-> (term, cnt) for every value of `col` with cnt >= phi * N,
    exact. NULLs are not counted (SQL GROUP BY semantics differ on
    NULL; callers wanting them should coalesce first)."""
    if not (0 < phi <= 1):
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    src = df.select(F.col(col).alias("term")).where(F.col("term").isNotNull())
    n_total = src.count()
    n_parts = max(1, src.rdd.getNumPartitions())
    local_bar = max(1.0, phi * n_total / n_parts)

    def _local_counts(batches):
        counts: Counter = Counter()
        for pdf in batches:
            counts.update(pdf["term"])
        hits = [t for t, c in counts.items() if c >= local_bar]
        if hits:
            yield pd.DataFrame({"term": hits})

    cand = src.mapInPandas(_local_counts, "term string") \
        .dropDuplicates(["term"])
    # candidate set is <= P/phi terms in the worst case and usually far
    # smaller; the join is left UNHINTED so AQE broadcasts it when the
    # actual size allows instead of a forced hint assuming it
    exact = (src.join(cand, "term", "left_semi")
             .groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
             .filter(F.col("cnt") >= phi * n_total))
    return exact
