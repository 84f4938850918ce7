"""Exact heavy hitters (terms with frequency >= phi * N) with bounded
shuffle AND bounded executor memory — Misra-Gries candidates, exact verify.

The naive plan shuffles the full distinct-term dimension (vocabulary x
partitions partial rows — at web scale, billions of rows for a query
whose answer has a few hundred). Pass 1 therefore runs scan-local and
emits only a candidate set; pass 2 exact-counts the candidates. Two
bounds make this web-scale safe:

1. SHUFFLE bound (weighted pigeonhole): if a term's global count is
   >= phi * N = phi * sum(n_p), then in at least one partition p its
   local count is >= phi * n_p (otherwise the sum would fall short).
   So a per-partition summary that is guaranteed to retain every term
   with local count >= phi * n_p yields a candidate set with NO false
   negatives, and the pass-2 shuffle carries candidates, not the
   vocabulary.
2. MEMORY bound (Misra-Gries): the per-partition summary is a
   Misra-Gries sketch of capacity k, maintained by the mergeable-
   summaries rule (Agarwal et al., PODS'12): per Arrow batch, add the
   batch's exact value_counts, then if the map exceeds k entries
   subtract the (k+1)-th largest count from every entry and drop the
   non-positives. Total undercount is <= n_p/(k+1), so with
   k = MARGIN * ceil(1/phi) (k+1 > 1/phi) every term with local count
   >= phi * n_p survives with a positive count. The map NEVER exceeds
   k + batch_distinct entries mid-merge and <= k at batch end —
   independent of the partition's vocabulary size (the previous
   implementation's per-partition Counter held the full vocabulary).

N itself is folded into pass 1 (each partition emits one row-count row
alongside its survivors), so the operator reads the source exactly
twice: once for candidates + N, once for the exact verify counts.

Results are EXACT (the candidate superset is repaired by exact
counting), so the oracle is plain GROUP BY ... HAVING. Same
narrow-then-verify shape as operators/bloom.py, applied to frequency
instead of membership.
"""

from __future__ import annotations

import heapq
import math
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# capacity multiplier over the minimum ceil(1/phi): correctness only
# needs k+1 > 1/phi; the margin shrinks the summary's undercount (fewer
# spurious candidates reach the pass-2 shuffle) at bounded memory cost.
MG_MARGIN = 2


def _mg_merge(counts: Counter, batch: Counter, capacity: int) -> None:
    """Merge `batch` (exact counts, itself a zero-error MG summary) into
    the running Misra-Gries summary `counts`, in place, keeping at most
    `capacity` entries. Mergeable-summaries rule: add, then subtract the
    (capacity+1)-th largest value from every entry and drop <= 0."""
    counts.update(batch)
    if len(counts) <= capacity:
        return
    # value to zero out: the (capacity+1)-th largest count
    offset = heapq.nlargest(capacity + 1, counts.values())[-1]
    for term in [t for t, c in counts.items() if c <= offset]:
        del counts[term]
    for term in counts:
        counts[term] -= offset


def heavy_hitters(df: DataFrame, col: str, phi: float) -> DataFrame:
    """-> (term, cnt) for every value of `col` with cnt >= phi * N,
    exact. NULLs are not counted (SQL GROUP BY semantics differ on
    NULL; callers wanting them should coalesce first)."""
    if not (0 < phi <= 1):
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    src = df.select(F.col(col).alias("term")).where(F.col("term").isNotNull())
    capacity = MG_MARGIN * math.ceil(1.0 / phi)

    def _mg_candidates(batches):
        counts: Counter = Counter()
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            # exact per-batch counts are vectorized (C-side); the MG
            # merge then touches per-DISTINCT-term entries, never rows
            _mg_merge(counts, Counter(pdf["term"].value_counts().to_dict()),
                      capacity)
        yield pd.DataFrame({"term": list(counts.keys()) + [None],
                            "n_rows": [None] * len(counts) + [n_rows]})

    # pass 1 output is tiny by construction (<= P * (capacity + 1)
    # rows); pin it so the n_total action below doubles as the
    # materialization and the candidate semi-join reuses it instead of
    # re-scanning the source.
    pass1 = src.mapInPandas(_mg_candidates, "term string, n_rows long") \
        .persist()
    n_total = pass1.agg(F.sum("n_rows")).collect()[0][0] or 0
    cand = pass1.where(F.col("term").isNotNull()).select("term") \
        .dropDuplicates(["term"])
    # candidate set is <= P * capacity terms in the worst case and
    # usually far smaller; the join is left UNHINTED so AQE broadcasts
    # it when the actual size allows instead of a forced hint assuming it
    exact = (src.join(cand, "term", "left_semi")
             .groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
             .filter(F.col("cnt") >= phi * n_total))
    return exact
