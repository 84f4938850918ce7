"""Bloom-filter join pruning: semi/anti joins where the big side is
filtered scan-locally by a broadcast bloom of the small side's keys.

The 100 TB shape of decontamination / membership checks is NOT a join of
the full corpus against the key dimension — it is (1) build a compact
bloom over the keys once, (2) broadcast those bytes to every task, (3)
drop the overwhelming majority of corpus rows AT THE SCAN with zero
shuffle, (4) run the exact join only over the tiny surviving candidate
set. Results are EXACT: blooms have no false negatives, so the residual
join removes exactly the false positives (fpp of the non-matching rows).
Spark's own runtime filtering injects this pattern for some shuffle
joins but not for the anti-join/`IN`-flag shapes a curation pipeline
needs, and never across separately-built jobs — this operator makes the
bloom an explicit, reusable artifact.

Spark 4 does not expose ``bloom_filter_agg``/``might_contain`` as public
SQL functions, so the filter is built DataFrame-native with the hashing
kept JVM-side in both phases: the k probe positions are
``pmod(xxhash64(key, seed_i), m)`` columns (whole-stage codegen), the
build ORs per-partition bit arrays produced by one Arrow-batched
``mapInPandas`` pass and tree-merges them in fanout-32 rounds (the
driver never holds more than 32 bitmaps, whatever the partition
count), and the probe is a vectorized bit-gather
pandas UDF over the broadcast bytes. Python never sees keys or hashes —
only int64 positions and one uint8 array.

Sizing: m = -n ln(p)/ln(2)^2 bits. At fpp=1% that is ~1.2 GiB of bloom
per 1e9 keys — still broadcastable where the raw key strings (tens of
GiB) are not; for larger dimensions raise fpp or partition the keys and
run per-shard blooms.

Reference parity: GitNexus prunes its import-resolution candidate space
with exact in-memory maps (``import-resolver.ts`` builds full
path->definition indexes); at corpus scale that index does not fit, and
this is the standard probabilistic replacement with an exactness
repair step.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..plans.hints import EST_ROW_BYTES, broadcast_if_small

#: Default false-positive probability: 1% keeps the residual exact join
#: at ~1% of the big side (plus true matches) for 9.6 bits/key.
DEFAULT_FPP = 0.01


def bloom_params(n_items: int, fpp: float = DEFAULT_FPP) -> tuple[int, int]:
    """Optimal (num_bits, num_hashes) for n_items at the target fpp.
    num_bits is rounded up to a byte multiple (min 64)."""
    n = max(1, n_items)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, (m + 7) // 8 * 8)
    k = max(1, int(round(m / n * math.log(2))))
    return m, k


def _positions(key: Column, num_bits: int, num_hashes: int) -> Column:
    """array<bigint> of the k bit positions for a key — pure JVM:
    one xxhash64 per hash seed, independent via the (key, seed) tuple."""
    return F.array(*[
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ])


#: Tree-merge fanout for the bloom build: each reduction round ORs up
#: to this many partition bitmaps per task, so the driver never receives
#: more than FANOUT bitmaps regardless of input partition count.
_MERGE_FANOUT = 32


def build_bloom(keys: DataFrame, key_col: str, num_bits: int,
                num_hashes: int) -> bytes:
    """Distributed bloom build, treeAggregate-shaped: each input
    partition reduces to one m/8-byte bitmap row, then bitmap rows are
    OR-merged in fanout-32 rounds until at most one task's worth
    remains — the driver materializes <= _MERGE_FANOUT bitmaps however
    many partitions the key scan has. Peak per-task memory is one
    bitmap (m/8 bytes); size num_bits accordingly."""
    nbytes = num_bits // 8

    def _or_reduce(frame_iter, col):
        arr = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in frame_iter:
            if len(pdf) == 0:
                continue
            seen = True
            if col == "p":
                pos = np.concatenate([np.asarray(v, dtype=np.int64)
                                      for v in pdf["p"]])
                # bitwise_or.at handles duplicate byte indexes; |= would not
                np.bitwise_or.at(arr, pos >> 3,
                                 np.uint8(1) << (pos & 7).astype(np.uint8))
            else:
                for b in pdf["bits"]:
                    arr |= np.frombuffer(b, dtype=np.uint8)
        if seen:
            yield pd.DataFrame({"bits": [arr.tobytes()]})

    bits = keys.select(
        _positions(F.col(key_col), num_bits, num_hashes).alias("p")) \
        .mapInPandas(lambda it: _or_reduce(it, "p"), "bits binary")
    n_parts = keys.rdd.getNumPartitions()
    while n_parts > _MERGE_FANOUT:
        n_parts = (n_parts + _MERGE_FANOUT - 1) // _MERGE_FANOUT
        bits = bits.repartition(n_parts) \
            .mapInPandas(lambda it: _or_reduce(it, "bits"), "bits binary")

    out = np.zeros(nbytes, dtype=np.uint8)
    for r in bits.collect():
        out |= np.frombuffer(r["bits"], dtype=np.uint8)
    return out.tobytes()


def might_contain(df: DataFrame, key_col: str, bloom: bytes,
                  num_bits: int, num_hashes: int,
                  flag_col: str = "_bloom_hit") -> DataFrame:
    """df + boolean flag_col: True iff key MAY be in the bloom'd set
    (no false negatives). Scan-local: positions are codegen'd JVM
    columns; Python does one vectorized bit-gather per Arrow batch.

    Each call registers one Spark broadcast of the bloom bytes, which
    lives until the returned plan is garbage-collected — long-running
    drivers (streaming) should build the bloom once and reuse the
    returned DataFrame, not re-call per micro-batch."""
    bc = df.sparkSession.sparkContext.broadcast(bloom)

    @pandas_udf("boolean")
    def _mc(pos: pd.Series) -> pd.Series:
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        arr = np.frombuffer(bc.value, dtype=np.uint8)
        mat = np.stack([np.asarray(v, dtype=np.int64) for v in pos])
        bits = (arr[mat >> 3] >> (mat & 7).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=1))

    return df.withColumn(
        flag_col, _mc(_positions(F.col(key_col), num_bits, num_hashes)))


def _prepared_keys(small: DataFrame, on: str, fpp: float):
    """Distinct non-null key dimension + its bloom. One count job sizes
    the filter (the dimension is scanned anyway to build it).

    localCheckpoint: the sizing count, the bloom-build scan and the
    exact-join side all consume this plan — without the pin the
    scan+distinct executed three times per call (guide §1.2). Eager, so
    the single materialization job doubles as the count's input; blocks
    free when the returned plan is garbage-collected (same lifetime as
    the bloom broadcast below)."""
    keys = small.select(on).where(F.col(on).isNotNull()).distinct() \
        .localCheckpoint()
    n = keys.count()
    num_bits, num_hashes = bloom_params(n, fpp)
    bloom = build_bloom(keys, on, num_bits, num_hashes)
    keys = broadcast_if_small(keys, n * EST_ROW_BYTES)
    return keys, bloom, num_bits, num_hashes


def bloom_semi_join(big: DataFrame, small: DataFrame, on: str,
                    fpp: float = DEFAULT_FPP) -> DataFrame:
    """Exact LEFT SEMI join, bloom-pruned: only candidate rows (true
    matches + ~fpp of the rest) reach the exact join."""
    keys, bloom, m, k = _prepared_keys(small, on, fpp)
    cand = might_contain(big, on, bloom, m, k).filter(F.col("_bloom_hit")) \
        .drop("_bloom_hit")
    return cand.join(keys, on=on, how="left_semi")


def bloom_anti_join(big: DataFrame, small: DataFrame, on: str,
                    fpp: float = DEFAULT_FPP) -> DataFrame:
    """Exact LEFT ANTI join (SQL NULL semantics: null keys never match,
    so they are kept). Definite misses bypass the join entirely; only
    bloom candidates pay for the exact anti check."""
    keys, bloom, m, k = _prepared_keys(small, on, fpp)
    flagged = might_contain(big, on, bloom, m, k)
    misses = flagged.filter(~F.col("_bloom_hit")).drop("_bloom_hit")
    cand = flagged.filter(F.col("_bloom_hit")).drop("_bloom_hit")
    return misses.unionByName(cand.join(keys, on=on, how="left_anti"))


def bloom_membership(big: DataFrame, small: DataFrame, on: str,
                     flag_col: str, fpp: float = DEFAULT_FPP) -> DataFrame:
    """big + exact boolean flag_col = key IN small (NULL keys -> False,
    matching SQL's `IN (...)` filter semantics under a WHERE): the bloom
    answers for definite misses; candidates are repaired by an exact
    join against the distinct key dimension."""
    keys, bloom, m, k = _prepared_keys(small, on, fpp)
    flagged = might_contain(big, on, bloom, m, k)
    misses = flagged.filter(~F.col("_bloom_hit")).drop("_bloom_hit") \
        .withColumn(flag_col, F.lit(False))
    cand = flagged.filter(F.col("_bloom_hit")).drop("_bloom_hit")
    marker = keys.withColumn("_k_present", F.lit(True))
    verified = cand.join(marker, on=on, how="left") \
        .withColumn(flag_col, F.coalesce(F.col("_k_present"), F.lit(False))) \
        .drop("_k_present")
    return misses.unionByName(verified)
