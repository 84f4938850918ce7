"""Mergeable sketch profiles: distinct counts (HLL) and quantiles (KLL)
that re-aggregate WITHOUT rescanning the corpus.

At 10^12 documents, "distinct entities per domain" or "token-count
quantiles per language" cannot be recomputed from raw data every time a
dashboard rolls them up to a coarser grain. The lakehouse answer is a
small at-rest PROFILE table keyed by the finest grain, carrying sketch
binaries instead of exact sets: any coarser grouping is a cheap
sketch-merge over the profile rows (register-wise max for HLL, compactor
merge for KLL), never a second corpus scan. Same pattern as the
reference's cached per-file statistics that survive incremental updates
(trie.ts keeps per-file indexes it can re-merge), lifted to columnar
aggregates.

Built entirely on Spark's JVM-side Datasketches bindings
(hll_sketch_agg / hll_union_agg / kll_*): no Python in the data path,
partial aggregation applies, and the sketch property "union of sketches
== sketch of the union" makes rollups EXACTLY as accurate as a direct
scan — verified in tests, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default HyperLogLog precision: 2^12 registers ~ 1.6% rel. std. error,
#: 4 KiB per sketch — profile tables stay metadata-sized.
DEFAULT_LG_K = 12


def distinct_profile(df: DataFrame, group_cols: list[str], value_col: str,
                     lg_k: int = DEFAULT_LG_K) -> DataFrame:
    """Per-group HLL distinct-count profile:
    (group_cols..., sketch: binary, approx_distinct: bigint).

    One partial-aggregated shuffle on group_cols; the sketch column is
    the mergeable artifact to persist, approx_distinct a convenience
    estimate of it.
    """
    sk = F.hll_sketch_agg(F.col(value_col).cast("string"), lg_k)
    return (df.groupBy(*group_cols)
            .agg(sk.alias("sketch"))
            .withColumn("approx_distinct",
                        F.hll_sketch_estimate("sketch")))


def rollup_distinct(profile: DataFrame,
                    rollup_cols: list[str]) -> DataFrame:
    """Re-aggregate a distinct_profile to a coarser grain by merging
    sketches (no corpus access): (rollup_cols..., approx_distinct).
    Pass [] to collapse to a single global row."""
    agg = F.hll_union_agg("sketch").alias("sketch")
    g = profile.groupBy(*rollup_cols).agg(agg) if rollup_cols \
        else profile.agg(agg)
    return g.withColumn("approx_distinct",
                        F.hll_sketch_estimate("sketch")) \
            .drop("sketch")


def overlap_profile(profile: DataFrame, group_col: str) -> DataFrame:
    """Pairwise distinct-INTERSECTION estimates between groups, computed
    entirely from an at-rest distinct_profile — no corpus access:
    (group_a, group_b, approx_a, approx_b, approx_union, approx_overlap)
    for every unordered pair group_a < group_b.

    HLL supports only union natively, so the intersection is
    inclusion-exclusion: |A∩B| ~= est(A) + est(B) - est(A∪B), with
    est(A∪B) from the pairwise ``hll_union`` of the two stored sketches.
    Error is additive in the three estimates, so it is relative to the
    UNION size, not the overlap — callers comparing small overlaps of
    huge sets should treat near-zero results as "below resolution".
    The pair join is over profile rows (one per group): a self-join of a
    metadata-sized table, never a corpus shuffle. It IS quadratic in the
    number of groups — intended for coarse grains (languages, sources,
    snapshots); for high-cardinality grains pre-filter to the candidate
    pairs of interest before calling."""
    a = profile.select(F.col(group_col).alias("group_a"),
                       F.col("sketch").alias("_ska"),
                       F.col("approx_distinct").alias("approx_a"))
    b = profile.select(F.col(group_col).alias("group_b"),
                       F.col("sketch").alias("_skb"),
                       F.col("approx_distinct").alias("approx_b"))
    pairs = a.join(b, F.col("group_a") < F.col("group_b"))
    union_est = F.hll_sketch_estimate(
        F.hll_union("_ska", "_skb")).alias("approx_union")
    return (pairs.select("group_a", "group_b", "approx_a", "approx_b",
                         union_est)
            .withColumn("approx_overlap",
                        F.greatest(
                            F.col("approx_a") + F.col("approx_b")
                            - F.col("approx_union"), F.lit(0)))
            .orderBy("group_a", "group_b"))


def quantile_profile(df: DataFrame, group_cols: list[str], value_col: str,
                     k: int = 200) -> DataFrame:
    """Per-group KLL quantile sketch over a bigint measure:
    (group_cols..., qsketch: binary, n: bigint). k controls accuracy
    (~1.65/sqrt(k) rank error at k=200 => ~1.2%)."""
    sk = F.kll_sketch_agg_bigint(F.col(value_col).cast("bigint"), F.lit(k))
    return (df.groupBy(*group_cols).agg(sk.alias("qsketch"))
            .withColumn("n", F.kll_sketch_get_n_bigint("qsketch")))


def rollup_quantiles(profile: DataFrame, rollup_cols: list[str],
                     ranks: list[float]) -> DataFrame:
    """Merge KLL sketches to a coarser grain and evaluate quantiles:
    (rollup_cols..., q_<rank>...). Rank error is preserved under merge
    (KLL is fully mergeable), so profile-table rollups carry the same
    guarantee as a direct scan.

    Spark exposes KLL merge only as a pairwise scalar
    (kll_sketch_merge_bigint), so the group's sketches are collected to
    an array and left-folded — fine by construction: the input is a
    PROFILE table (one row per fine-grain group), so a rollup group
    holds at most that many KiB-sized sketches, not corpus rows."""
    arr = F.collect_list("qsketch").alias("_sks")
    g = profile.groupBy(*rollup_cols).agg(arr) if rollup_cols \
        else profile.agg(arr)
    folded = F.aggregate(
        F.slice(F.col("_sks"), 2, F.greatest(F.size("_sks") - 1, F.lit(0))),
        F.col("_sks")[0],
        lambda acc, x: F.kll_sketch_merge_bigint(acc, x))
    g = g.withColumn("qsketch", folded).drop("_sks")
    for r in ranks:
        name = f"q_{str(r).replace('.', '_')}"
        g = g.withColumn(
            name, F.kll_sketch_get_quantile_bigint("qsketch", F.lit(float(r))))
    return g.drop("qsketch")
