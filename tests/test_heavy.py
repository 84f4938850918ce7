"""Heavy hitters: exact equality with GROUP BY ... HAVING, including a
hot term deliberately spread thin across every partition (the case a
naive per-partition threshold would miss)."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from gitnexus_spark.operators.heavy import MG_MARGIN, _mg_merge, heavy_hitters


def _exact(df, col, phi):
    n = df.where(F.col(col).isNotNull()).count()
    return {(r["term"], r["cnt"]) for r in
            df.where(F.col(col).isNotNull())
            .groupBy(F.col(col).alias("term"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= phi * n).collect()}


def test_matches_exact_group_by(spark):
    # zipf-ish: term t_k appears ~30000/k times
    df = spark.range(0, 60000).select(
        F.concat(F.lit("t"),
                 F.floor(60000 / (F.col("id") + 1)).cast("string"))
        .alias("w"))
    got = {(r["term"], r["cnt"])
           for r in heavy_hitters(df, "w", 0.01).collect()}
    assert got == _exact(df, "w", 0.01) and len(got) > 0


def test_spread_term_not_missed(spark):
    # 'hot' is 5% of rows but round-robin'd across 32 partitions so no
    # partition sees it concentrated
    df = spark.range(0, 40000).select(
        F.when(F.col("id") % 20 == 0, "hot")
        .otherwise(F.concat(F.lit("u"), F.col("id").cast("string")))
        .alias("w")).repartition(32)
    got = {r["term"] for r in heavy_hitters(df, "w", 0.04).collect()}
    assert got == {"hot"}


def test_mg_summary_bounded_on_adversarial_vocabulary():
    """A partition that is almost all distinct terms (the case that made
    the old Counter implementation hold the whole vocabulary) keeps the
    summary at <= capacity entries after every batch merge, yet never
    evicts a term above the phi * n_p bar."""
    phi = 0.01
    capacity = MG_MARGIN * math.ceil(1.0 / phi)
    counts: Counter = Counter()
    n_seen = 0
    for b in range(50):  # 50 batches x 2000 distinct singletons + 80 'hot'
        batch = Counter({f"u{b}_{i}": 1 for i in range(2000)})
        batch["hot"] = 80
        _mg_merge(counts, batch, capacity)
        n_seen += sum(batch.values())
        assert len(counts) <= capacity
    # hot is 80*50 / n_seen ~ 3.8% >> phi -> must have survived with a
    # positive count (undercount bounded by n_seen / (capacity + 1))
    assert counts["hot"] > 0
    assert counts["hot"] >= 4000 - n_seen // (capacity + 1)


def test_high_distinct_partition_end_to_end(spark):
    # one hot term at ~2% buried in a single partition whose vocabulary
    # (~49k distinct) vastly exceeds the MG capacity (2 * 100)
    df = spark.range(0, 50000).select(
        F.when(F.col("id") % 50 == 0, "hot")
        .otherwise(F.concat(F.lit("v"), F.col("id").cast("string")))
        .alias("w")).coalesce(1)
    got = {(r["term"], r["cnt"])
           for r in heavy_hitters(df, "w", 0.01).collect()}
    assert got == {("hot", 1000)}


def test_nulls_ignored_and_phi_validated(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], "w string")
    got = {(r["term"], r["cnt"])
           for r in heavy_hitters(df, "w", 0.5).collect()}
    assert got == {("a", 2)}
    with pytest.raises(ValueError):
        heavy_hitters(df, "w", 0.0)
