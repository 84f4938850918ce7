"""Heavy hitters: exact equality with GROUP BY ... HAVING, including a
hot term deliberately spread thin across every partition (the case a
naive per-partition threshold would miss)."""

import pytest
from pyspark.sql import functions as F

from gitnexus_spark.operators.heavy import heavy_hitters


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


def test_nulls_ignored_and_phi_validated(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], "w string")
    got = {(r["term"], r["cnt"])
           for r in heavy_hitters(df, "w", 0.5).collect()}
    assert got == {("a", 2)}
    with pytest.raises(ValueError):
        heavy_hitters(df, "w", 0.0)
