"""Bloom-filter join pruning: exactness (vs plain joins) is the
contract — the bloom may only change WORK, never results — plus the
pruning property itself (definite misses never reach the exact join)
and the fpp calibration.
"""

import pytest
from pyspark.sql import functions as F

from gitnexus_spark.operators.bloom import (bloom_anti_join,
                                            bloom_membership, bloom_params,
                                            bloom_semi_join, build_bloom,
                                            might_contain)


@pytest.fixture(scope="module")
def corpus(spark):
    # 5000 rows; keys k0..k999, plus some NULL keys
    return spark.range(0, 5000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 50 == 7, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 1000).cast("string")))
        .alias("key"),
    )


@pytest.fixture(scope="module")
def dim(spark):
    # 120 keys: k0, k3, k6, ... k357 — plus a NULL and a duplicate
    base = spark.range(0, 120).select(
        F.concat(F.lit("k"), (F.col("id") * 3).cast("string")).alias("key"))
    extra = spark.createDataFrame([(None,), ("k0",)], "key string")
    return base.union(extra)


def test_no_false_negatives_and_fpp(spark):
    members = spark.range(0, 2000).select(
        F.concat(F.lit("m"), F.col("id").cast("string")).alias("k"))
    m, h = bloom_params(2000, fpp=0.01)
    bloom = build_bloom(members, "k", m, h)
    hits = might_contain(members, "k", bloom, m, h)
    assert hits.filter(~F.col("_bloom_hit")).count() == 0  # NO false negs

    others = spark.range(0, 20000).select(
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("k"))
    fp = might_contain(others, "k", bloom, m, h) \
        .filter(F.col("_bloom_hit")).count()
    assert fp / 20000 < 0.03  # ~1% target, 3x headroom


def test_semi_join_exact(corpus, dim):
    got = {r["row_id"] for r in bloom_semi_join(corpus, dim, "key").collect()}
    want = {r["row_id"]
            for r in corpus.join(dim.select("key").distinct(),
                                 "key", "left_semi").collect()}
    assert got == want and len(want) > 0


def test_anti_join_exact_keeps_nulls(corpus, dim):
    got = {r["row_id"] for r in bloom_anti_join(corpus, dim, "key").collect()}
    want = {r["row_id"]
            for r in corpus.join(dim.select("key").distinct(),
                                 "key", "left_anti").collect()}
    assert got == want
    # null-key corpus rows are in the anti result (SQL semantics)
    null_ids = {r["row_id"]
                for r in corpus.filter(F.col("key").isNull()).collect()}
    assert null_ids <= got


def test_membership_flag_exact(corpus, dim):
    out = bloom_membership(corpus, dim, "key", "hit")
    got = {r["row_id"]: r["hit"] for r in out.collect()}
    member = {r["key"] for r in dim.collect() if r["key"] is not None}
    for r in corpus.collect():
        assert got[r["row_id"]] == (r["key"] in member), r
    assert len(got) == corpus.count()  # no row lost or duplicated


def test_pruning_actually_prunes(spark, corpus, dim):
    """Definite misses must not reach the exact join: with the dim keys
    all prefixed differently from most corpus keys, the candidate set
    the join sees is a small fraction of the corpus."""
    m, h = bloom_params(41, fpp=0.01)
    small = spark.range(0, 41).select(
        F.concat(F.lit("k"), (F.col("id") * 25).cast("string")).alias("key"))
    bloom = build_bloom(small, "key", m, h)
    cand = might_contain(corpus, "key", bloom, m, h) \
        .filter(F.col("_bloom_hit")).count()
    # 41 true keys cover 41/1000 of non-null rows (~203 rows of 4900);
    # candidates = true matches + ~fpp of the rest
    assert cand < 5000 * 0.10


def test_empty_dim(spark, corpus):
    empty = spark.createDataFrame([], "key string")
    assert bloom_semi_join(corpus, empty, "key").count() == 0
    assert bloom_anti_join(corpus, empty, "key").count() == corpus.count()


def test_tree_merge_many_partitions(spark):
    """>32 input partitions exercises the fanout-32 OR-merge rounds;
    membership must stay exact."""
    members = spark.range(0, 5000).repartition(80).select(
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("k"))
    m, h = bloom_params(5000, fpp=0.01)
    bloom = build_bloom(members, "k", m, h)
    assert might_contain(members, "k", bloom, m, h) \
        .filter(~F.col("_bloom_hit")).count() == 0
