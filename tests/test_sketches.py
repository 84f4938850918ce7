"""Mergeable sketch profiles: the rollup-without-rescan contract.

The load-bearing assertion is EXACT merge equivalence for HLL — the
union of per-group sketches must estimate identically to a sketch built
directly over the union — because that is what makes an at-rest profile
table a substitute for a corpus scan.
"""

import pytest
from pyspark.sql import functions as F

from gitnexus_spark.operators.sketches import (distinct_profile,
                                               overlap_profile,
                                               quantile_profile,
                                               rollup_distinct,
                                               rollup_quantiles)


@pytest.fixture(scope="module")
def mentions(spark):
    # (domain, lang, entity): entity universes overlap across groups
    return spark.range(0, 20000).select(
        (F.col("id") % 8).cast("string").alias("domain"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
        ((F.col("id") * 37 + 11) % 997).cast("string").alias("entity"),
        (F.col("id") % 512).alias("tokens"),
    )


def test_distinct_profile_accuracy(spark, mentions):
    prof = distinct_profile(mentions, ["domain"], "entity")
    exact = {r["domain"]: r["n"] for r in
             mentions.groupBy("domain")
             .agg(F.countDistinct("entity").alias("n")).collect()}
    for r in prof.collect():
        assert abs(r["approx_distinct"] - exact[r["domain"]]) \
            <= 0.05 * exact[r["domain"]]


def test_rollup_equals_direct_sketch_exactly(spark, mentions):
    """union(per-(domain,lang) sketches) == sketch(all rows) — estimate
    IDENTICAL, not just close: HLL union is register-wise max."""
    fine = distinct_profile(mentions, ["domain", "lang"], "entity")
    merged = rollup_distinct(fine, []).collect()[0]["approx_distinct"]
    direct = distinct_profile(
        mentions.withColumn("g", F.lit(1)), ["g"], "entity") \
        .collect()[0]["approx_distinct"]
    assert merged == direct

    # partial rollup to domain grain == direct per-domain sketches
    by_dom_merged = {r["domain"]: r["approx_distinct"]
                     for r in rollup_distinct(fine, ["domain"]).collect()}
    by_dom_direct = {r["domain"]: r["approx_distinct"]
                     for r in distinct_profile(
                         mentions, ["domain"], "entity").collect()}
    assert by_dom_merged == by_dom_direct


def test_overlap_profile_inclusion_exclusion(spark):
    """Ranged entity universes with known pairwise intersections:
    group g covers [g*300, g*300+500) so adjacent groups overlap by
    exactly 200, g/g+2 by 0."""
    df = spark.range(0, 30000).select(
        (F.col("id") % 4).alias("g"),
        ((F.col("id") % 4) * 300 + (F.floor(F.col("id") / 4) % 500))
        .cast("string").alias("entity"))
    prof = distinct_profile(df, ["g"], "entity")
    ov = {(r["group_a"], r["group_b"]): r["approx_overlap"]
          for r in overlap_profile(prof, "g").collect()}
    assert set(ov) == {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}
    for (ga, gb), est in ov.items():
        exact = 200 if gb - ga == 1 else 0
        union = 1000 - exact
        # additive HLL error is relative to the union size
        assert abs(est - exact) <= 0.06 * union, (ga, gb, est)


def test_quantile_profile_and_rollup(spark, mentions):
    prof = quantile_profile(mentions, ["domain"], "tokens")
    assert prof.select(F.sum("n")).collect()[0][0] == 20000
    q = rollup_quantiles(prof, [], [0.5, 0.9]).collect()[0]
    # tokens is uniform over 0..511: median ~256, p90 ~461
    assert abs(q["q_0_5"] - 256) <= 16
    assert abs(q["q_0_9"] - 461) <= 16

    per_lang = rollup_quantiles(
        quantile_profile(mentions, ["domain", "lang"], "tokens"),
        ["lang"], [0.5])
    got = {r["lang"]: r["q_0_5"] for r in per_lang.collect()}
    assert set(got) == {"en", "de"}
    for v in got.values():
        assert abs(v - 256) <= 20


def test_profile_survives_at_rest_roundtrip(spark, mentions, tmp_path):
    """Sketch binaries written to parquet and read back merge losslessly
    — the actual profile-table deployment shape."""
    p = str(tmp_path / "profile")
    distinct_profile(mentions, ["domain", "lang"], "entity") \
        .write.mode("overwrite").parquet(p)
    back = spark.read.parquet(p)
    merged = rollup_distinct(back, []).collect()[0]["approx_distinct"]
    direct = distinct_profile(
        mentions.withColumn("g", F.lit(1)), ["g"], "entity") \
        .collect()[0]["approx_distinct"]
    assert merged == direct
