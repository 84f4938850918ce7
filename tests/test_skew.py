"""Salted two-stage aggregation / salted join: exact equality with the
unsalted plan (T5 skew fixture: 40-row hub key)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    rows = [("hub", float(i), i) for i in range(400)] + \
           [(f"k{i}", float(i), i) for i in range(50)]
    return spark.createDataFrame(rows, ["key", "val", "seq"])


def test_salted_agg_equals_plain(skewed):
    from gitnexus_spark.operators.skew import salted_agg

    plain = {
        (r["key"]): (r["sum_val"], r["count_val"], r["min_val"], r["max_val"])
        for r in skewed.groupBy("key").agg(
            F.sum("val").alias("sum_val"), F.count("val").alias("count_val"),
            F.min("val").alias("min_val"), F.max("val").alias("max_val"),
        ).collect()
    }
    salted = {
        (r["key"]): (r["sum_val"], r["count_val"], r["min_val"], r["max_val"])
        for r in salted_agg(skewed, ["key"],
                            {"val": "sum"}, salts=8)
        .join(salted_agg(skewed, ["key"], {"val": "count"}, salts=8), "key")
        .join(salted_agg(skewed, ["key"], {"val": "min"}, salts=8), "key")
        .join(salted_agg(skewed, ["key"], {"val": "max"}, salts=8), "key")
        .collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark, skewed):
    from gitnexus_spark.operators.skew import salted_join

    dim = spark.createDataFrame(
        [("hub", "H"), ("k1", "A"), ("k2", "B")], ["key", "tag"])
    plain = sorted((r["key"], r["seq"], r["tag"])
                   for r in skewed.join(dim, "key").collect())
    salted = sorted((r["key"], r["seq"], r["tag"])
                    for r in salted_join(skewed, dim, "key", salts=8).collect())
    assert plain == salted
    assert len(plain) == 402


def test_salt_is_deterministic(skewed):
    from gitnexus_spark.operators.skew import with_salt

    a = sorted((r["key"], r["seq"], r["_salt"]) for r in with_salt(skewed, "key", 8).collect())
    b = sorted((r["key"], r["seq"], r["_salt"]) for r in with_salt(skewed, "key", 8).collect())
    assert a == b
    # hub key actually spreads across salts
    hub_salts = {s for k, _, s in a if k == "hub"}
    assert len(hub_salts) > 1


def test_salt_fallback_skips_map_columns(spark):
    """r3 ADVICE: F.hash rejects MapType at analysis, so the no-id_col
    fallback must exclude map columns (nested too) from the salt mix
    instead of erroring out on any schema that carries one."""
    from gitnexus_spark.operators.skew import salted_agg, with_salt

    df = spark.createDataFrame(
        [("hub", i, {"k": str(i)}) for i in range(40)],
        "key string, seq long, attrs map<string,string>")
    salted = with_salt(df, "key", 8).collect()
    assert len(salted) == 40
    assert len({r["_salt"] for r in salted}) > 1  # still spreads the hub
    agg = salted_agg(df, ["key"], {"seq": "sum"}, salts=8).collect()
    assert agg[0]["sum_seq"] == sum(range(40))
