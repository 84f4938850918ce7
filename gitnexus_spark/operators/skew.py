"""Skew handling: salted two-stage aggregation and salted joins.

The reference has NO skew handling — head names simply produce giant
candidate lists walked in a loop (call-processor.ts:242-258). At
10^12-doc scale, head entities (Wikipedia-style hubs) make `groupBy(name)`
and name-keyed joins pathological: one reducer gets the hub's partition.

Two explicit mitigations beyond session-level AQE skew-join:

- salted_agg: groupBy(key) decomposed into groupBy(key, salt) partial ->
  groupBy(key) final. Results are EXACTLY equal to the unsalted agg for
  algebraic (associative+commutative) aggregates; the salt column simply
  forces fan-out of the partial stage.
- salted_join: replicate the small/dim side `salts` times, salt the fact
  side uniformly (crc32-based, deterministic) — classic replicate-salt
  equi-join that splits a hub key across `salts` reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key_col: str, salts: int,
              salt_col: str = "_salt") -> DataFrame:
    """Uniform salt = hash(key, monotonically_increasing_id) mod salts.

    The per-row id is a GENUINE row discriminator, so even byte-identical
    duplicate rows of a hub key spread across reducers (hashing the column
    values alone would send them to one reducer). Salt values depend on
    partition layout, which is safe by construction: every consumer
    (salted_agg, salted_join) produces results exactly equal to the
    unsalted plan for ANY salt assignment — the salt only controls
    partial-stage fan-out."""
    return df.withColumn(
        salt_col,
        F.pmod(F.hash(F.col(key_col), F.monotonically_increasing_id()),
               F.lit(salts)).cast("int"),
    )


def salted_agg(df: DataFrame, key_cols: list[str], aggs: dict[str, str],
               salts: int = 16) -> DataFrame:
    """Two-stage aggregation: partial per (key, salt), final per key.

    aggs: {column: fn} with fn in {"sum", "count", "min", "max"} —
    the algebraic aggregates where partial+final composes exactly.
    count composes as partial count -> final SUM of partials.
    """
    fn_map = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    refn_map = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salted = with_salt(df, key_cols[0], salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        *[fn_map[fn](c).alias(f"_p_{c}_{fn}") for c, fn in aggs.items()]
    )
    final = partial.groupBy(*key_cols).agg(
        *[refn_map[fn](f"_p_{c}_{fn}").alias(f"{fn}_{c}") for c, fn in aggs.items()]
    )
    return final


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                salts: int = 16, how: str = "inner") -> DataFrame:
    """Replicate-salt join: dim rows replicated x salts, fact rows salted
    uniformly; join key becomes (key, salt). Exact same rows as the plain
    join, but a hub key now spreads over `salts` tasks."""
    spark = fact.sparkSession
    salt_range = spark.range(salts).select(F.col("id").cast("int").alias("_salt"))
    dim_rep = dim.crossJoin(F.broadcast(salt_range))
    fact_s = with_salt(fact, key, salts)
    out = fact_s.join(dim_rep, [key, "_salt"], how)
    return out.drop("_salt")
