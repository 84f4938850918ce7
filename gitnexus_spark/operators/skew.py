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
from pyspark.sql import types as T


def _hashable(dt: T.DataType) -> bool:
    """F.hash rejects MapType at analysis, at any nesting depth."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _hashable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_hashable(f.dataType) for f in dt.fields)
    return True


def with_salt(df: DataFrame, key_col: str, salts: int,
              salt_col: str = "_salt", id_col: str | None = None) -> DataFrame:
    """Uniform DETERMINISTIC salt.

    With ``id_col`` (a caller-supplied unique row id — almost every real
    table has one): salt = hash(key, id) mod salts — byte-identical
    duplicate rows of a hub key still spread across reducers.

    Without one: salt = hash(all HASHABLE columns) mod salts —
    map-typed columns (which F.hash rejects at analysis time, nested
    included) are skipped from the mix, so salting works on any schema.
    Deterministic on recomputation, but rows identical on the hashable
    subset collapse onto one reducer — a documented limitation, accepted
    on purpose: deriving the salt from monotonically_increasing_id
    (round-2 version) spreads duplicates but is INDETERMINATE under task
    retry — a re-executed map task after a shuffle-fetch failure can
    assign different salts than the original attempt, and Spark does not
    guarantee rolling back the consumer stage for expression-level
    nondeterminism (SPARK-23207-style duplicate/lost rows). Correctness
    beats duplicate-spread; pass id_col to get both.
    """
    mix = [F.col(key_col), F.col(id_col)] if id_col else \
        [F.col(f.name) for f in df.schema.fields if _hashable(f.dataType)]
    if not mix:  # every column map-typed: F.hash() has no valid input
        raise ValueError(
            "with_salt: no hashable columns to derive a salt from "
            "(all columns are map-typed) — pass id_col")
    return df.withColumn(
        salt_col, F.pmod(F.hash(*mix), F.lit(salts)).cast("int"))


def salted_agg(df: DataFrame, key_cols: list[str], aggs: dict[str, str],
               salts: int = 16, id_col: str | None = None) -> DataFrame:
    """Two-stage aggregation: partial per (key, salt), final per key.

    aggs: {column: fn} with fn in {"sum", "count", "min", "max"} —
    the algebraic aggregates where partial+final composes exactly.
    count composes as partial count -> final SUM of partials.
    id_col: unique row id for the salt mix (see with_salt).
    """
    fn_map = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    refn_map = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salted = with_salt(df, key_cols[0], salts, id_col=id_col)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        *[fn_map[fn](c).alias(f"_p_{c}_{fn}") for c, fn in aggs.items()]
    )
    final = partial.groupBy(*key_cols).agg(
        *[refn_map[fn](f"_p_{c}_{fn}").alias(f"{fn}_{c}") for c, fn in aggs.items()]
    )
    return final


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                salts: int = 16, how: str = "inner",
                id_col: str | None = None) -> DataFrame:
    """Replicate-salt join: dim rows replicated x salts, fact rows salted
    uniformly; join key becomes (key, salt). Exact same rows as the plain
    join, but a hub key now spreads over `salts` tasks.
    id_col: unique row id for the salt mix (see with_salt)."""
    spark = fact.sparkSession
    salt_range = spark.range(salts).select(F.col("id").cast("int").alias("_salt"))
    dim_rep = dim.crossJoin(F.broadcast(salt_range))
    fact_s = with_salt(fact, key, salts, id_col=id_col)
    out = fact_s.join(dim_rep, [key, "_salt"], how)
    return out.drop("_salt")
