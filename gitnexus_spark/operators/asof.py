"""Distributed as-of join: attach to each left row the temporally
nearest right row per key (backward = latest right_ts <= left_ts,
forward = earliest right_ts >= left_ts), LEFT-join semantics.

The classic training-data need ("state of X as of event time T":
feature snapshots for events, price as of order time, last crawl before
an annotation) that Spark SQL lacks as a primitive. A naive range join
(`l.key = r.key AND r.ts <= l.ts` + keep-max window) explodes to one
row per (left, EVERY earlier right) pair before pruning — quadratic per
key. This implementation is the canonical single-shuffle plan instead:

1. tag both sides and UNION them (right rows carry their payload in one
   struct, left rows a NULL struct);
2. one window over (key) ordered by (ts, side, payload):
   ``last(payload, ignorenulls=True)`` with an unbounded-preceding row
   frame carries the latest right payload forward onto each left row;
3. keep the left rows, unpack the struct.

Cost: one exchange on the key (both inputs together), one
per-partition sort — the same shape as a sort-merge join, with NO
intermediate pair blow-up. Deterministic under ties: right rows sort
before left rows at equal ts (inclusive match), and equal-ts right
duplicates resolve by payload-struct order (field-wise comparison;
greatest wins backward, smallest forward), never "whichever task won".

100 TB posture: the window partitions by key only, so a single hot key
serializes into one task — for power-law keys pre-bucket by
(key, coarse time bucket) and as-of within buckets carrying the
previous bucket's tail, or salt the COLD path only; per-key event
streams (users, sessions, instruments) are the intended shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "ts", right_ts: str | None = None,
              direction: str = "backward",
              tolerance_s: int | None = None,
              right_prefix: str = "r_") -> DataFrame:
    """Left as-of join. Output: every left row + ``<right_prefix><col>``
    for each non-key right column (NULL when no match, LEFT semantics).

    direction='backward': match the latest right_ts <= left_ts;
    'forward': the earliest right_ts >= left_ts. ``tolerance_s`` (event
    seconds) voids matches farther than the tolerance, like pandas
    merge_asof."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    rts = right_ts or left_ts
    reserved = {"_ts", "_side", "_rv", "_match"}
    clash = reserved & set(left.columns) | reserved & set(right.columns)
    if clash:
        raise ValueError(f"asof_join reserves columns {sorted(clash)}; "
                         "rename them on the inputs")
    payload_cols = [c for c in right.columns if c not in on]
    if rts not in payload_cols:
        raise ValueError(f"right_ts {rts!r} must be a non-key right column")

    payload_schema = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in payload_cols])
    l = left.withColumn("_ts", F.col(left_ts)) \
        .withColumn("_side", F.lit(1)) \
        .withColumn("_rv", F.lit(None).cast(payload_schema))
    r = right.select(
        *on,
        F.col(rts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*payload_cols).alias("_rv"),
    )
    for c in left.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.select(*left.columns, "_ts", "_side", "_rv") \
        .unionByName(r.select(*left.columns, "_ts", "_side", "_rv"))

    ts_order = F.col("_ts").asc() if direction == "backward" \
        else F.col("_ts").desc()
    rv_order = F.col("_rv").asc() if direction == "backward" \
        else F.col("_rv").desc()
    w = (Window.partitionBy(*on)
         .orderBy(ts_order, F.col("_side").asc(), rv_order)
         .rowsBetween(Window.unboundedPreceding, 0))
    u = u.withColumn("_match", F.last("_rv", ignorenulls=True).over(w))

    out = u.filter(F.col("_side") == 1)
    if tolerance_s is not None:
        gap = F.abs(F.unix_timestamp(F.col(left_ts))
                    - F.unix_timestamp(F.col(f"_match.{rts}")))
        out = out.withColumn(
            "_match", F.when(gap <= tolerance_s, F.col("_match")))
    sel = [F.col(c) for c in left.columns]
    sel += [F.col(f"_match.`{c}`").alias(f"{right_prefix}{c}")
            for c in payload_cols]
    return out.select(*sel)
