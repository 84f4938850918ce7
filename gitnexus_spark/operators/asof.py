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

100 TB posture — the hot-key escape hatch (``bucket_s=``): the plain
plan windows by key only, so ONE power-law key (a hub instrument, a
bot user) serializes into a single task. Passing ``bucket_s`` switches
to the bucketed plan: facts are windowed by (key, coarse time bucket)
— parallel across a hot key's time range — and cross-bucket carry is
computed on a per-(key, bucket) SUMMARY table (one row per non-empty
bucket, i.e. agg-level cardinality) so the only key-global window runs
over bucket counts, not row counts. Empty buckets are handled: the
carry for bucket b is the latest tail over ALL earlier buckets
(``last(ignorenulls)`` over the summary), not just b-1. Same results
as the plain plan by construction; proven by a parity test and by
sharing the DuckDB ASOF oracle (`asof_join_bucketed` entry).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _event_seconds(dt: T.DataType, expr: Column, col: str) -> Column:
    """Orderable event-seconds for a ts expression: raw value for numeric
    epoch columns, unix_timestamp for timestamp/date. Raises on types
    where 'seconds apart' is undefined (strings would silently parse to
    NULL under unix_timestamp — the bug class this guards against)."""
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType,
                       T.DoubleType, T.FloatType, T.DecimalType)):
        return expr.cast("double")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return F.unix_timestamp(expr).cast("double")
    raise ValueError(
        f"asof_join: column {col!r} has type {dt.simpleString()}; "
        "tolerance_s/bucket_s need a timestamp or numeric-epoch column")


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "ts", right_ts: str | None = None,
              direction: str = "backward",
              tolerance_s: int | None = None,
              right_prefix: str = "r_",
              bucket_s: int | None = None) -> DataFrame:
    """Left as-of join. Output: every left row + ``<right_prefix><col>``
    for each non-key right column (NULL when no match, LEFT semantics).

    direction='backward': match the latest right_ts <= left_ts;
    'forward': the earliest right_ts >= left_ts. ``tolerance_s`` (event
    seconds) voids matches farther than the tolerance, like pandas
    merge_asof. ``bucket_s`` (event seconds) switches to the skew-safe
    (key, time-bucket) plan — same results, hot keys parallelize across
    their time range; pick it so a bucket holds ~1e5-1e6 rows of the
    hottest key."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    rts = right_ts or left_ts
    reserved = {"_ts", "_side", "_rv", "_match", "_bucket", "_tail", "_carry"}
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

    backward = direction == "backward"
    ts_order = F.col("_ts").asc() if backward else F.col("_ts").desc()
    rv_order = F.col("_rv").asc() if backward else F.col("_rv").desc()

    if bucket_s is None:
        w = (Window.partitionBy(*on)
             .orderBy(ts_order, F.col("_side").asc(), rv_order)
             .rowsBetween(Window.unboundedPreceding, 0))
        u = u.withColumn("_match", F.last("_rv", ignorenulls=True).over(w))
    else:
        u = _bucketed_match(u, on, left.schema[left_ts].dataType,
                            int(bucket_s), backward, ts_order, rv_order)

    out = u.filter(F.col("_side") == 1)
    if tolerance_s is not None:
        # Raw numeric difference for epoch columns, unix_timestamp only
        # for real timestamps — unix_timestamp over a numeric column
        # parses NULL (or throws under ANSI) and would void every match.
        gap = F.abs(
            _event_seconds(left.schema[left_ts].dataType,
                           F.col(left_ts), left_ts)
            - _event_seconds(right.schema[rts].dataType,
                             F.col(f"_match.{rts}"), rts))
        out = out.withColumn(
            "_match", F.when(gap <= tolerance_s, F.col("_match")))
    sel = [F.col(c) for c in left.columns]
    sel += [F.col(f"_match.`{c}`").alias(f"{right_prefix}{c}")
            for c in payload_cols]
    return out.select(*sel)


def _bucketed_match(u: DataFrame, on: list[str], ts_type: T.DataType,
                    bucket_s: int, backward: bool,
                    ts_order: Column, rv_order: Column) -> DataFrame:
    """Skew-safe match computation: window facts by (key, bucket), carry
    cross-bucket state via a per-bucket summary table.

    Three steps, two fact-scale shuffles total (the join on
    (key, bucket) and the window reuse the same hash partitioning):

    1. tails: per (key, bucket), the bucket's carry-out right payload —
       max(struct(_ts, _rv)) for backward (latest ts, greatest payload
       on ties — identical tie-break to the in-bucket window), min for
       forward. Agg-level cardinality.
    2. carry: per key ordered by bucket (ASC backward / DESC forward),
       ``last(tail, ignorenulls)`` over rows STRICTLY before the current
       bucket — the latest/earliest right payload from any earlier/later
       bucket, skipping empty ones. This window IS key-global but runs
       on the summary (one row per non-empty (key, bucket)), so a hot
       key costs #buckets rows, not #events.
    3. in-bucket window over (key, bucket) + coalesce with the carry.
    """
    sec = _event_seconds(ts_type, F.col("_ts"), "_ts")
    u = u.withColumn("_bucket", F.floor(sec / F.lit(bucket_s)))

    # ONE fact-scale exchange builds the whole summary: grouping ALL
    # rows by (key, bucket) with a right-side-only conditional aggregate
    # yields exactly `distinct buckets present LEFT JOIN right tails`
    # (max/min ignore the NULL the when() gives left rows) — the
    # separate buckets_present distinct (a second fact-scale exchange)
    # and the summary join are gone (guide §2.4).
    tail_struct = F.struct(F.col("_ts"), F.col("_rv"))
    right_tail = F.when(F.col("_side") == 0, tail_struct)
    tail_agg = (F.max(right_tail) if backward else F.min(right_tail))
    summ = u.groupBy(*on, "_bucket").agg(tail_agg.alias("_tail"))

    bucket_order = F.col("_bucket").asc() if backward else F.col("_bucket").desc()
    w_carry = (Window.partitionBy(*on).orderBy(bucket_order)
               .rowsBetween(Window.unboundedPreceding, -1))
    carry = summ.withColumn(
        "_carry", F.last("_tail", ignorenulls=True).over(w_carry)
    ).select(*on, "_bucket", F.col("_carry._rv").alias("_carry"))

    u = u.join(carry, [*on, "_bucket"], "left")
    w_in = (Window.partitionBy(*on, "_bucket")
            .orderBy(ts_order, F.col("_side").asc(), rv_order)
            .rowsBetween(Window.unboundedPreceding, 0))
    return u.withColumn(
        "_match",
        F.coalesce(F.last("_rv", ignorenulls=True).over(w_in),
                   F.col("_carry"))
    ).drop("_bucket", "_carry")
