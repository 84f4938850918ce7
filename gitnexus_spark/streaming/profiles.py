"""Incremental sketch-profile maintenance over a stream.

The batch sketch layer (operators/sketches.py) proves that merging
per-group HLL sketches is LOSSLESS — union of sketches == sketch of the
union, bit for bit. That same property makes streaming maintenance of a
profile table exact AND replay-safe:

- exact: folding each micro-batch's partial sketches into the stored
  profile yields the identical sketch a from-scratch build over all data
  seen would produce — the maintained table never drifts;
- replay-safe: foreachBatch is at-least-once, so an epoch guard (cheap
  manifest-tag read) skips already-folded epochs, giving exactly-once
  commits and one snapshot per micro-batch. Epoch ids are scoped to the
  CHECKPOINT, so the guard tag is namespaced per checkpoint location
  (_run_ns): a stream restarted under a fresh checkpoint path starts at
  -1 and reprocesses, instead of silently skipping batches until its
  epoch_id overtakes a previous run's max. The residual coupling — a
  checkpoint dir WIPED IN PLACE is indistinguishable from replay and is
  treated as such — is deliberate; point a fresh checkpoint at a fresh
  path (and usually a fresh table). Note the guard is REQUIRED
  for bit-stable estimates, not just tidiness: although HLL union is
  register-wise max (re-merging a batch can never lose items), Spark's
  estimator is not invariant under self-union — a sketch unioned with
  itself can flip from the HIP to the composite estimator — so blind
  re-merges would wobble the reported counts.

Per trigger the work is one partial-agg shuffle of the BATCH at the
profile grain plus a keyed replace of the touched groups — history is
never rescanned, which is the whole point at 10^12 rows of history.
The reference's analogue is the per-file index it re-merges on update
(trie.ts:228-254), lifted to columnar aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import (DEFAULT_LG_K, distinct_profile,
                                  quantile_profile)
from ..sources.snapshots import SnapshotWriter


def merge_profile_into(writer: SnapshotWriter, table_path: str,
                       delta: DataFrame, group_cols: list[str],
                       tag: str | None = None) -> int:
    """Fold a delta distinct-profile into the at-rest profile table.

    Only groups PRESENT in the delta are re-merged (semi-join slice of
    the stored profile); untouched groups ride through the keyed
    replace. Commits one new snapshot; returns its id."""
    if not writer.exists(table_path):
        return writer.write(delta, table_path, op="profile", tag=tag)
    old = writer.read(table_path)
    keys = delta.select(*group_cols).dropDuplicates(group_cols)
    changed = old.join(keys, group_cols, "left_semi")
    both = changed.select(*group_cols, "sketch") \
        .unionByName(delta.select(*group_cols, "sketch"))
    merged = (both.groupBy(*group_cols)
              .agg(F.hll_union_agg("sketch").alias("sketch"))
              .withColumn("approx_distinct",
                          F.hll_sketch_estimate("sketch")))
    return writer.replace_into(table_path, merged, match_cols=group_cols,
                               tag=tag)


def merge_quantile_profile_into(writer: SnapshotWriter, table_path: str,
                                delta: DataFrame, group_cols: list[str],
                                tag: str | None = None) -> int:
    """Fold a delta quantile_profile (qsketch, n) into the at-rest
    table. KLL is fully mergeable too, and here each group merges
    exactly TWO sketches (stored + delta), so the pairwise
    kll_sketch_merge_bigint suffices — no fold. The exact row count
    ``n`` is additive, giving a free self-check column."""
    if not writer.exists(table_path):
        return writer.write(delta, table_path, op="profile", tag=tag)
    old = writer.read(table_path)
    keys = delta.select(*group_cols).dropDuplicates(group_cols)
    changed = old.join(keys, group_cols, "left_semi") \
        .select(*group_cols, F.col("qsketch").alias("_old_sk"),
                F.col("n").alias("_old_n"))
    merged = (delta.join(changed, group_cols, "left")
              .select(
                  *group_cols,
                  F.when(F.col("_old_sk").isNull(), F.col("qsketch"))
                  .otherwise(F.kll_sketch_merge_bigint("_old_sk", "qsketch"))
                  .alias("qsketch"),
                  (F.coalesce(F.col("_old_n"), F.lit(0)) + F.col("n"))
                  .alias("n")))
    return writer.replace_into(table_path, merged, match_cols=group_cols,
                               tag=tag)


def _run_ns(checkpoint_dir: str) -> str:
    """Stable namespace for epoch tags, derived from the checkpoint
    location. Structured Streaming epoch ids are scoped to the
    CHECKPOINT, not the table: a fresh checkpoint restarts them at 0, so
    a bare max-epoch guard would silently skip every batch until the new
    run's epoch_id overtook the old run's max (data loss, no error).
    Namespacing the tag per checkpoint makes the guard compare only
    epochs from the same run lineage."""
    import hashlib
    import os
    return hashlib.md5(
        os.path.abspath(checkpoint_dir).encode()).hexdigest()[:8]


def _last_epoch(writer: SnapshotWriter, table_path: str, ns: str) -> int:
    """Highest epoch-<ns>-N tag in the table's history (-1 if none)."""
    if not writer.exists(table_path):
        return -1
    prefix = f"epoch-{ns}-"
    last = -1
    for e in writer.history(table_path):
        for t in e.get("tags", []):
            if t.startswith(prefix):
                try:
                    last = max(last, int(t.rsplit("-", 1)[1]))
                except ValueError:
                    pass
    return last


def start_distinct_profile_stream(stream_df: DataFrame, table_path: str,
                                  group_cols: list[str], value_col: str,
                                  checkpoint_dir: str,
                                  lg_k: int = DEFAULT_LG_K):
    """Maintain an at-rest HLL distinct-count profile of a stream:
    each micro-batch is sketched at the (group_cols) grain and merged
    into the snapshot table at ``table_path``. Readers roll the profile
    up with operators/sketches.rollup_distinct — no history rescan."""
    spark = stream_df.sparkSession
    writer = SnapshotWriter(spark)
    ns = _run_ns(checkpoint_dir)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if epoch_id <= _last_epoch(writer, table_path, ns):
            return  # replayed epoch: already folded in (and idempotent)
        delta = distinct_profile(batch_df, group_cols, value_col, lg_k)
        merge_profile_into(writer, table_path, delta, group_cols,
                           tag=f"epoch-{ns}-{epoch_id}")

    return (
        stream_df.writeStream
        .foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_quantile_profile_stream(stream_df: DataFrame, table_path: str,
                                  group_cols: list[str], value_col: str,
                                  checkpoint_dir: str, k: int = 200):
    """Maintain an at-rest KLL quantile profile of a stream (same
    epoch-guarded commit discipline as the distinct profile; KLL merges
    are NOT idempotent — replaying a batch would double-count — so the
    guard is load-bearing here, not belt-and-braces)."""
    spark = stream_df.sparkSession
    writer = SnapshotWriter(spark)
    ns = _run_ns(checkpoint_dir)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if epoch_id <= _last_epoch(writer, table_path, ns):
            return
        delta = quantile_profile(batch_df, group_cols, value_col, k)
        merge_quantile_profile_into(writer, table_path, delta, group_cols,
                                    tag=f"epoch-{ns}-{epoch_id}")

    return (
        stream_df.writeStream
        .foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
