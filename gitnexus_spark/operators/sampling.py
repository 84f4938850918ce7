"""Training-data corpus assembly: deterministic stratified sampling and
token-budget sequence packing.

Both are the last mile of a web-scale pipeline: after dedup/quality
filtering, a training mix takes a WEIGHTED sample per stratum (source,
language, quality band) and packs the survivors into fixed-token-budget
sequences. Neither exists in the reference (its corpus fits in a
browser tab); both are first-class here because at 100 TB they decide
the shape of every downstream job.

Scale posture:
- sampling is a scan-local filter on an md5 fold of the row id — zero
  shuffles, exact reproducibility across runs/retries (same fold family
  as dedup/IVF leader selection, so the DuckDB oracle replays it
  bit-exactly);
- packing is ONE window shuffle keyed by the stratum column — the same
  partitioning the writer uses (partitionBy source), so at rest the
  exchange is often already in place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FOLD_MAX = 1 << 60  # md5-fold values are uniform in [0, 2^60)


def fold_expr(id_col: str) -> F.Column:
    """Uniform deterministic 60-bit fold of the row id — the shared
    sampling primitive (dedup.py minhash, similarity.py leader order)."""
    return F.expr(
        f"cast(conv(substring(md5(cast({id_col} as string)), 1, 15), 16, 10)"
        " as bigint)")


def stratified_sample(df: DataFrame, key_col: str, fractions: dict,
                      id_col: str, default: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sample: keep a row iff
    fold(id) < fraction[stratum] * 2^60.

    The mix recipe (`fractions`: stratum value -> keep rate, e.g.
    {"wiki": 1.0, "crawl": 0.1}) rides the plan as a literal CASE (a
    handful of strata by construction — a mix spec is human-written),
    so sampling is a scan-local filter: no shuffle, no RNG state, and
    the SAME rows survive on retry, resume, or a different cluster —
    what monotonically seeded `df.sample` cannot promise. Strata absent
    from the recipe keep `default` (drop, by convention of a mix spec).
    P[keep] is exact in expectation per stratum; realized counts are
    Binomial-tight (the fold is uniform).
    """
    frac = F.lit(float(default))
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(key_col) == F.lit(k), F.lit(float(v))) \
            .otherwise(frac)
    return df.filter(fold_expr(id_col) < (frac * F.lit(float(FOLD_MAX))))


def pack_sequences(df: DataFrame, part_col: str, order_col: str,
                   token_col: str, budget: int) -> DataFrame:
    """Contiguous greedy sequence packing: within each stratum, walk the
    rows in `order_col` order and open a new sequence whenever the
    cumulative token count would cross `budget`.

    seq_id = floor((cumsum_before) / budget) on the running token sum —
    the standard streaming-concat packing of LM training pipelines
    (documents are concatenated in corpus order and split every
    `budget` tokens; a document longer than the budget still advances
    the counter, landing alone in its span). Emits (seq_id, seq_offset)
    per row: seq_offset is where the row starts inside its sequence's
    token span.

    ONE shuffle (window partitioned by `part_col`, ordered by
    `order_col`); at 10^12 docs the stratum must not be a single hot
    key — pack per (source, shard) like the writer partitions, which
    this signature expresses directly.
    """
    w = Window.partitionBy(part_col).orderBy(order_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum(F.col(token_col)).over(w)
    before = cum - F.col(token_col)
    return df.withColumn("seq_id", F.floor(before / F.lit(budget))) \
             .withColumn("seq_offset", before - F.col("seq_id") * F.lit(budget))
