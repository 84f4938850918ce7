"""End-to-end corpus preparation: one call chaining every hygiene gate.

A user of the engine prepares a training corpus by composing the
individual operators (quality -> repetition -> exact dedup -> near-dup
clustering -> test-set decontamination); `prepare_corpus` is that
composition as a single auditable decision table — one row per input
document with every signal value, a final ``kept`` flag, and the FIRST
gate that dropped it (``drop_reason``), which is what you chart when a
mix suddenly shrinks. (Reference analogue: the staged filter pipeline of
GitNexus's ingestion — `src/services/ingestion/pipeline.ts:155-251` runs
filters, dedup, then integrity checks in fixed order; this is the
corpus-scale generalization with per-row provenance.)

Gate semantics (staged universes, the standard order):
- quality gates (``low_quality``, ``repetitive``) are per-document.
- exact dedup picks keepers among quality survivors only (a duplicate
  of a dropped page should not be dropped as a "duplicate" of garbage).
- near-dup clustering runs over exact-dedup survivors. MinHash-LSH
  pair generation is pair-local (band hashes depend only on the two
  documents), so clustering the survivor subset equals clustering the
  full corpus and inducing the subgraph — the oracle exploits this.
- decontamination is per-document; it is checked last so a document
  dropped as a duplicate reports the dedup reason.

Scale notes (100 TB posture): every join here is keyed on the doc id
(co-partitioned chain, AQE coalesces), the quality/repetition signals
are scan-local or partial-agg'd, dedup shuffles on content hash / band
hash (uniform), and the eval gram set broadcasts. Nothing in the
composition adds a shuffle beyond what the component operators already
cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import quality_agg, repetition_stats
from .dedup import decontaminate, near_dup_clusters


def prepare_corpus(docs: DataFrame, eval_df: DataFrame,
                   id_col: str = "doc_id", text_col: str = "text",
                   min_quality: float = 0.30, max_dup_line: float = 0.30,
                   max_top_gram: float = 0.10, num_hashes: int = 16,
                   bands: int = 8, shingle_n: int = 3,
                   decontam_n: int = 4) -> DataFrame:
    """Per-document corpus-prep decision table.

    Returns (id_col, quality, dup_line_frac, top_gram_frac, eval_hits,
    kept, drop_reason); ``filter(kept == 1)`` is the prepared corpus,
    ``groupBy(drop_reason).count()`` is the loss report.
    """
    # quality via the codegen token-stream aggregation (same values as
    # with_quality_score — see functions/text.py quality_agg)
    base = (
        docs.select(id_col, text_col)
        .join(quality_agg(docs.select(id_col, text_col), id_col, text_col),
              id_col)
        .join(repetition_stats(docs, id_col, text_col)
              .select(id_col, "dup_line_frac", "top_gram_frac"), id_col)
    )
    low_q = F.col("quality") < min_quality
    repet = (F.col("dup_line_frac") > max_dup_line) | \
        (F.col("top_gram_frac") > max_top_gram)
    surv1 = base.filter(~low_q & ~repet)

    # exact dedup among quality survivors: first-writer (min id) wins
    w = Window.partitionBy(F.md5(F.col(text_col)))
    exact = surv1.select(
        id_col,
        (F.col(id_col) != F.min(id_col).over(w)).cast("int")
        .alias("is_exact_dup"),
    )
    surv2 = surv1.join(exact.filter("is_exact_dup = 0"), id_col) \
        .select(id_col, text_col)

    near = near_dup_clusters(surv2, id_col, text_col, num_hashes, bands,
                             shingle_n).select(id_col, "is_keeper")

    dec = decontaminate(docs, eval_df, id_col, text_col,
                        shingle_n=decontam_n).select(id_col, "eval_hits")

    out = (
        base.select(id_col, "quality", "dup_line_frac", "top_gram_frac")
        .join(exact, id_col, "left")
        .join(near, id_col, "left")
        .join(dec, id_col, "left")
    )
    reason = (
        F.when(low_q, "low_quality")
        .when(repet, "repetitive")
        .when(F.col("is_exact_dup") == 1, "exact_dup")
        .when(F.col("is_keeper") == 0, "near_dup")
        .when(F.col("eval_hits") >= 1, "contaminated")
    )
    return out.select(
        id_col, "quality", "dup_line_frac", "top_gram_frac",
        F.coalesce("eval_hits", F.lit(0)).alias("eval_hits"),
        reason.isNull().cast("int").alias("kept"),
        reason.alias("drop_reason"),
    )
