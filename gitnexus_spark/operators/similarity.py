"""Similarity search over embedding columns (array<float>).

Baseline: exact brute-force cosine top-k (small query set x large corpus
— the corpus side stays distributed; queries broadcast).
Scale path: IVF-flat — deterministic leader-based cells; queries probe
the nearest `n_probe` cells only, cutting the scanned fraction to
~n_probe/n_cells while keeping recall high.

Arithmetic is explicit left-to-right double folds (F.aggregate over
zip_with) so the DuckDB oracle (same fold in list_sum/list_transform)
reproduces values bit-for-bit; user-facing scores round to 6 dp.
Related reference math: TF-IDF cosine in semantic-similarity.ts:23-59
(driver-side JS there; distributed + vectorized here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)"
NORM = "sqrt(aggregate({a}, cast(0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))"


def cosine_expr(a: str, b: str) -> F.Column:
    return F.expr(
        f"({DOT.format(a=a, b=b)}) / (({NORM.format(a=a)}) * ({NORM.format(a=b)}))"
    )


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Exact top-k by cosine: (q_id, vec_id, score, rank).

    queries is expected to be small -> broadcast nested-loop join; the
    corpus scan is the only pass over big data. Ties break on vec_id ASC
    (total order, deterministic under any parallelism).
    """
    joined = corpus.select(id_col, vec_col).crossJoin(
        F.broadcast(queries.select(q_id_col, q_vec_col))
    )
    scored = joined.withColumn("score", F.round(cosine_expr(vec_col, q_vec_col), 6))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "score", "rank")
    )


def ivf_assign(corpus: DataFrame, n_cells: int = 16,
               id_col: str = "vec_id", vec_col: str = "embedding",
               n_assign: int = 1) -> tuple[DataFrame, DataFrame]:
    """IVF-flat index build: deterministic leaders + cell assignment.

    Leaders = the n_cells corpus vectors with smallest ids (deterministic
    "sample"; k-means would drift across runs — determinism wins for a
    resumable pipeline; swap in k-means|| offline if recall needs it).
    Each vector joins its n_assign argmax-cosine leaders (n_assign > 1 =
    multi-assignment, closing the boundary-recall gap for pairwise ops at
    n_assign-x storage). Returns (leaders, assigned).
    The leader set is tiny -> broadcast; assignment is one corpus scan.
    """
    leaders = (
        corpus.select(F.col(id_col).alias("cell_id"), F.col(vec_col).alias("cell_vec"))
        .orderBy("cell_id").limit(n_cells)
    )
    scored = corpus.select(id_col, vec_col).crossJoin(F.broadcast(leaders)) \
        .withColumn("cs", cosine_expr(vec_col, "cell_vec"))
    w = Window.partitionBy(id_col).orderBy(F.desc("cs"), F.asc("cell_id"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_assign)
        .select(id_col, vec_col, "cell_id")
    )
    return leaders, assigned


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_cells: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """ANN top-k: probe the n_probe nearest cells per query, exact search
    within. At scale the assigned table is written bucketed by cell_id so
    a probe touches only matching buckets (partition pruning)."""
    leaders, assigned = ivf_assign(corpus, n_cells, id_col, vec_col)

    q_cells = queries.select(q_id_col, q_vec_col).crossJoin(F.broadcast(leaders)) \
        .withColumn("cs", cosine_expr(q_vec_col, "cell_vec"))
    wq = Window.partitionBy(q_id_col).orderBy(F.desc("cs"), F.asc("cell_id"))
    probes = (
        q_cells.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select(q_id_col, q_vec_col, "cell_id")
    )
    cand = assigned.join(probes, "cell_id")
    scored = cand.withColumn("score", F.round(cosine_expr(vec_col, q_vec_col), 6))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "score", "rank")
    )


def embedding_near_dup_pairs(corpus: DataFrame, threshold: float = 0.95,
                             n_cells: int = 16,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, score >= t).

    Blocked through IVF cells with 2-way multi-assignment (each vector
    lives in its two nearest cells, so near-identical vectors that are
    both leaders still co-occur) — the embedding analogue of LSH banding.
    Raise recall further by lowering n_cells.
    """
    _, assigned = ivf_assign(corpus, n_cells, id_col, vec_col, n_assign=2)
    a = assigned.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "cell_id")
    b = assigned.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "cell_id")
    return (
        a.join(b, "cell_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("score", F.round(cosine_expr("va", "vb"), 6))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )
