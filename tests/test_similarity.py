"""Similarity search: brute-force exactness, IVF recall, near-dup pairs."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter("vec_id < 3").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))


def test_self_is_top1(emb, queries):
    from gitnexus_spark.operators.similarity import brute_force_topk

    top = brute_force_topk(emb, queries, k=1).collect()
    for r in top:
        assert r["vec_id"] == r["q_id"]
        assert r["score"] == 1.0


def test_brute_force_matches_numpy(emb, queries):
    import numpy as np

    from gitnexus_spark.operators.similarity import brute_force_topk

    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    got = brute_force_topk(emb, queries, k=5).collect()
    for r in got:
        q, v = vecs[r["q_id"]], vecs[r["vec_id"]]
        expected = float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
        assert abs(r["score"] - expected) < 1e-5


def test_ivf_recall_vs_brute_force(emb, queries):
    from gitnexus_spark.operators.similarity import brute_force_topk, ivf_topk

    bf = {(r["q_id"], r["vec_id"]) for r in brute_force_topk(emb, queries, k=10).collect()}
    ivf = {(r["q_id"], r["vec_id"]) for r in
           ivf_topk(emb, queries, k=10, n_cells=16, n_probe=6).collect()}
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.8, f"IVF recall {recall} below floor"


def test_ivf_scaled_defaults_recall_sf01(spark):
    """VERDICT r02 #5 'done' criterion: at sf0.1 and the SCALED defaults
    (n_cells = floor(sqrt(n)), stratified md5-sampled leaders, n_probe =
    floor(sqrt(n_cells))), recall vs brute force stays above the floor."""
    from gitnexus_spark.operators.similarity import (brute_force_topk,
                                                     default_n_cells,
                                                     default_n_probe,
                                                     ivf_topk,
                                                     select_leaders)

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n = emb.count()
    assert default_n_cells(n) == 44  # floor(sqrt(2000))
    assert default_n_probe(44) == 12  # 2 * floor(sqrt(44))
    leaders = [r["cell_id"] for r in select_leaders(emb, 44).collect()]
    # stratified, not head-of-table: leaders spread across the id space
    assert max(leaders) > n // 2 and len(set(leaders)) == 44

    queries = emb.filter("vec_id % 401 = 0").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    bf = {(r["q_id"], r["vec_id"])
          for r in brute_force_topk(emb, queries, k=10).collect()}
    ivf = {(r["q_id"], r["vec_id"])
           for r in ivf_topk(emb, queries, k=10).collect()}
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.6, f"scaled-IVF recall {recall} below floor"


def test_ivf_at_rest_pruned_and_consistent(spark, emb, queries, tmp_path):
    """write_ivf_index + ivf_topk_at_rest: same answers as the in-memory
    path (same leaders/params), and the probe scan PRUNES to the probed
    cell directories (static partition filter — no full-index read)."""
    import contextlib
    import io
    import os

    from gitnexus_spark.operators.similarity import (default_n_probe,
                                                     ivf_topk,
                                                     ivf_topk_at_rest,
                                                     write_ivf_index)

    idx = str(tmp_path / "ivf")
    write_ivf_index(emb, idx, n_cells=16, n_assign=2)
    n_cells_on_disk = len([d for d in os.listdir(os.path.join(idx, "assigned"))
                           if d.startswith("cell_id=")])
    got = ivf_topk_at_rest(spark, idx, queries, k=5, n_probe=6)
    want = {(r["q_id"], r["rank"]): r["vec_id"] for r in
            ivf_topk(emb, queries, k=5, n_cells=16, n_probe=6,
                     n_assign=2).collect()}
    assert {(r["q_id"], r["rank"]): r["vec_id"]
            for r in got.collect()} == want

    assert n_cells_on_disk >= 2  # layout is actually partitioned

    # a narrow probe (1 query, n_probe=2) must reach the scan as a
    # partition filter over at most 2 of the 16 cell directories
    one_q = queries.limit(1)
    narrow = ivf_topk_at_rest(spark, idx, one_q, k=5, n_probe=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        narrow.explain("formatted")
    plan = buf.getvalue()
    import re
    m = re.search(r"PartitionFilters: \[cell_id#\d+L? IN \(([^)]*)\)", plan)
    assert m, plan
    assert len(m.group(1).split(",")) <= 2


def test_leader_selection_no_driver_merge_of_vectors(spark):
    """VERDICT r03 what's-wrong #2 'done' criterion: leader selection
    must not route embedding rows through a global sort/TakeOrdered.
    The threshold-predicate plan: the TakeOrdered branch scans ONLY the
    id column AND is pre-filtered by the fold bound (so it merges ~8 x
    n_cells id rows, not partitions x n_cells vector rows); the vector
    scan appears once, join-pruned to the broadcast winner ids."""
    import contextlib
    import io
    import re

    from gitnexus_spark.operators.similarity import (FOLD_MAX,
                                                     select_leaders)

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n, n_cells = 2000, 44
    leaders = select_leaders(emb, n_cells, n_rows=n)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        leaders.explain("formatted")
    plan = buf.getvalue()

    assert "TakeOrderedAndProject" in plan
    # scan feeding the sort: id-only ReadSchema (no embedding bytes)
    id_only_scans = re.findall(r"ReadSchema: struct<vec_id:bigint>$",
                               plan, re.M)
    assert id_only_scans, plan
    # the fold bound reaches BOTH branches as a filter (the sort input
    # is ~8*n_cells ids; the vector scan is pruned the same way)
    bound = int(FOLD_MAX * (8.0 * n_cells / n))
    assert plan.count(f"< {bound}") >= 2, plan
    # and the selected set is exactly the old rule: lowest n_cells folds
    assert leaders.count() == n_cells


def test_near_dup_pairs_symmetric_canonical(spark):
    from gitnexus_spark.operators.similarity import embedding_near_dup_pairs

    rows = [(1, [1.0, 0.0, 0.0]), (2, [0.999, 0.01, 0.0]), (3, [0.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    pairs = embedding_near_dup_pairs(df, threshold=0.95, n_cells=2).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_partition_topk_bounds_exchange_volume(spark):
    """VERDICT r02 #4 'done' criterion: the pre-merge stage emits at most
    #partitions x #queries x k rows — the exchange after it can never
    carry the full scored product."""
    import pandas as pd
    from pyspark.sql import functions as F

    from gitnexus_spark.operators.similarity import (_partition_topk,
                                                     brute_force_topk)

    n, parts, k, nq = 5000, 8, 5, 3
    corpus = spark.range(n).repartition(parts).select(
        F.col("id").alias("vec_id"),
        F.array(F.col("id").cast("double") % 17,
                F.lit(1.0), (F.col("id") % 7).cast("double")).alias("embedding"))
    queries = spark.createDataFrame(
        [(q, [float(q + 1), 1.0, float(q)]) for q in range(nq)],
        ["q_id", "q_vec"])
    from gitnexus_spark.operators.similarity import cosine_expr
    scored = (corpus.crossJoin(F.broadcast(queries))
              .withColumn("score", F.round(cosine_expr("embedding", "q_vec"), 6))
              .select("q_id", "vec_id", "score"))
    local = _partition_topk(scored, k, "q_id", "vec_id")
    n_local = local.count()
    assert n_local <= parts * nq * k
    assert n_local >= nq * k  # every query still has enough candidates

    # end-to-end result identical to a driver-side exact reference
    got = brute_force_topk(corpus, queries, k=k).toPandas()
    ref = scored.toPandas()
    for q in range(nq):
        sub = ref[ref.q_id == q].sort_values(
            ["score", "vec_id"], ascending=[False, True]).head(k)
        g = got[got.q_id == q].sort_values("rank")
        assert list(g.vec_id) == list(sub.vec_id)


def test_lloyd_trained_leaders_beat_sampled(spark):
    """train_leaders (Lloyd refinement, VERDICT r03 missing #4): on a
    clustered corpus where a stratified id-sample seeds some clusters
    with 0 leaders and others with 2+, two training rounds move the
    centroids onto the clusters and recall at n_probe=2 rises above the
    sampled baseline. Deterministic: fixed numpy seed, well-separated
    clusters (no argmax ties for float-sum ordering to flip)."""
    import numpy as np

    from gitnexus_spark.operators.similarity import (brute_force_topk,
                                                     ivf_topk,
                                                     train_leaders)

    rng = np.random.default_rng(7)
    n_clusters, per, d = 16, 100, 32
    rows = []
    for c in range(n_clusters):
        center = np.zeros(d)
        center[2 * c] = 1.0         # orthogonal cluster axes
        for i in range(per):
            v = center + rng.normal(0, 0.08, d)
            rows.append((c * per + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    emb = emb.persist()
    queries = emb.filter("vec_id % 157 = 0").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    bf = {(r["q_id"], r["vec_id"])
          for r in brute_force_topk(emb, queries, k=5).collect()}

    def recall(leader_rows):
        ivf = {(r["q_id"], r["vec_id"])
               for r in ivf_topk(emb, queries, k=5, n_probe=2, n_assign=1,
                                 leader_rows=leader_rows).collect()}
        return len(bf & ivf) / len(bf)

    seeded = train_leaders(emb, n_cells=n_clusters, iters=0)
    trained = train_leaders(emb, n_cells=n_clusters, iters=2)
    # same cell-id universe: retraining never disturbs at-rest layouts
    assert [c for c, _ in trained] == [c for c, _ in seeded]
    r_seed, r_train = recall(seeded), recall(trained)
    assert r_train >= r_seed, (r_seed, r_train)
    assert r_train >= 0.9, f"trained recall {r_train}"
    emb.unpersist()
