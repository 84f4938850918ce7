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
           ivf_topk(emb, queries, k=10, n_cells=16, n_probe=4).collect()}
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.8, f"IVF recall {recall} below floor"


def test_near_dup_pairs_symmetric_canonical(spark):
    from gitnexus_spark.operators.similarity import embedding_near_dup_pairs

    rows = [(1, [1.0, 0.0, 0.0]), (2, [0.999, 0.01, 0.0]), (3, [0.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    pairs = embedding_near_dup_pairs(df, threshold=0.95, n_cells=2).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
