"""Product quantization: slicing, code ranges, ADC recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_subspace_slices_uneven():
    from gitnexus_spark.operators.pq import _subspace_slices

    s = _subspace_slices(10, 4)
    assert s == [(0, 3), (3, 6), (6, 8), (8, 10)]
    assert _subspace_slices(8, 4) == [(0, 2), (2, 4), (4, 6), (6, 8)]


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(11)
    n_clusters, per, d = 8, 100, 32
    rows = []
    for c in range(n_clusters):
        center = np.zeros(d)
        center[4 * c] = 1.0
        for i in range(per):
            v = center + rng.normal(0, 0.06, d)
            v = v / np.linalg.norm(v)      # cosine == dot after normalize
            rows.append((c * per + i, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").persist()


def test_pq_encode_shape_and_range(clustered):
    from gitnexus_spark.operators.pq import encode_pq, train_pq_codebooks

    books = train_pq_codebooks(clustered, m=8, k=16, iters=1)
    assert [s for s, _ in books] == list(range(8))
    assert all(len(b) == 16 for _, b in books)
    assert sum(len(b[0]) for _, b in books) == 32
    codes = encode_pq(clustered, books)
    sample = codes.limit(20).collect()
    for r in sample:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])


def test_pq_adc_recall_and_rerank(clustered):
    """Code-only ADC ranking cannot resolve noise-level within-cluster
    distances (8 bytes/vector) — its raw recall floor is modest by
    design. The production pattern, PQ shortlist + exact re-rank
    (pq_topk_rerank), must recover the exact top-k almost entirely:
    end-to-end recall equals shortlist recall."""
    from gitnexus_spark.operators.pq import (encode_pq, pq_topk,
                                             pq_topk_rerank,
                                             train_pq_codebooks)
    from gitnexus_spark.operators.similarity import brute_force_topk

    queries = clustered.filter("vec_id % 131 = 0").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    bf = {(r["q_id"], r["vec_id"])
          for r in brute_force_topk(clustered, queries, k=10).collect()}

    books = train_pq_codebooks(clustered, m=8, k=16, iters=2)
    codes = encode_pq(clustered, books)
    adc = {(r["q_id"], r["vec_id"])
           for r in pq_topk(codes, queries, books, k=10).collect()}
    adc_recall = len(bf & adc) / len(bf)
    assert adc_recall >= 0.3, f"raw ADC recall {adc_recall} below floor"

    rr = {(r["q_id"], r["vec_id"])
          for r in pq_topk_rerank(codes, clustered, queries, books,
                                  k=10, shortlist=100).collect()}
    rr_recall = len(bf & rr) / len(bf)
    assert rr_recall >= 0.9, f"re-ranked recall {rr_recall} below floor"
    assert rr_recall >= adc_recall


def test_pq_self_retrieval(clustered):
    """A corpus vector used as its own query lands in its PQ top-10 —
    quantization distortion stays within the cluster radius."""
    from gitnexus_spark.operators.pq import (encode_pq, pq_topk,
                                             train_pq_codebooks)

    books = train_pq_codebooks(clustered, m=8, k=16, iters=2)
    codes = encode_pq(clustered, books)
    queries = clustered.filter("vec_id IN (5, 205, 405)").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    got = pq_topk(codes, queries, books, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], set()).add(r["vec_id"])
    for q, ids in by_q.items():
        assert q in ids, (q, ids)
