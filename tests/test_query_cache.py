"""Query-result cache: exact and paraphrase reuse at the reference's
thresholds, ranked suggestions, eviction, and concurrent-driver safety
via the manifest lock (ref src/lib/query-cache.ts)."""

import pytest
from pyspark.sql import functions as F

from gitnexus_spark.plans.query_cache import QueryCache, _qhash


@pytest.fixture()
def cache(spark, tmp_path):
    return QueryCache(spark, str(tmp_path / "qc"))


def _df(spark, n):
    return spark.range(0, n).select(F.col("id"), (F.col("id") * 2).alias("v"))


def test_exact_and_paraphrase_reuse(spark, cache):
    runs = []

    def builder():
        runs.append(1)
        return _df(spark, 10)

    q = "which customers ordered the most items"
    out, hit = cache.get_or_run(q, "SELECT ...", builder)
    assert not hit and out.count() == 10 and len(runs) == 1

    # exact repeat: served from the materialized result, builder not run
    out2, hit2 = cache.get_or_run(q, "SELECT ...", builder)
    assert hit2 and len(runs) == 1
    assert sorted(r["v"] for r in out2.collect()) == list(range(0, 20, 2))

    # paraphrase above the 0.8 best-query bar: also a hit
    out3, hit3 = cache.get_or_run(
        "which customers ordered the most", "SELECT ...", builder)
    assert hit3 and len(runs) == 1

    # unrelated question: miss, builder runs
    _, hit4 = cache.get_or_run(
        "total revenue by region last year", "SELECT ...",
        lambda: _df(spark, 3))
    assert not hit4 and len(runs) == 1


def test_suggestions_ranked_and_gated(spark, cache):
    cache.add("count pages per domain", "Q1", confidence=0.9)
    cache.add("count pages per domain name", "Q2", confidence=0.95)
    cache.add("count pages per domain right now", "Q3",
              confidence=0.2)  # below minConfidence=0.6 -> excluded
    cache.add("shortest path between two urls", "Q4", confidence=0.9)

    got = cache.find_similar("count pages per domain")
    queries = [e["query"] for e in got]
    assert "Q3" not in queries and "Q4" not in queries
    assert queries[0] == "Q1"  # exact text: similarity 1.0 wins
    # ranked by similarity * confidence, all >= 0.7 similarity
    scores = [e["similarity"] * e["confidence"] for e in got]
    assert scores == sorted(scores, reverse=True)
    assert all(e["similarity"] >= 0.7 for e in got)


def test_failed_queries_never_suggested(spark, cache):
    cache.add("how many nodes", "BAD", confidence=0.9, success=False)
    assert cache.find_similar("how many nodes") == []


def test_eviction_drops_oldest_and_its_result(spark, tmp_path):
    import os
    cache = QueryCache(spark, str(tmp_path / "qc"), max_entries=2)
    cache.add("first question asked", "Q1", result=_df(spark, 2))
    p1 = cache._load()[_qhash("first question asked")]["result_path"]
    cache.add("second question asked", "Q2")
    cache.add("third question asked", "Q3")
    entries = cache._load()
    assert len(entries) == 2
    assert _qhash("first question asked") not in entries
    assert not os.path.exists(p1)  # evicted entry's rows reclaimed


def test_manifest_survives_new_instance(spark, tmp_path):
    d = str(tmp_path / "qc")
    QueryCache(spark, d).add("persisted question", "Q", result=_df(spark, 4))
    again = QueryCache(spark, d)
    hit = again.best("persisted question")
    assert hit is not None and again.result_of(hit).count() == 4
    s = again.stats()
    assert s["total_queries"] == 1 and s["successful_queries"] == 1
