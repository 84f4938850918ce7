"""Inverted search index: result parity with the scan-based search for
multiple needle shapes, and partition pruning visible in the plan."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from gitnexus_spark.operators.graph_queries import search_nodes
from gitnexus_spark.operators.search_index import (build_search_index,
                                                   search_with_index)


@pytest.fixture(scope="module")
def nodes(spark):
    rows = [(f"n{i}", "Page", f"page{i}", f"https://s.org/a/p{i}.html")
            for i in range(200)]
    rows += [("e1", "Entity", "Acme Corp", None),
             ("e2", "Entity", "Acme Labs", None),
             ("e3", "Entity", "Zorg", None)]
    return spark.createDataFrame(
        rows, "id string, label string, name string, url string")


@pytest.fixture(scope="module")
def index_dir(spark, nodes, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sidx") / "index")
    build_search_index(nodes, d, n_buckets=16)
    return d


@pytest.mark.parametrize("needle", [
    "p42.html", "acme", "Acme Corp", "zorg", "s.org/a/p7", "absent-term",
    "p7", "7."])
def test_parity_with_scan_search(spark, nodes, index_dir, needle):
    got = {r["id"] for r in
           search_with_index(spark, nodes, index_dir, needle).collect()}
    want = {r["id"] for r in search_nodes(nodes, needle).collect()}
    assert got == want


def test_partition_pruning_in_plan(spark, nodes, index_dir):
    df = search_with_index(spark, nodes, index_dir, "zorg")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the index scan must carry a static partition filter on bucket
    assert "PartitionFilters" in plan
    import re
    m = re.search(r"PartitionFilters: \[[^\]]*bucket[^\]]*\]", plan)
    assert m, plan


def test_short_needle_falls_back_to_scan(spark, nodes, index_dir):
    # < 3 chars: no trigram — scan fallback, still exact
    got = {r["id"] for r in
           search_with_index(spark, nodes, index_dir, "p4").collect()}
    want = {r["id"] for r in search_nodes(nodes, "p4").collect()}
    assert got == want and len(want) > 0
