"""Export sinks (S5/S6) and blended text similarity (X10)."""

import glob

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame(
        [("n1", "Page", 'has "quotes", commas', "u1"),
         ("n2", "Entity", "Acme", None)],
        "id string, label string, name string, url string")
    edges = spark.createDataFrame(
        [("e1", "MENTIONS", "n1", "n2")],
        "id string, type string, src string, dst string")
    return nodes, edges


def test_export_json(graph, tmp_path, spark):
    from gitnexus_spark.sources.export import export_graph_json

    nodes, edges = graph
    export_graph_json(nodes, edges, str(tmp_path))
    back = spark.read.json(f"{tmp_path}/nodes")
    assert back.count() == 2
    meta = spark.read.json(f"{tmp_path}/metadata").collect()[0]
    assert meta["node_count"] == 2 and meta["relationship_count"] == 1


def test_export_csv_neo4j_headers_and_quoting(graph, tmp_path, spark):
    from gitnexus_spark.sources.export import export_graph_csv

    nodes, edges = graph
    export_graph_csv(nodes, edges, str(tmp_path))
    files = glob.glob(f"{tmp_path}/nodes_csv/*.csv")
    text = "".join(open(f).read() for f in files)
    assert ":ID" in text and ":LABEL" in text
    # RFC-4180: embedded quotes doubled, field quoted (export.ts:149-158)
    assert '"has ""quotes"", commas"' in text
    efiles = glob.glob(f"{tmp_path}/edges_csv/*.csv")
    etext = "".join(open(f).read() for f in efiles)
    assert ":START_ID" in etext and ":TYPE" in etext and ":END_ID" in etext


def test_blended_similarity_bounds_and_identity(spark):
    from gitnexus_spark.functions.similarity_text import blended_similarity

    pairs = spark.createDataFrame(
        [("same text here", "same text here"),
         ("alpha beta gamma", "delta epsilon zeta"),
         ("the quick brown fox", "the quick brown cat"),
         ("", "")],
        ["text_a", "text_b"])
    rows = blended_similarity(pairs).collect()
    by = {(r["text_a"], r["text_b"]): r for r in rows}
    ident = by[("same text here", "same text here")]
    assert ident["similarity"] == 1.0
    disjoint = by[("alpha beta gamma", "delta epsilon zeta")]
    assert disjoint["jaccard"] == 0.0 and disjoint["cosine"] == 0.0
    near = by[("the quick brown fox", "the quick brown cat")]
    assert 0.5 < near["similarity"] < 1.0
    empty = by[("", "")]
    assert empty["jaccard"] == 1.0 and empty["lev_sim"] == 1.0


def test_blended_weights_sum(spark):
    from gitnexus_spark.functions.similarity_text import (W_COSINE, W_JACCARD,
                                                          W_LEVENSHTEIN)

    assert abs(W_JACCARD + W_COSINE + W_LEVENSHTEIN - 1.0) < 1e-12
