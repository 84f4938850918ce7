"""Incremental re-ingest through passes 3/4 (VERDICT r03 missing #2,
reference trie.ts:228-254): a re-crawled url that renames an entity must
flip the MENTIONS edge and the Entity node WITHOUT a full pipeline
re-run — and the refreshed graph must equal a from-scratch rebuild on
the updated corpus."""

import os

import pytest
from pyspark.sql import functions as F


def _pipeline_tables(spark, out, pages, writer=None):
    from gitnexus_spark.plans.pipeline import KGPipeline
    from gitnexus_spark.synthetic import alias_dictionary

    return KGPipeline(spark, out, alias_dict=alias_dictionary(spark),
                      writer=writer).run(pages)


def _node_set(df):
    return {(r["id"], r["label"], r["name"], r["url"])
            for r in df.collect()}


def _edge_set(df):
    return {(r["id"], r["type"], r["src"], r["dst"]) for r in df.collect()}


def _resolved_set(df):
    return {(r["doc_url"], r["pred"], r["subj"], r["obj"],
             r["subj_stage"], r["obj_stage"]) for r in df.collect()}


@pytest.fixture(scope="module")
def base(spark, sf_dir, tmp_path_factory):
    """A 40-page KG built with the snapshot writer + the page picked for
    re-crawl (doc 1: canonical subject 'Entity_1')."""
    from gitnexus_spark.sources.snapshots import SnapshotWriter
    from gitnexus_spark.synthetic import synth_pages

    out = str(tmp_path_factory.mktemp("kg") / "t")
    # deterministic subset (limit() picks arbitrary rows): docs 0..39
    pages = synth_pages(spark, sf_dir).filter(
        F.regexp_extract("url", r"p(\d+)\.html$", 1).cast("int") < 40
    ).localCheckpoint()
    w = SnapshotWriter(spark)
    _pipeline_tables(spark, out, pages, writer=w)
    target = pages.filter(F.col("url").endswith("/p1.html")).collect()[0]
    return {"out": out, "pages": pages, "w": w, "row": target}


def _recrawl_row(spark, row, new_text):
    import datetime as dt

    from gitnexus_spark.synthetic import render_html

    html = render_html(1, row["url"], new_text, [])
    return spark.createDataFrame(
        [(row["url"], row["warc_ts"] + dt.timedelta(days=1), html,
          new_text, row["lang"])],
        "url string, warc_ts timestamp, html binary, text string,"
        " lang string")


def test_rename_flips_edge_and_node_and_matches_full_rebuild(
        spark, base, tmp_path):
    from gitnexus_spark.functions.ids import node_id
    from gitnexus_spark.plans.pipeline import integrity_checks
    from gitnexus_spark.plans.refresh import refresh_from_batch
    from gitnexus_spark.synthetic import alias_dictionary

    import shutil

    out = str(tmp_path / "kg")      # work on a copy: base stays pristine
    shutil.copytree(base["out"], out)
    w, row = base["w"], base["row"]
    new_text = "Entity_Zz9 founded Entity_20."
    batch = _recrawl_row(spark, row, new_text)

    stats = refresh_from_batch(spark, out, batch,
                               alias_dict=alias_dictionary(spark))
    assert stats["docs"] == 1

    nodes = w.read(os.path.join(out, "nodes"))
    edges = w.read(os.path.join(out, "edges"))

    # the renamed entity exists as a node, and THIS page mentions it
    new_id = spark.range(1).select(
        node_id("Entity", F.lit("Entity_Zz9"))).collect()[0][0]
    page_id = spark.range(1).select(
        node_id("Page", F.lit(row["url"]))).collect()[0][0]
    assert nodes.filter(F.col("id") == new_id).count() == 1
    assert edges.filter((F.col("type") == "MENTIONS")
                        & (F.col("src") == page_id)
                        & (F.col("dst") == new_id)).count() == 1

    # graph integrity still holds after the keyed surgery
    ic = integrity_checks(nodes, edges)
    assert all(v == 0 for v in ic.values()), ic

    # ground truth: a full rebuild over the updated corpus produces the
    # SAME nodes / edges / resolved triples (confidence excluded: the
    # batch dedup keeps an arbitrary supporting row's confidence)
    updated = (base["pages"].filter(F.col("url") != row["url"])
               .unionByName(batch))
    full = _pipeline_tables(spark, str(tmp_path / "rebuild"), updated)
    assert _node_set(nodes) == _node_set(full["nodes"])
    assert _edge_set(edges) == _edge_set(full["edges"])
    assert _resolved_set(w.read(os.path.join(out, "triples_resolved"))) \
        == _resolved_set(full["triples_resolved"])

    # every derived table advanced as snapshots (time travel to the
    # pre-refresh graph still works)
    hist = w.history(os.path.join(out, "edges"))
    assert len(hist) == 2
    pre = w.read(os.path.join(out, "edges"), snapshot_id=1)
    assert pre.filter((F.col("src") == page_id)
                      & (F.col("dst") == new_id)).count() == 0


def test_new_url_appends_through_all_passes(spark, base, tmp_path):
    """A url first seen in the refresh batch lands as a Page node with
    structure, mentions, and predicate edges — equal to a full rebuild
    (no unchanged page links TO it, so the documented inbound-link
    staleness does not apply)."""
    import datetime as dt

    from gitnexus_spark.plans.refresh import refresh_from_batch
    from gitnexus_spark.synthetic import alias_dictionary, render_html

    import shutil

    out = str(tmp_path / "kg")
    shutil.copytree(base["out"], out)
    w, row = base["w"], base["row"]
    url = row["url"].replace("/p1.html", "/p90001.html")
    text = "Entity_3 endorsed Entity_20."
    batch = spark.createDataFrame(
        [(url, row["warc_ts"] + dt.timedelta(days=2),
          render_html(90001, url, text, []), text, row["lang"])],
        "url string, warc_ts timestamp, html binary, text string,"
        " lang string")
    refresh_from_batch(spark, out, batch,
                       alias_dict=alias_dictionary(spark))

    nodes = w.read(os.path.join(out, "nodes"))
    assert nodes.filter((F.col("label") == "Page")
                        & (F.col("url") == url)).count() == 1

    updated = base["pages"].unionByName(batch)
    full = _pipeline_tables(spark, str(tmp_path / "rebuild2"), updated)
    assert _node_set(nodes) == _node_set(full["nodes"])
    assert _edge_set(w.read(os.path.join(out, "edges"))) \
        == _edge_set(full["edges"])
