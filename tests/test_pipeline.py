"""End-to-end four-pass pipeline: correctness, integrity, resume.

The expected-triples oracle here recomputes the golden set by formula
(synthetic.py's arithmetic), i.e. TRUE output parity — the thing the
reference's dual-track validation never checked (SURVEY §5).
"""

import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def pipeline_out(spark, sf_dir, tmp_path_factory):
    from gitnexus_spark.plans.pipeline import KGPipeline
    from gitnexus_spark.synthetic import alias_dictionary, synth_pages

    out_dir = str(tmp_path_factory.mktemp("kg"))
    pages = synth_pages(spark, sf_dir)
    pipe = KGPipeline(spark, out_dir, alias_dict=alias_dictionary(spark))
    out = pipe.run(pages)
    yield out, out_dir, pages
    shutil.rmtree(out_dir, ignore_errors=True)


def test_integrity_all_zero(pipeline_out):
    from gitnexus_spark.plans.pipeline import integrity_checks

    out, _, _ = pipeline_out
    checks = integrity_checks(out["nodes"], out["edges"])
    assert checks == {k: 0 for k in checks}


def test_entity_canonicalization_complete(pipeline_out):
    out, _, _ = pipeline_out
    ents = out["nodes"].filter(F.col("label") == "Entity")
    # all surface variants merge into the 97 canonical entities (E0..E96)
    assert ents.count() == 97
    names = {r["name"] for r in ents.select("name").collect()}
    assert names == {f"E{k}" for k in range(97)}


def test_resolved_triples_match_formula_oracle(spark, pipeline_out):
    """P/R == 1.0 vs the golden triple set derived from generation arithmetic."""
    out, _, pages = pipeline_out
    n = pages.count()
    expected = []
    preds = ["founded", "acquired", "endorsed", "criticized", "visited"]
    for d in range(n):
        k1, k2, k3 = d % 97, (d * 7 + 13) % 97, (d * 31 + 5) % 97
        expected.append((f"E{k1}", preds[d % 5], f"E{k2}"))
        if d % 3 == 0:
            expected.append((f"E{k1}", "acquired", f"E{k2}"))
            expected.append((f"E{k1}", "acquired", f"E{k3}"))
    got = [(r["subj"], r["pred"], r["obj"])
           for r in out["triples_resolved"].select("subj", "pred", "obj").collect()]
    assert sorted(got) == sorted(expected)


def test_all_stages_resolve(pipeline_out):
    """Stage attribution follows the reference precedence (J2): subjects
    are definitions of their own doc -> same_doc (or alias when the
    surface form is an alias); objects hit same_doc only when the doc
    defines them, else the global exact stage."""
    out, _, _ = pipeline_out
    subj_stages = {r["subj_stage"] for r in
                   out["triples_resolved"].select("subj_stage").distinct().collect()}
    obj_stages = {r["obj_stage"] for r in
                  out["triples_resolved"].select("obj_stage").distinct().collect()}
    assert "failed" not in subj_stages | obj_stages
    assert subj_stages == {"alias_exact", "same_doc"}
    assert "name_exact" in obj_stages and "same_doc" in obj_stages


def test_resume_skips_committed_passes(spark, sf_dir, pipeline_out):
    import time

    from gitnexus_spark.plans.pipeline import KGPipeline
    from gitnexus_spark.synthetic import alias_dictionary, synth_pages

    _, out_dir, pages = pipeline_out
    t0 = time.time()
    pipe2 = KGPipeline(spark, out_dir, alias_dict=alias_dictionary(spark))
    out2 = pipe2.run(pages)
    assert out2["triples_resolved"].count() > 0
    # all passes resumed from parquet: no pass recomputed (rows == -1 marker)
    resumed = [r for r in pipe2._lineage_rows if r[2] == -1]
    assert len(resumed) == len(pipe2._lineage_rows)
    assert time.time() - t0 < 30


def test_structure_hierarchy(pipeline_out):
    out, _, _ = pipeline_out
    nodes, edges = out["nodes"], out["edges"]
    labels = dict(nodes.groupBy("label").count().collect())
    assert labels["Corpus"] == 1
    assert labels["Page"] == 500
    assert labels["Domain"] >= 1
    # every Page has exactly one CONTAINS parent
    page_ids = nodes.filter("label = 'Page'").select(F.col("id").alias("dst"))
    contains = edges.filter("type = 'CONTAINS'").join(page_ids, "dst")
    assert contains.groupBy("dst").count().filter("count != 1").count() == 0


def test_no_dangling_edges_for_endpoint_only_names(spark, tmp_path):
    """Regression (ADVICE r02, medium): endpoint names that never survive
    the mention filter — 1-char subjects, stop-entity objects resolved via
    the alias dictionary — must still land in the canonical map, so pass 4
    materializes Entity nodes for every emitted predicate edge. Before the
    fix, canonical_entities only covered registry ∪ fuzzy names and these
    endpoints produced edges referencing nonexistent node ids."""
    from gitnexus_spark.plans.pipeline import KGPipeline, integrity_checks
    from gitnexus_spark.synthetic import render_html

    docs = [
        # subj "X": 1-char, filtered from mentions, same_doc-resolved
        ("https://t.example.org/a/p1.html", "X founded Entity_5."),
        # obj "Here": stop entity, filtered from mentions, alias-resolved
        ("https://t.example.org/a/p2.html", "Entity_5 visited Here."),
        ("https://t.example.org/b/p3.html", "Entity_9 endorsed Entity_5."),
    ]
    rows = [(u, render_html(i, u, t, []), t, "en") for i, (u, t) in enumerate(docs)]
    pages = spark.createDataFrame(
        rows, "url string, html binary, text string, lang string"
    ).withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    alias = spark.createDataFrame([("Here", "Entity_9")],
                                  ["alias", "canonical_name"])

    out = KGPipeline(spark, str(tmp_path / "kg"), alias_dict=alias).run(pages)
    checks = integrity_checks(out["nodes"], out["edges"])
    assert checks == {k: 0 for k in checks}

    res = {(r["subj"], r["pred"], r["obj"], r["subj_stage"], r["obj_stage"])
           for r in out["triples_resolved"].collect()}
    # "Here" merges into Entity_9's component (alias edge; 'E..' < 'H..')
    assert ("Entity_5", "visited", "Entity_9", "same_doc", "alias_exact") in res
    # 1-char subject keeps its surface form but now HAS a node
    assert ("X", "founded", "Entity_5", "same_doc", "name_exact") in res
    node_names = {r["name"] for r in
                  out["nodes"].filter("label = 'Entity'").collect()}
    assert {"X", "Entity_5", "Entity_9"} <= node_names
    assert "Here" not in node_names


def test_optimize_layout_artifacts(spark, pipeline_out):
    """optimize_layout=True on a committed warehouse resumes every pass
    and adds the two layout artifacts: the (src, dst) z-ordered edge
    table (same rows; endpoint lookups touch fewer files by min/max
    stats than the plain type-partitioned layout) and the trigram search
    index (identical results to the scan)."""
    import glob
    import os

    from gitnexus_spark.operators.graph_queries import (lookup_edges,
                                                        search_nodes)
    from gitnexus_spark.operators.search_index import search_with_index
    from gitnexus_spark.plans.pipeline import KGPipeline
    from gitnexus_spark.synthetic import alias_dictionary

    out, out_dir, pages = pipeline_out
    pipe = KGPipeline(spark, out_dir, alias_dict=alias_dictionary(spark),
                      optimize_layout=True)
    out2 = pipe.run(pages)  # resume: passes no-op, layout artifacts build

    zp = os.path.join(out_dir, "edges_zorder")
    ip = os.path.join(out_dir, "search_index")
    assert os.path.exists(os.path.join(zp, "_SUCCESS"))
    assert os.path.exists(os.path.join(ip, "_index_meta.json"))

    # same edge set, different layout
    cols = ["id", "type", "src", "dst"]
    ez = spark.read.parquet(zp).select(cols)
    assert ez.exceptAll(out["edges"].select(cols)).count() == 0
    assert out["edges"].select(cols).exceptAll(ez).count() == 0

    # comparative pruning: per-file (src, dst) min/max stats — an
    # endpoint lookup must touch a smaller fraction of z-ordered files
    # than of the plain layout's files
    def stats(path):
        rows = []
        for f in sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                                  recursive=True)):
            r = spark.read.parquet(f).agg(
                F.min("src"), F.max("src"),
                F.min("dst"), F.max("dst")).collect()[0]
            rows.append(r)
        return rows

    zs, ps = stats(zp), stats(os.path.join(out_dir, "edges"))
    probes = [(r["src"], r["dst"]) for r in
              out["edges"].select("src", "dst").orderBy("id").limit(40)
              .collect()][::4]  # 10 spread-out real endpoint pairs

    def frac(st, side):
        touched = 0
        for s, d in probes:
            v = s if side == "src" else d
            lo, hi = (0, 1) if side == "src" else (2, 3)
            touched += sum(1 for r in st if r[lo] <= v <= r[hi])
        return touched / (len(probes) * len(st))

    # with only ~8 files the curve has 2-4 bands per axis, so the
    # absolute bound is loose; the comparative bound is the claim
    for side in ("src", "dst"):
        assert frac(zs, side) < 0.7, (side, frac(zs, side))
        assert frac(zs, side) < 0.75 * frac(ps, side), (
            side, frac(zs, side), frac(ps, side))

    # lookup helper picks the z layout and filters correctly
    s0, d0 = probes[0]
    got = lookup_edges(spark, out_dir, src=s0, dst=d0)
    assert got.count() >= 1
    assert all(r["src"] == s0 and r["dst"] == d0 for r in got.collect())

    # search index parity with the scan, via the pipeline artifact
    nodes = out2["nodes"]
    want = {r["id"] for r in search_nodes(nodes, "E4").collect()}
    got_ids = {r["id"] for r in
               search_with_index(spark, nodes, ip, "E4").collect()}
    assert got_ids == want and len(want) > 0
