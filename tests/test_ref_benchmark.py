"""The reference's 8-query benchmark set runs through the Cypher
front-end with DataFrame-equivalent parity (tools/ref_benchmark.py;
reference kuzu-performance-benchmark.ts:44-86)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    from gitnexus_spark.plans.pipeline import KGPipeline
    from gitnexus_spark.synthetic import alias_dictionary, synth_pages

    out_dir = str(tmp_path_factory.mktemp("refbench_kg"))
    KGPipeline(spark, out_dir, alias_dict=alias_dictionary(spark)) \
        .run(synth_pages(spark, sf_dir))
    return out_dir


def test_reference_benchmark_set_parity(spark, warehouse):
    import ref_benchmark

    res = ref_benchmark.run(spark, warehouse, trials=1)
    assert len(res) == 8, "all 8 reference benchmark shapes must run"
    bad = {k: v for k, v in res.items() if not v["parity"]}
    assert not bad, f"Cypher vs DataFrame parity failed: {bad}"
    # every retargeted query must actually select data at sf0.001
    empty = [k for k, v in res.items() if v["rows"] == 0]
    assert not empty, f"benchmark queries matched no rows: {empty}"
    # reference LIMIT discipline is preserved
    limits = {"simple_node_query": 100, "complex_relationship_query": 50,
              "multi_hop_query": 30, "aggregation_query": 10,
              "filtered_query": 50, "join_query": 40,
              "pattern_matching": 25, "subquery": 30}
    for k, cap in limits.items():
        assert res[k]["rows"] <= cap
