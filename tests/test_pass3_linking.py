"""Pass-3: three-stage linking, connected components, canonicalization.

Engineered so every resolution stage fires at least once, with golden
(name, resolved, stage) — FIXTURES.md T4/T5; mirrors the reference's
resolution matrix (call-processor.ts:146-300).
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def registry(spark):
    from gitnexus_spark.operators.linking import entity_registry

    m = spark.createDataFrame(
        [("d1", "Acme Corp", 0, 9), ("d2", "Acme Corp", 0, 9),
         ("d1", "Foo Inc", 12, 19), ("d3", "Bar Ltd", 0, 7),
         ("d3", "Zorg", 10, 14)],
        ["url", "name", "start", "end"],
    )
    return entity_registry(m)


@pytest.fixture(scope="module")
def alias_dict(spark):
    return spark.createDataFrame(
        [("AC", "Acme Corp"), ("TheFoo", "Foo Inc")], ["alias", "canonical_name"]
    )


def link(spark, registry, alias_dict, names):
    from gitnexus_spark.operators.linking import link_mentions

    un = spark.createDataFrame([("d", n, "any") for n in names],
                               ["doc_url", "name", "role"])
    out = link_mentions(un, registry, alias_dict)
    return {r["name"]: (r["canonical_name"], r["stage"]) for r in out.collect()}


def test_stage1_alias_exact(spark, registry, alias_dict):
    got = link(spark, registry, alias_dict, ["AC"])
    assert got["AC"] == ("Acme Corp", "alias_exact")


def test_stage2_name_exact(spark, registry, alias_dict):
    got = link(spark, registry, alias_dict, ["Bar Ltd"])
    assert got["Bar Ltd"] == ("Bar Ltd", "name_exact")


def test_stage3_fuzzy(spark, registry, alias_dict):
    # typo variant: 3-gram Jaccard against "Acme Corp" clears 0.5
    got = link(spark, registry, alias_dict, ["Acme Corpp"])
    assert got["Acme Corpp"] == ("Acme Corp", "fuzzy")


def test_failed(spark, registry, alias_dict):
    got = link(spark, registry, alias_dict, ["Qxv"])
    assert got["Qxv"] == (None, "failed")


def test_exactly_one_row_per_input(spark, registry, alias_dict):
    from gitnexus_spark.operators.linking import link_mentions

    un = spark.createDataFrame(
        [("d", n, "any") for n in ["AC", "Bar Ltd", "Acme Corpp", "Qxv", "Zorg"]],
        ["doc_url", "name", "role"],
    )
    assert link_mentions(un, registry, alias_dict).count() == 5


def test_fuzzy_tiebreak_deterministic(spark):
    """Two candidates with identical Jaccard -> lexicographic min wins
    (the reference picks candidates[0] = array order; we impose a total
    order, SURVEY §7.4)."""
    from gitnexus_spark.operators.linking import entity_registry, link_mentions

    m = spark.createDataFrame(
        [("d1", "Acme Corp A", 0, 1), ("d2", "Acme Corp B", 0, 1)],
        ["url", "name", "start", "end"],
    )
    reg = entity_registry(m)
    un = spark.createDataFrame([("d", "Acme Corp X", "any")],
                               ["doc_url", "name", "role"])
    for _ in range(3):
        got = link_mentions(un, reg, None).collect()[0]
        assert got["canonical_name"] == "Acme Corp A"
        assert got["stage"] == "fuzzy"


# --- connected components (T5 fixture) -------------------------------------

def test_connected_components_shapes(spark):
    from gitnexus_spark.operators.components import connected_components

    pair = [("a", "b")]
    chain = [(f"c{i}", f"c{i+1}") for i in range(4)]
    hub = [("h0", f"h{i}") for i in range(1, 40)]
    edges = spark.createDataFrame(pair + chain + hub, ["src", "dst"])
    comp = {r["vertex"]: r["component"] for r in connected_components(edges).collect()}
    assert comp["a"] == comp["b"] == "a"
    assert all(comp[f"c{i}"] == "c0" for i in range(5))
    assert all(comp[f"h{i}"] == "h0" for i in range(40))
    # disjoint components stay disjoint
    assert len({comp["a"], comp["c0"], comp["h0"]}) == 3


def test_canonical_entities_norm_and_alias_merge(spark):
    from gitnexus_spark.operators.components import canonical_entities
    from gitnexus_spark.operators.linking import entity_registry

    m = spark.createDataFrame(
        [("d1", "Entity_5", 0, 1), ("d2", "Entity-5", 0, 1), ("d3", "Solo", 0, 1)],
        ["url", "name", "start", "end"],
    )
    reg = entity_registry(m)
    ad = spark.createDataFrame([("E5", "Entity_5")], ["alias", "canonical_name"])
    canon = {r["name"]: r["canonical"]
             for r in canonical_entities(reg, None, ad).collect()}
    # norm-key merges Entity_5/Entity-5; alias dict pulls in E5; min name = E5
    assert canon["Entity_5"] == "E5"
    assert canon["Entity-5"] == "E5"
    assert canon["Solo"] == "Solo"
