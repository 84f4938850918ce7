"""SCC: known topologies, a randomized instance vs brute-force mutual
reachability, isolated nodes, and the multi-round worst case."""

import pytest
from pyspark.sql import functions as F

from gitnexus_spark.operators.scc import strongly_connected_components


def _run(spark, pairs, nodes=None):
    e = spark.createDataFrame(pairs, "src string, dst string")
    nd = spark.createDataFrame([(x,) for x in nodes], "v string") \
        if nodes else None
    out = strongly_connected_components(e, nodes=nd)
    return {r["v"]: r["scc_id"] for r in out.collect()}


def test_two_cycles_and_bridge(spark):
    # cycle {a,b,c}, cycle {x,y}, bridge c->x (one-way)
    got = _run(spark, [("a", "b"), ("b", "c"), ("c", "a"),
                       ("x", "y"), ("y", "x"), ("c", "x")])
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_dag_all_singletons(spark):
    got = _run(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    assert got == {"a": "a", "b": "b", "c": "c"}


def test_anti_ordered_chain_needs_outer_rounds(spark):
    # chain z->y->x->w: min labels flow AGAINST reachability, forcing
    # multiple outer coloring rounds
    got = _run(spark, [("z", "y"), ("y", "x"), ("x", "w")])
    assert got == {c: c for c in "wxyz"}


def test_isolated_nodes_and_self_loop(spark):
    got = _run(spark, [("a", "b"), ("b", "a"), ("s", "s")],
               nodes=["a", "b", "s", "iso"])
    assert got == {"a": "a", "b": "a", "s": "s", "iso": "iso"}


def _brute_scc(pairs, nodes):
    adj, radj = {}, {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        radj.setdefault(v, set()).add(u)

    def reach(start, g):
        seen, stack = set(), [start]
        while stack:
            x = stack.pop()
            for y in g.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        return seen

    out = {}
    for v in nodes:
        mutual = (reach(v, adj) & reach(v, radj)) | {v}
        out[v] = min(mutual)
    return out


def test_randomized_vs_brute(spark):
    import numpy as np
    rng = np.random.RandomState(11)
    nodes = [f"n{i:02d}" for i in range(60)]
    pairs = list({(nodes[rng.randint(60)], nodes[rng.randint(60)])
                  for _ in range(150)})
    pairs = [(u, v) for u, v in pairs if u != v]
    got = _run(spark, pairs, nodes=nodes)
    assert got == _brute_scc(pairs, nodes)


def test_distributed_path_parity(spark):
    """driver_threshold=0 forces the FW-BW coloring path; results must
    match the driver-Tarjan path and brute force on the same instance."""
    import numpy as np
    rng = np.random.RandomState(7)
    nodes = [f"m{i:02d}" for i in range(40)]
    pairs = list({(nodes[rng.randint(40)], nodes[rng.randint(40)])
                  for _ in range(90)})
    pairs = [(u, v) for u, v in pairs if u != v]
    e = spark.createDataFrame(pairs, "src string, dst string")
    nd = spark.createDataFrame([(x,) for x in nodes], "v string")
    dist = strongly_connected_components(e, nodes=nd, driver_threshold=0)
    got = {r["v"]: r["scc_id"] for r in dist.collect()}
    assert got == _brute_scc(pairs, nodes)


def test_driver_path_long_cycle(spark):
    """A 400-cycle — the shape that is diameter-bound for distributed
    relaxation — resolves through the driver-Tarjan gate instantly."""
    n = 400
    pairs = [(f"c{i:03d}", f"c{(i + 1) % n:03d}") for i in range(n)]
    got = _run(spark, pairs)
    assert set(got.values()) == {"c000"}
    assert len(got) == n
