"""Graph read path: the query surface of the reference re-expressed as
DataFrame ops over the two-table graph model (nodes, edges).

Reference: GraphQueryEngine regex-Cypher (src/ai/query-engine.ts:46-132,
152-402) and adjacency-indexed traversal (src/core/graph/query.ts:30-197).
The regex parser + per-class executors collapse into Spark SQL over two
temp views; the only constructs needing explicit iteration are k-hop /
variable-length paths (Catalyst has no recursion) — bounded driver loops
over joins, caps carried over from query-optimization.ts:412-422.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_PATH_DEPTH = 5       # ref query-optimization.ts:412-422 rewrites *1..N>5 -> 5
DEFAULT_NODE_CAP = 500   # ref query.ts:102 BFS node cap


def register_views(nodes: DataFrame, edges: DataFrame) -> None:
    """Expose the graph to Spark SQL — the replacement for the reference's
    whole Cypher layer (entry point C, SURVEY §3.3)."""
    nodes.createOrReplaceTempView("nodes")
    edges.createOrReplaceTempView("edges")


def lookup_edges(spark, out_dir: str, src: str | None = None,
                 dst: str | None = None) -> DataFrame:
    """Endpoint edge lookup over a pipeline warehouse. Reads the
    z-ordered layout (``edges_zorder``, written by
    KGPipeline(optimize_layout=True)) when present — its files hold
    Morton rectangles of (src, dst), so a filter on EITHER endpoint (or
    both) prunes by native parquet string min/max stats; the plain
    type-partitioned table, where an endpoint filter touches every file,
    is the fallback."""
    import os
    zp = os.path.join(out_dir, "edges_zorder")
    path = zp if os.path.exists(os.path.join(zp, "_SUCCESS")) \
        else os.path.join(out_dir, "edges")
    df = spark.read.parquet(path)
    if src is not None:
        df = df.filter(F.col("src") == src)
    if dst is not None:
        df = df.filter(F.col("dst") == dst)
    return df


AUTO_LIMIT = 1000
_LIMIT_RE = re.compile(r"\blimit\s+\d+", re.IGNORECASE)


def guarded_sql(spark, sql: str, auto_limit: int = AUTO_LIMIT) -> DataFrame:
    """O5 auto-LIMIT guardrail (reference query-optimization.ts:412-422
    appends LIMIT to unbounded queries): statements with no LIMIT anywhere
    get `LIMIT auto_limit` appended, bounding accidental full-result
    materialization at the SQL entry point. Conservative: any LIMIT in
    the text (even in a subquery) disables the rewrite."""
    s = sql.strip().rstrip(";")
    if not _LIMIT_RE.search(s):
        s = f"{s} LIMIT {auto_limit}"
    return spark.sql(s)


def write_adjacency_bucketed(edges: DataFrame, table: str,
                             buckets: int = 64, key: str = "src") -> None:
    """Q3 adjacency indexing at rest: persist the edge table bucketed AND
    sorted by the traversal key (plus type partitioning upstream).
    Frontier joins and degree scans against a bucketed table co-locate on
    bucket id — Catalyst elides the exchange on the bucketed side; at
    10^12 edges that is the difference between one scan and a full
    shuffle. The reference keeps TWO in-memory adjacency maps (out and
    in, query.ts:30-60); the at-rest analogue is two bucketed tables,
    key='src' for outbound and key='dst' for inbound traversal."""
    if key not in ("src", "dst"):
        raise ValueError(f"bucket key must be src or dst, got {key!r}")
    spark = edges.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a managed-table DIRECTORY can outlive its metastore entry (fresh
    # session, same warehouse dir) — saveAsTable would then fail with
    # LOCATION_ALREADY_EXISTS, so clear the stale location first
    import os
    import shutil
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    loc = os.path.join(wh, table.lower())
    if os.path.exists(loc):
        shutil.rmtree(loc, ignore_errors=True)
    edges.write.bucketBy(buckets, key).sortBy(key) \
        .mode("overwrite").format("parquet").saveAsTable(table)


def match_pattern(nodes: DataFrame, edges: DataFrame, rel_type: str,
                  src_label: str | None = None,
                  dst_label: str | None = None) -> DataFrame:
    """(a)-[:T]->(b) pattern join (J6, query-engine.ts:359-402).

    Returns (src_id, src_name, type, dst_id, dst_name). The edges side is
    filtered by partition column `type` first (partition-pruned scan at
    rest), then two hash joins against nodes.
    """
    e = edges.filter(F.col("type") == rel_type)
    a = nodes.select(F.col("id").alias("src"), F.col("label").alias("src_label"),
                     F.col("name").alias("src_name"))
    b = nodes.select(F.col("id").alias("dst"), F.col("label").alias("dst_label"),
                     F.col("name").alias("dst_name"))
    if src_label:
        a = a.filter(F.col("src_label") == src_label)
    if dst_label:
        b = b.filter(F.col("dst_label") == dst_label)
    return (
        e.join(a, "src").join(b, "dst")
        .select(F.col("src").alias("src_id"), "src_name",
                F.col("type"), F.col("dst").alias("dst_id"), "dst_name")
    )


def _k_hop_frontier(adj: DataFrame, start_ids: DataFrame, k: int,
                    node_cap: int) -> DataFrame:
    """Shared BFS loop over an adjacency relation (from_id, to_id).
    Duplicate adjacency pairs are harmless for correctness (the frontier
    dedups on id), so pre-deduping is the caller's cost choice."""
    visited = start_ids.select(F.col("id")).dropDuplicates(["id"]) \
        .withColumn("hop", F.lit(0)).localCheckpoint()
    frontier = visited

    for depth in range(1, min(k, MAX_PATH_DEPTH * 2) + 1):
        # cap DETERMINISTICALLY: orderBy(id).limit is TakeOrdered — which
        # nodes survive an over-cap frontier no longer depends on partition
        # order (a bare .limit() did, breaking the determinism invariant)
        nxt = (
            frontier.join(adj, frontier.id == adj.from_id)
            .select(F.col("to_id").alias("id"))
            .dropDuplicates(["id"])
            .join(visited.select("id"), "id", "left_anti")
            .orderBy("id")
            .limit(node_cap)
            .withColumn("hop", F.lit(depth))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited


def k_hop(edges: DataFrame, start_ids: DataFrame, k: int,
          direction: str = "out", rel_types: list[str] | None = None,
          node_cap: int = DEFAULT_NODE_CAP) -> DataFrame:
    """k-hop neighborhood (Q4, query.ts:97-152): iterative frontier joins.

    start_ids: DataFrame with column `id`. Returns (id, hop) with the
    minimum hop distance (<= k). Each hop is one join; AQE handles the
    shrinking frontier. node_cap mirrors the reference's traversal cap.
    """
    e = edges
    if rel_types:
        e = e.filter(F.col("type").isin(rel_types))
    if direction == "out":
        adj = e.select(F.col("src").alias("from_id"), F.col("dst").alias("to_id"))
    elif direction == "in":
        adj = e.select(F.col("dst").alias("from_id"), F.col("src").alias("to_id"))
    else:  # both
        adj = e.select(F.col("src").alias("from_id"), F.col("dst").alias("to_id")) \
            .unionByName(e.select(F.col("dst").alias("from_id"),
                                  F.col("src").alias("to_id")))
    adj = adj.dropDuplicates(["from_id", "to_id"]).persist()
    visited = _k_hop_frontier(adj, start_ids, k, node_cap)
    adj.unpersist()
    return visited


def k_hop_bucketed(spark, table: str, start_ids: DataFrame, k: int,
                   direction: str = "out",
                   rel_types: list[str] | None = None,
                   node_cap: int = DEFAULT_NODE_CAP) -> DataFrame:
    """Q4 over the AT-REST adjacency index (write_adjacency_bucketed):
    the edge table arrives pre-partitioned (bucketed+sorted) by the
    traversal key, so every frontier join exchanges ONLY the tiny
    frontier side — Catalyst reads the bucketed side's output
    partitioning and elides its shuffle (asserted by
    tests/test_graph_queries.py::test_bucketed_k_hop_plan). At 10^12
    edges this is the difference between shuffling the edge set once per
    hop and never.

    direction='out' expects a table bucketed by src, direction='in' one
    bucketed by dst (the reference keeps two adjacency maps,
    query.ts:30-60; at rest that is two bucketed tables). A mismatched
    pairing is still CORRECT — the bucketed side merely regains an
    exchange."""
    e = spark.table(table)
    if rel_types:
        e = e.filter(F.col("type").isin(rel_types))
    if direction == "out":
        adj = e.select(F.col("src").alias("from_id"), F.col("dst").alias("to_id"))
    elif direction == "in":
        adj = e.select(F.col("dst").alias("from_id"), F.col("src").alias("to_id"))
    else:
        raise ValueError(f"direction must be out or in, got {direction!r}")
    return _k_hop_frontier(adj, start_ids, k, node_cap)


def paths_between(edges: DataFrame, start_ids: DataFrame, end_ids: DataFrame,
                  max_depth: int = 6, max_paths: int = 3,
                  rel_types: list[str] | None = None) -> DataFrame:
    """Paths between two node sets (Q5, reference query.ts:154-197
    ``pathsBetween``, maxDepth 6 / maxPaths 3).

    The reference runs sequential BFS with a GLOBAL visited set, so which
    path it returns depends on adjacency-array insertion order —
    nondeterministic under its own parallelism. The Spark contract is the
    deterministic closure of that: ALL cycle-free shortest paths from
    start to end (hops == minimum), ordered by path, capped at max_paths.

    Level-synchronous expansion with array_contains cycle pruning; stops
    at the first level that reaches an end node (never enumerates deeper).
    Each level is one join; the end-set probe is a broadcast semi-join.
    Scale note: caps (max_depth<=6, max_paths) are the reference's own
    cost model; for dense hub graphs swap in per-node best-path dedup per
    level (frontier bounded by |V|) before the product can grow.

    Returns (path: array<id>, hops).
    """
    e = edges
    if rel_types:
        e = e.filter(F.col("type").isin(rel_types))
    adj = e.select(F.col("src").alias("from_id"), F.col("dst").alias("to_id")) \
        .dropDuplicates(["from_id", "to_id"]).persist()
    end = end_ids.select(F.col("id").alias("_end")).dropDuplicates(["_end"])

    frontier = start_ids.select(
        F.array(F.col("id")).alias("path"),
        F.col("id").alias("head_id"),
        F.lit(0).alias("hops"),
    ).localCheckpoint()

    # trivial case: start node IS an end node (reference returns empty path)
    found = frontier.join(F.broadcast(end), frontier.head_id == F.col("_end"), "semi")
    if found.isEmpty():
        found = None
        for depth in range(1, max_depth + 1):
            frontier = (
                frontier.join(adj, frontier.head_id == adj.from_id)
                .filter(~F.array_contains(F.col("path"), F.col("to_id")))
                .select(
                    F.concat(F.col("path"), F.array(F.col("to_id"))).alias("path"),
                    F.col("to_id").alias("head_id"),
                    F.lit(depth).alias("hops"),
                )
                .localCheckpoint()
            )
            if frontier.isEmpty():
                break
            hits = frontier.join(F.broadcast(end),
                                 frontier.head_id == F.col("_end"), "semi")
            if not hits.isEmpty():
                found = hits    # first (= shortest) level only
                break
    adj.unpersist()
    if found is None:
        return frontier.filter(F.lit(False)).select("path", "hops")
    return (
        found.orderBy(F.col("path").cast("string"))
        .limit(max_paths)
        .select("path", "hops")
    )


def var_length_paths(edges: DataFrame, start_ids: DataFrame, rel_type: str,
                     min_hops: int = 1, max_hops: int = 3,
                     max_paths: int = 10) -> DataFrame:
    """Variable-length paths (Q6, query-engine.ts:254-323): bounded
    iterative self-join accumulating the path as an id array; cycles
    pruned with array_contains; capped like the reference (<= max_paths
    per start node, max depth clamped to MAX_PATH_DEPTH)."""
    max_hops = min(max_hops, MAX_PATH_DEPTH)
    e = edges.filter(F.col("type") == rel_type) \
        .select(F.col("src").alias("from_id"), F.col("dst").alias("to_id")) \
        .dropDuplicates(["from_id", "to_id"]).persist()

    paths = start_ids.select(
        F.col("id").alias("start_id"),
        F.array(F.col("id")).alias("path"),
        F.col("id").alias("head_id"),
        F.lit(0).alias("hops"),
    ).localCheckpoint()
    results = []
    frontier = paths
    for depth in range(1, max_hops + 1):
        frontier = (
            frontier.join(e, frontier.head_id == e.from_id)
            .filter(~F.array_contains(F.col("path"), F.col("to_id")))
            .select(
                "start_id",
                F.concat(F.col("path"), F.array(F.col("to_id"))).alias("path"),
                F.col("to_id").alias("head_id"),
                F.lit(depth).alias("hops"),
            )
            .localCheckpoint()
        )
        if frontier.isEmpty():
            break
        if depth >= min_hops:
            results.append(frontier)
    e.unpersist()
    if not results:
        return paths.filter(F.lit(False)).select("start_id", "path", "hops")
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    # cap paths per start node deterministically (path array as tiebreak)
    from pyspark.sql import Window

    w = Window.partitionBy("start_id").orderBy("hops", F.col("path").cast("string"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_paths)
        .select("start_id", "path", "hops")
    )


def search_nodes(nodes: DataFrame, needle: str) -> DataFrame:
    """Full-text node search (Q9, query-engine.ts:448-463)."""
    hay = F.lower(F.concat_ws(" ", F.coalesce("name", F.lit("")),
                              F.coalesce("url", F.lit(""))))
    return nodes.filter(hay.contains(needle.lower()))


def node_degree(edges: DataFrame) -> DataFrame:
    """(id, out_degree, in_degree) — adjacency stats (Q10/A1 family)."""
    out_d = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("out_degree"))
    in_d = edges.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("in_degree"))
    return out_d.join(in_d, "id", "full").select(
        "id",
        F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
        F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
    )


def top_entities_by_mentions(nodes: DataFrame, edges: DataFrame, k: int = 10) -> DataFrame:
    """Benchmark-query analogue: group-count + ORDER BY DESC LIMIT k
    (kuzu-performance-benchmark.ts:62-63)."""
    men = edges.filter(F.col("type") == "MENTIONS")
    ent = nodes.filter(F.col("label") == "Entity") \
        .select(F.col("id").alias("dst"), "name")
    return (
        men.join(ent, "dst")
        .groupBy("dst", "name").agg(F.count("*").alias("n_mentions"))
        .orderBy(F.desc("n_mentions"), F.asc("name"))
        .limit(k)
    )


def count_triangles(edges: DataFrame,
                    rel_types: list[str] | None = None) -> DataFrame:
    """Global triangle count over the undirected simple graph induced by
    the edge table — 1-row DataFrame (n_triangles).

    Graph-structure analytics over the same two-table model as
    node_degree / pagerank (the reference's degree surface,
    query-engine.ts:448-478, iterated one step further).

    Scale shape — compact-forward with DEGREE ORIENTATION: every
    undirected edge is oriented from the endpoint with the smaller
    (degree, id) key to the larger, so each triangle is counted exactly
    once from its lowest-degree apex and per-vertex out-degree is
    O(sqrt(m)) on any graph. The wedge join (the quadratic step) then
    generates sum(outdeg^2) ~ m^1.5 candidates worst-case instead of
    sum(deg^2), which on a power-law web graph is the difference between
    a feasible shuffle and a hub explosion. Three shuffles total: degree
    agg, wedge self-join, closing-edge semi-join.
    """
    e = edges
    if rel_types:
        e = e.filter(F.col("type").isin(rel_types))
    und = (
        e.select(F.least("src", "dst").alias("u"),
                 F.greatest("src", "dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .unionAll(und.select(F.col("v").alias("id")))
        .groupBy("id").agg(F.count("*").alias("deg"))
    )
    # orientation key: (deg, id) — total order, ties broken by id
    du = deg.select(F.col("id").alias("u"),
                    F.struct(F.col("deg"), F.col("id")).alias("ku"))
    dv = deg.select(F.col("id").alias("v"),
                    F.struct(F.col("deg"), F.col("id")).alias("kv"))
    keyed = und.join(du, "u").join(dv, "v")
    oriented = keyed.select(
        F.when(F.col("ku") < F.col("kv"), F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(F.col("ku") < F.col("kv"), F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(F.col("ku") < F.col("kv"), F.col("kv")).otherwise(F.col("ku")).alias("khi"),
    ).persist()
    a = oriented.select(F.col("lo"), F.col("hi").alias("x"), F.col("khi").alias("kx"))
    b = oriented.select(F.col("lo"), F.col("hi").alias("y"), F.col("khi").alias("ky"))
    wedges = a.join(b, "lo").filter(F.col("kx") < F.col("ky")) \
        .select(F.col("x").alias("lo"), F.col("y").alias("hi"))
    closed = wedges.join(oriented.select("lo", "hi"), ["lo", "hi"], "inner")
    out = closed.agg(F.count("*").alias("n_triangles"))
    n = out.collect()[0][0]
    oriented.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame([(n,)], "n_triangles bigint")


def pagerank(nodes: DataFrame, edges: DataFrame, iters: int = 3,
             damping: float = 0.85) -> DataFrame:
    """Fixed-iteration PageRank over the (nodes, edges) two-table graph.

    Centrality analytics on the constructed KG / page-link graph — the
    natural extension of the reference's degree surface (node_degree /
    top-entities, query-engine.ts:448-478): same graph model, iterated.
    Dangling mass (nodes with no out-edges) is redistributed uniformly,
    so total rank mass stays 1 at every iteration.

    Scale shape: each iteration is ONE edge-scale shuffle — edges join
    the node-scale rank table on src (both hash-partitioned on the join
    key), then a partial-aggregated groupBy(dst).  The node count and
    the dangling mass enter the plan as broadcast 1-row aggregates.
    `iters` is a fixed small constant (rank deltas decay geometrically
    by `damping`), so the driver loop is bounded plan construction.
    Each iteration's rank table is persisted and materialized by one
    node-scale count action, which lets the PREVIOUS iteration's cache
    blocks be released immediately — without eager materialization the
    3-fold per-iteration fan-in (withdeg/dangling/contribs) recomputes
    exponentially, and without the release repeated calls pin executor
    storage for the session lifetime. The returned frame stays
    persisted; the caller may unpersist it when done.

    nodes: DataFrame with column `id` (must cover all edge endpoints;
    isolated nodes get the (1-d)/n floor plus dangling share).
    edges:  DataFrame with columns `src`, `dst`; parallel edges count
    double, matching the contribution semantics of a multigraph.
    Returns (id, rank) with SUM(rank) == 1.
    """
    ids = nodes.select("id")
    e = edges.select("src", "dst")
    nf = ids.agg(F.count("*").alias("n"))
    outdeg = e.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_deg"))
    deg = ids.join(outdeg, "id", "left").select(
        "id", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
    deg = deg.persist()
    ranks = ids.crossJoin(F.broadcast(nf)).select(
        "id", (F.lit(1.0) / F.col("n")).alias("rank"))
    base = F.lit(1.0 - damping)
    prev = None
    for _ in range(iters):
        withdeg = ranks.join(deg, "id")
        dang = withdeg.filter(F.col("out_deg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling"))
        contribs = (
            e.join(
                withdeg.filter(F.col("out_deg") > 0).select(
                    F.col("id").alias("src"),
                    (F.col("rank") / F.col("out_deg")).alias("w")),
                "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("w").alias("contrib"))
        )
        ranks = (
            ids.join(contribs, "id", "left")
            .crossJoin(F.broadcast(nf))
            .crossJoin(F.broadcast(dang))
            .select(
                "id",
                (base / F.col("n")
                 + F.lit(damping) * (F.coalesce("contrib", F.lit(0.0))
                                     + F.col("dangling") / F.col("n"))
                 ).alias("rank"))
            .persist()
        )
        ranks.count()          # materialize, then free the previous round
        if prev is not None:
            prev.unpersist()
        prev = ranks
    deg.unpersist()
    return ranks
