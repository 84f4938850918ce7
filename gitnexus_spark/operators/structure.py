"""Pass 1b — structure graph: Corpus / Domain / Section / Page + CONTAINS.

Web retarget of GitNexus's StructureProcessor
(reference src/core/ingestion/structure-processor.ts:55-255):
Project -> Corpus, Folder -> Domain(host) + Section(path prefix),
File -> Page(url). The reference synthesizes intermediate directories from
file paths (structure-processor.ts:87-127 ``categorizePaths``); here the
same inference runs as a single Catalyst expression chain:
split the URL path, posexplode cumulative prefixes, dedupe.

Everything is built-in DataFrame ops — no UDFs, fully codegen'd, and the
only shuffles are the host and section ``dropDuplicates`` (hash
aggregates), keyed on the node id so they partition evenly at
10^12-page scale; the deepest-container edge is scan-local (the deepest
prefix is just the joined dir path every row already carries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ids import edge_id, node_id

CORPUS_NAME = "corpus"

HOST_RE = r"^[a-z]+://([^/]+)"
PATH_RE = r"^[a-z]+://[^/]+(/.*)$"


def _squash_path(path_expr: str) -> str:
    """SQL expr: normalize '.'/'..'/'//' segments of a path string.

    '' and '.' segments are dropped; '..' pops the accumulator (bounded at
    root, like browsers; RFC 3986 remove_dot_segments semantics, except
    empty segments collapse). Directory-form inputs (trailing '/', or
    ending in '.'/'..') keep their trailing slash. Pure fold — codegen'd,
    no UDF."""
    segs = f"filter(split({path_expr}, '/'), s -> s != '' AND s != '.')"
    squashed = (
        f"aggregate({segs}, cast(array() as array<string>), (acc, s) -> "
        f"if(s = '..', slice(acc, 1, greatest(size(acc) - 1, 0)), "
        f"concat(acc, array(s))))"
    )
    core = f"array_join({squashed}, '/')"
    is_dir = f"({path_expr} rlike '(/|/\\\\.|/\\\\.\\\\.|^\\\\.|^\\\\.\\\\.)$')"
    return (f"concat('/', {core}, "
            f"CASE WHEN {is_dir} AND {core} != '' THEN '/' ELSE '' END)")


def normalize_link_targets(links: DataFrame, base_col: str = "url",
                           target_col: str = "target_url") -> DataFrame:
    """Resolve relative hrefs against the source page URL (P7 — the web
    analogue of the reference's relative-import resolution with ./ and ../
    handling + candidate probing, import-processor.ts:522-606).

    Handles: absolute http(s) (pass-through), scheme-relative '//h/p',
    root-relative '/p', and document-relative './p', '../p', 'p' — all
    with '.'/'..' squashing. Fragments are stripped; hrefs with any other
    scheme (mailto:, javascript:, data:) are dropped (they can never
    resolve to a Page). Everything is a single expression chain over the
    links projection — no UDF, no shuffle.
    """
    href = f"split({target_col}, '#')[0]"
    scheme = f"regexp_extract({base_col}, '^([a-z]+)://', 1)"
    host = f"regexp_extract({base_col}, '{HOST_RE}', 1)"
    base_path = f"regexp_extract({base_col}, '{PATH_RE}', 1)"
    base_dir = f"regexp_extract({base_path}, '^(.*/)[^/]*$', 1)"
    norm = f"""CASE
      WHEN {href} IS NULL OR {href} = '' THEN NULL
      WHEN {href} rlike '^https?://' THEN {href}
      WHEN {href} rlike '^[a-zA-Z][a-zA-Z0-9+.-]*:' THEN NULL
      WHEN {href} rlike '^//' THEN concat({scheme}, ':', {href})
      WHEN {href} rlike '^/' THEN concat({scheme}, '://', {host}, {_squash_path(href)})
      ELSE concat({scheme}, '://', {host},
                  {_squash_path(f"concat({base_dir}, {href})")})
    END"""
    other = [c for c in links.columns if c != target_col]
    return links.select(*other, F.expr(norm).alias(target_col)) \
                .filter(F.col(target_col).isNotNull()) \
                .select(*links.columns)


def structure_graph(pages: DataFrame,
                    cache_handles: list | None = None
                    ) -> tuple[DataFrame, DataFrame]:
    """pages(url, ...) -> (nodes, edges) of the containment hierarchy.

    nodes: (id, label, name, url)   — url only set for Page nodes
    edges: (id, type, src, dst)     — type = CONTAINS

    The prefix explosion and the deduped section set feed FOUR downstream
    branches (section nodes; domain->section, section->section edges;
    deepest-container join) — without caching, each branch re-runs the
    explode and the edges write re-shuffles it three times (the r3
    lineage showed struct walls rivaling extraction). Pass
    `cache_handles=[]` to persist these two intermediates; the persisted
    frames are appended for the caller to unpersist after its writes.
    """
    p = pages.select(
        "url",
        F.regexp_extract("url", HOST_RE, 1).alias("host"),
        F.regexp_extract("url", PATH_RE, 1).alias("path"),
    )

    corpus_id = F.md5(F.concat_ws("|", F.lit("Corpus"), F.lit(CORPUS_NAME)))

    # Page nodes
    page_nodes = p.select(
        node_id("Page", F.col("url")).alias("id"),
        F.lit("Page").alias("label"),
        F.element_at(F.split("path", "/"), -1).alias("name"),
        F.col("url"),
    )

    # Domain nodes (dedup on host) — persisted alongside the explode
    # caches when the caller asks: the Corpus->Domain edge branch reads
    # the SAME distinct-host set, so without the pin the corpus-scale
    # host dedup exchange runs once per write (nodes AND edges).
    domain_nodes = (
        p.select("host").dropDuplicates(["host"])
        .select(
            node_id("Domain", F.col("host")).alias("id"),
            F.lit("Domain").alias("label"),
            F.col("host").alias("name"),
            F.lit(None).cast("string").alias("url"),
        )
    )
    if cache_handles is not None:
        domain_nodes = domain_nodes.persist()
        cache_handles.append(domain_nodes)

    # Section nodes: every cumulative dir prefix of the path, per host.
    # path "/a/b/c.html" -> segments [a, b]; prefixes "/a", "/a/b".
    segs = p.select(
        "url", "host",
        F.expr("slice(split(path, '/'), 2, greatest(size(split(path,'/')) - 2, 0))").alias("dirs"),
    )
    # dir-less urls contribute no prefix rows (plain posexplode): every
    # remaining consumer is section-scoped — the deepest-container edge
    # below is computed scan-locally from `dirs` itself, so the old
    # null-prefix carrier rows have no reader left.
    prefixes = segs.select(
        "url", "host",
        F.posexplode(
            F.expr("transform(dirs, (d, i) -> concat_ws('/', slice(dirs, 1, i + 1)))")
        ).alias("depth", "prefix"),
    )
    if cache_handles is not None:
        prefixes = prefixes.persist()
        cache_handles.append(prefixes)

    section_key = F.concat_ws("/", F.col("host"), F.col("prefix"))
    # ONE corpus-scale section dedup: `sec` (one row per section id, with
    # host/prefix/depth — all functionally determined by the id) feeds the
    # section NODES and both section edge branches; the separate
    # dropDuplicates(skey) pass the nodes branch ran was the same
    # exchange a second time (sid = hash(skey) bijectively).
    sec = prefixes.select(
        "host", "prefix", "depth",
        node_id("Section", section_key).alias("sid"),
    ).dropDuplicates(["sid"])
    if cache_handles is not None:
        sec = sec.persist()
        cache_handles.append(sec)

    section_nodes = sec.select(
        F.col("sid").alias("id"),
        F.lit("Section").alias("label"),
        F.element_at(F.split("prefix", "/"), -1).alias("name"),
        F.lit(None).cast("string").alias("url"),
    )

    corpus_node = page_nodes.sparkSession.range(1).select(
        corpus_id.alias("id"),
        F.lit("Corpus").alias("label"),
        F.lit(CORPUS_NAME).alias("name"),
        F.lit(None).cast("string").alias("url"),
    )

    nodes = corpus_node.unionByName(domain_nodes).unionByName(section_nodes).unionByName(page_nodes)

    # CONTAINS edges -------------------------------------------------------
    # Corpus -> Domain
    e_cd = domain_nodes.select(
        F.lit("CONTAINS").alias("type"),
        corpus_id.alias("src"),
        F.col("id").alias("dst"),
    )

    # Domain -> first Section; Section -> child Section (parent = prefix minus last seg)
    e_ds = sec.filter(F.col("depth") == 0).select(
        F.lit("CONTAINS").alias("type"),
        node_id("Domain", F.col("host")).alias("src"),
        F.col("sid").alias("dst"),
    )
    parent_prefix = F.expr(
        "concat_ws('/', slice(split(prefix, '/'), 1, size(split(prefix,'/')) - 1))"
    )
    e_ss = sec.filter(F.col("depth") > 0).select(
        F.lit("CONTAINS").alias("type"),
        node_id("Section", F.concat_ws("/", F.col("host"), parent_prefix)).alias("src"),
        F.col("sid").alias("dst"),
    )

    # deepest container -> Page (Domain when the path has no dirs).
    # The deepest prefix IS the full dir path (concat_ws of `dirs`), so
    # this branch is computed scan-locally from segs — the old
    # explode + groupBy(url).max_by(depth) was a corpus-scale exchange
    # recomputing a value each input row already holds.
    page_parent = segs.select(
        F.lit("CONTAINS").alias("type"),
        F.when(
            F.size("dirs") > 0,
            node_id("Section",
                    F.concat_ws("/", F.col("host"),
                                F.concat_ws("/", F.col("dirs")))),
        ).otherwise(node_id("Domain", F.col("host"))).alias("src"),
        node_id("Page", F.col("url")).alias("dst"),
    )

    # no dedup exchange: the four branches are pairwise-disjoint and each
    # internally duplicate-free by construction (e_cd from distinct
    # hosts, e_ds/e_ss keyed by the deduped section id, page_parent one
    # row per url of the url-keyed input) — a dropDuplicates here was a
    # full edge-scale exchange that removed nothing (oracle-verified).
    edges = (
        e_cd.unionByName(e_ds).unionByName(e_ss).unionByName(page_parent)
        .select(edge_id(F.col("type"), F.col("src"), F.col("dst")).alias("id"),
                "type", "src", "dst")
    )
    return nodes, edges
