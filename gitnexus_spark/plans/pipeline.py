"""Four-pass KG construction pipeline with checkpoint/resume + lineage.

Orchestration mirror of GitNexus's GraphPipeline.run
(reference src/core/ingestion/pipeline.ts:32-136): four ordered passes with
data dependencies (pass 3 needs pass 2's extraction; pass 4 needs pass 3's
links), plus the integrity validation of pipeline.ts:155-251 re-expressed
as DataFrame anti-joins.

Differences by design (Spark-first, not a port):
- every pass CHECKPOINTS its output as a partitioned parquet table
  (Iceberg in production — same layout, snapshot-tagged); a re-run skips
  passes whose _SUCCESS marker exists → resumable mid-run (north star).
- lineage/counters: each pass appends (pass, table, rows, wall_sec) to a
  `_lineage` table — the distributed replacement for the reference's
  console statistics (call-processor.ts:43-56).
- ids are deterministic content hashes, so re-runs are idempotent.

Final graph model (reference kuzu.service.ts:74-164, one table per
label/type -> ONE nodes table partitioned by label + ONE edges table
partitioned by type):

  nodes(id, label, name, url)            labels: Corpus Domain Section Page Entity
  edges(id, type, src, dst, confidence)  types:  CONTAINS LINKS_TO MENTIONS
                                                 FOUNDED ACQUIRED ... (pred edges)
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.html import extract_text
from ..functions.ids import edge_id, node_id
from ..operators import extract as ex
from ..operators.components import canonical_entities
from ..operators.linking import entity_registry
from ..operators.structure import structure_graph


def _table(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, name)


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


class KGPipeline:
    """Resumable four-pass pipeline over a pages corpus."""

    def __init__(self, spark: SparkSession, out_dir: str,
                 alias_dict: DataFrame | None = None,
                 count_rows: bool = True) -> None:
        self.spark = spark
        self.out_dir = out_dir
        self.alias_dict = alias_dict
        # count_rows=False skips the per-pass row-count job (half the jobs
        # in a run) -- rows land in lineage as -1; use for benchmarking,
        # keep True in production where lineage counters matter.
        self.count_rows = count_rows
        self._lineage_rows: list[tuple] = []

    # -- lineage ------------------------------------------------------------
    def _write(self, df: DataFrame, name: str, partition_by: list[str] | None = None,
               observe: bool = True) -> DataFrame:
        path = _table(self.out_dir, name)
        t0 = time.time()
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        out = self.spark.read.parquet(path)
        rows = out.count() if (observe and self.count_rows) else -1
        self._lineage_rows.append((name, path, rows, round(time.time() - t0, 3)))
        return out

    def _load_or(self, name: str, builder, partition_by=None) -> DataFrame:
        path = _table(self.out_dir, name)
        if _done(path):  # resume: pass already committed
            self._lineage_rows.append((name, path, -1, 0.0))
            return self.spark.read.parquet(path)
        return self._write(builder(), name, partition_by)

    def lineage(self) -> DataFrame:
        return self.spark.createDataFrame(
            self._lineage_rows, ["pass", "table", "rows", "wall_sec"]
        )

    def write_lineage(self) -> str:
        """Persist per-pass counters to <out_dir>/_lineage (append mode —
        one batch per (re)run, so resume history is auditable). The
        distributed replacement for the reference's console statistics
        (call-processor.ts:43-56)."""
        path = _table(self.out_dir, "_lineage")
        self.lineage().withColumn("run_ts", F.current_timestamp()) \
            .write.mode("append").parquet(path)
        return path

    # -- passes ---------------------------------------------------------------
    def run(self, pages: DataFrame) -> dict[str, DataFrame]:
        # Defensive parallelism floor: the pass-1/2 mapInPandas stages are
        # CPU-bound per document; an under-partitioned input (e.g. one
        # small parquet file) would serialize them. At cluster scale the
        # input table's own splits dominate and this is a no-op.
        target = self.spark.sparkContext.defaultParallelism * 2
        if pages.rdd.getNumPartitions() < target:
            pages = pages.repartition(target)
        # pass 1: deterministic text extraction (+content hash for dedup)
        def p1():
            t = extract_text(pages.select("url", "warc_ts", "html", "lang"))
            return t.select(
                "url", "warc_ts", "lang",
                F.col("text_extracted").alias("text"),
                F.md5(F.col("text_extracted")).alias("content_hash"),
            )
        pages_text = self._load_or("pages_text", p1)

        # pass 1b: structure graph (computed once; url projection persisted
        # so the nodes and edges jobs share the scan)
        _struct_cache: dict[str, DataFrame] = {}

        def _struct() -> tuple[DataFrame, DataFrame]:
            if "n" not in _struct_cache:
                src = pages_text.select("url").persist()
                n, e = structure_graph(src)
                _struct_cache["n"], _struct_cache["e"] = n, e
            return _struct_cache["n"], _struct_cache["e"]

        struct_nodes = self._load_or("struct_nodes", lambda: _struct()[0])
        struct_edges = self._load_or("struct_edges", lambda: _struct()[1])

        # pass 2: one-scan extraction (mentions + triples + links)
        def p2():
            withhtml = pages_text.join(pages.select("url", "html"), "url")
            return ex.extract_all(withhtml)
        extracted = self._load_or("extracted", p2, partition_by=["item"])

        mentions = ex.mentions(extracted)
        raw_triples = ex.triples(extracted)
        page_links = ex.links(extracted)

        # pass 3: registry -> 3-stage linking -> CC canonicalization
        def p3_registry():
            return entity_registry(mentions)
        registry = self._load_or("entities", p3_registry)

        # 3a: classify every distinct endpoint surface form through the
        # 3-stage linker (name-granular: the endpoint dimension is small
        # relative to the fact table, so this join is cheap and the result
        # broadcastable back onto triples).
        def p3_linked():
            from ..operators.linking import link_mentions
            endpoints = (
                raw_triples.select(F.col("subj").alias("name"))
                .unionByName(raw_triples.select(F.col("obj").alias("name")))
                .dropDuplicates(["name"])
                .select(F.lit("").alias("doc_url"), "name", F.lit("any").alias("role"))
            )
            return link_mentions(endpoints, registry, self.alias_dict) \
                .select("name", "canonical_name", "stage", "confidence")
        linked = self._load_or("name_links", p3_linked)

        # 3b: coreference merge over the entity dimension (CC union-find)
        def p3_canon():
            return canonical_entities(registry, linked, self.alias_dict)
        canon = self._load_or("canonical_map", p3_canon)

        # 3c: resolve triple endpoints: raw surface form -> CC canonical.
        # Both maps are vocabulary-sized -> broadcast joins, no fact shuffle.
        def p3_resolved():
            stagemap = linked.select(
                "name", "stage", "confidence",
            ).join(canon, "name", "left") \
             .select("name", F.coalesce("canonical", "name").alias("resolved"),
                     "stage", "confidence")
            s = stagemap.select(F.col("name").alias("subj"),
                                F.col("resolved").alias("subj_c"),
                                F.col("stage").alias("subj_stage"),
                                F.col("confidence").alias("subj_conf"))
            o = stagemap.select(F.col("name").alias("obj"),
                                F.col("resolved").alias("obj_c"),
                                F.col("stage").alias("obj_stage"),
                                F.col("confidence").alias("obj_conf"))
            return (
                raw_triples.join(F.broadcast(s), "subj", "left")
                           .join(F.broadcast(o), "obj", "left")
                .select(
                    "doc_url", "pred",
                    F.coalesce("subj_c", "subj").alias("subj"),
                    F.coalesce("obj_c", "obj").alias("obj"),
                    "subj_stage", "obj_stage",
                    (F.coalesce("subj_conf", F.lit(0.0))
                     * F.coalesce("obj_conf", F.lit(0.0))).alias("confidence"),
                )
            )
        resolved = self._load_or("triples_resolved", p3_resolved)

        # pass 4: final nodes/edges, partitioned by label / type
        def p4_nodes():
            ents = (
                canon.select("canonical").dropDuplicates(["canonical"])
                .select(
                    node_id("Entity", F.col("canonical")).alias("id"),
                    F.lit("Entity").alias("label"),
                    F.col("canonical").alias("name"),
                    F.lit(None).cast("string").alias("url"),
                )
            )
            return struct_nodes.unionByName(ents).dropDuplicates(["id"])
        nodes = self._load_or("nodes", p4_nodes, partition_by=["label"])

        def p4_edges():
            page_ids = pages_text.select(
                "url", node_id("Page", F.col("url")).alias("page_id"))
            # LINKS_TO: page -> page (IMPORTS analogue, endpoint join J4)
            lt = (
                page_links
                .join(page_ids, "url")
                .join(page_ids.withColumnRenamed("url", "target_url")
                              .withColumnRenamed("page_id", "target_id"),
                      "target_url", "inner")
                .select(F.lit("LINKS_TO").alias("type"),
                        F.col("page_id").alias("src"),
                        F.col("target_id").alias("dst"),
                        F.lit(1.0).alias("confidence"))
            )
            # MENTIONS: page -> canonical entity (DEFINES analogue)
            men = (
                mentions.join(F.broadcast(canon), "name", "left")
                .join(page_ids, "url")
                .select(F.lit("MENTIONS").alias("type"),
                        F.col("page_id").alias("src"),
                        node_id("Entity", F.coalesce("canonical", "name")).alias("dst"),
                        F.lit(1.0).alias("confidence"))
            )
            # predicate edges: entity -> entity (CALLS analogue); only fully
            # resolved triples become edges (ref: unresolved calls are counted,
            # not emitted — call-processor.ts:93-119)
            pe = (
                resolved
                .filter(F.col("subj_stage") != "failed")
                .filter(F.col("obj_stage") != "failed")
                .select(F.upper("pred").alias("type"),
                        node_id("Entity", F.col("subj")).alias("src"),
                        node_id("Entity", F.col("obj")).alias("dst"),
                        "confidence")
            )
            return (
                struct_edges.select("type", "src", "dst",
                                    F.lit(1.0).alias("confidence"))
                .unionByName(lt).unionByName(men).unionByName(pe)
                .dropDuplicates(["type", "src", "dst"])
                .select(edge_id(F.col("type"), F.col("src"), F.col("dst")).alias("id"),
                        "type", "src", "dst", "confidence")
            )
        edges = self._load_or("edges", p4_edges, partition_by=["type"])

        return {
            "pages_text": pages_text, "extracted": extracted,
            "mentions": mentions, "triples_raw": raw_triples,
            "links": page_links, "entities": registry,
            "triples_resolved": resolved, "canonical_map": canon,
            "nodes": nodes, "edges": edges,
        }


def integrity_checks(nodes: DataFrame, edges: DataFrame) -> dict[str, int]:
    """Graph well-formedness as anti-joins — all must be 0
    (reference validateGraphIntegrity, pipeline.ts:155-251)."""
    ids = nodes.select("id")
    orphan_src = edges.join(ids.withColumnRenamed("id", "src"), "src", "left_anti").count()
    orphan_dst = edges.join(ids.withColumnRenamed("id", "dst"), "dst", "left_anti").count()
    # isolated: no edge touches the node (U3, pipeline.ts:88-101)
    touched = edges.select(F.col("src").alias("id")) \
                   .unionByName(edges.select(F.col("dst").alias("id"))).dropDuplicates(["id"])
    isolated = nodes.filter(F.col("label") != "Corpus") \
                    .join(touched, "id", "left_anti").count()
    dup_edges = (
        edges.groupBy("type", "src", "dst").count().filter(F.col("count") > 1).count()
    )
    dup_nodes = nodes.groupBy("id").count().filter(F.col("count") > 1).count()
    return {
        "orphan_edge_src": orphan_src,
        "orphan_edge_dst": orphan_dst,
        "isolated_nodes": isolated,
        "duplicate_edges": dup_edges,
        "duplicate_node_ids": dup_nodes,
    }
