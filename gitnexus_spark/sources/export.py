"""Graph export sinks — JSON + Neo4j-bulk-import CSV.

Reference: src/lib/export.ts — exportGraphToJSON (export.ts:34-68) and
the Neo4j-style CSV pair with RFC-4180 quoting (export.ts:73-158,
escapeCSVValue :149-158). Spark's writers handle quoting/escaping; the
Neo4j bulk-import header convention (`:ID`, `:LABEL`, `:START_ID`,
`:TYPE`, `:END_ID`) is reproduced via column aliases.

Distributed by construction: each sink is a parallel write, not the
reference's single-threaded string concatenation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_graph_json(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """Graph -> JSON-lines (debug/interchange; ref exportGraphToJSON).
    Metadata (counts) lands in <out_dir>/metadata alongside."""
    spark = nodes.sparkSession
    nodes.write.mode("overwrite").json(f"{out_dir}/nodes")
    edges.write.mode("overwrite").json(f"{out_dir}/edges")
    meta = spark.createDataFrame(
        [(nodes.count(), edges.count())], ["node_count", "relationship_count"])
    meta.write.mode("overwrite").json(f"{out_dir}/metadata")


def nodes_to_neo4j_csv(nodes: DataFrame) -> DataFrame:
    """Column layout of generateNodesCSV (export.ts:85-111)."""
    return nodes.select(
        F.col("id").alias(":ID"),
        F.col("name").alias("name"),
        F.coalesce("url", F.lit("")).alias("filePath"),
        F.col("label").alias(":LABEL"),
    )


def edges_to_neo4j_csv(edges: DataFrame) -> DataFrame:
    """Column layout of generateRelationshipsCSV (export.ts:116-144)."""
    return edges.select(
        F.col("src").alias(":START_ID"),
        F.col("type").alias(":TYPE"),
        F.col("dst").alias(":END_ID"),
    )


def export_graph_csv(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """Neo4j bulk-import CSV pair; RFC-4180 quoting is Spark's CSV writer
    (quote doubling on embedded quotes — what escapeCSVValue hand-rolls)."""
    (nodes_to_neo4j_csv(nodes)
     .write.mode("overwrite").option("header", True)
     .option("quoteAll", False).option("escape", '"')
     .csv(f"{out_dir}/nodes_csv"))
    (edges_to_neo4j_csv(edges)
     .write.mode("overwrite").option("header", True)
     .option("escape", '"')
     .csv(f"{out_dir}/edges_csv"))
