"""Deterministic synthetic `pages` corpus (the pipeline's input table).

Schema = BASELINE input_hint: (url, warc_ts, html:binary, text, lang).

Derivation is pure arithmetic over the driver-provided ``documents``
parquet (doc_id, text, lang, source), so a DuckDB oracle can recompute
every expected downstream row by formula — the same trick the reference's
tests use with hand-enumerable fixtures (kuzu-integration.test.ts:36-41).

Injected KG signal per document (all mod-arithmetic on doc_id):

  eid1 = doc_id % 97            eid2 = (doc_id*7+13) % 97
  eid3 = (doc_id*31+5) % 97     pred = PREDS[doc_id % 5]
  subject surface form:
      doc_id % 7 == 6 -> "Entity-{eid1}"   (hyphen variant; only stage-3
                                            fuzzy linking resolves it)
      doc_id % 4 == 3 -> "E{eid1}"         (alias form; stage-1 broadcast
                                            alias-dictionary resolves it)
      else            -> "Entity_{eid1}"   (canonical; stage-2 same-corpus
                                            exact match)
  sentence1 = "{subj} {pred} Entity_{eid2}."
  doc_id % 3 == 0 adds a multi-object sentence:
      "Entity_{eid1} acquired Entity_{eid2} and Entity_{eid3}."
  text = sentence1 [+ " " + sentence2] + " " + normalize_ws(doc text)

  nav links (boilerplate, excluded from extracted text):
      t1 = (doc_id*3+1) % n_docs ; t2 = (doc_id*11+7) % n_docs

The html column is rendered so that functions.html.html_to_text(html)
== text BYTE-IDENTICALLY (the north-star pass-1 gate); rendering wraps
text in one <p>, adds head/title/script/comment/nav boilerplate that the
extractor must drop.
"""

from __future__ import annotations

import html as _html_mod
import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PREDS = ["founded", "acquired", "endorsed", "criticized", "visited"]
N_ENTITIES = 97

# predicate list as a SQL array literal, reused by oracle builders
PREDS_SQL = "['founded','acquired','endorsed','criticized','visited']"


def subject_name(doc_id: int) -> str:
    eid1 = doc_id % N_ENTITIES
    if doc_id % 7 == 6:
        return f"Entity-{eid1}"
    if doc_id % 4 == 3:
        return f"E{eid1}"
    return f"Entity_{eid1}"


def page_url(doc_id: int, source: str, lang: str) -> str:
    return f"https://{source}.example.org/{lang}/s{doc_id % 10}/p{doc_id}.html"


def compose_text(doc_id: int, raw_text: str) -> str:
    eid1, eid2, eid3 = (
        doc_id % N_ENTITIES,
        (doc_id * 7 + 13) % N_ENTITIES,
        (doc_id * 31 + 5) % N_ENTITIES,
    )
    pred = PREDS[doc_id % 5]
    parts = [f"{subject_name(doc_id)} {pred} Entity_{eid2}."]
    if doc_id % 3 == 0:
        parts.append(f"Entity_{eid1} acquired Entity_{eid2} and Entity_{eid3}.")
    norm = " ".join((raw_text or "").split())
    if norm:
        parts.append(norm)
    return " ".join(parts)


def render_html(doc_id: int, url: str, text: str, nav_urls: list[str]) -> bytes:
    """Render a page whose extracted text is exactly ``text``."""
    nav = " ".join(f'<a href="{u}">L{i}</a>' for i, u in enumerate(nav_urls))
    doc = (
        "<!DOCTYPE html><html><head>"
        f"<title>Page {doc_id}</title>"
        "<style>body{margin:0}</style>"
        "<script>var boilerplate = 1;</script>"
        "</head><body>"
        "<!-- generated page -->"
        f"<nav>{nav}</nav>"
        f"<p>{_html_mod.escape(text, quote=False)}</p>"
        "</body></html>"
    )
    return doc.encode("utf-8")


_SYNTH_NDOCS: dict[tuple, int] = {}


def replicate_pages(pages: DataFrame, rep: int) -> DataFrame:
    """rep deterministic url variants per page (same text/html) — scales a
    small synthetic corpus to bench/scaling input sizes. Lives in the
    package (not bench.py) so a `spark-submit --py-files gitnexus_spark.zip`
    deployment resolves it."""
    if rep <= 1:
        return pages
    return pages.crossJoin(
        F.broadcast(pages.sparkSession.range(rep).select(F.col("id").alias("rep_i")))
    ).withColumn("url", F.concat_ws("", "url", F.lit("?v="), F.col("rep_i"))) \
     .drop("rep_i")


def synth_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> pages(url, warc_ts, html, text, lang).

    Column derivations are Catalyst expressions; only html rendering runs
    in an Arrow-batched mapInPandas stage (string assembly + utf-8 encode).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # n_docs memoized per (sf_dir, file mtimes+sizes): it feeds the
    # nav-link arithmetic as a literal, and running a count() job (plus
    # the former rdd.getNumPartitions() probe) on EVERY call taxed each
    # bench/oracle run's fixed cost (VERDICT r02 what's-wrong #5). The
    # fingerprint in the key makes in-process dataset regeneration at
    # the same path invalidate the memo instead of silently producing
    # wrong link structure (r3 ADVICE).
    ppath = f"{sf_dir}/documents.parquet"
    if os.path.isdir(ppath):
        stats = tuple(sorted(
            (n, os.path.getmtime(os.path.join(ppath, n)),
             os.path.getsize(os.path.join(ppath, n)))
            for n in os.listdir(ppath) if not n.startswith(".")))
    else:
        st = os.stat(ppath)
        stats = ((ppath, st.st_mtime, st.st_size),)
    memo_key = (sf_dir, stats)
    n_docs = _SYNTH_NDOCS.get(memo_key)
    if n_docs is None:
        n_docs = docs.count()
        _SYNTH_NDOCS.clear()
        _SYNTH_NDOCS[memo_key] = n_docs
    # the driver parquet is a single small file -> 1 input split; spread it
    # so the (Python-bound) render/extract stages use every core
    target = spark.sparkContext.defaultParallelism * 2
    docs = docs.repartition(target)

    d = docs.select(
        F.col("doc_id"),
        F.col("lang"),
        F.col("source"),
        F.col("text").alias("raw_text"),
    )
    base = d.select(
        "doc_id",
        F.concat(
            F.lit("https://"), "source", F.lit(".example.org/"), "lang",
            F.lit("/s"), (F.col("doc_id") % 10).cast("string"),
            F.lit("/p"), F.col("doc_id").cast("string"), F.lit(".html"),
        ).alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        "lang",
        "source",
        "raw_text",
        ((F.col("doc_id") * 3 + 1) % n_docs).alias("t1"),
        ((F.col("doc_id") * 11 + 7) % n_docs).alias("t2"),
    )

    from pyspark.sql.types import (BinaryType, StringType, StructField,
                                   StructType, TimestampType)
    import pandas as pd

    out_schema = StructType([
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ])

    # nav targets need (source, lang) of the target doc to build its url;
    # join the (small) id->url projection twice, broadcast.
    url_dim = base.select(F.col("doc_id").alias("tid"), F.col("url").alias("turl"))
    with_t = (
        base.join(F.broadcast(url_dim.withColumnRenamed("tid", "t1")
                              .withColumnRenamed("turl", "t1_url")), "t1")
            .join(F.broadcast(url_dim.withColumnRenamed("tid", "t2")
                              .withColumnRenamed("turl", "t2_url")), "t2")
    )

    def render(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            texts = [compose_text(i, t) for i, t in zip(pdf["doc_id"], pdf["raw_text"])]
            htmls = [
                render_html(i, u, txt, [u1, u2])
                for i, u, txt, u1, u2 in zip(
                    pdf["doc_id"], pdf["url"], texts, pdf["t1_url"], pdf["t2_url"]
                )
            ]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "warc_ts": pdf["warc_ts"],
                    "html": htmls,
                    "text": texts,
                    "lang": pdf["lang"],
                }
            )

    return with_t.mapInPandas(render, schema=out_schema)


def alias_dictionary(spark: SparkSession) -> DataFrame:
    """Broadcastable alias dictionary (alias -> canonical_name).

    The web analogue of GitNexus's ImportMap (import-processor.ts:38-46):
    a small dimension resolving alias surface forms to canonical entities.
    E{k} -> Entity_{k} for the synthetic corpus's 97 entities.
    """
    rows = [(f"E{k}", f"Entity_{k}") for k in range(N_ENTITIES)]
    return spark.createDataFrame(rows, ["alias", "canonical_name"])


# ---------------------------------------------------------------------------
# SQL fragments for DuckDB oracles (documents view -> expected pages columns).
# Mirrors compose_text()/page_url() exactly; keep the two in lockstep.
# ---------------------------------------------------------------------------

SQL_URL = (
    "'https://' || source || '.example.org/' || lang || '/s' || "
    "CAST(doc_id % 10 AS VARCHAR) || '/p' || CAST(doc_id AS VARCHAR) || '.html'"
)

SQL_SUBJ = (
    "CASE WHEN doc_id % 7 = 6 THEN 'Entity-' || CAST(doc_id % 97 AS VARCHAR) "
    "WHEN doc_id % 4 = 3 THEN 'E' || CAST(doc_id % 97 AS VARCHAR) "
    "ELSE 'Entity_' || CAST(doc_id % 97 AS VARCHAR) END"
)

SQL_PRED = f"{PREDS_SQL}[(doc_id % 5) + 1]"

SQL_OBJ = "'Entity_' || CAST((doc_id*7+13) % 97 AS VARCHAR)"

SQL_TEXT = (
    f"{SQL_SUBJ} || ' ' || {SQL_PRED} || ' ' || {SQL_OBJ} || '.'"
    " || CASE WHEN doc_id % 3 = 0 THEN"
    " ' Entity_' || CAST(doc_id % 97 AS VARCHAR) ||"
    " ' acquired Entity_' || CAST((doc_id*7+13) % 97 AS VARCHAR) ||"
    " ' and Entity_' || CAST((doc_id*31+5) % 97 AS VARCHAR) || '.'"
    " ELSE '' END"
    " || CASE WHEN trim(regexp_replace(text, '\\s+', ' ', 'g')) = '' THEN ''"
    " ELSE ' ' || trim(regexp_replace(text, '\\s+', ' ', 'g')) END"
)
