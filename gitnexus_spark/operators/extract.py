"""Pass 2 — vectorized mention / triple / link extraction.

Web retarget of GitNexus's ParsingProcessor + ImportProcessor extraction
stages (reference src/core/ingestion/parsing-processor.ts:374-519 definition
extraction driven by declarative tree-sitter query packs
tree-sitter-queries.ts:2-257; import extraction import-processor.ts:160-441).

Design carried over: extraction rules are DATA (regex rule packs), the
executor is ONE Arrow-batched ``mapInPandas`` stage — the Spark analogue of
the reference's worker-pool parse stage (web-worker-pool.ts), except Spark's
task scheduler replaces the reference's barrier-per-batch pool.

One scan emits a single tall `extracted` table (item ∈ {mention, triple,
link}); mentions/triples/links are cheap filtered projections of it, so a
100 TB corpus is read ONCE, not three times.

Noise filtering mirrors the reference:
- 1-char / placeholder names dropped (parsing-processor.ts:443-457)
- stop-entity dictionary as a broadcast anti-join, the web analogue of the
  builtin-call filter (call-processor.ts:337-528)
- per-document mention dedup (DuplicateDetector, shared-utils.ts:131)
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, StringType, StructField,
                               StructType)

# --- rule packs (data, not code; ports the tree-sitter query-pack design) ---

# A mention: capitalized token optionally extended by more capitalized
# tokens ("Alice Smith") or joined by _ / - ("Entity_12", "Entity-12").
MENTION_PATTERN = r"[A-Z][A-Za-z0-9_-]*(?: [A-Z][A-Za-z0-9_-]*)*"

# Predicate vocabulary for (subj, pred, obj) extraction; extensible pack.
PRED_VOCAB = ["founded", "acquired", "endorsed", "criticized", "visited",
              "launched", "owns", "leads", "joined", "left"]

# Stop-entity list (web analogue of ~450 builtin names,
# call-processor.ts:337-528). Sentence-initial function words and
# web-boilerplate words that capitalize.
STOP_ENTITIES = [
    "The", "A", "An", "It", "He", "She", "They", "We", "You", "I",
    "This", "That", "These", "Those", "But", "And", "Or", "If", "When",
    "Home", "About", "Contact", "Login", "Register", "Search", "Menu",
    "Next", "Prev", "Previous", "More", "Read", "Click", "Here",
]

MENTION_RE = re.compile(MENTION_PATTERN)
TRIPLE_RE = re.compile(
    rf"({MENTION_PATTERN}) ({'|'.join(PRED_VOCAB)}) "
    rf"({MENTION_PATTERN}(?: and {MENTION_PATTERN})*)"
)
OBJ_SPLIT_RE = re.compile(r" and ")
HREF_RE = re.compile(rb'<a\s[^>]*href="([^"]+)"[^>]*>(.*?)</a>', re.DOTALL)
TAG_RE = re.compile(rb"<[^>]*>")

from pyspark.sql.types import BooleanType

EXTRACTED_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("item", StringType()),       # mention | triple | link
    StructField("name", StringType()),       # mention name / triple subj / link anchor
    StructField("pred", StringType()),       # triple only
    StructField("obj", StringType()),        # triple only
    StructField("start", IntegerType()),     # char offset (mention/triple)
    StructField("end", IntegerType()),
    StructField("target_url", StringType()), # link only
    # triple only: does the endpoint's surface form match a DEFINITION
    # (triple subject) of the SAME document? Computed scan-local while the
    # document is in hand, so the same-document linking stage (J2, reference
    # call-processor.ts:222-235 / trie.ts:119-123) costs ZERO joins at
    # 10^12-doc scale — the doc-context signal travels on the row itself.
    StructField("subj_samedoc", BooleanType()),
    StructField("obj_samedoc", BooleanType()),
])


def _extract_doc(url: str, text: str, html: bytes | None) -> list[tuple]:
    rows: list[tuple] = []
    seen_mentions: set[str] = set()
    triple_rows: list[tuple] = []
    if text:
        for m in MENTION_RE.finditer(text):
            name = m.group(0)
            if name in seen_mentions:          # per-doc DuplicateDetector
                continue
            seen_mentions.add(name)
            rows.append((url, "mention", name, None, None, m.start(), m.end(),
                         None, None, None))
        for t in TRIPLE_RE.finditer(text):
            subj, pred, obj_list = t.group(1), t.group(2), t.group(3)
            for obj in OBJ_SPLIT_RE.split(obj_list):
                triple_rows.append((subj, pred, obj, t.start(), t.end()))
        # same-document definition index: the doc's triple SUBJECTS (the web
        # analogue of the reference's per-file definition set, trie.ts:119)
        defs = {tr[0] for tr in triple_rows}
        for subj, pred, obj, start, end in triple_rows:
            rows.append((url, "triple", subj, pred, obj, start, end, None,
                         subj in defs, obj in defs))
    if html:
        for h in HREF_RE.finditer(bytes(html)):
            target = h.group(1).decode("utf-8", errors="replace")
            anchor = TAG_RE.sub(b"", h.group(2)).decode("utf-8", errors="replace").strip()
            rows.append((url, "link", anchor, None, None, None, None, target,
                         None, None))
    return rows


def extract_all(pages: DataFrame, text_col: str = "text",
                carry_cols: list[str] | None = None) -> DataFrame:
    """pages -> tall extracted(url, item, name, pred, obj, start, end, target_url).

    Single corpus scan; per-document regex work inside Arrow batches.
    carry_cols: input columns copied onto every emitted row (e.g. warc_ts
    for event-time streaming aggregation).
    """
    import pandas as pd
    from pyspark.sql.types import StructType

    carry = carry_cols or []
    src = pages.select("url", F.col(text_col).alias("text"), "html", *carry)
    carry_fields = [f for f in pages.schema.fields if f.name in carry]
    schema = StructType(EXTRACTED_SCHEMA.fields + carry_fields)

    def run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.name for f in EXTRACTED_SCHEMA.fields]
        for pdf in it:
            out: list[tuple] = []
            idx: list[int] = []
            for i, (url, text, html) in enumerate(zip(pdf["url"], pdf["text"], pdf["html"])):
                rows = _extract_doc(url, text, html)
                out.extend(rows)
                idx.extend([i] * len(rows))
            res = pd.DataFrame(out, columns=cols)
            for c in carry:
                res[c] = pdf[c].iloc[idx].reset_index(drop=True) if idx else pdf[c].iloc[:0]
            yield res

    return src.mapInPandas(run, schema=schema)


# fused pass-1+2 output: extraction rows + one item='page' row per document
# carrying the extracted text (so downstream NEVER re-joins the heavy html
# column back onto derived tables — VERDICT r01 what's-wrong #3)
CORPUS_SCHEMA = StructType(EXTRACTED_SCHEMA.fields + [
    StructField("text", StringType()),          # page only
    StructField("content_hash", StringType()),  # page only: md5(text)
])


def extract_corpus(pages: DataFrame, carry_cols: list[str] | None = None) -> DataFrame:
    """Fused pass 1+2: ONE scan of pages(url, html, ...) emits the tall
    corpus table (item ∈ {page, mention, triple, link}).

    - item='page' rows carry the deterministic html->text extraction
      (functions.html.html_to_text — the byte-identical pass-1 gate) and
      its md5 content hash;
    - mention/triple rows are extracted from that SAME in-hand text;
    - link rows come from the raw html, also in hand.

    The html column is read once and never shuffled: at 100 TB the input
    scan is the only stage that touches it. carry_cols (e.g. warc_ts,
    lang) are copied onto the page rows.
    """
    import hashlib

    import pandas as pd

    from ..functions.html import html_to_text

    carry = carry_cols or []
    src = pages.select("url", "html", *carry)
    carry_fields = [f for f in pages.schema.fields if f.name in carry]
    schema = StructType(CORPUS_SCHEMA.fields + carry_fields)
    n_base = len(CORPUS_SCHEMA.fields)

    def run(it) -> "pd.DataFrame":
        cols = [f.name for f in schema.fields]
        for pdf in it:
            out: list[tuple] = []
            carries = [pdf[c] for c in carry]
            for i, (url, html) in enumerate(zip(pdf["url"], pdf["html"])):
                text = html_to_text(html)
                chash = hashlib.md5(text.encode("utf-8")).hexdigest()
                cvals = tuple(c.iloc[i] for c in carries)
                out.append((url, "page", None, None, None, None, None, None,
                            None, None, text, chash) + cvals)
                for r in _extract_doc(url, text, html):
                    out.append(r + (None, None) + cvals)
            yield pd.DataFrame(out, columns=cols)

    assert n_base == 12, "CORPUS_SCHEMA drifted; update extract_corpus emit tuples"
    return src.mapInPandas(run, schema=schema)


def pages_text(corpus: DataFrame, carry_cols: list[str] | None = None) -> DataFrame:
    """item='page' projection of extract_corpus output (partition-pruned
    when the corpus table is written partitioned by item)."""
    carry = carry_cols or []
    return corpus.filter(F.col("item") == "page") \
        .select("url", "text", "content_hash", *carry)


def mentions(extracted: DataFrame, min_len: int = 2,
             stop_entities: list[str] | None = None) -> DataFrame:
    """Filtered mention projection: noise + stop-entity anti-join.

    (url, name, start, end) — the web analogue of definition rows.
    """
    stops = stop_entities if stop_entities is not None else STOP_ENTITIES
    spark = extracted.sparkSession
    stop_df = spark.createDataFrame([(s,) for s in stops], ["name"])
    return (
        extracted.filter(F.col("item") == "mention")
        .filter(F.length("name") >= min_len)
        .join(F.broadcast(stop_df), "name", "left_anti")
        .select("url", "name", "start", "end")
    )


def triples(extracted: DataFrame) -> DataFrame:
    """(doc_url, subj, pred, obj, start, subj_samedoc, obj_samedoc) raw
    triples (pre-linking); the samedoc flags feed the same-document
    linking stage with zero joins."""
    return (
        extracted.filter(F.col("item") == "triple")
        .select(F.col("url").alias("doc_url"), F.col("name").alias("subj"),
                "pred", "obj", "start", "subj_samedoc", "obj_samedoc")
    )


def extraction_diagnostics(extracted: DataFrame,
                           pages_text: DataFrame | None = None) -> DataFrame:
    """A9 parsing diagnostics (reference per-file parse statistics,
    parsing-processor.ts console counters): per-document extraction
    yields — (url, n_mentions, n_triples, n_links[, text_chars]).

    One grouped aggregation over the (already url-partitioned) extracted
    table; conditional sums, no extra scans.
    """
    d = extracted.filter(F.col("item") != "page").groupBy("url").agg(
        F.sum((F.col("item") == "mention").cast("int")).alias("n_mentions"),
        F.sum((F.col("item") == "triple").cast("int")).alias("n_triples"),
        F.sum((F.col("item") == "link").cast("int")).alias("n_links"),
    )
    if pages_text is not None:
        d = d.join(pages_text.select("url", F.length("text").alias("text_chars")),
                   "url", "left")
    return d


def links(extracted: DataFrame) -> DataFrame:
    """(url, target_url, anchor) hyperlink edges — the IMPORTS analogue
    (reference import-processor.ts:611-645)."""
    return (
        extracted.filter(F.col("item") == "link")
        .select("url", "target_url", F.col("name").alias("anchor"))
    )
