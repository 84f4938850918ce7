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

EXTRACTED_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("item", StringType()),       # mention | triple | link
    StructField("name", StringType()),       # mention name / triple subj / link anchor
    StructField("pred", StringType()),       # triple only
    StructField("obj", StringType()),        # triple only
    StructField("start", IntegerType()),     # char offset (mention/triple)
    StructField("end", IntegerType()),
    StructField("target_url", StringType()), # link only
])


def _extract_doc(url: str, text: str, html: bytes | None) -> list[tuple]:
    rows: list[tuple] = []
    seen_mentions: set[str] = set()
    if text:
        for m in MENTION_RE.finditer(text):
            name = m.group(0)
            if name in seen_mentions:          # per-doc DuplicateDetector
                continue
            seen_mentions.add(name)
            rows.append((url, "mention", name, None, None, m.start(), m.end(), None))
        for t in TRIPLE_RE.finditer(text):
            subj, pred, obj_list = t.group(1), t.group(2), t.group(3)
            for obj in OBJ_SPLIT_RE.split(obj_list):
                rows.append((url, "triple", subj, pred, obj, t.start(), t.end(), None))
    if html:
        for h in HREF_RE.finditer(bytes(html)):
            target = h.group(1).decode("utf-8", errors="replace")
            anchor = TAG_RE.sub(b"", h.group(2)).decode("utf-8", errors="replace").strip()
            rows.append((url, "link", anchor, None, None, None, None, target))
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
    """(doc_url, subj, pred, obj) raw triples (pre-linking)."""
    return (
        extracted.filter(F.col("item") == "triple")
        .select(F.col("url").alias("doc_url"), F.col("name").alias("subj"),
                "pred", "obj", "start")
    )


def links(extracted: DataFrame) -> DataFrame:
    """(url, target_url, anchor) hyperlink edges — the IMPORTS analogue
    (reference import-processor.ts:611-645)."""
    return (
        extracted.filter(F.col("item") == "link")
        .select("url", "target_url", F.col("name").alias("anchor"))
    )
