"""W3 — tightest-containing-span attribution window.

Web retarget of GitNexus's caller attribution: a call site is attributed
to the TIGHTEST containing definition span (reference
call-processor.ts:771-802 — smallest enclosing range wins, kind rank as
tiebreak). Here: attribute an item (e.g. a mention at [start, end)) to
the smallest same-document span (e.g. a triple/sentence span) containing
it.

Shape at scale: the only shuffle is the same-document equi-join — both
sides derive from the extraction scan and co-partition on url; the
containment predicate and the winner window run within each document's
rows (documents are small, the window partition is (url, start, end) of
one item — never a hot key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tightest_containing_span(
    items: DataFrame,
    spans: DataFrame,
    on: str = "url",
    item_start: str = "start",
    item_end: str = "end",
    span_start: str = "t_start",
    span_end: str = "t_end",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """items + (span_start, span_end) of the tightest containing span.

    Winner order: span length ASC (tightest), span start ASC, then any
    ``tiebreak_cols`` (the reference's kind-rank analogue) — a total
    order, deterministic under any parallelism (the reference's pick
    depends on array order). Items with no containing span are dropped
    (the reference skips unattributable call sites).
    """
    j = items.join(spans, on).filter(
        (F.col(span_start) <= F.col(item_start))
        & (F.col(span_end) >= F.col(item_end))
    )
    order = [
        (F.col(span_end) - F.col(span_start)).asc(),
        F.col(span_start).asc(),
    ] + [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(on, item_start, item_end).orderBy(*order)
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
