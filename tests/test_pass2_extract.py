"""Pass-2 extraction: mentions, triples (with coordination), links.

Fixture style mirrors the reference's canned-snippet harnesses
(src/lib/import-extraction-test.ts:4-24) — hand-enumerable inputs with
exact expected rows, per extraction form (FIXTURES.md T2).
"""

from gitnexus_spark.operators.extract import _extract_doc


def rows(text=None, html=None):
    return _extract_doc("u", text, html)


def mention_names(text):
    return [r[2] for r in rows(text=text) if r[1] == "mention"]


def triple_tuples(text):
    return [(r[2], r[3], r[4]) for r in rows(text=text) if r[1] == "triple"]


def test_simple_mention_and_triple():
    t = "Alice Smith founded Acme Corp."
    assert mention_names(t) == ["Alice Smith", "Acme Corp"]
    assert triple_tuples(t) == [("Alice Smith", "founded", "Acme Corp")]


def test_multi_object_coordination():
    t = "Acme acquired Foo and Bar."
    assert triple_tuples(t) == [("Acme", "acquired", "Foo"), ("Acme", "acquired", "Bar")]


def test_duplicate_mention_same_doc_deduped():
    t = "Acme rocks. Acme rolls."
    assert mention_names(t) == ["Acme"]  # DuplicateDetector analogue


def test_underscore_hyphen_names():
    t = "Entity_12 visited Entity-7."
    assert mention_names(t) == ["Entity_12", "Entity-7"]
    assert triple_tuples(t) == [("Entity_12", "visited", "Entity-7")]


def test_no_triple_without_pred_vocab():
    assert triple_tuples("Alice met Bob.") == []
    assert mention_names("Alice met Bob.") == ["Alice", "Bob"]


def test_empty_and_none():
    assert rows(text="") == []
    assert rows(text=None) == []


def test_link_extraction_from_html():
    h = b'<nav><a href="https://x.org/a.html">A Page</a><a href="/rel">go <b>deep</b></a></nav>'
    got = [(r[2], r[7]) for r in rows(html=h) if r[1] == "link"]
    assert got == [("A Page", "https://x.org/a.html"), ("go deep", "/rel")]


def test_mentions_filter_spark(spark):
    """Stop-entity anti-join + min-length filter (F10/F11 analogues)."""
    from gitnexus_spark.operators.extract import extract_all, mentions

    df = spark.createDataFrame(
        [("u1", "The Acme team met It and Zorg.", None)],
        "url string, text string, html binary",
    )
    ext = extract_all(df)
    got = sorted(r["name"] for r in mentions(ext).collect())
    # "The Acme" is one capitalized span; "It" and single chars dropped
    assert got == ["The Acme", "Zorg"] or got == ["Acme", "Zorg"]


def test_extract_all_counts_match_formula(spark, sf_dir):
    """Corpus-level: triple count per doc = 1 + 2*[doc_id%3==0]."""
    from pyspark.sql import functions as F

    from gitnexus_spark.operators.extract import extract_all, triples
    from gitnexus_spark.synthetic import synth_pages

    pages = synth_pages(spark, sf_dir)
    tri = triples(extract_all(pages))
    n_docs = pages.count()
    expected = n_docs + 2 * ((n_docs + 2) // 3)  # doc_ids 0..n-1, %3==0 count
    assert tri.count() == expected
