"""Pass-1 gate: deterministic, byte-identical HTML -> text extraction.

North-star requirement: per-url extracted text must match the stored
`text` column byte-for-byte (BASELINE.json input_hint). The reference has
no HTML pass (it consumes plain text), so the spec lives in
gitnexus_spark/functions/html.py; these tests pin it.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gitnexus_spark.functions.html import html_to_text
from gitnexus_spark.synthetic import compose_text, render_html

GOLDEN = [
    # (html, expected_text)
    (b"<html><body><p>hello world</p></body></html>", "hello world"),
    (b"<p>a</p><p>b</p>", "a\nb"),
    (b"<p>a &amp; b &lt;c&gt; &#x41;</p>", "a & b <c> A"),
    (b"<head><title>skip me</title></head><body><p>keep</p></body>", "keep"),
    (b"<script>var x = '<p>no</p>';</script><p>yes</p>", "yes"),
    (b"<style>p{}</style><p>yes</p>", "yes"),
    (b"<nav><a href='/x'>boilerplate</a></nav><p>content</p>", "content"),
    (b"<!-- comment --><p>real</p>", "real"),
    (b"<p>  collapse \t  spaces  </p>", "collapse spaces"),
    (b"<p>line1<br>line2</p>", "line1\nline2"),
    (b"<div><span>in</span>line</div>", "inline"),
    (b"<ul><li>one</li><li>two</li></ul>", "one\ntwo"),
    ("<p>café 漢字 \U0001f600</p>".encode("utf-8"), "café 漢字 \U0001f600"),
    (b"<p>crlf\r\nnorm</p>", "crlf norm"),
    (b"", ""),
    (None, ""),
    (b"plain text no tags", "plain text no tags"),
    (b"<p>nested <b>bold <i>italic</i></b> end</p>", "nested bold italic end"),
    # nav nested inside body with content on both sides
    (b"<body><p>a</p><nav><ul><li>m1</li></ul></nav><p>b</p></body>", "a\nb"),
    # lone-surrogate-free replacement decoding
    (b"<p>bad \xff byte</p>", "bad � byte"),
]


@pytest.mark.parametrize("html,expected", GOLDEN)
def test_golden(html, expected):
    assert html_to_text(html) == expected


@given(st.integers(min_value=0, max_value=10_000),
       st.text(alphabet=st.characters(blacklist_categories=("Cs", "Cc")), max_size=200))
@settings(max_examples=200, deadline=None)
def test_roundtrip_render_extract(doc_id, raw):
    """synthetic render -> extract is the identity on composed text (byte gate)."""
    text = compose_text(doc_id, raw)
    html = render_html(doc_id, "https://h.example.org/p.html", text,
                       ["https://h.example.org/a.html", "https://h.example.org/b.html"])
    extracted = html_to_text(html)
    assert extracted.encode("utf-8") == text.encode("utf-8")


def test_deterministic():
    h = b"<p>same input</p><div>same output</div>"
    assert html_to_text(h) == html_to_text(h) == "same input\nsame output"


def test_spark_extract_matches_text_column(spark, sf_dir):
    """End-to-end: mapInPandas extraction over synthesized pages == text column."""
    from pyspark.sql import functions as F

    from gitnexus_spark.functions.html import extract_text
    from gitnexus_spark.synthetic import synth_pages

    pages = synth_pages(spark, sf_dir)
    extracted = extract_text(pages)
    mismatches = extracted.filter(F.col("text_extracted") != F.col("text")).count()
    assert mismatches == 0
    assert extracted.count() > 0
