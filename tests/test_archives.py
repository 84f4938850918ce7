"""S2 archive sources: ZIP + WARC readers with size guards, end-to-end
into the extraction pipeline (reference ZipService caps, zip.ts:30-31)."""

import datetime as dt
import io
import zipfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def zip_dir(tmp_path):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("site/a.html", "<p>Acme founded Zorg.</p>")
        zf.writestr("site/b.htm", "<p>Beta visited Acme.</p>")
        zf.writestr("site/style.css", "body{}")            # extension guard
        zf.writestr("site/huge.html", "x" * 2048)          # file-size guard (cap below)
    p = tmp_path / "bundle.zip"
    p.write_bytes(buf.getvalue())
    return str(tmp_path)


def test_zip_reader_guards_and_extraction(spark, zip_dir):
    from gitnexus_spark.operators.extract import extract_corpus
    from gitnexus_spark.sources.archives import (pages_from_archive,
                                                 read_zip_pages, skip_report)

    rows = read_zip_pages(spark, zip_dir + "/*.zip", max_file_bytes=1024)
    skips = {r["skip_reason"]: r["n"] for r in skip_report(rows).collect()}
    assert skips == {"extension": 1, "file_too_large": 1}

    pages = pages_from_archive(rows, default_lang="en")
    assert {r["url"].rsplit("!/", 1)[1] for r in pages.collect()} \
        == {"site/a.html", "site/b.htm"}

    corpus = extract_corpus(pages)
    got = {(r["name"], r["pred"], r["obj"])
           for r in corpus.filter("item = 'triple'").collect()}
    assert got == {("Acme", "founded", "Zorg"), ("Beta", "visited", "Acme")}


def test_zip_archive_size_guard(spark, tmp_path):
    from gitnexus_spark.sources.archives import read_zip_pages, skip_report

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a.html", "<p>Hi There.</p>" * 100)
    (tmp_path / "big.zip").write_bytes(buf.getvalue())
    rows = read_zip_pages(spark, str(tmp_path) + "/*.zip", max_archive_bytes=64)
    skips = {r["skip_reason"]: r["n"] for r in skip_report(rows).collect()}
    assert skips == {"archive_too_large": 1}
    assert rows.filter("item = 'page'").count() == 0


def _warc_record(uri: str, date: str, body: bytes, rec_type: bytes = b"response") -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    head = (b"WARC-Type: " + rec_type + b"\r\n"
            b"WARC-Target-URI: " + uri.encode() + b"\r\n"
            b"WARC-Date: " + date.encode() + b"\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n")
    return b"WARC/1.0\r\n" + head + b"\r\n" + http + b"\r\n\r\n"


def test_warc_reader(spark, tmp_path):
    from gitnexus_spark.sources.archives import (pages_from_archive,
                                                 read_warc_pages, skip_report)

    warc = (_warc_record("https://a.org/p1.html", "2024-01-01T00:00:00Z",
                         b"<p>Acme founded Zorg.</p>")
            + _warc_record("https://a.org/p1.html", "2024-01-01T00:00:00Z",
                           b"GET / HTTP/1.1", rec_type=b"request")   # not a response
            + _warc_record("https://a.org/p2.html", "2024-01-02T03:04:05Z",
                           b"<p>Beta visited Acme.</p>"))
    (tmp_path / "crawl.warc").write_bytes(warc)
    rows = read_warc_pages(spark, str(tmp_path) + "/*.warc")
    pages = pages_from_archive(rows, default_lang="en").collect()
    assert {r["url"] for r in pages} == {"https://a.org/p1.html",
                                         "https://a.org/p2.html"}
    by_url = {r["url"]: r for r in pages}
    assert bytes(by_url["https://a.org/p1.html"]["html"]) == b"<p>Acme founded Zorg.</p>"
    assert by_url["https://a.org/p2.html"]["warc_ts"] == dt.datetime(2024, 1, 2, 3, 4, 5)
    assert skip_report(rows).count() == 0


def test_warc_file_size_guard(spark, tmp_path):
    from gitnexus_spark.sources.archives import read_warc_pages, skip_report

    warc = _warc_record("https://a.org/big.html", "2024-01-01T00:00:00Z",
                        b"x" * 4096)
    (tmp_path / "c.warc").write_bytes(warc)
    rows = read_warc_pages(spark, str(tmp_path) + "/*.warc", max_file_bytes=1024)
    skips = {r["skip_reason"]: r["n"] for r in skip_report(rows).collect()}
    assert skips == {"file_too_large": 1}


# --- O5 auto-LIMIT guardrail ---------------------------------------------------

def test_guarded_sql_appends_limit(spark):
    from gitnexus_spark.operators.graph_queries import guarded_sql

    spark.range(5000).createOrReplaceTempView("t_guard")
    assert guarded_sql(spark, "SELECT * FROM t_guard", auto_limit=10).count() == 10
    # explicit LIMIT is respected, not overridden
    assert guarded_sql(spark, "SELECT * FROM t_guard LIMIT 7;").count() == 7


# --- Q3 bucketed adjacency ------------------------------------------------------

def test_write_adjacency_bucketed(spark, tmp_path):
    from gitnexus_spark.operators.graph_queries import write_adjacency_bucketed

    import shutil

    spark.sql("DROP TABLE IF EXISTS adj_test")
    shutil.rmtree("spark-warehouse/adj_test", ignore_errors=True)
    edges = spark.createDataFrame(
        [("a", "b", "L"), ("a", "c", "L"), ("b", "c", "L")],
        ["src", "dst", "type"])
    write_adjacency_bucketed(edges, "adj_test", buckets=4)
    back = spark.table("adj_test")
    assert back.count() == 3
    # bucket metadata is live in the catalog
    ddl = spark.sql("DESCRIBE TABLE EXTENDED adj_test").collect()
    meta = {r["col_name"]: r["data_type"] for r in ddl}
    assert meta.get("Num Buckets") == "4"
    assert "src" in meta.get("Bucket Columns", "")
    spark.sql("DROP TABLE IF EXISTS adj_test")
