"""Structured Streaming ingest: file-source micro-batches through the
same extraction operators, exactly-once url dedup, resumable checkpoint."""

import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def stream_dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ["in", "out", "ckpt"]}
    yield d
    shutil.rmtree(tmp_path, ignore_errors=True)


def _write_batch(spark, in_dir, rows):
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string")
    df.coalesce(1).write.mode("append").parquet(in_dir)


def test_stream_extraction_end_to_end(spark, stream_dirs):
    import datetime as dt

    from gitnexus_spark.streaming.ingest import (read_page_stream,
                                                 start_extraction_stream)

    ts = dt.datetime(2024, 1, 1)
    _write_batch(spark, stream_dirs["in"], [
        ("u1", ts, b"<p>Acme founded Zorg.</p>", "Acme founded Zorg.", "en"),
        ("u2", ts, b"<p>Beta visited Acme.</p>", "Beta visited Acme.", "en"),
        ("u1", ts, b"<p>Acme founded Zorg.</p>", "Acme founded Zorg.", "en"),  # dup url
    ])
    stream = read_page_stream(spark, stream_dirs["in"])
    assert stream.isStreaming
    q = start_extraction_stream(stream, stream_dirs["out"], stream_dirs["ckpt"])
    q.awaitTermination(120)

    out = spark.read.parquet(stream_dirs["out"])
    triples = out.filter("item = 'triple'")
    got = {(r["name"], r["pred"], r["obj"]) for r in triples.collect()}
    assert got == {("Acme", "founded", "Zorg"), ("Beta", "visited", "Acme")}
    # duplicate url collapsed within watermark (exactly-once page semantics)
    assert out.filter("item = 'triple'").count() == 2

    # resume from checkpoint: second batch only processes new files
    _write_batch(spark, stream_dirs["in"], [
        ("u3", ts, b"<p>Gamma acquired Beta.</p>", "Gamma acquired Beta.", "en"),
    ])
    q2 = start_extraction_stream(
        read_page_stream(spark, stream_dirs["in"]),
        stream_dirs["out"], stream_dirs["ckpt"])
    q2.awaitTermination(120)
    out2 = spark.read.parquet(stream_dirs["out"])
    assert out2.filter("item = 'triple'").count() == 3


def test_windowed_mention_counts_plan(spark):
    """The windowed aggregation builds a valid streaming plan (event-time
    carried through extraction)."""
    import datetime as dt

    from gitnexus_spark.streaming.ingest import windowed_mention_counts

    batch = spark.createDataFrame(
        [("u1", dt.datetime(2024, 1, 1, 0, 30), b"<p>Acme rises.</p>", "Acme rises.", "en"),
         ("u2", dt.datetime(2024, 1, 1, 1, 30), b"<p>Acme falls.</p>", "Acme falls.", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string")
    got = {(str(r["window_start"]), r["name"]): r["n"]
           for r in windowed_mention_counts(batch).collect()}
    assert got == {("2024-01-01 00:00:00", "Acme"): 1,
                   ("2024-01-01 01:00:00", "Acme"): 1}
