"""S2 — archive sources: ZIP bundles and WARC crawl files, with size guards.

Web retarget of GitNexus's ZipService (reference src/services/zip.ts:30-31:
10 MB/file and 100 MB/archive caps, extension allowlist, directory
normalization) plus the Common-Crawl-native format the north star names:
WARC response records.

Spark shape: archives land as whole binary blobs via the built-in
``binaryFile`` source (one row per archive, splittable ACROSS archives —
a 100 TB crawl is millions of archives, so parallelism comes from the
archive count, the natural Common-Crawl unit). Per-archive member
extraction runs in an Arrow-batched ``mapInPandas`` stage using only
stdlib parsers (zipfile / bytes.split), emitting the pipeline's canonical
pages schema (url, warc_ts, html, lang) — feed straight into
``extract_corpus``.

Guards (all rule-pack data, reference parity):
- files over ``max_file_bytes`` are skipped (10 MB default);
- archives over ``max_archive_bytes`` are skipped whole (100 MB default);
- only allowlisted extensions are extracted from ZIPs (.html/.htm default).
Skipped entities are emitted as rows with item='skipped' + a reason, so
the guard is observable (a silent cap reads as full coverage).
"""

from __future__ import annotations

import io
import zipfile
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType, TimestampType)

MAX_FILE_BYTES = 10 * 1024 * 1024       # ref zip.ts:30
MAX_ARCHIVE_BYTES = 100 * 1024 * 1024   # ref zip.ts:31
HTML_EXTENSIONS = (".html", ".htm")

ARCHIVE_PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("lang", StringType()),
    StructField("item", StringType()),       # page | skipped
    StructField("skip_reason", StringType()),
    StructField("byte_len", LongType()),
])


def _zip_members(path: str, blob: bytes, max_file: int,
                 extensions: tuple[str, ...]) -> list[tuple]:
    rows: list[tuple] = []
    try:
        zf = zipfile.ZipFile(io.BytesIO(blob))
    except Exception:
        return [(path, None, None, None, "skipped", "bad_zip", len(blob))]
    import datetime as dt
    for info in zf.infolist():
        if info.is_dir():
            continue
        name = info.filename.replace("\\", "/")
        url = f"zip://{path}!/{name}"
        if not name.lower().endswith(extensions):
            rows.append((url, None, None, None, "skipped", "extension", info.file_size))
            continue
        if info.file_size > max_file:
            rows.append((url, None, None, None, "skipped", "file_too_large",
                         info.file_size))
            continue
        ts = dt.datetime(*info.date_time)
        rows.append((url, ts, zf.read(info), None, "page", None, info.file_size))
    return rows


def _warc_records(path: str, blob: bytes, max_file: int) -> list[tuple]:
    """Minimal WARC/1.0 response-record parser (public format,
    stdlib-only): records are split on the \\r\\n\\r\\n header boundary;
    response records carry WARC-Target-URI / WARC-Date headers and an
    HTTP message whose body is the page html."""
    import datetime as dt
    rows: list[tuple] = []
    for rec in blob.split(b"WARC/1.0\r\n")[1:]:
        try:
            head, rest = rec.split(b"\r\n\r\n", 1)
        except ValueError:
            continue
        headers: dict[str, str] = {}
        for line in head.decode("utf-8", errors="replace").splitlines():
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        if headers.get("warc-type") != "response":
            continue
        uri = headers.get("warc-target-uri", f"warc://{path}#unknown")
        # one malformed Content-Length must not fail the whole Spark task
        # (ADVICE r03): missing header falls back to the remaining bytes;
        # unparsable header becomes an observable bad_record skip row.
        raw_len = headers.get("content-length")
        if raw_len is None:
            length = len(rest)
        else:
            try:
                length = int(raw_len)
            except ValueError:
                rows.append((uri, None, None, None, "skipped", "bad_record",
                             len(rest)))
                continue
        http = rest[:length]
        # HTTP response: status+headers, blank line, body
        body = http.split(b"\r\n\r\n", 1)[1] if b"\r\n\r\n" in http else http
        if len(body) > max_file:
            rows.append((uri, None, None, None, "skipped", "file_too_large",
                         len(body)))
            continue
        ts = None
        if "warc-date" in headers:
            try:
                ts = dt.datetime.fromisoformat(
                    headers["warc-date"].replace("Z", "+00:00")).replace(tzinfo=None)
            except ValueError:
                ts = None
        rows.append((uri, ts, body, None, "page", None, len(body)))
    return rows


def _read_archives(spark: SparkSession, path_glob: str, kind: str,
                   max_file_bytes: int, max_archive_bytes: int,
                   extensions: tuple[str, ...]) -> DataFrame:
    import pandas as pd

    blobs = spark.read.format("binaryFile").load(path_glob) \
        .select("path", "length", "content")

    def run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.name for f in ARCHIVE_PAGES_SCHEMA.fields]
        for pdf in it:
            out: list[tuple] = []
            for path, length, blob in zip(pdf["path"], pdf["length"], pdf["content"]):
                if length > max_archive_bytes:
                    out.append((path, None, None, None, "skipped",
                                "archive_too_large", int(length)))
                    continue
                b = bytes(blob)
                if kind == "zip":
                    out.extend(_zip_members(path, b, max_file_bytes, extensions))
                else:
                    out.extend(_warc_records(path, b, max_file_bytes))
            yield pd.DataFrame(out, columns=cols)

    return blobs.mapInPandas(run, schema=ARCHIVE_PAGES_SCHEMA)


def read_zip_pages(spark: SparkSession, path_glob: str,
                   max_file_bytes: int = MAX_FILE_BYTES,
                   max_archive_bytes: int = MAX_ARCHIVE_BYTES,
                   extensions: tuple[str, ...] = HTML_EXTENSIONS) -> DataFrame:
    """ZIP archives -> pages rows (plus item='skipped' guard rows)."""
    return _read_archives(spark, path_glob, "zip",
                          max_file_bytes, max_archive_bytes, extensions)


def read_warc_pages(spark: SparkSession, path_glob: str,
                    max_file_bytes: int = MAX_FILE_BYTES,
                    max_archive_bytes: int = MAX_ARCHIVE_BYTES) -> DataFrame:
    """WARC files -> pages rows from response records (+ guard rows)."""
    return _read_archives(spark, path_glob, "warc",
                          max_file_bytes, max_archive_bytes, ())


def pages_from_archive(archive_rows: DataFrame,
                       default_lang: str | None = None) -> DataFrame:
    """Keep only extracted pages, shaped for extract_corpus
    (url, warc_ts, html, lang)."""
    return (
        archive_rows.filter(F.col("item") == "page")
        .select("url", "warc_ts", "html",
                F.coalesce(F.col("lang"), F.lit(default_lang)).alias("lang"))
    )


def skip_report(archive_rows: DataFrame) -> DataFrame:
    """Guard observability: counts per skip_reason (never silent)."""
    return (
        archive_rows.filter(F.col("item") == "skipped")
        .groupBy("skip_reason").agg(F.count("*").alias("n"),
                                    F.sum("byte_len").alias("bytes"))
    )
