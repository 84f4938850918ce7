"""Multimodal columns: opaque binary payloads + typed metadata.

Web pages carry images/audio/video; the pipeline treats them as
`binary` columns with a typed metadata struct, processed by Arrow-batched
mapInPandas stages. The Spark-side plumbing here (schemas, batch shapes,
partitioning, UDF signatures) is real and tested. Image DIMENSIONS are
real for PNG/GIF/JPEG/PPM payloads via a stdlib header parser
(`parse_image_header`) and audio METADATA (channels / sample rate /
bit depth / duration) is real for WAV/FLAC/MP3 via `parse_audio_header`
— no codec library needed for either. Full pixel/sample decode and
other formats are stubbed behind an import-guard because image/audio
libraries are not in this container, falling back to a deterministic fake
derived from the byte content (so tests exercise the full distributed
path end-to-end).

Design notes for 100 TB:
- binary payloads ride in the same parquet/Iceberg row as their metadata
  (no side files); `spark.sql.files.maxPartitionBytes` bounds task input.
- decode/feature stages are mapInPandas with a small Arrow batch size —
  payloads are orders of magnitude bigger than text rows, so the batch
  row-count must shrink to keep task memory flat (ASSET_BATCH_ROWS).
- feature vectors come back as array<float>, flowing directly into
  operators/similarity.py (ANN) and dedup (embedding near-dup).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, FloatType, IntegerType, LongType,
                               StringType, StructField, StructType)

ASSET_BATCH_ROWS = 256  # small Arrow batches: payload-heavy rows

ASSET_SCHEMA = StructType([
    StructField("asset_id", StringType()),
    StructField("url", StringType()),
    StructField("media_type", StringType()),   # image | audio | video
    StructField("payload", StringType()),      # placeholder in DDL docs; real col is binary
])

DECODED_SCHEMA = StructType([
    StructField("asset_id", StringType()),
    StructField("url", StringType()),
    StructField("media_type", StringType()),
    StructField("byte_len", LongType()),
    StructField("content_sha", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("feature", ArrayType(FloatType())),
])

try:  # real decoders when available (not in this container)
    import PIL.Image  # type: ignore  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

FEATURE_DIM = 16


def parse_image_header(b: bytes) -> tuple[str, int, int] | None:
    """Stdlib-only image metadata: (format, width, height) for real PNG /
    GIF / JPEG / PPM payloads, None otherwise. No codec library needed —
    dimensions live in fixed/markered header positions:

    - PNG: 8-byte signature, then the IHDR chunk is mandatory-first, so
      width/height are the two big-endian u32 at bytes 16..24.
    - GIF(87a|89a): logical screen descriptor — little-endian u16 pair at
      bytes 6..10.
    - JPEG: scan the marker stream for a start-of-frame (SOF0..15 minus
      DHT/JPG/DAC); height/width are big-endian u16 at offsets 3/5 into
      the segment payload.
    - PPM (P6): ASCII header `P6 <w> <h> <maxval>` with #-comments.
    """
    import struct

    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h)
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h)
    if len(b) >= 4 and b[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                return None  # not a marker where one must be — corrupt
            marker = b[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # standalone
                i += 2
                continue
            seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                return ("jpeg", w, h)
            i += 2 + seg_len
        return None
    if len(b) >= 2 and b[:2] == b"P6":
        fields: list[int] = []
        tok = bytearray()
        i = 2
        while i < len(b) and len(fields) < 2:
            c = b[i]
            if c == 0x23:  # '#' comment to end of line
                while i < len(b) and b[i] not in (0x0A, 0x0D):
                    i += 1
            elif 0x30 <= c <= 0x39:
                tok.append(c)
            elif c in (0x20, 0x09, 0x0A, 0x0D):
                if tok:
                    fields.append(int(tok.decode()))
                    tok.clear()
            else:
                return None
            i += 1
        if len(fields) == 2:
            return ("ppm", fields[0], fields[1])
    return None


AUDIO_META_SCHEMA = StructType([
    StructField("asset_id", StringType()),
    StructField("url", StringType()),
    StructField("byte_len", LongType()),
    StructField("content_sha", StringType()),
    StructField("format", StringType()),
    StructField("channels", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("bits_per_sample", IntegerType()),
    StructField("duration_ms", LongType()),
])

# MPEG1 Layer III tables (ISO 11172-3): bitrate kbps by index, sample rate
_MP3_BITRATE = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                256, 320, 0)
_MP3_RATE = (44100, 48000, 32000, 0)


def parse_audio_header(b: bytes) -> tuple[str, int, int, int | None,
                                          int | None] | None:
    """Stdlib-only audio metadata: (format, channels, sample_rate_hz,
    bits_per_sample|None, duration_ms|None) for real WAV / FLAC / MP3
    payloads, None otherwise — the audio twin of `parse_image_header`.

    - WAV: RIFF/WAVE chunk walk; the mandatory `fmt ` chunk carries
      channels/rate/bits, the `data` chunk size over the byte rate gives
      duration.
    - FLAC: the STREAMINFO block is mandatory-first; sample rate (20
      bits), channels-1 (3), bits-1 (5) and total samples (36) are one
      big-endian u64 at block offset 10.
    - MP3 (MPEG1 Layer III): first frame header after optional ID3v2;
      duration is the CBR estimate from the frame bitrate — correct for
      CBR files, approximate for VBR (declared).
    """
    import struct

    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        i = 12
        fmt = None
        data_size = None
        while i + 8 <= len(b):
            cid = b[i:i + 4]
            size = struct.unpack("<I", b[i + 4:i + 8])[0]
            if cid == b"fmt " and i + 24 <= len(b):
                _, ch, rate, byte_rate, _, bits = struct.unpack(
                    "<HHIIHH", b[i + 8:i + 24])
                fmt = (ch, rate, byte_rate, bits)
            elif cid == b"data":
                data_size = size
            i += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is None or fmt[1] == 0:
            return None
        ch, rate, byte_rate, bits = fmt
        dur = (data_size * 1000 // byte_rate
               if data_size is not None and byte_rate else None)
        return ("wav", ch, rate, bits, dur)
    if len(b) >= 26 and b[:4] == b"fLaC":
        if b[4] & 0x7F != 0:  # STREAMINFO must be the first block
            return None
        info = b[8:]  # past magic + block header
        v = struct.unpack(">Q", info[10:18])[0]
        rate = v >> 44
        ch = ((v >> 41) & 0x7) + 1
        bits = ((v >> 36) & 0x1F) + 1
        total = v & ((1 << 36) - 1)
        if rate == 0:
            return None
        dur = total * 1000 // rate if total else None
        return ("flac", ch, rate, bits, dur)
    i = 0
    if len(b) >= 10 and b[:3] == b"ID3":  # skip ID3v2 (syncsafe size)
        size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) | \
            ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        i = 10 + size
    if i + 4 <= len(b) and b[i] == 0xFF and b[i + 1] & 0xFE == 0xFA:
        # sync + MPEG1 (0b11) + Layer III (0b01); protection bit free
        br = _MP3_BITRATE[b[i + 2] >> 4]
        rate = _MP3_RATE[(b[i + 2] >> 2) & 0x3]
        ch = 1 if (b[i + 3] >> 6) == 0b11 else 2
        if br == 0 or rate == 0:
            return None
        dur = (len(b) - i) * 8 // br  # bytes*8 / (kbps) == ms, CBR
        return ("mp3", ch, rate, None, dur)
    return None


def probe_audio(assets: DataFrame, payload_col: str = "payload") -> DataFrame:
    """assets(asset_id, url, payload:binary) -> AUDIO_META_SCHEMA via an
    Arrow-batched mapInPandas pass. Unparseable payloads yield a row with
    NULL format (observable skip, never a task failure) — the same
    bad-record posture as the archive sources."""
    import pandas as pd

    src = assets.select("asset_id", "url", F.col(payload_col).alias("payload"))

    def run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for aid, url, payload in zip(pdf["asset_id"], pdf["url"],
                                         pdf["payload"]):
                if payload is None:
                    rows.append((aid, url, 0, None, None, None, None, None,
                                 None))
                    continue
                b = bytes(payload)
                sha = hashlib.sha256(b).hexdigest()
                hdr = parse_audio_header(b)
                if hdr is None:
                    rows.append((aid, url, len(b), sha, None, None, None,
                                 None, None))
                else:
                    fmt, ch, rate, bits, dur = hdr
                    rows.append((aid, url, len(b), sha, fmt, ch, rate, bits,
                                 dur))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_META_SCHEMA.fields])

    return src.mapInPandas(run, schema=AUDIO_META_SCHEMA)


def _fake_decode(payload: bytes, media_type: str) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for codec work: metadata + a FEATURE_DIM
    feature vector derived from the byte content (sha256-seeded), so the
    distributed plumbing is exercised with stable, assertable outputs."""
    h = hashlib.sha256(payload).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    n_frames = 1 if media_type == "image" else 1 + h[2] % 120
    feature = [((h[i] / 255.0) * 2.0 - 1.0) for i in range(FEATURE_DIM)]
    return width, height, n_frames, feature


def decode_assets(assets: DataFrame, payload_col: str = "payload") -> DataFrame:
    """assets(asset_id, url, media_type, payload:binary) -> DECODED_SCHEMA.

    Real image decode requires PIL (absent here) — the stage then uses the
    deterministic fake, clearly marked. The mapInPandas plumbing (schema,
    batching, null handling) is identical either way.
    """
    import pandas as pd

    src = assets.select("asset_id", "url", "media_type",
                        F.col(payload_col).alias("payload"))

    def run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for aid, url, mt, payload in zip(pdf["asset_id"], pdf["url"],
                                             pdf["media_type"], pdf["payload"]):
                if payload is None:
                    rows.append((aid, url, mt, 0, None, None, None, None, None))
                    continue
                b = bytes(payload)
                w, hgt, nf, feat = _fake_decode(b, mt)
                if mt == "image":
                    # real metadata first: stdlib header parse covers
                    # PNG/GIF/JPEG/PPM with no codec dependency; PIL (when
                    # present) extends coverage to every other format. Any
                    # failure (fake bytes, truncated image) falls back to
                    # the deterministic stand-in instead of failing tasks.
                    hdr = parse_image_header(b)
                    if hdr is not None:
                        _, w, hgt = hdr
                    elif _HAVE_PIL:
                        try:
                            import io

                            import PIL.Image
                            with PIL.Image.open(io.BytesIO(b)) as img:
                                w, hgt = img.width, img.height
                        except Exception:
                            pass
                rows.append((aid, url, mt, len(b),
                             hashlib.sha256(b).hexdigest(), w, hgt, nf, feat))
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return src.mapInPandas(run, schema=DECODED_SCHEMA)


def resize_stub(decoded: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize stage: real resize needs a codec (stubbed); the plumbing
    rewrites metadata deterministically so downstream schema contracts are
    testable."""
    return decoded.withColumn("width", F.lit(target_w)) \
                  .withColumn("height", F.lit(target_h)) \
                  .withColumn("resized", F.lit(True))


def frame_sample(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plan: explode sampled frame indices (metadata
    only — decode of the frames themselves is codec work)."""
    return (
        decoded.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0),
                                 F.greatest(F.col("n_frames") - 1, F.lit(0)),
                                 F.lit(every_n))),
        )
        .select("asset_id", "url", "frame_idx")
    )
