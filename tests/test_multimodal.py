"""Multimodal plumbing: decode/feature schemas, batching, frame sampling.
Codec work is a deterministic fake (container has no image libs); the
distributed path (binary columns through Arrow batches) is real."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        ("a1", "u1", "image", b"\x89PNG fake image bytes"),
        ("a2", "u2", "video", b"\x00\x00ftyp fake video bytes"),
        ("a3", "u3", "audio", b"ID3 fake audio bytes"),
        ("a4", "u4", "image", None),
    ]
    return spark.createDataFrame(
        rows, "asset_id string, url string, media_type string, payload binary")


def test_decode_schema_and_determinism(assets):
    from gitnexus_spark.multimodal.binary_ops import FEATURE_DIM, decode_assets

    d1 = {r["asset_id"]: r.asDict() for r in decode_assets(assets).collect()}
    d2 = {r["asset_id"]: r.asDict() for r in decode_assets(assets).collect()}
    assert d1 == d2                              # deterministic
    assert d1["a1"]["byte_len"] == 21
    assert len(d1["a1"]["feature"]) == FEATURE_DIM
    assert all(-1.0 <= v <= 1.0 for v in d1["a1"]["feature"])
    assert d1["a2"]["n_frames"] > 1              # video gets frames
    assert d1["a1"]["n_frames"] == 1             # image is single frame
    assert d1["a4"]["content_sha"] is None       # null payload -> null metadata


def test_features_flow_into_similarity(assets, spark):
    """Decoded features plug straight into the ANN operator."""
    from gitnexus_spark.multimodal.binary_ops import decode_assets
    from gitnexus_spark.operators.similarity import brute_force_topk

    dec = decode_assets(assets).filter("feature IS NOT NULL") \
        .select(F.col("asset_id").alias("vec_id"), F.col("feature").alias("embedding"))
    q = dec.limit(1).select(F.col("vec_id").alias("q_id"),
                            F.col("embedding").alias("q_vec"))
    top = brute_force_topk(dec, q, k=1, id_col="vec_id")
    r = top.collect()[0]
    assert r["vec_id"] == r["q_id"] and r["score"] == 1.0


def test_frame_sampling(assets):
    from gitnexus_spark.multimodal.binary_ops import decode_assets, frame_sample

    frames = frame_sample(decode_assets(assets), every_n=10).collect()
    assert all(r["frame_idx"] % 10 == 0 for r in frames)
    assert len(frames) >= 1


def _real_png(w, h):
    """A genuinely valid minimal PNG (correct CRCs, 1 opaque RGB row set)."""
    import struct
    import zlib

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x7f\x00\x7f" * w for _ in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_parse_image_header_golden_bytes():
    import struct

    from gitnexus_spark.multimodal.binary_ops import parse_image_header

    assert parse_image_header(_real_png(3, 2)) == ("png", 3, 2)
    gif = b"GIF89a" + struct.pack("<HH", 640, 480) + b"\x00" * 6
    assert parse_image_header(gif) == ("gif", 640, 480)
    jpeg = (b"\xff\xd8"                                   # SOI
            + b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
            + b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", 480, 640)
            + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01")  # SOF0
    assert parse_image_header(jpeg) == ("jpeg", 640, 480)
    ppm = b"P6\n# a comment\n12 34\n255\n" + b"\x00" * 10
    assert parse_image_header(ppm) == ("ppm", 12, 34)
    # malformed / non-image payloads -> None (fake fallback downstream)
    assert parse_image_header(b"\x89PNG fake image bytes") is None
    assert parse_image_header(b"\xff\xd8\x00garbage") is None
    assert parse_image_header(b"plain text") is None
    assert parse_image_header(b"") is None


def test_parse_jpeg_progressive_and_corrupt_markers():
    """VERDICT r03 next-round #8: SOF2 (progressive) parses like SOF0;
    DHT/DAC/JPG markers are skipped, never mistaken for a frame; a
    stream that loses marker alignment mid-scan returns None instead of
    a bogus size."""
    import struct

    from gitnexus_spark.multimodal.binary_ops import parse_image_header

    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof_payload = b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"

    # progressive: DQT + DHT segments BEFORE the SOF2 frame
    dqt = b"\xff\xdb\x00\x05" + b"\x00" * 3
    dht = b"\xff\xc4\x00\x06" + b"\x00" * 4          # must be skipped
    sof2 = b"\xff\xc2\x00\x11\x08" + struct.pack(">HH", 333, 222) \
        + sof_payload
    prog = b"\xff\xd8" + app0 + dqt + dht + sof2
    assert parse_image_header(prog) == ("jpeg", 222, 333)

    # DAC (0xCC) and JPG (0xC8) are also not frames
    dac = b"\xff\xcc\x00\x04\x00\x00"
    jpg = b"\xff\xc8\x00\x04\x00\x00"
    sof15 = b"\xff\xcf\x00\x11\x08" + struct.pack(">HH", 10, 20) \
        + sof_payload
    assert parse_image_header(b"\xff\xd8" + dac + jpg + sof15) \
        == ("jpeg", 20, 10)

    # restart markers (standalone, no length) are stepped over
    rst = b"\xff\xd0"
    sof0 = b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", 5, 6) + sof_payload
    assert parse_image_header(b"\xff\xd8" + rst + sof0) == ("jpeg", 6, 5)

    # corrupt: a segment length that points into non-marker bytes
    bad_len = b"\xff\xe0\x00\x03\x00" + b"not-a-marker" + sof0
    assert parse_image_header(b"\xff\xd8" + bad_len) is None

    # truncated: stream ends before any SOF
    assert parse_image_header(b"\xff\xd8" + app0 + dqt) is None


def test_decode_assets_real_png_header(spark):
    """End-to-end: a real PNG payload yields its true dimensions through
    the distributed decode stage, no codec library involved."""
    from gitnexus_spark.multimodal.binary_ops import decode_assets

    png = _real_png(7, 5)
    df = spark.createDataFrame(
        [("p1", "u1", "image", png), ("p2", "u2", "image", b"not an image")],
        "asset_id string, url string, media_type string, payload binary")
    got = {r["asset_id"]: r.asDict() for r in decode_assets(df).collect()}
    assert (got["p1"]["width"], got["p1"]["height"]) == (7, 5)
    assert got["p1"]["byte_len"] == len(png)
    # non-image bytes keep the deterministic fake (bounded, stable)
    assert 16 <= got["p2"]["width"] <= 255


def test_resize_stub_contract(assets):
    from gitnexus_spark.multimodal.binary_ops import decode_assets, resize_stub

    out = resize_stub(decode_assets(assets), 224, 224)
    rows = out.filter("byte_len > 0").collect()
    assert all(r["width"] == 224 and r["height"] == 224 for r in rows)


def _wav_bytes(rate=8000, ch=1, bits=16, n_frames=800):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(bits // 8)
        w.setframerate(rate)
        w.writeframes(b"\x00" * (n_frames * ch * (bits // 8)))
    return buf.getvalue()


def _flac_bytes(rate=44100, ch=2, bits=16, total=44100):
    import struct

    v = (rate << 44) | ((ch - 1) << 41) | ((bits - 1) << 36) | total
    streaminfo = b"\x00" * 10 + struct.pack(">Q", v) + b"\x00" * 16
    return b"fLaC" + bytes([0x80, 0, 0, len(streaminfo)]) + streaminfo


def _mp3_bytes(n_pad=4000, id3=False):
    # MPEG1 Layer III, 128 kbps (idx 9), 44100 Hz (idx 0), stereo
    frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * n_pad
    if id3:
        tag = b"ID3" + bytes([3, 0, 0, 0, 0, 0, 10]) + b"\x00" * 10
        return tag + frame
    return frame


def test_parse_audio_header_golden_bytes():
    from gitnexus_spark.multimodal.binary_ops import parse_audio_header

    # real WAV written by the stdlib encoder: 800 frames @ 8 kHz = 100 ms
    assert parse_audio_header(_wav_bytes()) == ("wav", 1, 8000, 16, 100)
    assert parse_audio_header(_wav_bytes(rate=44100, ch=2))[:3] == \
        ("wav", 2, 44100)
    assert parse_audio_header(_flac_bytes()) == ("flac", 2, 44100, 16, 1000)
    fmt, ch, rate, bits, dur = parse_audio_header(_mp3_bytes())
    assert (fmt, ch, rate, bits) == ("mp3", 2, 44100, None)
    assert dur == (4000 + 4) * 8 // 128  # CBR estimate
    # ID3v2 prefix is skipped, not mistaken for audio
    assert parse_audio_header(_mp3_bytes(id3=True))[0] == "mp3"
    # corrupt / truncated payloads are rejected, not crashed on
    assert parse_audio_header(b"RIFF\x00\x00\x00\x00WAVE") is None
    assert parse_audio_header(b"fLaC" + b"\x7f" + b"\x00" * 30) is None
    assert parse_audio_header(b"\xff\xe0 not a frame") is None
    assert parse_audio_header(b"") is None


def test_probe_audio_distributed(spark):
    from gitnexus_spark.multimodal.binary_ops import probe_audio

    rows = [
        ("a1", "u1", bytearray(_wav_bytes())),
        ("a2", "u2", bytearray(_flac_bytes())),
        ("a3", "u3", bytearray(b"junk payload")),
        ("a4", "u4", None),
    ]
    assets = spark.createDataFrame(rows, "asset_id string, url string, payload binary")
    got = {r["asset_id"]: r for r in probe_audio(assets).collect()}
    assert got["a1"]["format"] == "wav" and got["a1"]["duration_ms"] == 100
    assert got["a2"]["sample_rate"] == 44100
    # bad records are observable rows, not task failures
    assert got["a3"]["format"] is None and got["a3"]["byte_len"] == 12
    assert got["a4"]["content_sha"] is None


def test_header_parsers_never_crash_on_fuzz():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gitnexus_spark.multimodal.binary_ops import (parse_audio_header,
                                                      parse_image_header)

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=256))
    def run(b):
        for parse in (parse_audio_header, parse_image_header):
            out = parse(b)
            assert out is None or isinstance(out, tuple)

    run()
    # prefix-mutated REAL payloads (the adversarial case: valid magic,
    # garbage body) must also never raise
    wav = _wav_bytes()

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=0, max_value=len(wav) - 1), st.binary(min_size=1, max_size=8))
    def run2(pos, junk):
        mutated = wav[:pos] + junk + wav[pos + len(junk):]
        parse_audio_header(mutated)

    run2()
