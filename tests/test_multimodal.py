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


def test_resize_stub_contract(assets):
    from gitnexus_spark.multimodal.binary_ops import decode_assets, resize_stub

    out = resize_stub(decode_assets(assets), 224, 224)
    rows = out.filter("byte_len > 0").collect()
    assert all(r["width"] == 224 and r["height"] == 224 for r in rows)
