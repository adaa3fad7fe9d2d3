"""Multimodal column plumbing (schemas, Arrow batch shapes, explode
semantics) with the deterministic fake codecs."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_images,
    media_features,
    resize_images,
    sample_video_frames,
)


def _media(spark):
    rows = [
        (1, "image", b"img-one-bytes", (None, None, None, None, "image/png")),
        (2, "image", b"img-two-bytes", (None, None, None, None, "image/png")),
        (3, "video", b"vid-bytes", (None, None, None, 35, "video/mp4")),
        (4, "audio", b"aud-bytes", (None, None, 16000, None, "audio/wav")),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_images_only_images(spark):
    out = decode_images(_media(spark)).collect()
    assert {r["media_id"] for r in out} == {1, 2}
    for r in out:
        assert 16 <= r["width"] < 80 and 16 <= r["height"] < 80
        assert len(r["raster"]) == 64


def test_decode_deterministic(spark):
    a = {r["media_id"]: bytes(r["raster"]) for r in decode_images(_media(spark)).collect()}
    b = {r["media_id"]: bytes(r["raster"]) for r in decode_images(_media(spark)).collect()}
    assert a == b


def test_resize_schema_and_rows(spark):
    out = resize_images(decode_images(_media(spark)), 32, 32).collect()
    assert len(out) == 2
    assert all(len(r["resized"]) == 16 for r in out)


def test_video_frame_sampling(spark):
    out = sample_video_frames(_media(spark), every_nth=10, max_frames=8).collect()
    # 35 frames, every 10th -> frames 0,10,20,30
    assert [(r["media_id"], r["frame_no"]) for r in out] == [
        (3, 0), (3, 10), (3, 20), (3, 30)
    ]
    assert len({bytes(r["frame"]) for r in out}) == 4  # distinct frames


def test_media_features_jvm_side(spark):
    feats = media_features(decode_images(_media(spark)))
    rows = feats.collect()
    assert all(r["pixels"] == r["width"] * r["height"] for r in rows)
    assert all(len(r["raster_sha256"]) == 64 for r in rows)
