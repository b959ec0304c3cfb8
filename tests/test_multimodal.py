"""Multimodal column plumbing tests (stubbed codecs, real Spark plans)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reactionetl_etl_spark.operators.multimodal import (
    decode_image_features,
    sample_video_frames,
    with_media_metadata,
)

PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 100
JPEG = b"\xff\xd8\xff\xe0" + b"\x01" * 50
MP3 = b"ID3\x04" + b"\x02" * 80
RAW = b"\x00\x01\x02\x03" * 10


@pytest.fixture(scope="module")
def media(spark):
    rows = [(1, PNG), (2, JPEG), (3, MP3), (4, RAW)]
    return spark.createDataFrame(rows, "media_id long, content binary")


def test_mime_sniffing(spark, media):
    got = {
        r["media_id"]: r["media_meta"]["mime"]
        for r in with_media_metadata(media).collect()
    }
    assert got == {
        1: "image/png",
        2: "image/jpeg",
        3: "audio/mpeg",
        4: "application/octet-stream",
    }


def test_media_meta_sizes(spark, media):
    got = {
        r["media_id"]: r["media_meta"]["n_bytes"]
        for r in with_media_metadata(media).collect()
    }
    assert got == {1: len(PNG), 2: len(JPEG), 3: len(MP3), 4: len(RAW)}


def test_image_features_deterministic(spark, media):
    feats = decode_image_features(media, dim=8)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert len(rows[1]["feature"]) == 8
    assert all(0.0 <= v <= 1.0 for v in rows[1]["feature"])
    # deterministic across executions
    again = {r["media_id"]: r["feature"] for r in decode_image_features(media, dim=8).collect()}
    assert again[1] == rows[1]["feature"]
    assert rows[1]["mime"] == "image/png"


def test_frame_sampling_row_expansion(spark, media):
    frames = sample_video_frames(media, every_n_bytes=32)
    per_media = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    # ceil(len / 32) frames each
    assert per_media == {1: 4, 2: 2, 3: 3, 4: 2}
    first = frames.filter((F.col("media_id") == 1) & (F.col("frame_index") == 0)).first()
    assert bytes(first["frame"]) == PNG[:32]
