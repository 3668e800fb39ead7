"""Multimodal plumbing tests: binary columns + metadata + Arrow-batched
decode/featurize/frame-sample (decode itself is a documented stub)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shmr_spark.multimodal import (
    MEDIA_SCHEMA,
    attach_media_metadata,
    decode_and_featurize,
    sample_frames,
)
from shmr_spark.multimodal.binary import _decode_image_real


@pytest.fixture()
def media_df(spark):
    rows = [
        (0, bytes([0xFF, 0xD8, 0xFF]) + b"jpegpayload" * 200, ("image/jpeg", 64, 64, None)),
        (1, b"\x89PNG\r\n" + b"pngpayload" * 300, ("image/png", 32, 32, None)),
        (2, b"RIFF" + b"wavpayload" * 500, ("audio/wav", None, None, 4000)),
        (3, None, (None, None, None, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_metadata_sniff(spark, media_df):
    out = {r.media_id: r.sniffed_mime for r in attach_media_metadata(media_df).collect()}
    assert out[0] == "image/jpeg"
    assert out[1] == "image/png"
    assert out[2] == "audio/wav"


def test_decode_and_featurize_shapes(spark, media_df):
    feats = decode_and_featurize(media_df, dim=64)
    rows = feats.collect()
    assert feats.columns == ["media_id", "n_bytes", "sha256", "feature"]
    assert len(rows) == 4
    for r in rows:
        assert len(r.feature) == 64
        assert all(-1.0 <= x <= 1.0 for x in r.feature)
    # deterministic: same content → same feature
    again = {r.media_id: r.feature for r in decode_and_featurize(media_df, dim=64).collect()}
    assert {r.media_id: r.feature for r in rows} == again
    # binary column must NOT survive into the feature output
    assert "content" not in feats.columns


def test_real_decoder_is_marked_stub(spark):
    with pytest.raises(NotImplementedError):
        _decode_image_real(b"anything")


def test_sample_frames_flatmap_shape(spark, media_df):
    frames = sample_frames(media_df, every_n_bytes=1000, max_frames=4)
    per_media = {
        r.media_id: r.n
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_media[2] >= 2  # 5000-byte wav → multiple frames
    assert per_media[3] == 1  # null content → 1 placeholder frame
    assert all(n <= 4 for n in per_media.values())
