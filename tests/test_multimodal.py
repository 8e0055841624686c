"""Multimodal surface: binary columns, content-hash dedup, and the
mapInPandas decode plumbing (batch shape, schema, binary round-trip)."""

from __future__ import annotations

import hashlib

import pytest

from trafficanalysisbigdata_spark.io import register_views
from trafficanalysisbigdata_spark.operators.multimodal import (
    extract_media_features,
    fake_decode,
    pillow_decode,
    synthesize_media,
)
from trafficanalysisbigdata_spark.session import prep


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    prep(spark)
    register_views(spark, sf_dir, "documents")
    return synthesize_media(spark.table("documents"))


def test_media_schema(media):
    dt = dict(media.dtypes)
    assert dt["content"] == "binary"
    assert dt["modality"] == "string"
    assert dt["meta"].startswith("struct<")


def test_features_match_local_recompute(spark, media):
    feats = {r.media_id: r for r in extract_media_features(media).collect()}
    sample = media.limit(20).collect()
    assert len(feats) == media.count()
    for row in sample:
        raw = bytes(row.content)
        w, h, luma = fake_decode(raw)
        got = feats[row.media_id]
        assert (got.width, got.height) == (w, h)
        assert abs(got.luma - round(luma, 6)) < 1e-9
        assert got.n_pixels == w * h
        assert got.fingerprint == hashlib.md5(raw).hexdigest()


def test_features_survive_many_partitions(media):
    """Arrow batching must be per-partition-safe, including empty partitions."""
    many = media.repartition(64)
    out = extract_media_features(many)
    assert out.count() == media.count()
    assert out.select("media_id").distinct().count() == media.count()


def test_pillow_decoder_stub_raises():
    with pytest.raises(NotImplementedError, match="pillow"):
        pillow_decode(b"\x89PNG\r\n")


def test_sample_frames_ragged_tail(spark):
    """67 bytes at frame_bytes=32 -> 3 frames: 32+32+3; empty content -> 0."""
    from trafficanalysisbigdata_spark.operators.multimodal import sample_frames

    media = spark.createDataFrame(
        [(1, "video", b"x" * 67), (2, "video", b""), (3, "image", b"y" * 64)],
        "media_id long, modality string, content binary",
    )
    rows = sorted(
        (r.media_id, r.frame_idx, len(bytes(r.frame)))
        for r in sample_frames(media, frame_bytes=32).collect()
    )
    # image row filtered out; empty video emits no frames
    assert rows == [(1, 0, 32), (1, 1, 32), (1, 2, 3)]


def test_audio_window_energy_math(spark):
    """Window boundaries, energy sums, ragged tail, silence rule."""
    from trafficanalysisbigdata_spark.operators.multimodal import audio_window_energy

    # 30 'z' bytes (ord 122): window 0 = 25 full bytes -> 3050 (not silent at
    # threshold 3000), window 1 = 5-byte tail -> 610 (silent); image filtered
    media = spark.createDataFrame(
        [(1, "audio", b"z" * 30), (2, "image", b"z" * 30)],
        "media_id long, modality string, content binary",
    )
    rows = sorted(
        (r.media_id, r.win, r.energy, r.is_silent)
        for r in audio_window_energy(
            media, window_bytes=25, silence_threshold=3000
        ).collect()
    )
    assert rows == [(1, 0, 25 * 122, 0), (1, 1, 5 * 122, 1)]
