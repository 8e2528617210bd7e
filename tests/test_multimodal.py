"""Multimodal plumbing tests: Arrow batch shapes, stub gating,
deterministic fakes."""

from __future__ import annotations

import hashlib

import pytest

from advisorydatapipeline_spark.operators.multimodal import (
    attach_payload,
    decode_media,
    extract_metadata,
    sample_frames,
)


def _media(spark):
    df = spark.createDataFrame(
        [(0, "image bytes here"), (1, "audio bytes"), (2, "video payload x")],
        "doc_id long, text string",
    )
    return attach_payload(df, "doc_id", "text")


def test_attach_payload_types(spark):
    m = _media(spark)
    assert dict(m.dtypes) == {
        "media_id": "bigint", "media_type": "string", "payload": "binary",
    }
    types = {r.media_id: r.media_type for r in m.collect()}
    assert types == {0: "image", 1: "audio", 2: "video"}


def test_metadata_matches_python_hash(spark):
    out = {r.media_id: r for r in extract_metadata(_media(spark)).collect()}
    expect = hashlib.md5(b"image bytes here").hexdigest()
    assert out[0].content_hash == expect
    assert out[0].byte_len == len(b"image bytes here")


def test_decode_requires_codec_or_fake(spark):
    with pytest.raises(NotImplementedError):
        decode_media(_media(spark)).collect()


def test_decode_fake_is_deterministic(spark):
    a = {r.media_id: tuple(r) for r in decode_media(_media(spark), fake=True).collect()}
    b = {r.media_id: tuple(r) for r in decode_media(_media(spark), fake=True).collect()}
    assert a == b
    assert a[1][5] == 16000  # audio sample_rate
    assert a[0][2] >= 64  # image width


def test_sample_frames_only_video(spark):
    frames = sample_frames(_media(spark), every_n=30, fake=True).collect()
    assert frames and all(f.media_id == 2 for f in frames)
    assert [f.frame_idx for f in frames] == sorted(f.frame_idx for f in frames)
