"""MJPEG-AVI frame sampling (operators/video.py): container round
trip, skip-cost proof, corruption fuzz, Spark operator. Full-corpus
value gate: registry entry ``avi_mjpeg_frame_sampling``."""

from __future__ import annotations

import pytest

from advisorydatapipeline_spark.operators.video import (
    AVI_BLOCKS,
    decode_avi_frames,
    encode_avi_mjpeg,
    frame_block_value,
)


def test_roundtrip_sampled_frames_exact():
    for d in (0, 3, 4, 11):
        n = 8 + d % 5
        frames = decode_avi_frames(encode_avi_mjpeg(d), 3)
        assert [f[0] for f in frames] == [
            f for f in range(n) if f % 3 == 0
        ]
        for f, w, h, ps in frames:
            assert (w, h) == (24, 16)
            assert ps == 64 * sum(
                frame_block_value(d, f, b) for b in range(AVI_BLOCKS)
            )
    # every_n=1 decodes every frame; every_n > n yields frame 0 only
    assert len(decode_avi_frames(encode_avi_mjpeg(0), 1)) == 8
    assert [f[0] for f in decode_avi_frames(encode_avi_mjpeg(0), 99)] == [0]


def test_unsampled_frames_are_skipped_not_parsed():
    """The sampler's cost model: bytes of unsampled frames are never
    parsed — corrupting frame 1 (unsampled at every_n=3) must not
    affect the sampled set, while corrupting frame 0 (sampled) must
    raise ValueError."""
    good = encode_avi_mjpeg(5)
    i0 = good.find(b"00dc")
    i1 = good.find(b"00dc", i0 + 4)
    # chunk body starts at +8; destroy the JPEG SOI marker there
    bad_unsampled = bytearray(good)
    bad_unsampled[i1 + 8 : i1 + 10] = b"\x00\x00"
    assert decode_avi_frames(bytes(bad_unsampled), 3) == (
        decode_avi_frames(good, 3)
    )
    bad_sampled = bytearray(good)
    bad_sampled[i0 + 8 : i0 + 10] = b"\x00\x00"
    with pytest.raises(ValueError):
        decode_avi_frames(bytes(bad_sampled), 3)


def test_mutation_truncation_fuzz_valueerror_only():
    good = encode_avi_mjpeg(2)
    for i in range(len(good)):
        bad = good[:i] + bytes([good[i] ^ 0xFF]) + good[i + 1 :]
        try:
            decode_avi_frames(bad, 3)
        except ValueError:
            pass
    for cut in range(0, len(good), 5):
        try:
            decode_avi_frames(good[:cut], 3)
        except ValueError:
            pass
    with pytest.raises(ValueError):
        decode_avi_frames(b"RIFFxxxxWAVE", 3)  # RIFF but not AVI
    with pytest.raises(ValueError):
        decode_avi_frames(good, 0)  # invalid stride


def test_avi_frame_samples_null_row_contract(spark):
    from advisorydatapipeline_spark.operators.video import (
        avi_frame_samples,
    )

    rows = [
        (1, encode_avi_mjpeg(1)),
        (2, b"junk"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = avi_frame_samples(df, every_n=3).collect()
    assert {r.media_id for r in got} == {1}
    n = 8 + 1 % 5
    assert sorted(r.frame_idx for r in got) == [
        f for f in range(n) if f % 3 == 0
    ]
    for r in got:
        assert r.pixel_sum == 64 * sum(
            frame_block_value(1, r.frame_idx, b)
            for b in range(AVI_BLOCKS)
        )
