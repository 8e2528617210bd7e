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


def _ipv_expected(d, every_n=1):
    """Pure-Python expected rows straight from the block-value spec."""
    from advisorydatapipeline_spark.operators.video import (
        IPV_BLOCKS,
        IPV_GOP,
        ipv_block_value,
    )

    n = 8 + d % 5
    out = []
    for f in range(n):
        if f % every_n:
            continue
        vals = [ipv_block_value(d, f, b) for b in range(IPV_BLOCKS)]
        if f % IPV_GOP == 0:
            resid = 0
        else:
            pvals = [
                ipv_block_value(d, f - 1, b) for b in range(IPV_BLOCKS)
            ]
            resid = 64 * sum(
                (v - pv) % 256 for v, pv in zip(vals, pvals)
            )
        out.append(
            (f, int(f % IPV_GOP == 0), 24, 16, 64 * sum(vals), resid)
        )
    return out


def test_ipv_roundtrip_exact():
    from advisorydatapipeline_spark.operators.video import (
        decode_ipframe_video,
        encode_ipframe_video,
    )

    for d in (0, 3, 4, 11, 57):
        assert decode_ipframe_video(encode_ipframe_video(d)) == (
            _ipv_expected(d)
        )
        assert decode_ipframe_video(
            encode_ipframe_video(d), 3
        ) == _ipv_expected(d, 3)


def test_ipv_reference_chain_damage_stops_at_gop_boundary():
    """The defining inter-frame property: corrupting one mid-GOP
    P-frame byte changes the reconstruction of every LATER frame in
    that GOP (the damage rides the reference chain) and of NO frame
    from the next I-frame on."""
    from advisorydatapipeline_spark.operators.video import (
        IPV_FRAME_H,
        IPV_FRAME_W,
        IPV_GOP,
        decode_ipframe_video,
        encode_ipframe_video,
    )

    d = 2  # 10 frames, I at 0/4/8
    good = encode_ipframe_video(d)
    fsz = 1 + IPV_FRAME_W * IPV_FRAME_H
    # corrupt one delta byte inside frame 1 (a P-frame)
    off = 11 + 1 * fsz + 1 + 7  # header + frame0 + type byte + pixel 7
    bad = bytearray(good)
    bad[off] = (bad[off] + 100) % 256
    ref = decode_ipframe_video(good, 1)
    got = decode_ipframe_video(bytes(bad), 1)
    changed = [r[0] for r, g in zip(ref, got) if r != g]
    assert changed == [1, 2, 3]  # rest of the GOP, nothing past I@4
    # pixel sums differ inside the damaged GOP; resid of LATER frames
    # is untouched (the wire bytes are the same, only reconstruction
    # drifts)
    for f in (2, 3):
        assert got[f][5] == ref[f][5]
        assert got[f][4] != ref[f][4]
    assert got[4:] == ref[4:]


def test_ipv_corruption_fuzz_valueerror_only():
    import numpy as np  # noqa: F401 — decode path imports it

    from advisorydatapipeline_spark.operators.video import (
        decode_ipframe_video,
        encode_ipframe_video,
    )

    good = encode_ipframe_video(1)
    # header/type-byte mutations either raise ValueError or decode
    for i in list(range(12)) + [11 + 0, 11 + 385]:
        bad = good[:i] + bytes([good[i] ^ 0xFF]) + good[i + 1 :]
        try:
            decode_ipframe_video(bad)
        except ValueError:
            pass
    for cut in range(0, len(good), 97):
        with pytest.raises(ValueError):
            decode_ipframe_video(good[:cut])
    with pytest.raises(ValueError):
        decode_ipframe_video(b"JUNK" + good[4:])
    with pytest.raises(ValueError):
        decode_ipframe_video(good, 0)
    # a P-frame type byte where the GOP says I must fail loud
    bad = bytearray(good)
    bad[11] = 0x50
    with pytest.raises(ValueError):
        decode_ipframe_video(bytes(bad))


def test_ipframe_frame_samples_null_row_contract(spark):
    from advisorydatapipeline_spark.operators.video import (
        encode_ipframe_video,
        ipframe_frame_samples,
    )

    rows = [
        (1, encode_ipframe_video(1)),
        (2, b"junk"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = ipframe_frame_samples(df, every_n=3).collect()
    assert {r.media_id for r in got} == {1}
    want = _ipv_expected(1, 3)
    assert sorted(
        (r.frame_idx, r.is_iframe, r.width, r.height, r.pixel_sum,
         r.resid_sum)
        for r in got
    ) == want


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
