"""MP3 frame-header walk (operators/mp3.py): spec round trips,
corruption fuzz, Spark stats operator. The full-corpus value gate is
the registry entry ``mp3_frame_stats``."""

from __future__ import annotations

import pytest

from advisorydatapipeline_spark.operators.mp3 import (
    MP3_BITRATES_V1L3,
    MP3_SAMPLERATES_V1,
    encode_mp3_stream,
    mp3_frame_length,
    parse_mp3_stream,
)


def test_frame_length_spec_examples():
    # 128 kbps @ 44100 Hz: 144*128000/44100 = 417.96 -> 417 (+pad)
    assert mp3_frame_length(128, 44100, 0) == 417
    assert mp3_frame_length(128, 44100, 1) == 418
    # 320 kbps @ 48000 Hz: 144*320000/48000 = 960 exactly
    assert mp3_frame_length(320, 48000, 0) == 960


def test_fixture_round_trip_matches_arithmetic():
    for d in (0, 1, 5, 7, 13, 49, 123, 497):
        got = parse_mp3_stream(encode_mp3_stream(d))
        n = 3 + d % 5
        cbr = d % 7 == 0
        sr = MP3_SAMPLERATES_V1[d % 3]
        kbps = [
            128 if cbr else MP3_BITRATES_V1L3[1 + (d + f) % 14]
            for f in range(n)
        ]
        pads = [0 if cbr else (d + f) % 2 for f in range(n)]
        id3 = 10 + d % 50 if d % 4 == 1 else 0
        assert got["sample_rate"] == sr
        assert got["n_frames"] == n
        assert got["duration_samples"] == n * 1152
        assert got["bitrate_sum_kbps"] == sum(kbps)
        assert got["is_vbr"] == (len(set(kbps)) > 1)
        assert got["mono"] == (d % 2 == 1)
        assert got["id3_len"] == id3
        assert got["byte_len"] == id3 + sum(
            mp3_frame_length(k, sr, p) for k, p in zip(kbps, pads)
        )


def test_scope_violations_are_valueerror():
    good = bytearray(encode_mp3_stream(2))  # no ID3, stereo, VBR
    # MPEG-2 version bits
    bad = bytearray(good)
    bad[1] = 0xF3
    with pytest.raises(ValueError):
        parse_mp3_stream(bytes(bad))
    # Layer I
    bad = bytearray(good)
    bad[1] = 0xFF
    with pytest.raises(ValueError):
        parse_mp3_stream(bytes(bad))
    # free-format bitrate
    bad = bytearray(good)
    bad[2] &= 0x0F
    with pytest.raises(ValueError):
        parse_mp3_stream(bytes(bad))
    # forbidden bitrate index
    bad = bytearray(good)
    bad[2] |= 0xF0
    with pytest.raises(ValueError):
        parse_mp3_stream(bytes(bad))
    # reserved samplerate
    bad = bytearray(good)
    bad[2] |= 0x0C
    with pytest.raises(ValueError):
        parse_mp3_stream(bytes(bad))
    # truncation mid-frame
    with pytest.raises(ValueError):
        parse_mp3_stream(bytes(good[:-3]))
    with pytest.raises(ValueError):
        parse_mp3_stream(b"")


def test_mutation_truncation_fuzz_valueerror_only():
    """Every single-byte mutation and truncation decodes or raises
    ValueError — never any other exception class."""
    good = encode_mp3_stream(13)  # ID3 + VBR stream
    for i in range(len(good)):
        bad = good[:i] + bytes([good[i] ^ 0xFF]) + good[i + 1 :]
        try:
            parse_mp3_stream(bad)
        except ValueError:
            pass
    for cut in range(len(good)):
        try:
            parse_mp3_stream(good[:cut])
        except ValueError:
            pass


def test_decode_mp3_stats_null_row_contract(spark):
    from advisorydatapipeline_spark.operators.mp3 import decode_mp3_stats

    rows = [
        (1, encode_mp3_stream(1)),
        (2, b"junk"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in decode_mp3_stats(df).collect()}
    assert got[1].container == "mp3"
    assert got[1].n_frames == 4 and got[1].mono is True
    assert got[1].id3_len == 10 + 1 % 50
    assert got[2].container == "unknown" and got[2].n_frames is None
    assert got[3].container == "unknown"
