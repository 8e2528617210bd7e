"""FLAC subset codec: CRC test vectors, bit-exact round-trips across
predictor orders and frame shapes, UTF-8 frame numbers, and the
every-byte corruption sweep (CRC-8/16 must catch every flip or the
structural parse must ValueError — never a silent wrong decode).
Full-corpus value gate: flac_stream_stats."""

from __future__ import annotations

import random

import pytest

from advisorydatapipeline_spark.operators.flac_codec import (
    FLAC_BLOCK,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
    encode_flac_fixture,
    flac_fixture_samples,
    _read_utf8_number,
    _utf8_frame_number,
    _BitReader,
)


def test_crc_spec_vectors():
    # CRC-8 poly 0x07 and CRC-16/BUYPASS poly 0x8005 (init 0, no
    # reflection) published check values for b"123456789"
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8
    assert crc8(b"") == 0
    assert crc16(b"") == 0


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_round_trip_each_fixed_order(order):
    rnd = random.Random(order)
    samples = [rnd.randint(-3000, 3000) for _ in range(FLAC_BLOCK * 2)]
    enc = encode_flac(samples, order_cycle=(order,))
    sr, nf, dec = decode_flac(enc)
    assert (sr, nf) == (44100, 2)
    assert dec == samples


@pytest.mark.parametrize("n", [0, 1, 2, 255, 256, 257, 600, 1000])
def test_round_trip_frame_shapes(n):
    rnd = random.Random(n)
    samples = [rnd.randint(-32768, 32767) for _ in range(n)]
    enc = encode_flac(samples)
    sr, nf, dec = decode_flac(enc)
    assert dec == samples
    assert nf == (n + FLAC_BLOCK - 1) // FLAC_BLOCK


def test_compression_is_real():
    # smooth signals must compress well below the 2-byte/sample raw
    # size (Rice on order-2 residuals), random ones must not explode
    smooth = [i % 512 - 256 for i in range(2048)]
    raw = 2 * 2048
    assert len(encode_flac(smooth, order_cycle=(2,))) < raw // 2
    rnd = random.Random(0)
    noisy = [rnd.randint(-32768, 32767) for _ in range(2048)]
    assert len(encode_flac(noisy)) < raw * 3 // 2


def test_utf8_frame_numbers():
    for n in [0, 1, 127, 128, 2047, 2048, 65535, 1 << 20, (1 << 31) - 1]:
        b = _utf8_frame_number(n)
        assert _read_utf8_number(_BitReader(b)) == n
    # real UTF-8 encodings for BMP values
    assert _utf8_frame_number(0x41) == b"A"
    assert _utf8_frame_number(0xE9) == "é".encode()


def test_sample_range_enforced():
    with pytest.raises(ValueError):
        encode_flac([40000])


def test_corruption_sweep_no_silent_wrong_decode():
    samples = flac_fixture_samples(3)
    enc = bytearray(encode_flac(samples))
    for i in range(len(enc)):
        for delta in (0xFF, 0x01):  # flip all bits / flip low bit
            bad = bytes(enc[:i]) + bytes([enc[i] ^ delta]) + bytes(
                enc[i + 1 :]
            )
            try:
                _, _, dec = decode_flac(bad)
                assert dec == samples, f"silent corruption at byte {i}"
            except ValueError:
                pass


def test_truncation_always_fails():
    enc = encode_flac(flac_fixture_samples(5))
    for cut in range(1, len(enc)):
        with pytest.raises(ValueError):
            decode_flac(enc[:cut])


def test_fixture_corrupt_arm():
    sr, nf, dec = decode_flac(encode_flac_fixture(1))
    assert dec == flac_fixture_samples(1)
    # the plant flips the first frame's header CRC-8 byte, so the
    # rejection must come from the CRC-8 comparison specifically
    with pytest.raises(ValueError, match="CRC-8"):
        decode_flac(encode_flac_fixture(7))


def test_streaminfo_total_zero_is_unknown():
    # FLAC spec: STREAMINFO total_samples == 0 means "unknown" — the
    # stream must decode fully with no final sample-count check.
    enc = bytearray(encode_flac(flac_fixture_samples(3)))
    # total_samples = 36 bits starting at STREAMINFO-body bit 108
    # (16+16+24+24+20+3+5): low nibble of stream byte 21 plus stream
    # bytes 22-25 (body starts at stream byte 8).
    enc[21] &= 0xF0
    for i in range(22, 26):
        enc[i] = 0
    sr, nf, dec = decode_flac(bytes(enc))
    assert dec == flac_fixture_samples(3)
    assert nf == 3


def test_not_flac():
    with pytest.raises(ValueError):
        decode_flac(b"RIFF....WAVE")
    with pytest.raises(ValueError):
        decode_flac(b"fLaC")  # no metadata


def test_lpc_round_trip_and_mixed_cycle():
    from advisorydatapipeline_spark.operators.flac_codec import LPC2

    rnd = random.Random(9)
    samples = [rnd.randint(-8000, 8000) for _ in range(700)]
    for cycle in [(LPC2,), (0, LPC2, 2), (LPC2, 4)]:
        sr, nf, dec = decode_flac(encode_flac(samples, order_cycle=cycle))
        assert dec == samples, cycle


def test_lpc_prediction_uses_arithmetic_shift():
    from advisorydatapipeline_spark.operators.flac_codec import LPC2

    # negative prediction sums exercise the arithmetic (floor) shift:
    # a descending-negative ramp makes sum(coef*s) < 0 in every step
    samples = [-(i * 7) % 3000 * -1 for i in range(300)]
    sr, nf, dec = decode_flac(encode_flac(samples, order_cycle=(LPC2,)))
    assert dec == samples


def test_fixture_routes_middle_frame_through_lpc():
    # byte-level: the second frame's subframe type must be LPC
    # (1xxxxx); decode both fixture and a fixed-only encode and
    # confirm identical samples but different streams
    from advisorydatapipeline_spark.operators.flac_codec import LPC2

    s = flac_fixture_samples(11)
    a = encode_flac(s, order_cycle=(0, LPC2, 2))
    b = encode_flac(s, order_cycle=(0, 1, 2))
    assert a != b
    assert decode_flac(a)[2] == decode_flac(b)[2] == s
