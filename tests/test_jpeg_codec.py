"""Baseline-JPEG codec (operators/jpeg_codec.py): spec round trips,
corruption fuzz, Spark stats operator. The full-corpus value gate is
the registry entry ``jpeg_pixel_stats``."""

from __future__ import annotations

import numpy as np
import pytest

from advisorydatapipeline_spark.operators.jpeg_codec import (
    FLAT_QUANT,
    ZIGZAG,
    decode_jpeg_pixels,
    encode_jpeg_baseline,
    encode_jpeg_cellgrid,
    idct_pixels,
)


def test_zigzag_is_the_spec_order():
    # T.81 figure 5 head, plus permutation property
    assert ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[-4:] == [47, 55, 62, 63]
    assert sorted(ZIGZAG) == list(range(64))


def test_dc_only_blocks_decode_to_exact_flat_values():
    blocks = [[0] * 64 for _ in range(4)]
    for n, dc in enumerate((0, 50, -30, 112)):
        blocks[n][0] = dc
    w, h, img = decode_jpeg_pixels(encode_jpeg_baseline(blocks, 16, 16))
    assert (w, h) == (16, 16)
    expect = {(0, 0): 128, (0, 1): 178, (1, 0): 98, (1, 1): 240}
    for (r, c), v in expect.items():
        assert (img[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] == v).all()


def test_random_ac_coefficient_round_trip():
    """Encode arbitrary quantized coefficients, decode the bitstream,
    compare against the IDCT of those SAME coefficients computed
    directly — pins Huffman coding, zig-zag, byte stuffing, DC
    prediction and dequant bit-exactly for the full AC path."""
    q = np.array(FLAT_QUANT, dtype=np.int64).reshape(8, 8)
    for seed in (1, 7, 42):
        rng = np.random.RandomState(seed)
        nb = 16
        coef = rng.randint(-63, 63, size=(nb, 64))
        coef[:, 0] = rng.randint(-128, 120, size=nb)
        # plant sparse blocks to exercise long zero runs (ZRL) and
        # an isolated last coefficient (index 63) after 15+ zeros
        coef[3, 1:] = 0
        coef[5, 1:] = 0
        coef[5, 63] = 17
        blocks = [list(map(int, coef[n])) for n in range(nb)]
        w, h, img = decode_jpeg_pixels(
            encode_jpeg_baseline(blocks, 32, 32)
        )
        assert (w, h) == (32, 32)
        expect = idct_pixels(coef.reshape(nb, 8, 8) * q)
        bw = 4
        for n in range(nb):
            r, c = divmod(n, bw)
            got = img[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8]
            assert (got == expect[n]).all(), (seed, n)


def test_restart_interval_round_trip_and_predictor_reset():
    """DRI/RSTn path: encode with restart_interval=3 (7 blocks -> two
    RST markers, modulo-8 sequence, predictor resets) and verify the
    decode matches the direct IDCT; also verify an out-of-order RST
    raises ValueError."""
    q = np.array(FLAT_QUANT, dtype=np.int64).reshape(8, 8)
    rng = np.random.RandomState(13)
    nb = 7
    coef = rng.randint(-40, 40, size=(nb, 64))
    coef[:, 0] = rng.randint(-100, 100, size=nb)
    blocks = [list(map(int, coef[n])) for n in range(nb)]
    payload = encode_jpeg_baseline(blocks, 56, 8, restart_interval=3)
    assert b"\xff\xdd" in payload  # DRI present
    assert b"\xff\xd0" in payload and b"\xff\xd1" in payload
    w, h, img = decode_jpeg_pixels(payload)
    assert (w, h) == (56, 8)
    expect = idct_pixels(coef.reshape(nb, 8, 8) * q)
    for n in range(nb):
        assert (img[:, n * 8 : n * 8 + 8] == expect[n]).all(), n
    # corrupt the RST sequence: D0 -> D5 must be rejected
    bad = payload.replace(b"\xff\xd0", b"\xff\xd5", 1)
    with pytest.raises(ValueError):
        decode_jpeg_pixels(bad)


def test_sof0_length_field_off_by_one_is_valueerror():
    """ADVICE r10: an SOF0 whose length field claims an 8-byte body
    must raise ValueError (short SOF0), not IndexError — byte-flip
    fuzz can't reach this because flipping the length byte overruns
    the payload first."""
    good = encode_jpeg_cellgrid(3)
    idx = good.find(b"\xff\xc0")
    # original body is 9 bytes -> length field 11; rewrite to 10 and
    # drop one body byte so the segment still fits the stream
    bad = (
        good[:idx + 2]
        + (10).to_bytes(2, "big")
        + good[idx + 4 : idx + 12]
        + good[idx + 13 :]
    )
    with pytest.raises(ValueError):
        decode_jpeg_pixels(bad)


def test_segment_length_plus_minus_one_fuzz_valueerror_only():
    """ADVICE r10: mutate every segment length field by +/-1 (not
    just XOR 0xFF) — decode must succeed or raise ValueError only."""
    good = encode_jpeg_baseline(
        [[(7 * k + b) % 19 - 9 for b in range(64)] for k in range(2)],
        16,
        8,
        restart_interval=1,
    )
    pos = 2
    while pos + 4 <= len(good):
        if good[pos] != 0xFF:
            break
        marker = good[pos + 1]
        if marker == 0xDA:
            break
        seglen = int.from_bytes(good[pos + 2 : pos + 4], "big")
        for delta in (-1, 1):
            mut = bytearray(good)
            mut[pos + 2 : pos + 4] = (seglen + delta).to_bytes(2, "big")
            try:
                decode_jpeg_pixels(bytes(mut))
            except ValueError:
                pass
        pos += 2 + seglen


def test_nonbaseline_and_garbage_rejected():
    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"not a jpeg")
    good = encode_jpeg_cellgrid(3)
    # flip SOF0 (0xC0) to progressive SOF2 (0xC2)
    prog = bytearray(good)
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg_pixels(bytes(prog))


def test_mutation_truncation_fuzz_valueerror_only():
    """Every single-byte mutation and truncation must decode or raise
    ValueError — never any other exception class (the mapInPandas
    corrupt-skip contract all codec arms share)."""
    good = encode_jpeg_baseline(
        [[(7 * k + b) % 19 - 9 for b in range(64)] for k in range(2)],
        16,
        8,
    )
    for i in range(len(good)):
        bad = good[:i] + bytes([good[i] ^ 0xFF]) + good[i + 1 :]
        try:
            decode_jpeg_pixels(bad)
        except ValueError:
            pass
    for cut in range(len(good)):
        try:
            decode_jpeg_pixels(good[:cut])
        except ValueError:
            pass


def test_cellgrid_matches_formula_and_third_container_pin():
    """The JPEG fixture carries the SAME cell-brightness image as the
    BMP/dHash fixtures: decoded pixel sum equals 64 * sum(cell), and
    per-cell flat values equal the BMP cell values exactly."""
    def cellv(d, i, j, group=6):
        if i < 8:
            x = (d // group) * 64 + i * 8 + j
            return (
                ((x * x % 2147483648) * 2654435761 + x * 506952113)
                % 2147483648
            ) % 241
        return 250 if j < d % 4 else 0

    for d in (0, 5, 11, 123):
        w, h, img = decode_jpeg_pixels(encode_jpeg_cellgrid(d))
        assert (w, h) == (72, 64)
        for i in (0, 4, 8):
            for j in (0, 3, 7):
                assert (
                    img[j * 8 : j * 8 + 8, i * 8 : i * 8 + 8]
                    == cellv(d, i, j)
                ).all()
        assert int(img.astype(np.int64).sum()) == 64 * sum(
            cellv(d, i, j) for i in range(9) for j in range(8)
        )


def test_decode_jpeg_stats_null_row_contract(spark):
    from advisorydatapipeline_spark.operators.jpeg_codec import (
        decode_jpeg_stats,
    )

    rows = [
        (1, encode_jpeg_cellgrid(1)),
        (2, b"junk"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in decode_jpeg_stats(df).collect()}
    assert got[1].container == "jpeg"
    assert (got[1].width, got[1].height, got[1].n_blocks) == (72, 64, 72)
    assert got[2].container == "unknown" and got[2].pixel_sum is None
    assert got[3].container == "unknown"
