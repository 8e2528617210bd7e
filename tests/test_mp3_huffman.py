"""MP3 Layer III Huffman spectral decode (operators/mp3_huffman.py,
r12 verdict item 3): exhaustive pure-Python ground truth, table
soundness, reservoir evidence, corruption plants, and the Spark hop.
"""

from __future__ import annotations

import pytest

from advisorydatapipeline_spark.operators.mp3_huffman import (
    COUNT1A_CODES,
    PAIR_CODES,
    SIDE_INFO_BYTES,
    TABLE_SET,
    TABLE_SPEC,
    BitReader,
    BitWriter,
    decode_mp3_huffman_stream,
    encode_mp3_huffman_stream,
    granule_params,
    granule_spectra,
    mdb_target,
    n_frames_for,
)


def test_tables_are_complete_prefix_codes():
    """Kraft EQUALITY (a full prefix tree — no undecodable bit
    pattern) for every canonical table, and code uniqueness."""
    for name, codes in list(PAIR_CODES.items()) + [("c1a", COUNT1A_CODES)]:
        kraft = sum(2 ** -ln for _, ln in codes)
        assert abs(kraft - 1.0) < 1e-12, name
        assert len({(c, ln) for c, ln in codes}) == len(codes), name
        # prefix-freeness: no code is a prefix of another
        as_bits = sorted(
            format(c, f"0{ln}b") for c, ln in codes
        )
        for a, b in zip(as_bits, as_bits[1:]):
            assert not b.startswith(a), name


def test_roundtrip_exhaustive_vs_ground_truth():
    """decode(encode(d)) must reproduce the generating spectra
    EXACTLY — every granule, every line, every sign — for 400 docs
    (covers all 24 mdb values, all 4 tables, both count1 tables,
    escapes, and every frame-count class)."""
    mdbs = set()
    escapes = 0
    for d in range(400):
        dec = decode_mp3_huffman_stream(encode_mp3_huffman_stream(d))
        nf = n_frames_for(d)
        assert len(dec["granules"]) == 2 * nf
        assert dec["mdb"][0] == 0
        for f in range(nf):
            assert dec["mdb"][f] == mdb_target(d, f)
        mdbs.update(dec["mdb"])
        escapes += dec["n_escape"]
        for t in range(2 * nf):
            gp = granule_params(d, t)
            assert dec["bv"][t] == gp["bv"]
            assert dec["nq"][t] == gp["nq"]
            assert dec["granules"][t] == granule_spectra(d, t)
    assert mdbs == set(range(24))  # reservoir genuinely exercised
    assert escapes > 1000  # linbits path genuinely exercised


def test_hand_decoded_bitstream():
    """Bit-level pin: one granule's first pair decoded by hand with
    the table literals — guards against silent table/bit-order
    drift."""
    d = 0
    gp = granule_params(d, 0)
    enc = encode_mp3_huffman_stream(d)
    # frame 0, mdb 0: granule data starts at byte 4+17 of the stream
    rd = BitReader(enc, 4 + SIDE_INFO_BYTES)
    tid = gp["tsel"][0]
    cap, lb = TABLE_SPEC[tid]
    want = granule_spectra(d, 0)[:2]
    stored = [min(abs(v), 15) if lb else abs(v) for v in want]
    base = 16 if lb else cap
    code, ln = PAIR_CODES[tid][stored[0] * base + stored[1]]
    assert rd.read(ln) == code
    for v, st in zip(want, stored):
        if lb and st == 15:
            assert rd.read(lb) == abs(v) - 15
        if v != 0:
            assert rd.read(1) == (1 if v < 0 else 0)


def test_corruption_plants():
    """Flipping main-data bits must never silently yield the original
    spectra: either a loud ValueError (desync caught by the
    part2_3_length / overrun checks) or changed values."""
    d = 7
    clean = encode_mp3_huffman_stream(d)
    truth = [granule_spectra(d, t) for t in range(2 * n_frames_for(d))]
    flipped_silently_equal = 0
    for byte_off in range(4 + SIDE_INFO_BYTES, 4 + SIDE_INFO_BYTES + 8):
        corrupt = bytearray(clean)
        corrupt[byte_off] ^= 0x40
        try:
            dec = decode_mp3_huffman_stream(bytes(corrupt))
        except ValueError:
            continue
        if dec["granules"] == truth:
            flipped_silently_equal += 1
    assert flipped_silently_equal == 0


def test_side_info_corruption_is_loud():
    """A table_select pointing outside the decode set raises."""
    d = 3
    clean = bytearray(encode_mp3_huffman_stream(d))
    # side info bits: 9+5+4 = 18 header bits, granule0 fields
    # 12+9+8+4+1 = 34 more -> table_select[0] starts at bit 52
    w = BitWriter()
    w.bits = []
    rd = BitReader(bytes(clean), 4)
    vals = [rd.read(n) for n in (9, 5, 4, 12, 9, 8, 4, 1, 5)]
    assert vals[-1] in TABLE_SET
    # overwrite those 5 bits with table id 30 (not in the set)
    bit0 = (4 * 8) + 9 + 5 + 4 + 12 + 9 + 8 + 4 + 1
    for i, b in enumerate(f"{30:05b}"):
        byte_i, bit_i = divmod(bit0 + i, 8)
        if b == "1":
            clean[byte_i] |= 0x80 >> bit_i
        else:
            clean[byte_i] &= ~(0x80 >> bit_i) & 0xFF
    with pytest.raises(ValueError, match="not in decode set|mismatch"):
        decode_mp3_huffman_stream(bytes(clean))


def test_spark_stats_match_pure_python(spark):
    """The mapInPandas hop equals a driver-side recomputation from
    the ground-truth generator for a doc sample."""
    from advisorydatapipeline_spark.operators.mp3_huffman import (
        line_weight,
        mp3_huffman_stats,
    )

    ids = list(range(37))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r.asDict()
        for r in mp3_huffman_stats(df).collect()
    }
    for d in ids:
        nf = n_frames_for(d)
        lines_by_t = [granule_spectra(d, t) for t in range(2 * nf)]
        want_checksum = sum(
            v * line_weight(t, i)
            for t, lines in enumerate(lines_by_t)
            for i, v in enumerate(lines)
        )
        row = got[d]
        assert row["n_granules"] == 2 * nf
        assert row["sum_bv"] == sum(
            granule_params(d, t)["bv"] for t in range(2 * nf)
        )
        assert row["checksum"] == want_checksum
        assert row["max_mdb"] == max(
            mdb_target(d, f) for f in range(nf)
        )
        assert row["sum_abs"] == sum(
            abs(v) for lines in lines_by_t for v in lines
        )
