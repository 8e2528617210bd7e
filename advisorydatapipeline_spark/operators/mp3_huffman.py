"""MP3 Layer III Huffman spectral decode over real bytes (r12 verdict
item 3) — the stage between mp3.py's frame walk and mp3_synth.py's
IMDCT back-half, retiring the "Huffman spectral decode" arm of the
lib-bound note in operators/multimodal.py.

What is REAL here (bit-exact ISO/IEC 11172-3 structure):
- frame header walk (delegating the sizing rule to operators/mp3.py);
- the 17-byte mono side-info bit layout: main_data_begin(9),
  private(5), scfsi(4), then per granule part2_3_length(12),
  big_values(9), global_gain(8), scalefac_compress(4),
  window_switching_flag(1), table_select(3x5), region0_count(4),
  region1_count(3), preflag/scalefac_scale/count1table_select(1+1+1);
- the BIT RESERVOIR: each frame's granule data starts
  ``main_data_begin`` bytes BEFORE that frame's own main-data slots,
  i.e. inside previous frames' slots — decoded with a real backward
  seek over the accumulated slot stream;
- big-values region partitioning at scalefactor-band boundaries
  (the 44.1 kHz long-block offset table), pairs never straddling;
- linbits ESCAPES (stored magnitude 15 + linbits extension),
  per-value sign bits, and the count1 region of (v,w,x,y)
  quadruples decoded until part2_3_length bits are consumed, with
  exact-length verification;
- Huffman decode itself: an MSB-first bit-by-bit prefix-tree walk.

What is repo-canonical (documented deviation): the CODE TABLES.
The exact ISO 11172-3 Table B.7 bit patterns are not reproducible in
this offline container, so tables 1/7/15/24 and count1 table A are
canonical Huffman codes built at import from a deterministic
small-values-likely weight model (real Huffman construction, Kraft
equality asserted in pytest). Count1 table B IS the ISO fixed
4-bit table (code = one's complement of the quadruple), and table 0
is ISO's zero-bit all-zeros table. A build against the published
spec swaps the table literals; every other decode path is unchanged.

Engine-exactness: Huffman coding is lossless, so the gate replays
the GENERATING formulas (house 2^31 mix) in DuckDB while the Spark
arm byte-builds the stream and genuinely decodes it — any defect in
side-info packing, reservoir seek, region/table selection, escape or
sign handling shifts the decoded stats (the FLAC/mp3_synth fixture
contract). Magnitudes: |val| <= 30, weights < 1024, <= 8 granules x
576 lines -> |checksum| < 2^28; every stat fits int64 trivially.

Reference twin: none — the reference contains no media code; this is
north-star multimodal surface (SURVEY.md §2 beyond-reference block).
"""

from __future__ import annotations

import heapq
from typing import Iterator

from pyspark.sql import DataFrame

from advisorydatapipeline_spark.operators.mp3 import mp3_frame_length

MIX31 = 2147483648
MIX_A = 2654435761
MIX_B = 2246822519

# 44.1 kHz MPEG-1 long-block scalefactor-band line offsets
SFB_LONG_44 = [
    0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
    134, 162, 196, 238, 288, 342, 418, 576,
]

BITRATE_KBPS = 128  # fixed CBR fixture tier (br_idx 9)
SAMPLE_RATE = 44100
SIDE_INFO_BYTES = 17  # mono MPEG-1
FRAME_HEADER = bytes([0xFF, 0xFB, (9 << 4) | (0 << 2) | 0, 0xC0])

# fixture table set: (table_id -> (value_cap, linbits)); stored
# symbol max is 15 for the linbits table (escape at 15, ISO rule),
# so value_cap = 15 + 2^linbits - 1 for table 24.
TABLE_SET = (1, 7, 15, 24)
TABLE_SPEC = {1: (2, 0), 7: (6, 0), 15: (16, 0), 24: (31, 4)}


def mixq(a: int) -> int:
    """House 2^31 mix — reduce mod 2^31 BEFORE multiplying."""
    return (a % MIX31) * MIX_A % MIX31


def field_mix(d: int, f: int, t: int, p: int, s: int = 0) -> int:
    """Collision-free fixture index space: field f<8, granule/frame
    t<8, position p<64, slot s<8. One multiplicative mix is not
    enough here: modular multiplication never diffuses high bits
    downward, and ``d`` enters the raw index only at bit 15+, so
    ``mixq(raw) % small`` would see d only through a coarse lattice
    (measured: main_data_begin collapsed to 9 of 24 values). The
    double-mix folds the well-mixed HIGH bits of the first round
    back into the low bits before the second multiply. The oracle
    replays the identical expression."""
    raw = d * 32768 + f * 4096 + t * 512 + p * 8 + s
    return mixq(mixq(raw) // 65536 + raw)


def line_weight(t: int, i: int) -> int:
    """Order-sensitive checksum weight (second house stream)."""
    return (t * 1024 + i) * MIX_B % MIX31 % 1024


# ---------------------------------------------------------------------
# canonical Huffman tables (built once at import)
# ---------------------------------------------------------------------


def _huffman_lengths(weights: list[int]) -> list[int]:
    """Real Huffman construction with deterministic tie-breaking
    (weight, then insertion counter); returns per-symbol code length."""
    n = len(weights)
    if n == 1:
        return [1]
    heap = [(w, i, (i,)) for i, w in enumerate(weights)]
    heapq.heapify(heap)
    nxt = n
    depth = [0] * n
    while len(heap) > 1:
        w1, _, s1 = heapq.heappop(heap)
        w2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (w1 + w2, nxt, s1 + s2))
        nxt += 1
    return depth


def _canonical_codes(lengths: list[int]) -> list[tuple[int, int]]:
    """(code, length) per symbol from lengths — canonical assignment:
    symbols sorted by (length, symbol id), codes count upward."""
    order = sorted(range(len(lengths)), key=lambda s: (lengths[s], s))
    codes: list[tuple[int, int]] = [(0, 0)] * len(lengths)
    code = 0
    prev_len = 0
    for s in order:
        ln = lengths[s]
        code <<= ln - prev_len
        codes[s] = (code, ln)
        code += 1
        prev_len = ln
    return codes


def _decode_tree(codes: list[tuple[int, int]]) -> dict:
    """Binary prefix tree {0/1 -> subtree | ('sym', id)} for the
    bit-by-bit decode walk."""
    root: dict = {}
    for sym, (code, ln) in enumerate(codes):
        node = root
        for b in range(ln - 1, 0, -1):
            node = node.setdefault((code >> b) & 1, {})
        node[code & 1] = ("sym", sym)
    return root


def _pair_table(stored_max: int) -> tuple[list[tuple[int, int]], dict]:
    """Codes + decode tree over the (x, y) pair alphabet with
    0 <= x, y <= stored_max; weight model favors small values (the
    ISO design intent) — symbol id = x * (stored_max+1) + y."""
    n = stored_max + 1
    weights = [
        (1 << 16) // ((1 + x) * (1 + y)) + 1
        for x in range(n)
        for y in range(n)
    ]
    codes = _canonical_codes(_huffman_lengths(weights))
    return codes, _decode_tree(codes)


def _count1a_table() -> tuple[list[tuple[int, int]], dict]:
    """Count1 table A stand-in: 16 quadruple symbols, zeros likely."""
    weights = [1 << (2 * (4 - bin(nib).count("1"))) for nib in range(16)]
    codes = _canonical_codes(_huffman_lengths(weights))
    return codes, _decode_tree(codes)


PAIR_CODES: dict[int, list[tuple[int, int]]] = {}
PAIR_TREES: dict[int, dict] = {}
for _tid in TABLE_SET:
    _cap, _lb = TABLE_SPEC[_tid]
    _stored = 15 if _lb else _cap - 1
    PAIR_CODES[_tid], PAIR_TREES[_tid] = _pair_table(_stored)
COUNT1A_CODES, COUNT1A_TREE = _count1a_table()


# ---------------------------------------------------------------------
# bit I/O (MSB-first, ISO order)
# ---------------------------------------------------------------------


class BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for b in range(n - 1, -1, -1):
            self.bits.append((value >> b) & 1)

    def __len__(self) -> int:
        return len(self.bits)

    def to_bytes(self) -> bytes:
        bits = self.bits + [0] * (-len(self.bits) % 8)
        return bytes(
            sum(bits[i + j] << (7 - j) for j in range(8))
            for i in range(0, len(bits), 8)
        )


class BitReader:
    def __init__(self, data: bytes, start_byte: int = 0) -> None:
        self.data = data
        self.pos = start_byte * 8

    def read(self, n: int) -> int:
        if self.pos + n > len(self.data) * 8:
            raise ValueError("bitstream overrun")
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


# ---------------------------------------------------------------------
# fixture spectra (the generating formulas the oracle replays)
# ---------------------------------------------------------------------


def n_frames_for(doc_id: int) -> int:
    return 2 + doc_id % 3


def granule_params(d: int, t: int) -> dict:
    """Side-info fields + content sizes for granule t of doc d."""
    bv = 15 + field_mix(d, 0, t, 0) % 22
    v1 = field_mix(d, 1, t, 0)
    r0c = 4 + v1 % 4
    r1c = 3 + (v1 // 8) % 3
    tsel = tuple(
        TABLE_SET[field_mix(d, 2, t, r) % 4] for r in range(3)
    )
    nq = field_mix(d, 5, t, 0) % 20
    c1sel = field_mix(d, 1, t, 6) % 2
    gain = field_mix(d, 1, t, 5) % 256
    return {
        "bv": bv, "r0c": r0c, "r1c": r1c, "tsel": tsel,
        "nq": nq, "c1sel": c1sel, "gain": gain,
    }


def region_of_line(line: int, r0c: int, r1c: int) -> int:
    r0b = SFB_LONG_44[r0c + 1]
    r1b = SFB_LONG_44[r0c + r1c + 2]
    return 0 if line < r0b else (1 if line < r1b else 2)


def big_value(d: int, t: int, p: int, s: int, table_id: int) -> int:
    """Signed big-values magnitude for pair p slot s (the formula the
    oracle replays)."""
    cap = TABLE_SPEC[table_id][0]
    m = field_mix(d, 3, t, p, s) % cap
    sign = field_mix(d, 4, t, p, s) % 2
    return -m if sign else m


def quad_values(d: int, t: int, q: int) -> list[int]:
    """Signed (v, w, x, y) for count1 quadruple q."""
    x = field_mix(d, 5, t, 1 + q)
    nib = x % 16
    out = []
    for j, bit in enumerate((nib >> 3 & 1, nib >> 2 & 1,
                             nib >> 1 & 1, nib & 1)):
        sign = (x >> (4 + j)) & 1
        out.append(-bit if bit and sign else bit)
    return out


def mdb_target(d: int, f: int) -> int:
    """main_data_begin for frame f (0 for the first frame)."""
    return 0 if f == 0 else field_mix(d, 1, f, 7) % 24


def granule_spectra(d: int, t: int) -> list[int]:
    """Pure-Python ground truth: the full decoded line sequence
    (big-values lines then count1 lines) for granule t of doc d."""
    gp = granule_params(d, t)
    out = []
    for p in range(gp["bv"]):
        r = region_of_line(2 * p, gp["r0c"], gp["r1c"])
        for s in (0, 1):
            out.append(big_value(d, t, p, s, gp["tsel"][r]))
    for q in range(gp["nq"]):
        out.extend(quad_values(d, t, q))
    return out


# ---------------------------------------------------------------------
# encoder (fixture builder)
# ---------------------------------------------------------------------


def _encode_granule(d: int, t: int) -> BitWriter:
    gp = granule_params(d, t)
    w = BitWriter()
    for p in range(gp["bv"]):
        r = region_of_line(2 * p, gp["r0c"], gp["r1c"])
        tid = gp["tsel"][r]
        _cap, lb = TABLE_SPEC[tid]
        vals = [big_value(d, t, p, s, tid) for s in (0, 1)]
        mags = [abs(v) for v in vals]
        stored = [min(m, 15) if lb else m for m in mags]
        code, ln = PAIR_CODES[tid][stored[0] * (16 if lb else _cap)
                                   + stored[1]]
        w.write(code, ln)
        for m, st, v in zip(mags, stored, vals):
            if lb and st == 15:
                w.write(m - 15, lb)
            if m:
                w.write(1 if v < 0 else 0, 1)
    c1_codes = COUNT1A_CODES if gp["c1sel"] == 0 else None
    for q in range(gp["nq"]):
        vals = quad_values(d, t, q)
        nib = sum((1 if v != 0 else 0) << (3 - j)
                  for j, v in enumerate(vals))
        if c1_codes is not None:
            code, ln = c1_codes[nib]
            w.write(code, ln)
        else:  # ISO count1 table B: 4 bits, one's complement
            w.write((~nib) & 0xF, 4)
        for v in vals:
            if v:
                w.write(1 if v < 0 else 0, 1)
    return w


def encode_mp3_huffman_stream(d: int) -> bytes:
    """Build a real CBR 128 kbps 44.1 kHz mono stream whose main data
    exercises the bit reservoir: frame f's granule data begins
    ``mdb_target(d, f)`` bytes inside earlier frames' slots."""
    nf = n_frames_for(d)
    flen = mp3_frame_length(BITRATE_KBPS, SAMPLE_RATE, 0)
    slots = flen - 4 - SIDE_INFO_BYTES

    frame_bits: list[tuple[BitWriter, list[int]]] = []
    for f in range(nf):
        gw = BitWriter()
        lens = []
        for g in (0, 1):
            sub = _encode_granule(d, f * 2 + g)
            lens.append(len(sub))
            gw.bits.extend(sub.bits)
        frame_bits.append((gw, lens))

    # lay granule blocks into the slot stream with per-frame stuffing
    # so each frame's data starts exactly mdb_target bytes back
    data = bytearray()
    side: list[tuple[int, list[int]]] = []
    for f in range(nf):
        gw, lens = frame_bits[f]
        start = f * slots - mdb_target(d, f)
        if start < len(data) or start < 0:
            raise AssertionError("reservoir target infeasible")
        data.extend(b"\x00" * (start - len(data)))  # stuffing
        blob = gw.to_bytes()
        data.extend(blob)
        side.append((mdb_target(d, f), lens))
    total = slots * nf
    if len(data) > total:
        raise AssertionError("granule data overruns slot stream")
    data.extend(b"\x00" * (total - len(data)))

    out = bytearray()
    for f in range(nf):
        sw = BitWriter()
        sw.write(side[f][0], 9)  # main_data_begin
        sw.write(0, 5)  # private
        sw.write(0, 4)  # scfsi
        for g in (0, 1):
            t = f * 2 + g
            gp = granule_params(d, t)
            sw.write(side[f][1][g], 12)  # part2_3_length
            sw.write(gp["bv"], 9)
            sw.write(gp["gain"], 8)
            sw.write(0, 4)  # scalefac_compress
            sw.write(0, 1)  # window_switching_flag
            for r in range(3):  # table_select: the real table id
                sw.write(gp["tsel"][r], 5)
            sw.write(gp["r0c"], 4)
            sw.write(gp["r1c"], 3)
            sw.write(0, 1)  # preflag
            sw.write(0, 1)  # scalefac_scale
            sw.write(gp["c1sel"], 1)
        si = sw.to_bytes()
        assert len(si) == SIDE_INFO_BYTES
        out += FRAME_HEADER + si + data[f * slots:(f + 1) * slots]
    return bytes(out)


# ---------------------------------------------------------------------
# decoder (reads bytes only — no fixture formulas)
# ---------------------------------------------------------------------


def decode_mp3_huffman_stream(payload: bytes) -> dict:
    """Genuine decode: frame walk -> side-info bit parse -> reservoir
    seek -> per-granule Huffman walk (regions, escapes, signs,
    count1) with exact part2_3_length verification. Returns
    ``{"granules": [list[int] line values...], "bv": [...],
    "nq": [...], "mdb": [...], "n_escape": int}``."""
    pos = 0
    reservoir = bytearray()
    granules: list[list[int]] = []
    bvs: list[int] = []
    nqs: list[int] = []
    mdbs: list[int] = []
    n_escape = 0
    while pos < len(payload):
        if payload[pos] != 0xFF or (payload[pos + 1] & 0xE0) != 0xE0:
            raise ValueError("frame sync lost")
        br_idx = payload[pos + 2] >> 4
        sr_idx = (payload[pos + 2] >> 2) & 0x03
        if br_idx != 9 or sr_idx != 0:
            raise ValueError("fixture scope: 128 kbps / 44.1 kHz only")
        pad = (payload[pos + 2] >> 1) & 1
        flen = mp3_frame_length(BITRATE_KBPS, SAMPLE_RATE, pad)
        si = BitReader(payload, pos + 4)
        mdb = si.read(9)
        si.read(5)
        si.read(4)
        g_fields = []
        for _g in (0, 1):
            fields = {
                "p23": si.read(12), "bv": si.read(9),
                "gain": si.read(8), "sfc": si.read(4),
                "wsf": si.read(1),
                "tsel": tuple(si.read(5) for _ in range(3)),
                "r0c": si.read(4), "r1c": si.read(3),
                "pre": si.read(1), "sfs": si.read(1),
                "c1sel": si.read(1),
            }
            if fields["wsf"] != 0 or fields["sfc"] != 0:
                raise ValueError("fixture scope: long blocks, slen 0")
            g_fields.append(fields)
        main_start = len(reservoir) - mdb
        if main_start < 0:
            raise ValueError("main_data_begin before stream start")
        reservoir += payload[pos + 4 + SIDE_INFO_BYTES: pos + flen]
        rd = BitReader(bytes(reservoir), main_start)
        for fields in g_fields:
            bit0 = rd.pos
            lines: list[int] = []
            nq = 0
            r0b = SFB_LONG_44[fields["r0c"] + 1]
            r1b = SFB_LONG_44[fields["r0c"] + fields["r1c"] + 2]
            for p in range(fields["bv"]):
                line = 2 * p
                r = 0 if line < r0b else (1 if line < r1b else 2)
                tid = fields["tsel"][r]
                if tid == 0:  # ISO table 0: zero bits, zero values
                    lines.extend((0, 0))
                    continue
                if tid not in PAIR_TREES:
                    raise ValueError(f"table {tid} not in decode set")
                _cap, lb = TABLE_SPEC[tid]
                node = PAIR_TREES[tid]
                while True:
                    node = node[rd.read(1)]
                    if isinstance(node, tuple):
                        sym = node[1]
                        break
                base = 16 if lb else _cap
                pair = [sym // base, sym % base]
                for v in pair:
                    if lb and v == 15:
                        v += rd.read(lb)
                        n_escape += 1
                    if v and rd.read(1):
                        v = -v
                    lines.append(v)
            while rd.pos - bit0 < fields["p23"]:
                if len(lines) + 4 > 576:
                    raise ValueError("count1 overruns 576 lines")
                if fields["c1sel"] == 0:
                    node = COUNT1A_TREE
                    while True:
                        node = node[rd.read(1)]
                        if isinstance(node, tuple):
                            nib = node[1]
                            break
                else:  # ISO count1 table B
                    nib = (~rd.read(4)) & 0xF
                for j in range(4):
                    bit = (nib >> (3 - j)) & 1
                    if bit and rd.read(1):
                        bit = -bit
                    lines.append(bit)
                nq += 1
            if rd.pos - bit0 != fields["p23"]:
                raise ValueError("part2_3_length mismatch")
            granules.append(lines)
            bvs.append(fields["bv"])
            nqs.append(nq)
        mdbs.append(mdb)
        pos += flen
    if pos != len(payload):
        raise ValueError("frames do not tile payload")
    return {
        "granules": granules, "bv": bvs, "nq": nqs,
        "mdb": mdbs, "n_escape": n_escape,
    }


# ---------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------

HUFF_SCHEMA = (
    "doc_id long, n_granules long, sum_bv long, n_count1 long,"
    " n_nonzero long, sum_abs long, max_abs long, n_escape long,"
    " checksum long, max_mdb long"
)


def mp3_huffman_stats(docs_df: DataFrame) -> DataFrame:
    """Per-doc spectral stats: one mapInPandas hop byte-builds the
    fixture stream, REALLY decodes it (reservoir + Huffman walk), and
    aggregates the decoded lines. Payloads never leave the operator;
    10 scalars per doc do. Zero shuffle beyond the caller's id
    repartition."""
    import pandas as pd

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                dec = decode_mp3_huffman_stream(
                    encode_mp3_huffman_stream(d)
                )
                n_nonzero = sum_abs = max_abs = checksum = 0
                for t, lines in enumerate(dec["granules"]):
                    for i, v in enumerate(lines):
                        if v:
                            n_nonzero += 1
                            sum_abs += abs(v)
                            max_abs = max(max_abs, abs(v))
                        checksum += v * line_weight(t, i)
                rows.append(
                    {
                        "doc_id": d,
                        "n_granules": len(dec["granules"]),
                        "sum_bv": sum(dec["bv"]),
                        "n_count1": sum(dec["nq"]),
                        "n_nonzero": n_nonzero,
                        "sum_abs": sum_abs,
                        "max_abs": max_abs,
                        "n_escape": dec["n_escape"],
                        "checksum": checksum,
                        "max_mdb": max(dec["mdb"]),
                    }
                )
            yield pd.DataFrame(rows)

    return docs_df.select("doc_id").mapInPandas(op, HUFF_SCHEMA)


# ---------------------------------------------------------------------
# DuckDB oracle (replays the generating formulas; the Spark arm
# decodes real bytes — losslessness makes the gate total)
# ---------------------------------------------------------------------


def _sql_mix(a: str) -> str:
    return f"((({a}) % 2147483648) * 2654435761 % 2147483648)"


def _sql_fmix(raw: str) -> str:
    """SQL twin of :func:`field_mix` (the double mix)."""
    inner = _sql_mix(raw)
    return _sql_mix(f"{inner} // 65536 + ({raw})")


def _sql_raw(f: int, t: str, p: str = "0", s: str = "0") -> str:
    return f"d * 32768 + {f} * 4096 + ({t}) * 512 + ({p}) * 8 + ({s})"


def duck_huffman_oracle() -> str:
    """Replay of every fixture formula over the documents table,
    producing the same 10 per-doc stats :func:`mp3_huffman_stats`
    computes from genuinely decoded bytes."""
    fm = _sql_fmix
    rw = _sql_raw
    sfb0 = " ".join(
        f"WHEN {idx} THEN {SFB_LONG_44[idx]}" for idx in range(5, 9)
    )
    sfb1 = " ".join(
        f"WHEN {idx} THEN {SFB_LONG_44[idx]}" for idx in range(9, 15)
    )
    tsel_case = (
        "CASE {v} % 4 WHEN 0 THEN 1 WHEN 1 THEN 7 WHEN 2 THEN 15 "
        "ELSE 24 END"
    )
    return f"""
WITH docs AS (SELECT doc_id AS d FROM documents),
gr AS (
  SELECT d, t.t FROM docs
  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS t) t
  WHERE t.t < 2 * (2 + d % 3)
),
par AS (
  SELECT d, t,
    15 + {fm(rw(0, "t"))} % 22 AS bv,
    4 + {fm(rw(1, "t"))} % 4 AS r0c,
    3 + ({fm(rw(1, "t"))} // 8) % 3 AS r1c,
    {fm(rw(5, "t"))} % 20 AS nq
  FROM gr
),
bounds AS (
  SELECT d, t, bv, nq,
    CASE r0c + 1 {sfb0} END AS r0b,
    CASE r0c + r1c + 2 {sfb1} END AS r1b
  FROM par
),
bigl AS (
  SELECT b.d, b.t, p.p, s.s, 2 * p.p + s.s AS i,
    {tsel_case.format(v=fm(rw(2, "b.t",
        "CASE WHEN 2*p.p < r0b THEN 0 WHEN 2*p.p < r1b THEN 1 "
        "ELSE 2 END")))} AS tsel
  FROM bounds b
  CROSS JOIN (SELECT unnest(generate_series(0, 36)) AS p) p
  CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS s) s
  WHERE p.p < b.bv
),
bigv AS (
  SELECT d, t, i, tsel,
    {fm(rw(3, "t", "p", "s"))} %
      CASE tsel WHEN 1 THEN 2 WHEN 7 THEN 6 WHEN 15 THEN 16
      ELSE 31 END AS m,
    {fm(rw(4, "t", "p", "s"))} % 2 AS sgn
  FROM bigl
),
quadl AS (
  SELECT b.d, b.t, 2 * b.bv + 4 * q.q + j.j AS i, j.j,
    {fm(rw(5, "b.t", "1 + q.q"))} AS x
  FROM bounds b
  CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS q) q
  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) j
  WHERE q.q < b.nq
),
lines AS (
  SELECT d, t, i,
    CASE WHEN sgn = 1 THEN -m ELSE m END AS val, m,
    CASE WHEN tsel = 24 AND m >= 15 THEN 1 ELSE 0 END AS esc
  FROM bigv
  UNION ALL
  SELECT d, t, i,
    CASE
      WHEN (x // (CASE j WHEN 0 THEN 8 WHEN 1 THEN 4
                  WHEN 2 THEN 2 ELSE 1 END)) % 2 = 0 THEN 0
      WHEN (x // (CASE j WHEN 0 THEN 16 WHEN 1 THEN 32
                  WHEN 2 THEN 64 ELSE 128 END)) % 2 = 1 THEN -1
      ELSE 1
    END AS val,
    (x // (CASE j WHEN 0 THEN 8 WHEN 1 THEN 4
           WHEN 2 THEN 2 ELSE 1 END)) % 2 AS m,
    0 AS esc
  FROM quadl
),
mdb AS (
  SELECT d, f.f, {fm(rw(1, "f.f", "7"))} % 24 AS v
  FROM docs CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS f) f
  WHERE f.f < 2 + d % 3
),
per_doc AS (
  SELECT l.d,
    CAST(sum(CASE WHEN l.val <> 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_nonzero,
    CAST(sum(abs(l.val)) AS BIGINT) AS sum_abs,
    CAST(max(abs(l.val)) AS BIGINT) AS max_abs,
    CAST(sum(l.esc) AS BIGINT) AS n_escape,
    CAST(sum(l.val * ((((l.t * 1024 + l.i) * 2246822519)
      % 2147483648) % 1024)) AS BIGINT) AS checksum
  FROM lines l GROUP BY 1
)
SELECT p.d AS doc_id,
  CAST(g.n_granules AS BIGINT) AS n_granules,
  CAST(g.sum_bv AS BIGINT) AS sum_bv,
  CAST(g.n_count1 AS BIGINT) AS n_count1,
  p.n_nonzero, p.sum_abs, p.max_abs, p.n_escape, p.checksum,
  CAST(m.max_mdb AS BIGINT) AS max_mdb
FROM per_doc p
JOIN (SELECT d, count(*) AS n_granules, sum(bv) AS sum_bv,
             sum(nq) AS n_count1 FROM par GROUP BY 1) g ON g.d = p.d
JOIN (SELECT d, max(v) AS max_mdb FROM mdb GROUP BY 1) m ON m.d = p.d
"""
