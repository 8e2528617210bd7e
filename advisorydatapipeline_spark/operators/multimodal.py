"""Multimodal column plumbing (beyond-reference, north-star op).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata (schemas.MEDIA_SCHEMA). The Spark-side plumbing — schema,
partitioning, Arrow batch shape, ``mapInPandas`` operator signatures —
is real and tested, and every codec-free container format has a REAL
stdlib-only decode arm:

- BMP: header (:func:`decode_bmp`) + full pixel decode
  (:func:`decode_bmp_pixels` — offset/padding/row-order aware);
- WAV: header (:func:`decode_wav`) + framewise energy/zero-crossing
  features over the parsed sample stream (:func:`wav_frame_features`);
- PNG: full decode through zlib + all-5-filter reversal
  (:func:`decode_png`);
- GIF: full LZW decode (:func:`decode_gif`, deferred-clear aware) +
  animated frame SAMPLING that skips unsampled frames
  (:func:`decode_gif_frames` / :func:`sample_gif_frames`);
- JPEG: frame-header decode via ITU-T.81 marker scan
  (:func:`parse_jpeg_header`) + FULL baseline entropy decode ->
  dequant -> IDCT -> pixels in operators/jpeg_codec.py
  (:func:`~advisorydatapipeline_spark.operators.jpeg_codec.decode_jpeg_pixels`).

- MJPEG-AVI video: container walk + per-frame baseline-JPEG decode
  with true skip-unsampled cost (operators/video.py);
- IPV1 inter-frame video (r14): I-frame + mod-256 P-frame deltas
  decoded through the reference chain (operators/video.py), sampled
  here by :func:`sample_frames`'s real path.

Exactly ONE library-bound arm remains stubbed: :func:`decode_media`
for payloads in FOREIGN containers (standardized inter codecs
H.264/VP9/AV1, non-baseline JPEG color) raises
``NotImplementedError`` unless the optional codec import succeeds
(import-try gate), or runs a clearly-marked deterministic fake when
``fake=True``.

Scale design (100 TB of media): payloads never shuffle — every
operator here is ``mapInPandas`` (narrow, per-partition, Arrow-
batched). Metadata-only derivations project the binary column away
before any wide op. Partition by content hash prefix for even file
sizes; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # optional codec stack (absent in this container)
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False

METADATA_SCHEMA = (
    "media_id long, media_type string, byte_len long, content_hash string"
)
DECODED_SCHEMA = (
    "media_id long, media_type string, width int, height int, "
    "n_frames int, sample_rate int"
)


def attach_payload(
    df: DataFrame, id_col: str, text_col: str, type_col_mod: int = 3
) -> DataFrame:
    """Test/demo helper: derive an opaque binary payload column from a
    text column (utf-8 bytes) plus a media_type. Mirrors how a real
    pipeline would land raw bytes + type tag from object storage."""
    mtype = (
        F.when(F.col(id_col) % type_col_mod == 0, "image")
        .when(F.col(id_col) % type_col_mod == 1, "audio")
        .otherwise("video")
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        mtype.alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def extract_metadata(media_df: DataFrame) -> DataFrame:
    """Codec-free metadata pass: byte length + content hash, computed
    in Arrow-batched pandas. md5 here matches SQL ``md5`` exactly, so
    the whole mapInPandas hop is oracle-checkable."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "content_hash": pdf["payload"].map(
                        lambda b: hashlib.md5(b).hexdigest()
                        if b is not None
                        else None
                    ),
                }
            )

    return media_df.mapInPandas(op, METADATA_SCHEMA)


def encode_bmp(width: int, height: int, pixel_value: int = 0) -> bytes:
    """Minimal valid 24-bpp uncompressed BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER + padded pixel rows), pure Python. Used to build
    real decodable fixtures — BMP needs no codec library, only the
    fixed 54-byte header layout from the public format spec."""
    row_bytes = ((width * 3 + 3) // 4) * 4
    data_size = row_bytes * height
    header = (
        b"BM"
        + int(54 + data_size).to_bytes(4, "little")  # file size
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")  # pixel-data offset
        + (40).to_bytes(4, "little")  # BITMAPINFOHEADER size
        + int(width).to_bytes(4, "little", signed=True)
        + int(height).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")  # planes
        + (24).to_bytes(2, "little")  # bpp
        + (0).to_bytes(4, "little")  # BI_RGB
        + data_size.to_bytes(4, "little")
        + b"\x00" * 16  # ppm + palette fields
    )
    row = bytes([pixel_value % 256] * (width * 3)) + b"\x00" * (
        row_bytes - width * 3
    )
    return header + row * height


def decode_bmp(payload: bytes) -> tuple[int, int, int]:
    """(width, height, bpp) from a BMP header; raises on non-BMP."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = abs(int.from_bytes(payload[22:26], "little", signed=True))
    bpp = int.from_bytes(payload[28:30], "little")
    return width, height, bpp


def encode_bmp_gradient(width: int, height: int, seed: int = 0) -> bytes:
    """24-bpp BMP whose pixel (x, y, channel) bytes follow the
    deterministic gradient ``(seed + 7x + 13y + 29c) % 256`` (same
    formula as :func:`encode_png`), bottom-up row order as the
    positive-height BMP spec requires — so the decoded pixel sum is
    doc-id arithmetic an oracle can replay."""
    row_bytes = ((width * 3 + 3) // 4) * 4
    data_size = row_bytes * height
    header = (
        b"BM"
        + int(54 + data_size).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + int(width).to_bytes(4, "little", signed=True)
        + int(height).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + data_size.to_bytes(4, "little")
        + b"\x00" * 16
    )
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(width):
            # BMP stores BGR: channel c=0 blue, 1 green, 2 red —
            # keep the logical (R,G,B)=(c 0,1,2) gradient and write
            # reversed so decode maps back to the same sum
            r = (seed + 7 * x + 13 * y) % 256
            g = (seed + 7 * x + 13 * y + 29) % 256
            bch = (seed + 7 * x + 13 * y + 58) % 256
            row += bytes([bch, g, r])
        row += b"\x00" * (row_bytes - width * 3)
        rows.append(bytes(row))
    return header + b"".join(rows)


def decode_bmp_pixels(payload: bytes) -> tuple[int, int, int]:
    """(width, height, pixel_sum) from a 24-bpp uncompressed BMP —
    full pixel decode (round-9 completion of the BMP arm, matching
    PNG/GIF): honours the pixel-data offset field, 4-byte row
    padding, bottom-up (positive height) AND top-down (negative
    height) row order. pixel_sum is the sum of every R+G+B byte, so
    a wrong offset, padding, or row-order bug shifts the value.
    ValueError-only corruption contract like every codec arm."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError("BMP header too small")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    raw_h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bpp BMP supported")
    if width <= 0 or raw_h == 0:
        raise ValueError("BMP declares empty image")
    height = abs(raw_h)
    row_bytes = ((width * 3 + 3) // 4) * 4
    need = data_off + row_bytes * height
    if data_off < 54 or need > len(payload):
        raise ValueError("BMP pixel data overruns payload")
    total = 0
    for r in range(height):
        start = data_off + r * row_bytes
        total += sum(payload[start : start + width * 3])
    return width, height, total


def decode_bmp_stats(media_df: DataFrame) -> DataFrame:
    """Per-payload full BMP pixel decode via
    :func:`decode_bmp_pixels`; corrupt / non-BMP payloads yield a
    NULL row (``container = 'unknown'``). mapInPandas, narrow."""
    schema = (
        "media_id long, container string, width int, height int, "
        "pixel_sum long"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                b = bytes(row["payload"]) if row["payload"] is not None else b""
                rec = {
                    "media_id": row["media_id"],
                    "container": "unknown",
                    "width": None,
                    "height": None,
                    "pixel_sum": None,
                }
                try:
                    w, h, ps = decode_bmp_pixels(b)
                    rec.update(
                        container="bmp", width=w, height=h, pixel_sum=ps
                    )
                except ValueError:
                    pass
                out.append(rec)
            yield pd.DataFrame(out)

    return media_df.mapInPandas(op, schema)


# --- Audio fingerprint (energy-delta bits) + Hamming-banded near-dup -
#
# Round-10 audio twin of the image dHash operator: Haitsma-Kalker
# style acoustic fingerprinting reduced to its energy-band core —
# bit f = [E(frame f+1) > E(frame f)] over the REAL decoded PCM
# stream — then the same exact-recall block-combination join.

AUDIO_FP_BITS = 64
AUDIO_FP_FRAMES = AUDIO_FP_BITS + 1  # 65 frames -> 64 deltas


def _mix2(x: int) -> int:
    """Two-round quadratic integer mix, all intermediates < 2^63 so
    Spark and DuckDB replay it exactly in BIGINT. One round leaves
    nearby content keys' bit-30 correlated (measured: 30k accidental
    near-dup pairs at 20k docs); two rounds measured 100% planted at
    500/5k/20k docs."""
    M, A, B = 2147483648, 2654435761, 506952113
    h = ((x * x % M) * A + x * B) % M
    return ((h * h % M) * A + h * B) % M


def audio_fp_spec_bits(doc_id: int, *, group: int = 6) -> list[int]:
    """The planted fingerprint spec shared by the fixture encoder,
    the pytest twin, and (re-expressed in SQL) the DuckDB oracle:
    bits 0-59 pseudo-random per content key (bit 30 of the two-round
    mix), bits 60-63 are the per-doc flip tail — so within a group of
    ``group`` docs hamming(a, b) = |a%4 - b%4| <= 3, the same planted
    structure as encode_bmp_cellgrid."""
    ckey = doc_id // group
    bits = [
        (_mix2(ckey * 64 + f) >> 30) & 1 for f in range(AUDIO_FP_BITS - 4)
    ]
    bits += [1 if t < doc_id % 4 else 0 for t in range(4)]
    return bits


def encode_wav_bitwalk(
    doc_id: int, *, frame_len: int = 50, group: int = 6
) -> bytes:
    """PCM-WAV fixture whose framewise energies REALIZE the planted
    fingerprint: amplitude walks +-1 per frame (a_0 = 1000, up on a
    1-bit, down on a 0-bit), each frame holding ``frame_len``
    constant samples, so E(f+1) > E(f) iff bit f is 1 — strict, no
    ties. 65 frames, samples within int16, energies within BIGINT."""
    import struct

    bits = audio_fp_spec_bits(doc_id, group=group)
    amps = [1000]
    for b in bits:
        amps.append(amps[-1] + (1 if b else -1))
    samples = b"".join(
        struct.pack("<h", a) * frame_len for a in amps
    )
    header = encode_wav(16000, 0)
    out = bytearray(header + samples)
    out[4:8] = (36 + len(samples)).to_bytes(4, "little")
    out[40:44] = len(samples).to_bytes(4, "little")
    return bytes(out)


def audio_fingerprint_blocks(
    media_df: DataFrame, *, frame_len: int = 50
) -> DataFrame:
    """(media_id, block_0..block_3) 64-bit audio fingerprint per WAV
    payload: REAL RIFF/PCM frame decode (:func:`wav_frame_rows`),
    per-frame energy, bit f = [E(f+1) > E(f)] over the first 65
    frames, packed as four 16-bit blocks. Corrupt / non-WAV / short
    (<65 frames) payloads contribute zero rows.

    mapInPandas, narrow, Arrow-batched — payload bytes never shuffle;
    5 scalar columns leave the operator."""
    schema = (
        "media_id long, block_0 long, block_1 long, "
        "block_2 long, block_3 long"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                b = bytes(row["payload"]) if row["payload"] is not None else b""
                try:
                    frames = wav_frame_rows(b, frame_len)
                except ValueError:
                    continue
                if len(frames) < AUDIO_FP_FRAMES:
                    continue
                energies = [fr[2] for fr in frames[:AUDIO_FP_FRAMES]]
                blocks = [0, 0, 0, 0]
                for f in range(AUDIO_FP_BITS):
                    if energies[f + 1] > energies[f]:
                        blocks[f // 16] |= 1 << (f % 16)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "block_0": blocks[0],
                        "block_1": blocks[1],
                        "block_2": blocks[2],
                        "block_3": blocks[3],
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "block_0", "block_1",
                    "block_2", "block_3",
                ],
            )

    return media_df.mapInPandas(op, schema)


def audio_fp_near_dupes(
    media_df: DataFrame,
    *,
    max_hamming: int = 3,
    frame_len: int = 50,
) -> DataFrame:
    """Audio near-dup pairs by 64-bit energy-delta fingerprint +
    the exact-recall block-combination Hamming join
    (operators/dedup.py:blocks_near_dupes — shared with
    dedup_simhash64 and image_phash_near_dupes). Output
    (id_a, id_b, hamming), id_a < id_b.

    Scale (100 TB of audio): payload bytes never shuffle (narrow
    Arrow decode hop); only the 5-column signature moves, once, on
    the combination key. Signature persisted (a/b projections differ,
    registry cache contract)."""
    from advisorydatapipeline_spark.operators.dedup import (
        blocks_near_dupes,
    )

    sig = audio_fingerprint_blocks(media_df, frame_len=frame_len).persist()
    return blocks_near_dupes(
        sig,
        "media_id",
        DHASH_BLOCK_WIDTHS,
        max_hamming=max_hamming,
    )


# --- Perceptual image hashing (dHash) + Hamming-banded near-dup ------
#
# Round-10 composition of the codec family (real BMP pixel decode)
# with the dedup family (the simhash64 exact-recall block-combination
# join): the image-dedup operator every multimodal training pipeline
# runs before training.

DHASH_GRID_W, DHASH_GRID_H = 9, 8  # classic dHash: 9x8 -> 8x8 bits
DHASH_BLOCK_WIDTHS = [16, 16, 16, 16]


def _bmp_rows_topdown(payload: bytes) -> tuple[int, int, list[bytes]]:
    """(width, height, rows) from a 24-bpp uncompressed BMP, where
    ``rows[j]`` is image row j TOP-DOWN, padding stripped (exactly
    ``3 * width`` BGR bytes). Shares the validation rules of
    :func:`decode_bmp_pixels` (ValueError-only contract); unlike the
    order-invariant pixel SUM, consumers of this helper see row
    ORDER, so bottom-up (positive height) storage is flipped here."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError("BMP header too small")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    raw_h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bpp BMP supported")
    if width <= 0 or raw_h == 0:
        raise ValueError("BMP declares empty image")
    height = abs(raw_h)
    row_bytes = ((width * 3 + 3) // 4) * 4
    if data_off < 54 or data_off + row_bytes * height > len(payload):
        raise ValueError("BMP pixel data overruns payload")
    rows = []
    for j in range(height):
        stored = (height - 1 - j) if raw_h > 0 else j  # bottom-up flip
        start = data_off + stored * row_bytes
        rows.append(payload[start : start + width * 3])
    return width, height, rows


def bmp_dhash_blocks(payload: bytes) -> tuple[int, int, int, int]:
    """64-bit difference hash (dHash) of a 24-bpp BMP, returned as
    four 16-bit blocks (the exact shape
    dedup.blocks_near_dupes consumes; bit 63 in one BIGINT would
    also flip the sign).

    Spec (integer-exact, oracle-replayable):
    - grayscale = R + G + B per pixel (no division),
    - box-downsample to the 9x8 dHash grid by summing each cell
      (width must divide into 9, height into 8 — equal-area cells
      make the sums directly comparable; ValueError otherwise),
    - bit (j*8 + c) = 1 iff cell(c, j) < cell(c+1, j) (strict).

    numpy-vectorized (reshape + axis sums) — per-payload cost is one
    pass over the pixels, no Python per-pixel loop. ValueError-only
    corruption contract like every codec arm."""
    import numpy as np

    w, h, rows = _bmp_rows_topdown(payload)
    if w % DHASH_GRID_W or h % DHASH_GRID_H:
        raise ValueError(
            f"dHash grid needs width%{DHASH_GRID_W}==0 and "
            f"height%{DHASH_GRID_H}==0, got {w}x{h}"
        )
    sx, sy = w // DHASH_GRID_W, h // DHASH_GRID_H
    arr = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(
        h, w, 3
    )
    gray = arr.sum(axis=2, dtype=np.int64)  # R+G+B (order-invariant)
    cells = gray.reshape(DHASH_GRID_H, sy, DHASH_GRID_W, sx).sum(
        axis=(1, 3)
    )  # (8 rows, 9 cols) of exact cell sums
    bits = cells[:, :-1] < cells[:, 1:]  # (8, 8) strict comparisons
    blocks = [0, 0, 0, 0]
    for j in range(8):
        for c in range(8):
            if bits[j, c]:
                bit = j * 8 + c
                blocks[bit // 16] |= 1 << (bit % 16)
    return blocks[0], blocks[1], blocks[2], blocks[3]


def image_dhash_blocks(media_df: DataFrame) -> DataFrame:
    """(media_id, block_0..block_3) dHash signature per image payload
    via :func:`bmp_dhash_blocks`. Corrupt / non-BMP / non-grid-sized
    payloads contribute zero rows (corrupt-skip contract).

    mapInPandas, narrow, Arrow-batched — payload bytes never shuffle;
    exactly 5 scalar columns leave the operator."""
    schema = (
        "media_id long, block_0 long, block_1 long, "
        "block_2 long, block_3 long"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                b = bytes(row["payload"]) if row["payload"] is not None else b""
                try:
                    b0, b1, b2, b3 = bmp_dhash_blocks(b)
                except ValueError:
                    continue
                out.append(
                    {
                        "media_id": row["media_id"],
                        "block_0": b0,
                        "block_1": b1,
                        "block_2": b2,
                        "block_3": b3,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "block_0", "block_1",
                    "block_2", "block_3",
                ],
            )

    return media_df.mapInPandas(op, schema)


def image_phash_near_dupes(
    media_df: DataFrame,
    *,
    max_hamming: int = 3,
    wide_keys: bool = False,
) -> DataFrame:
    """Perceptual-hash image near-dup pairs: dHash each payload
    (real pixel decode + downsample), then the SAME exact-recall
    block-combination Hamming join as dedup_simhash64
    (operators/dedup.py:blocks_near_dupes) — by pigeonhole, any pair
    within ``max_hamming`` (default 3) shares a whole 16-bit block.
    Output (id_a, id_b, hamming), id_a < id_b — scheme-independent
    (exactly the hamming<=k pair set), so the oracle replays the
    simplest banding whatever plan shape is picked.

    ``wide_keys`` is the corpus-scale lever (same trade as
    dedup.simhash_plan_blocks): repack the signature into EIGHT 8-bit
    blocks and join on C(8,5)=56 combination keys of 40 bits instead
    of 4 keys of 16 bits. 16-bit keys hash into only 65k buckets per
    block, so past ~10M images random collisions make the candidate
    stream quadratic; 40-bit keys push that to ~10^12. Explode factor
    rises 4 -> 56 (rows are 5 BIGINTs — still tiny next to payload
    bytes, which never shuffle).

    Scale (100 TB of images): the decode is a narrow Arrow-batched
    hop (payload bytes never shuffle — only the 4 BIGINT blocks
    leave); the join shuffles the signature table once on the
    combination key. The signature table is persisted because the
    self-join's a/b sides project different columns, so the decode
    would otherwise run twice (registry cache contract: materialized
    by the caller's one action, harnesses clearCache between
    queries)."""
    from advisorydatapipeline_spark.operators.dedup import (
        blocks_near_dupes,
    )

    sig = image_dhash_blocks(media_df)
    if wide_keys:
        # bits [8k, 8k+8) live in 16-bit block k//2 at byte k%2
        sig = sig.select(
            "media_id",
            *[
                F.expr(
                    f"CAST((block_{k // 2} >> {8 * (k % 2)}) & 255 "
                    f"AS BIGINT) AS block_{k}"
                )
                for k in range(8)
            ],
        )
        widths = [8] * 8
    else:
        widths = DHASH_BLOCK_WIDTHS
    sig = sig.persist()
    return blocks_near_dupes(
        sig,
        "media_id",
        widths,
        max_hamming=max_hamming,
    )


def encode_bmp_cellgrid(doc_id: int, *, group: int = 6) -> bytes:
    """Deterministic BMP fixture for the image-dedup entry: a 9x8
    grid of constant-brightness cells (all three channels equal the
    cell value), scaled by per-doc factors so the decoder's
    box-downsample does real work:

      sx = 1 + doc_id % 2, sy = 1 + doc_id % 3   (9*sx x 8*sy image)
      ckey = doc_id // group                      (content key)
      x = ckey*64 + i*8 + j
      cell(i<8, j) = (((x*x % 2^31) * 2654435761 + x * 506952113)
                      % 2^31) % 241
      cell(8, j)   = 250 if j < doc_id % 4 else 0 (planted flips)

    The QUADRATIC mix matters: a linear hash (Weyl sequence) leaves
    different content keys' comparison patterns correlated — measured
    ~45k accidental hamming<=3 cross-group pairs at 5k docs (output
    grew superlinearly); with x*x in the mix the pair set is 100%
    planted at 500/5k/20k docs and grows exactly linearly
    (group-count * C(group,2)). All intermediates stay below 2^63
    (x*x % 2^31 first, then * 2654435761 < 5.7e18), so Spark and
    DuckDB replay it exactly in BIGINT.

    Docs sharing a content key differ ONLY in the last column, which
    feeds exactly one dHash bit per row — so within a group of
    ``group`` docs, hamming(a, b) = |a%4 - b%4| <= 3 by
    construction, and the near-dup operator must recover exactly
    those pairs (plus any accidental cross-group collisions, which
    the oracle replays identically). Bottom-up storage per the
    positive-height BMP spec, so a row-order bug reorders j and
    changes the hash."""
    sx, sy = 1 + doc_id % 2, 1 + doc_id % 3
    width, height = DHASH_GRID_W * sx, DHASH_GRID_H * sy
    ckey = doc_id // group

    def cell(i: int, j: int) -> int:
        if i < DHASH_GRID_W - 1:
            x = ckey * 64 + i * 8 + j
            return (
                ((x * x % 2147483648) * 2654435761 + x * 506952113)
                % 2147483648
            ) % 241
        return 250 if j < doc_id % 4 else 0

    row_bytes = ((width * 3 + 3) // 4) * 4
    data_size = row_bytes * height
    header = (
        b"BM"
        + int(54 + data_size).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + int(width).to_bytes(4, "little", signed=True)
        + int(height).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + data_size.to_bytes(4, "little")
        + b"\x00" * 16
    )
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(width):
            v = cell(x // sx, y // sy)
            row += bytes([v, v, v])
        row += b"\x00" * (row_bytes - width * 3)
        rows.append(bytes(row))
    return header + b"".join(rows)


def encode_wav(
    sample_rate: int, n_samples: int, amplitude: int = 0
) -> bytes:
    """Minimal valid PCM WAV (RIFF/fmt/data), mono 16-bit, pure
    Python — the canonical 44-byte header from the public RIFF spec
    plus ``n_samples`` constant-amplitude samples."""
    data_size = n_samples * 2
    byte_rate = sample_rate * 2
    header = (
        b"RIFF"
        + (36 + data_size).to_bytes(4, "little")
        + b"WAVEfmt "
        + (16).to_bytes(4, "little")  # PCM fmt chunk size
        + (1).to_bytes(2, "little")  # PCM
        + (1).to_bytes(2, "little")  # mono
        + int(sample_rate).to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (2).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")  # bits/sample
        + b"data"
        + data_size.to_bytes(4, "little")
    )
    sample = int(amplitude).to_bytes(2, "little", signed=True)
    return header + sample * n_samples


def encode_wav_pattern(
    sample_rate: int, n_samples: int, seed: int = 0
) -> bytes:
    """PCM WAV fixture with DETERMINISTIC varying samples
    ``s_i = ((seed + 11*i) % 2001) - 1000`` — unlike
    :func:`encode_wav`'s constant amplitude, this produces nonzero
    framewise energy and sign changes, so feature extraction over it
    is oracle-replayable doc-id arithmetic."""
    import struct

    header = encode_wav(sample_rate, 0)  # 44-byte header, 0 data
    data = b"".join(
        struct.pack("<h", ((seed + 11 * i) % 2001) - 1000)
        for i in range(n_samples)
    )
    # patch RIFF + data chunk sizes for the real payload
    out = bytearray(header + data)
    out[4:8] = (36 + len(data)).to_bytes(4, "little")
    out[40:44] = len(data).to_bytes(4, "little")
    return bytes(out)


def wav_frame_features(
    media_df: DataFrame, frame_len: int = 100
) -> DataFrame:
    """REAL audio feature extraction over PCM-WAV payloads (the audio
    twin of the GIF frame sampler): parses the RIFF container and the
    16-bit little-endian sample stream with stdlib ``struct``, then
    emits per-frame energy (sum of squared samples — exact BIGINT)
    and zero-crossing count (sign flips within the frame), the two
    canonical framewise audio features. 1 -> N row expansion; the
    final (partial) frame is kept with its true sample count.
    Corrupt / non-WAV payloads contribute zero rows.

    mapInPandas, narrow, Arrow-batched — payload bytes never shuffle;
    only 5 scalar columns per frame leave the operator."""
    import struct

    schema = (
        "media_id long, frame_idx int, n_in_frame int, "
        "energy long, zero_crossings int"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                b = bytes(row["payload"]) if row["payload"] is not None else b""
                try:
                    frames = wav_frame_rows(b, frame_len)
                except ValueError:
                    continue
                for fi, n_in, energy, zc in frames:
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": fi,
                            "n_in_frame": n_in,
                            "energy": energy,
                            "zero_crossings": zc,
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "frame_idx", "n_in_frame",
                    "energy", "zero_crossings",
                ],
            )

    return media_df.mapInPandas(op, schema)


def decode_wav(payload: bytes) -> tuple[int, int, int]:
    """(sample_rate, n_samples, bits) from a PCM WAV header; raises
    ValueError (ONLY ValueError — the corrupt-skip contract the
    mapInPandas operators rely on) on anything non-WAV. Walks RIFF
    chunks rather than assuming fixed offsets so files with extra
    chunks (LIST/INFO) still parse. The data chunk's declared size is
    clamped to the bytes actually present after its header, so a size
    field that lies about the payload cannot push n_samples past the
    real sample stream."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sample_rate, bits, data_size = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        csize = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == b"fmt ":
            sample_rate = int.from_bytes(
                payload[pos + 12 : pos + 16], "little"
            )
            bits = int.from_bytes(payload[pos + 22 : pos + 24], "little")
        elif cid == b"data":
            # clamp declared size to what the buffer really holds
            data_size = min(csize, max(0, len(payload) - (pos + 8)))
        pos += 8 + csize + (csize % 2)
    if sample_rate is None or data_size is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits is None or bits == 0 or bits % 8 != 0:
        raise ValueError(f"invalid WAV bits-per-sample: {bits}")
    return sample_rate, data_size // (bits // 8), bits


def wav_frame_rows(
    payload: bytes, frame_len: int
) -> list[tuple[int, int, int, int]]:
    """Pure framewise-feature core of ``wav_frame_features``:
    ``[(frame_idx, n_in_frame, energy, zero_crossings), ...]`` for a
    16-bit PCM WAV payload. Raises ONLY ValueError on corrupt /
    non-WAV / non-16-bit input (struct.error is re-raised as
    ValueError as a last line of defence), so Spark tasks skip bad
    objects instead of dying — the same contract, and the same
    every-byte mutation/truncation fuzz coverage, as the other codec
    arms (PNG/BMP/GIF/JPEG)."""
    import struct

    _sr, n, bits = decode_wav(payload)
    if bits != 16:
        raise ValueError("only 16-bit PCM supported")
    # data chunk location: re-walk RIFF for the offset
    b = payload
    pos, data_off = 12, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        csize = int.from_bytes(b[pos + 4 : pos + 8], "little")
        if cid == b"data":
            data_off = pos + 8
            break
        pos += 8 + csize + (csize % 2)
    if data_off is None:
        raise ValueError("WAV missing data chunk")
    raw = b[data_off : data_off + 2 * n]
    raw = raw[: (len(raw) // 2) * 2]  # never hand an odd tail to struct
    try:
        samples = [s for (s,) in struct.iter_unpack("<h", raw)]
    except struct.error as exc:  # pragma: no cover - truncation guard
        raise ValueError(f"malformed PCM stream: {exc}") from exc
    frames = []
    for fi in range(0, (len(samples) + frame_len - 1) // frame_len):
        fr = samples[fi * frame_len : (fi + 1) * frame_len]
        zc = sum(1 for a, c in zip(fr, fr[1:]) if (a < 0) != (c < 0))
        frames.append((fi, len(fr), sum(s * s for s in fr), zc))
    return frames


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + ctype
        + data
        + zlib.crc32(ctype + data).to_bytes(4, "big")
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (public spec, RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal valid 8-bit RGB non-interlaced PNG, stdlib-only (zlib
    for IDAT deflate + CRC32). Pixels are the deterministic gradient
    ``(seed + 7x + 13y + 29c) % 256`` and each row's filter type
    cycles ``(y + seed) % 5`` — so a decoder must correctly reverse
    ALL five PNG filters (None/Sub/Up/Average/Paeth) to reproduce the
    pixel checksum, not just inflate the stream."""
    import struct
    import zlib

    bpp = 3
    out = bytearray()
    prev = bytes(width * bpp)
    for y in range(height):
        raw = bytes(
            (seed + 7 * x + 13 * y + 29 * c) % 256
            for x in range(width)
            for c in range(bpp)
        )
        ft = (y + seed) % 5
        line = bytearray()
        for i, v in enumerate(raw):
            a = raw[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                f = v
            elif ft == 1:
                f = (v - a) % 256
            elif ft == 2:
                f = (v - b) % 256
            elif ft == 3:
                f = (v - (a + b) // 2) % 256
            else:
                f = (v - _paeth(a, b, c)) % 256
            line.append(f)
        out += bytes([ft]) + bytes(line)
        prev = raw
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def parse_png_header(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) from the fixed-offset
    IHDR chunk ALONE — the cheap header arm. The PNG spec requires
    IHDR to be the first chunk at byte 8, so this is signature check
    + 17 fixed-offset bytes: no inflate, no filter reversal, O(1)
    regardless of image size. Raises ValueError on anything that is
    not a PNG with a well-formed IHDR."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    # the IHDR payload is exactly 13 bytes by spec — a signature +
    # "IHDR" tag with a bogus declared length would otherwise let
    # dimensions be read from arbitrary following bytes
    if (
        len(payload) < 26
        or payload[8:12] != (13).to_bytes(4, "big")
        or payload[12:16] != b"IHDR"
    ):
        raise ValueError("PNG missing well-formed IHDR chunk")
    width = int.from_bytes(payload[16:20], "big")
    height = int.from_bytes(payload[20:24], "big")
    return width, height, payload[24], payload[25]


def decode_png(payload: bytes) -> tuple[int, int, int, int, int]:
    """(width, height, bit_depth, color_type, pixel_sum) from a real
    PNG byte stream — full stdlib-only decode: chunk walk with IDAT
    concatenation, zlib inflate, and per-row filter REVERSAL (all
    five filter types, Paeth included; reconstruction reads already-
    reconstructed left/up neighbors per the spec). ``pixel_sum`` is
    the integer sum of every reconstructed RGB byte, so any filter or
    offset mistake shifts the value. 8-bit non-interlaced RGB only —
    other PNG variants raise (palette/16-bit/interlace need no codec
    lib either, just more spec; out of scope here).

    EVERY corruption failure surfaces as ValueError — a valid PNG
    signature with a truncated IHDR (struct/IndexError) or corrupt
    IDAT (zlib.error) must hit the same skip path the mapInPandas
    handlers use for non-PNG bytes, so one bad object can't kill a
    100 TB scan."""
    import struct
    import zlib

    try:
        return _decode_png_checked(payload, struct, zlib)
    except (zlib.error, struct.error, IndexError) as exc:
        raise ValueError(f"corrupt PNG payload: {exc}") from exc


def _decode_png_checked(payload: bytes, struct, zlib):
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = bit_depth = color_type = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        clen = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(
                ">IIBB", data[:10]
            )
            if bit_depth != 8 or color_type != 2 or data[12] != 0:
                raise ValueError(
                    "only 8-bit non-interlaced RGB PNG supported"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    raw = zlib.decompress(bytes(idat))
    bpp = 3
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data size mismatch")
    prev = bytes(stride)
    total = 0
    pos = 0
    for _y in range(height):
        ft = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += stride + 1
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 1:
                line[i] = (line[i] + a) % 256
            elif ft == 2:
                line[i] = (line[i] + b) % 256
            elif ft == 3:
                line[i] = (line[i] + (a + b) // 2) % 256
            elif ft == 4:
                line[i] = (line[i] + _paeth(a, b, c)) % 256
            elif ft != 0:
                raise ValueError(f"unknown PNG filter type {ft}")
        total += sum(line)
        prev = bytes(line)
    return width, height, bit_depth, color_type, total


def decode_png_stats(media_df: DataFrame) -> DataFrame:
    """Full-pixel PNG decode as a narrow Arrow-batched hop: payloads
    in, 6 scalar stat columns out (bytes never shuffle). Non-PNG or
    corrupt payloads yield a NULL-stat row instead of raising — one
    bad object can't kill a 100 TB scan."""
    schema = (
        "media_id long, container string, width int, height int, "
        "bit_depth int, color_type int, pixel_sum long"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                b = bytes(row["payload"]) if row["payload"] is not None else b""
                rec = {
                    "media_id": row["media_id"],
                    "container": "unknown",
                    "width": None,
                    "height": None,
                    "bit_depth": None,
                    "color_type": None,
                    "pixel_sum": None,
                }
                try:
                    w, h, bd, ct, ps = decode_png(b)
                    rec.update(
                        container="png",
                        width=w,
                        height=h,
                        bit_depth=bd,
                        color_type=ct,
                        pixel_sum=ps,
                    )
                except ValueError:
                    pass
                out.append(rec)
            yield pd.DataFrame(out)

    return media_df.mapInPandas(op, schema)


_GIF_SIGS = (b"GIF87a", b"GIF89a")


def _gif_lzw_encode(indices: bytes, mcs: int) -> bytes:
    """GIF-variant LZW compress (public spec, GIF89a appendix F):
    greedy longest-match dictionary coding with variable-width codes
    packed LSB-first. A REAL encoder (not literal-only emission) so
    the decoder's dictionary-hit paths — including the deferred
    ``code == next_free`` cScSc case — are exercised by round-trips.

    Width bookkeeping mirrors the decoder exactly: the decoder adds
    its entry one code BEHIND the encoder, so the encoder bumps the
    code width when ``next_free - 1`` (the decoder's table size at
    read time) reaches ``1 << width``. At the 12-bit table cap a
    clear code resets both sides."""
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> tuple[dict, int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            mcs + 1,
        )

    table, next_free, width = fresh()
    emit(clear, width)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_free < 4096:
            table[wk] = next_free
            next_free += 1
            if next_free - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table, next_free, width = fresh()
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, mcs: int, n_pixels: int) -> bytes:
    """Inverse of :func:`_gif_lzw_encode`; returns exactly
    ``n_pixels`` palette indices or raises ValueError (truncated
    stream, bad code, missing EOI — same corruption contract as the
    PNG arm)."""
    if not 2 <= mcs <= 8:
        raise ValueError(f"bad GIF LZW min code size {mcs}")
    clear = 1 << mcs
    eoi = clear + 1
    pos = 0  # bit cursor

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > len(data) * 8:
            raise ValueError("truncated GIF LZW stream")
        byte0, bit0 = divmod(pos, 8)
        acc = int.from_bytes(
            data[byte0 : byte0 + (bit0 + width + 7) // 8], "little"
        )
        pos += width
        return (acc >> bit0) & ((1 << width) - 1)

    out = bytearray()
    table: list[bytes] = []
    width = mcs + 1
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW literal expected after clear")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            # deferred-clear semantics: at the 4096-entry cap the
            # encoder stops defining codes but may keep emitting
            # without a clear — freeze the table to stay in sync
            # (matches _gif_lzw_encode's next_free < 4096 guard)
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW code {code} beyond table")
        if prev is not None and len(table) == (1 << width) and width < 12:
            width += 1
        out += entry
        prev = entry
        if len(out) >= n_pixels:
            # spec: EOI must follow; tolerate its absence only at the
            # exact pixel count (some writers omit the trailing EOI)
            break
    if len(out) != n_pixels:
        raise ValueError(
            f"GIF pixel count mismatch: {len(out)} != {n_pixels}"
        )
    return bytes(out)


GIF_N_COLORS = 16  # fixture palette size (mcs 4)


def _gif_palette(seed: int) -> list[tuple[int, int, int]]:
    """Deterministic fixture palette: arithmetic-expressible so a SQL
    oracle can recompute the exact pixel sum (mirrors encode_png's
    gradient contract)."""
    return [
        (
            (i * 17 + seed) % 256,
            (i * 29 + 2 * seed + 5) % 256,
            (i * 43 + 3 * seed + 11) % 256,
        )
        for i in range(GIF_N_COLORS)
    ]


def encode_gif(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal valid GIF89a, stdlib-only: logical screen descriptor,
    16-entry global color table, one non-interlaced image, REAL LZW
    compression in ≤255-byte sub-blocks. Pixel indices are the
    deterministic gradient ``(seed + 7x + 13y) % 16`` over the
    :func:`_gif_palette` colors, so the decoded RGB pixel sum is
    pure doc-id arithmetic an oracle can replay."""
    mcs = 4
    pal = b"".join(bytes(c) for c in _gif_palette(seed))
    indices = bytes(
        (seed + 7 * x + 13 * y) % GIF_N_COLORS
        for y in range(height)
        for x in range(width)
    )
    lzw = _gif_lzw_encode(indices, mcs)
    blocks = b"".join(
        bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    )
    return (
        b"GIF89a"
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
        # GCT present, color resolution 8, GCT size 2^(3+1)=16
        + bytes([0b1_111_0_011, 0, 0])
        + pal
        + b"\x2c"  # image descriptor
        + (0).to_bytes(2, "little")
        + (0).to_bytes(2, "little")
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
        + b"\x00"  # no LCT, not interlaced
        + bytes([mcs])
        + blocks
        + b"\x00"  # block terminator
        + b"\x3b"  # trailer
    )


def encode_gif_animated(
    width: int, height: int, seed: int = 0, n_frames: int = 2
) -> bytes:
    """Multi-frame GIF89a, stdlib-only: logical screen + global color
    table, then per frame a Graphic Control Extension (fixed 4/100 s
    delay) + image descriptor + REAL LZW pixel data. Frame ``f``'s
    indices are the deterministic gradient
    ``(seed + 7x + 13y + 31f) % 16``, so every frame's decoded RGB
    pixel sum stays pure doc-id arithmetic an oracle can replay."""
    mcs = 4
    pal = b"".join(bytes(c) for c in _gif_palette(seed))
    out = bytearray(
        b"GIF89a"
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
        + bytes([0b1_111_0_011, 0, 0])
        + pal
    )
    for f in range(n_frames):
        indices = bytes(
            (seed + 7 * x + 13 * y + 31 * f) % GIF_N_COLORS
            for y in range(height)
            for x in range(width)
        )
        lzw = _gif_lzw_encode(indices, mcs)
        blocks = b"".join(
            bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
            for i in range(0, len(lzw), 255)
        )
        out += (
            b"\x21\xf9\x04"  # graphic control extension, block size 4
            + bytes([0])  # no disposal, no transparency
            + (4).to_bytes(2, "little")  # delay 4/100 s
            + bytes([0, 0])  # transparent idx, terminator
            + b"\x2c"
            + (0).to_bytes(2, "little")
            + (0).to_bytes(2, "little")
            + width.to_bytes(2, "little")
            + height.to_bytes(2, "little")
            + b"\x00"
            + bytes([mcs])
            + blocks
            + b"\x00"
        )
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(
    payload: bytes, every_n: int = 1
) -> tuple[int, int, int, int, list[tuple[int, int]]]:
    """(width, height, n_colors, n_frames, [(frame_idx, pixel_sum)])
    from a (possibly multi-frame) GIF — REAL frame sampling: only
    frames with ``idx % every_n == 0`` are LZW-decoded; the others'
    data sub-blocks are length-SKIPPED without decompression, which
    is the entire point of frame sampling at scale (cost tracks
    sampled frames, not stream length). Same ValueError-only
    corruption contract and format exclusions as :func:`decode_gif`.
    """
    try:
        return _decode_gif_frames_checked(payload, every_n)
    except IndexError as exc:  # pragma: no cover - defensive
        raise ValueError(f"corrupt GIF payload: {exc}") from exc


def _decode_gif_frames_checked(
    payload: bytes, every_n: int
) -> tuple[int, int, int, int, list[tuple[int, int]]]:
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    if payload[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    width = int.from_bytes(payload[6:8], "little")
    height = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    if not packed & 0x80:
        raise ValueError("GIF without global color table unsupported")
    n_colors = 2 << (packed & 0x07)
    pos = 13
    pal = payload[pos : pos + 3 * n_colors]
    if len(pal) < 3 * n_colors:
        raise ValueError("truncated GIF color table")
    pos += 3 * n_colors
    frames: list[tuple[int, int]] = []
    frame_idx = 0
    while True:
        if pos >= len(payload):
            raise ValueError("GIF missing trailer")
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x3B:
            break
        elif b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        else:
            if pos + 10 > len(payload):
                raise ValueError("truncated GIF image descriptor")
            iw = int.from_bytes(payload[pos + 5 : pos + 7], "little")
            ih = int.from_bytes(payload[pos + 7 : pos + 9], "little")
            ipacked = payload[pos + 9]
            if ipacked & 0x80:
                raise ValueError("GIF local color table unsupported")
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            pos += 10
            if pos >= len(payload):
                raise ValueError("GIF missing LZW min code size")
            mcs = payload[pos]
            pos += 1
            sampled = frame_idx % every_n == 0
            lzw = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                n = payload[pos]
                chunk = payload[pos + 1 : pos + 1 + n]
                if len(chunk) < n:
                    raise ValueError("truncated GIF data sub-block")
                if sampled:
                    lzw += chunk
                pos += 1 + n
            if pos >= len(payload):
                raise ValueError("GIF missing sub-block terminator")
            pos += 1
            if sampled:
                idxs = _gif_lzw_decode(bytes(lzw), mcs, iw * ih)
                psum = sum(
                    pal[3 * i] + pal[3 * i + 1] + pal[3 * i + 2]
                    for i in idxs
                )
                frames.append((frame_idx, psum))
            frame_idx += 1
    if frame_idx == 0:
        raise ValueError("GIF trailer before any image")
    return width, height, n_colors, frame_idx, frames


def sample_gif_frames(media_df: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling over animated-GIF payloads (1 -> N row
    expansion): one output row per SAMPLED frame with its decoded
    pixel sum; unsampled frames are sub-block-skipped, never
    decompressed. Corrupt / non-GIF payloads contribute zero rows
    (the mapInPandas skip contract).

    mapInPandas, narrow, Arrow-batched — payload bytes never
    shuffle; only 5 scalar columns per sampled frame leave."""
    schema = (
        "media_id long, frame_idx int, n_frames int, "
        "width int, height int, pixel_sum long"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                b = bytes(row["payload"]) if row["payload"] is not None else b""
                try:
                    w, h, _nc, nf, frames = decode_gif_frames(b, every_n)
                except ValueError:
                    continue
                for fi, ps in frames:
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": fi,
                            "n_frames": nf,
                            "width": w,
                            "height": h,
                            "pixel_sum": ps,
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "frame_idx", "n_frames",
                    "width", "height", "pixel_sum",
                ],
            )

    return media_df.mapInPandas(op, schema)


def parse_gif_header(payload: bytes) -> tuple[int, int]:
    """(width, height) from the fixed-offset logical screen
    descriptor ALONE — the O(1) header arm (GIF twin of
    :func:`parse_png_header`): signature + 4 bytes, no LZW, no
    palette walk. Raises ValueError on non-GIF bytes. Like the PNG
    header arm, this does NOT validate the pixel stream."""
    if payload[:6] not in _GIF_SIGS or len(payload) < 13:
        raise ValueError("not a GIF payload")
    return (
        int.from_bytes(payload[6:8], "little"),
        int.from_bytes(payload[8:10], "little"),
    )


def decode_gif(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, n_colors, pixel_sum) from a real GIF byte
    stream — full stdlib-only decode: logical screen + global color
    table parse, extension-block skip, image descriptor, sub-block
    reassembly, variable-width LSB-first LZW decompression, and
    palette mapping. ``pixel_sum`` is the integer sum of every
    mapped RGB byte, so a wrong code width, sub-block seam, or
    palette offset shifts the value. First image frame only;
    interlaced or local-color-table images raise (more spec, no
    codec lib — out of scope like PNG's palette/16-bit variants).

    EVERY corruption failure surfaces as ValueError — same skip-path
    contract as :func:`decode_png`, so one bad object can't kill a
    100 TB scan."""
    try:
        return _decode_gif_checked(payload)
    except IndexError as exc:  # pragma: no cover - defensive
        raise ValueError(f"corrupt GIF payload: {exc}") from exc


def _decode_gif_checked(payload: bytes) -> tuple[int, int, int, int]:
    if payload[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    packed = payload[10]
    if not packed & 0x80:
        raise ValueError("GIF without global color table unsupported")
    n_colors = 2 << (packed & 0x07)
    pos = 13
    pal = payload[pos : pos + 3 * n_colors]
    if len(pal) < 3 * n_colors:
        raise ValueError("truncated GIF color table")
    pos += 3 * n_colors
    # walk extension blocks to the first image descriptor
    while True:
        if pos >= len(payload):
            raise ValueError("GIF missing image descriptor")
        b = payload[pos]
        if b == 0x21:  # extension: label byte + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:
            break
        elif b == 0x3B:
            raise ValueError("GIF trailer before any image")
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    if pos + 10 > len(payload):
        raise ValueError("truncated GIF image descriptor")
    iw = int.from_bytes(payload[pos + 5 : pos + 7], "little")
    ih = int.from_bytes(payload[pos + 7 : pos + 9], "little")
    ipacked = payload[pos + 9]
    if ipacked & 0x80:
        raise ValueError("GIF local color table unsupported")
    if ipacked & 0x40:
        raise ValueError("interlaced GIF unsupported")
    pos += 10
    if pos >= len(payload):
        raise ValueError("GIF missing LZW min code size")
    mcs = payload[pos]
    pos += 1
    lzw = bytearray()
    while pos < len(payload) and payload[pos] != 0:
        n = payload[pos]
        chunk = payload[pos + 1 : pos + 1 + n]
        if len(chunk) < n:
            raise ValueError("truncated GIF data sub-block")
        lzw += chunk
        pos += 1 + n
    indices = _gif_lzw_decode(bytes(lzw), mcs, iw * ih)
    if any(i >= n_colors for i in indices):
        raise ValueError("GIF pixel index beyond color table")
    # palette-map and sum without materializing w*h RGB rows:
    # count occurrences per index, dot with per-entry RGB sums
    counts = [0] * n_colors
    for i in indices:
        counts[i] += 1
    pal_sums = [
        pal[3 * i] + pal[3 * i + 1] + pal[3 * i + 2]
        for i in range(n_colors)
    ]
    total = sum(c * s for c, s in zip(counts, pal_sums))
    return iw, ih, n_colors, total


def decode_gif_stats(media_df: DataFrame) -> DataFrame:
    """Full GIF decode as a narrow Arrow-batched hop (GIF twin of
    :func:`decode_png_stats`): payloads in, 5 scalar stat columns
    out (bytes never shuffle). Non-GIF or corrupt payloads yield a
    NULL-stat row instead of raising."""
    schema = (
        "media_id long, container string, width int, height int, "
        "n_colors int, pixel_sum long"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                b = bytes(row["payload"]) if row["payload"] is not None else b""
                rec = {
                    "media_id": row["media_id"],
                    "container": "unknown",
                    "width": None,
                    "height": None,
                    "n_colors": None,
                    "pixel_sum": None,
                }
                try:
                    w, h, nc, ps = decode_gif(b)
                    rec.update(
                        container="gif",
                        width=w,
                        height=h,
                        n_colors=nc,
                        pixel_sum=ps,
                    )
                except ValueError:
                    pass
                out.append(rec)
            yield pd.DataFrame(out)

    return media_df.mapInPandas(op, schema)


_JPEG_SOF_MARKERS = frozenset(
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
)
_JPEG_SOF_PROGRESSIVE = (0xC2, 0xC6, 0xCA, 0xCE)


def encode_jpeg(
    width: int,
    height: int,
    n_components: int = 3,
    progressive: bool = False,
) -> bytes:
    """Structurally valid JPEG marker stream (SOI / APP0-JFIF / DQT /
    SOFn / DHT / SOS + non-0xFF filler entropy bytes + EOI), pure
    Python from the public JFIF/ITU-T.81 segment layout. Only the
    marker/segment FRAMING is meaningful — the entropy data is a
    fixed filler, so this is a fixture for the header arm, not a
    decodable image (REAL baseline JPEG encode/decode live in
    operators/jpeg_codec.py as of round 10)."""

    def seg(marker: int, body: bytes) -> bytes:
        return (
            bytes([0xFF, marker])
            + (len(body) + 2).to_bytes(2, "big")
            + body
        )

    app0 = seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, bytes([0]) + bytes((3 + 7 * i) % 255 + 1 for i in range(64)))
    sof_body = (
        bytes([8])
        + int(height).to_bytes(2, "big")
        + int(width).to_bytes(2, "big")
        + bytes([n_components])
        + b"".join(bytes([c + 1, 0x11, 0]) for c in range(n_components))
    )
    sof = seg(0xC2 if progressive else 0xC0, sof_body)
    dht = seg(0xC4, bytes([0x00]) + bytes(16))
    sos_body = (
        bytes([n_components])
        + b"".join(bytes([c + 1, 0]) for c in range(n_components))
        + bytes([0, 63, 0])
    )
    sos = seg(0xDA, sos_body)
    entropy = bytes([0x5A]) * 64
    return b"\xff\xd8" + app0 + dqt + sof + dht + sos + entropy + b"\xff\xd9"


def parse_jpeg_header(payload: bytes) -> tuple[int, int, int, bool]:
    """(width, height, n_components, progressive) from a JPEG's SOF
    frame header — the O(1)-per-segment header arm (JPEG twin of
    :func:`parse_png_header`): a marker-segment scan from SOI to the
    first SOFn marker (SOF0..SOF15 minus DHT/JPG/DAC), reading the
    ITU-T.81 frame header (precision, lines, samples/line,
    components). The scan never enters entropy-coded data: a legal
    stream puts SOF before SOS, so hitting SOS or EOI first means no
    frame header exists. Raises ValueError on anything that is not a
    JPEG with a well-formed SOF — same skip-path contract as the
    PNG/GIF arms, so one bad object can't kill a 100 TB scan."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    while True:
        if pos + 2 > len(payload):
            raise ValueError("JPEG truncated before SOF marker")
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        pos += 1
        while pos < len(payload) and payload[pos] == 0xFF:
            pos += 1  # spec-legal 0xFF fill bytes before the marker
        if pos >= len(payload):
            raise ValueError("JPEG truncated in marker")
        marker = payload[pos]
        pos += 1
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone marker: no length field
        if marker in (0x00, 0xD8):
            raise ValueError("JPEG marker desync")
        if marker in (0xD9, 0xDA):
            raise ValueError("JPEG has no SOF before SOS/EOI")
        if pos + 2 > len(payload):
            raise ValueError("JPEG truncated in segment length")
        seg_len = int.from_bytes(payload[pos : pos + 2], "big")
        if seg_len < 2 or pos + seg_len > len(payload):
            raise ValueError("JPEG segment overruns payload")
        if marker in _JPEG_SOF_MARKERS:
            if seg_len < 8:
                raise ValueError("JPEG SOF segment too short")
            height = int.from_bytes(payload[pos + 3 : pos + 5], "big")
            width = int.from_bytes(payload[pos + 5 : pos + 7], "big")
            ncomp = payload[pos + 7]
            if seg_len != 8 + 3 * ncomp:
                raise ValueError("JPEG SOF length/component mismatch")
            if not (height and width and ncomp):
                raise ValueError("JPEG SOF declares empty frame")
            return width, height, ncomp, marker in _JPEG_SOF_PROGRESSIVE
        pos += seg_len


def decode_jpeg_header_stats(media_df: DataFrame) -> DataFrame:
    """Per-payload JPEG frame-header stats via
    :func:`parse_jpeg_header`. Non-JPEG / corrupt payloads yield a
    NULL row (``container = 'unknown'``) instead of raising.

    mapInPandas, narrow, Arrow-batched: payload bytes never shuffle —
    only 7 scalar columns leave the operator."""
    schema = (
        "media_id long, container string, width int, height int, "
        "n_components int, progressive boolean, byte_len long"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                b = bytes(row["payload"]) if row["payload"] is not None else b""
                rec = {
                    "media_id": row["media_id"],
                    "container": "unknown",
                    "width": None,
                    "height": None,
                    "n_components": None,
                    "progressive": None,
                    "byte_len": len(b),
                }
                try:
                    w, h, nc, prog = parse_jpeg_header(b)
                    rec.update(
                        container="jpeg",
                        width=w,
                        height=h,
                        n_components=nc,
                        progressive=prog,
                    )
                except ValueError:
                    pass
                out.append(rec)
            yield pd.DataFrame(out)

    return media_df.mapInPandas(op, schema)


def decode_media_headers(media_df: DataFrame) -> DataFrame:
    """REAL media decode for codec-free container formats (round-5
    upgrade of the all-stub arm): BMP and PCM-WAV headers are fixed
    public byte layouts, so their dimensions/sample counts decode in
    pure Python — no PIL/av needed. Unknown magic bytes yield a NULL
    row (``container = 'unknown'``) instead of raising, so one bad
    object can't kill a 100 TB scan.

    The PNG/GIF/JPEG arms are HEADER-ONLY: a well-formed header
    yields its container tag and dimensions without validating the
    pixel stream, so ``container = 'png'`` does not imply the body is
    decodable — use ``decode_png_stats`` / ``decode_gif_stats`` /
    ``jpeg_codec.decode_jpeg_stats`` for that guarantee.

    mapInPandas, narrow, Arrow-batched: payload bytes never shuffle.
    """
    schema = (
        "media_id long, container string, width int, height int, "
        "sample_rate int, n_samples int, byte_len long"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                b = bytes(row["payload"]) if row["payload"] is not None else b""
                rec = {
                    "media_id": row["media_id"],
                    "container": "unknown",
                    "width": None,
                    "height": None,
                    "sample_rate": None,
                    "n_samples": None,
                    "byte_len": len(b),
                }
                try:
                    if b[:2] == b"BM":
                        w, h, _bpp = decode_bmp(b)
                        rec.update(container="bmp", width=w, height=h)
                    elif b[:4] == b"RIFF":
                        sr, n, _bits = decode_wav(b)
                        rec.update(
                            container="wav", sample_rate=sr, n_samples=n
                        )
                    elif b[:8] == _PNG_SIG:
                        # header arm stays O(1): IHDR fixed-offset
                        # parse only — full pixel decode is
                        # decode_png_stats' job
                        w, h, _bd, _ct = parse_png_header(b)
                        rec.update(container="png", width=w, height=h)
                    elif b[:6] in _GIF_SIGS:
                        # O(1) logical-screen parse — full LZW decode
                        # is decode_gif_stats' job
                        w, h = parse_gif_header(b)
                        rec.update(container="gif", width=w, height=h)
                    elif b[:2] == b"\xff\xd8":
                        # marker-segment scan to the SOF frame header
                        w, h, _nc, _prog = parse_jpeg_header(b)
                        rec.update(container="jpeg", width=w, height=h)
                except ValueError:
                    pass
                out.append(rec)
            yield pd.DataFrame(out)

    return media_df.mapInPandas(op, schema)


def decode_media(media_df: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode payloads to typed media properties.

    PARTIAL STUB: BMP/WAV decode is real (see
    :func:`decode_media_headers`); everything else needs codec
    libraries not present in this container. With ``fake=True`` it
    produces *deterministic* fake dimensions derived from the content
    hash — keeping the operator signature, schema, and batch shape
    real for pipeline tests.
    """
    if not fake and not _HAS_PIL:
        raise NotImplementedError(
            "general media decoding requires codec libraries (PIL/av) "
            "that are not installed; codec-free full decodes exist for "
            "BMP (decode_bmp_pixels), WAV (wav_frame_features), PNG "
            "(decode_png), GIF incl. animated (decode_gif_frames), and "
            "baseline JPEG (jpeg_codec.decode_jpeg_pixels), and "
            "MJPEG-AVI video (video.decode_avi_frames); MP3 framing/"
            "timing is real (mp3.parse_mp3_stream), Huffman spectral "
            "decode is real (mp3_huffman.py: bit reservoir, regions, "
            "linbits escapes, count1 — repo-canonical code tables, "
            "documented), and so is the full synthesis back-half — "
            "IMDCT, windowing, overlap-add, frequency inversion "
            "(mp3_synth.py) and the polyphase subband-to-PCM stage "
            "(mp3_polyphase.py) — only general-purpose inter-frame "
            "video codecs and arbitrary PIL/av container decoding "
            "remain lib-bound (a repo-canonical intra+delta video "
            "codec ships in video.py: decode_ipframe_video); pass "
            "fake=True for the deterministic stub"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                h = int(hashlib.md5(row["payload"]).hexdigest()[:8], 16)
                is_img = row["media_type"] == "image"
                is_vid = row["media_type"] == "video"
                out.append(
                    {
                        "media_id": row["media_id"],
                        "media_type": row["media_type"],
                        "width": 64 + h % 1024 if (is_img or is_vid) else 0,
                        "height": 64 + (h // 1024) % 1024 if (is_img or is_vid) else 0,
                        "n_frames": 1 + h % 300 if is_vid else (1 if is_img else 0),
                        "sample_rate": 16000 if row["media_type"] == "audio" else 0,
                    }
                )
            yield pd.DataFrame(out)

    return media_df.mapInPandas(op, DECODED_SCHEMA)


def sample_frames(
    media_df: DataFrame, every_n: int = 30, *, fake: bool = False
) -> DataFrame:
    """Frame sampling for video payloads (1->N row expansion through
    mapInPandas). REAL for the repo's codec-free containers (r14 —
    retires the last multimodal NotImplementedError): MJPEG-AVI
    payloads go through the RIFF walk + full JPEG entropy decode
    (operators/video.decode_avi_frames) and IPV1 streams through the
    inter-frame reference-chain decode
    (operators/video.decode_ipframe_video); ``frame_hash`` is the
    md5 of the decoded frame's scalar signature, so a decode defect
    changes the output. Payloads in foreign containers (H.264 etc.)
    contribute zero rows on the real path — decoding THOSE still
    needs codec libraries; ``fake=True`` keeps the deterministic
    stub for plumbing tests."""
    schema = "media_id long, frame_idx int, frame_hash string"

    def op_fake(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                if row["media_type"] != "video":
                    continue
                h = hashlib.md5(row["payload"]).hexdigest()
                n = 1 + int(h[:8], 16) % 300
                for idx in range(0, n, every_n):
                    rows.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": idx,
                            "frame_hash": hashlib.md5(
                                f"{h}:{idx}".encode()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_hash"]
            )

    def op_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from advisorydatapipeline_spark.operators.video import (
            decode_avi_frames,
            decode_ipframe_video,
        )

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                if row["media_type"] != "video":
                    continue
                b = (
                    bytes(row["payload"])
                    if row["payload"] is not None
                    else b""
                )
                sigs: list[tuple[int, tuple]] = []
                try:
                    if b[:4] == b"IPV1":
                        sigs = [
                            (f, rest)
                            for f, *rest in decode_ipframe_video(
                                b, every_n
                            )
                        ]
                    elif b[:4] == b"RIFF":
                        sigs = [
                            (f, rest)
                            for f, *rest in decode_avi_frames(
                                b, every_n
                            )
                        ]
                except ValueError:
                    continue
                for f, sig in sigs:
                    rows.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": f,
                            "frame_hash": hashlib.md5(
                                repr(tuple(sig)).encode()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_hash"]
            )

    return media_df.mapInPandas(op_fake if fake else op_real, schema)
