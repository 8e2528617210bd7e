"""Goertzel/DFT band energies over real PCM-WAV payloads — the
frequency-analysis half the WAV family lacked (wav_frame_energy is
time-domain). Same engine-exactness technique as mp3_synth.py: the
trig basis is QUANTIZED-INTEGER tables generated once at import
(``floor(cos(2*pi*k*i/N) * 2^12)`` / same for sin) and embedded
literally in the DuckDB oracle, so per-band spectral energy
``(sum s_i*C[k][i])^2 + (sum s_i*S[k][i])^2`` is exact BIGINT in
both engines. Magnitudes: |s| <= 1000, |C| <= 2^12, 128 terms ->
|a| < 2^29, a^2 + b^2 < 2^59.

The Spark arm parses REAL WAV bytes (44-byte RIFF header skip,
int16-LE data chunk) built by multimodal.encode_wav_pattern — the
same fixture wav_frame_energy gates — so the entry pins container
parse + sample decode + the integer DFT in one chain.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame

DFT_Q = 1 << 12  # trig quantization scale
DFT_N = 128  # analysis window (samples per doc)
DFT_BANDS = (1, 3, 7, 16, 31)  # cycles per window
WAV_RATE = 8000


def dft_tables() -> tuple[list[list[int]], list[list[int]]]:
    """(cos, sin) integer tables, one row per band k, N columns."""
    cos_t = [
        [
            math.floor(math.cos(2 * math.pi * k * i / DFT_N) * DFT_Q)
            for i in range(DFT_N)
        ]
        for k in DFT_BANDS
    ]
    sin_t = [
        [
            math.floor(math.sin(2 * math.pi * k * i / DFT_N) * DFT_Q)
            for i in range(DFT_N)
        ]
        for k in DFT_BANDS
    ]
    return cos_t, sin_t


def wav_seed(doc_id: int) -> int:
    """encode_wav_pattern seed from the house 2^31 mix."""
    return (doc_id % 2147483648) * 2654435761 % 2147483648 % 100000


def wav_band_energies(docs_df: DataFrame) -> DataFrame:
    """(media_id, band_k, a_sum, b_sum, energy_q) long-format band
    energies: one mapInPandas hop encodes the WAV fixture, parses the
    REAL bytes back (header skip + int16-LE), and runs the integer
    Goertzel sums as one numpy matmul per batch. Payload bytes never
    leave the operator; 5 rows of 4 scalars per doc do."""
    import numpy as np
    import pandas as pd

    from advisorydatapipeline_spark.operators.multimodal import (
        encode_wav_pattern,
    )

    cos_t, sin_t = dft_tables()
    C = np.array(cos_t, dtype=np.int64)  # (bands, N)
    S = np.array(sin_t, dtype=np.int64)
    bands = np.array(DFT_BANDS, dtype=np.int64)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            if not len(ids):
                continue
            mats = []
            for d in ids:
                payload = encode_wav_pattern(
                    WAV_RATE, DFT_N, seed=wav_seed(int(d))
                )
                # REAL parse: RIFF header is 44 bytes, data chunk is
                # int16 little-endian mono
                samples = np.frombuffer(
                    payload, dtype="<i2", offset=44
                ).astype(np.int64)
                if len(samples) != DFT_N:
                    raise ValueError("bad WAV fixture length")
                mats.append(samples)
            m = np.stack(mats)  # (B, N)
            a = m @ C.T  # (B, bands)
            b = m @ S.T
            nb = len(bands)
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(ids, nb),
                    "band_k": np.tile(bands, len(ids)),
                    "a_sum": a.ravel(),
                    "b_sum": b.ravel(),
                    "energy_q": (a * a + b * b).ravel(),
                }
            )

    return docs_df.select("doc_id").mapInPandas(
        op,
        "media_id long, band_k long, a_sum long, b_sum long,"
        " energy_q long",
    )


def duck_band_oracle() -> str:
    """DuckDB replay from the same literal tables and the
    encode_wav_pattern sample formula s_i = ((seed + 11i) % 2001)
    - 1000 — total over container build, byte parse, and DFT."""
    cos_t, sin_t = dft_tables()
    c_rows = ", ".join(
        f"({k}, {i}, {cv})"
        for k, row in zip(DFT_BANDS, cos_t)
        for i, cv in enumerate(row)
    )
    s_rows = ", ".join(
        f"({k}, {i}, {sv})"
        for k, row in zip(DFT_BANDS, sin_t)
        for i, sv in enumerate(row)
    )
    return f"""
WITH tabc(k, i, c) AS (VALUES {c_rows}),
tabs(k, i, s) AS (VALUES {s_rows}),
samp AS (
  SELECT d.doc_id,
         t.i,
         CAST(((d.doc_id % 2147483648) * 2654435761 % 2147483648
               % 100000 + 11 * t.i) % 2001 - 1000 AS BIGINT) AS smp
  FROM documents d
  CROSS JOIN (SELECT unnest(generate_series(0, {DFT_N - 1})) AS i) t
),
sums AS (
  SELECT samp.doc_id, tabc.k,
         CAST(sum(samp.smp * tabc.c) AS BIGINT) AS a_sum,
         CAST(sum(samp.smp * tabs.s) AS BIGINT) AS b_sum
  FROM samp
  JOIN tabc ON tabc.i = samp.i
  JOIN tabs ON tabs.i = samp.i AND tabs.k = tabc.k
  GROUP BY 1, 2
)
SELECT doc_id AS media_id, k AS band_k, a_sum, b_sum,
       CAST(a_sum * a_sum + b_sum * b_sum AS BIGINT) AS energy_q
FROM sums
"""
