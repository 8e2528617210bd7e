"""MP3 hybrid-filterbank back-half: IMDCT + windowing + overlap-add +
frequency inversion over integer fixtures (r11 verdict stretch item
7) — the granule-synthesis stage that, with mp3.py's frame walk,
narrows the "lossy audio is lib-bound" note to Huffman spectral
decode and the final polyphase window stage.

ISO/IEC 11172-3 long-block (block_type 0) chain, one granule pair:
each of the 32 subbands holds 18 MDCT coefficients per granule; the
36-point IMDCT lifts them to time, the sine window shapes them, the
second half of granule A overlap-adds the first half of granule B,
and odd time-samples of odd subbands flip sign (frequency inversion)
before they would enter the polyphase filterbank.

Engine-exactness (the house codec rule): the transform matrices are
QUANTIZED-INTEGER tables generated once at import —
``floor(cos(pi/72*(2n+1+18)*(2k+1)) * 2^14)`` and
``floor(sin(pi/36*(n+0.5)) * 2^14)`` — and the SAME literals are
embedded in the DuckDB oracle, so the whole chain is exact BIGINT
arithmetic in both engines. Magnitudes: |X| < 2^15, |C| <= 2^14, 18
terms -> |s| < 2^33.2; windowed < 2^47.2; overlap-added < 2^48.2;
per-doc sums over 576 samples < 2^58.4 — every intermediate fits
int64 with headroom.

Reference twin: none — the reference contains no media code; this is
north-star multimodal surface (SURVEY.md §2 beyond-reference block).
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame

IMDCT_Q = 1 << 14  # cos/sin quantization scale
N_SUBBANDS = 32
N_COEFF = 18  # MDCT coefficients per subband per granule
N_IMDCT = 36  # time samples per subband per granule
MP3S_SPECTRUM_MOD = 65536  # spectral fixture range: [-32768, 32767]


def imdct_table() -> list[list[int]]:
    """36x18 quantized long-block IMDCT matrix:
    C[n][k] = floor(cos(pi/72 * (2n+1+18) * (2k+1)) * 2^14)."""
    return [
        [
            math.floor(
                math.cos(math.pi / 72 * (2 * n + 1 + 18) * (2 * k + 1))
                * IMDCT_Q
            )
            for k in range(N_COEFF)
        ]
        for n in range(N_IMDCT)
    ]


def sine_window() -> list[int]:
    """36-point long-block sine window:
    W[n] = floor(sin(pi/36 * (n + 0.5)) * 2^14)."""
    return [
        math.floor(math.sin(math.pi / 36 * (n + 0.5)) * IMDCT_Q)
        for n in range(N_IMDCT)
    ]


def spectrum_value(doc_id: int, g: int, sb: int, k: int) -> int:
    """Deterministic spectral coefficient from the house 2^31 mix,
    mapped to [-32768, 32767] — replayed literally by the oracle."""
    x = (doc_id * 4096 + g * 1024 + sb * 32 + k) % 2147483648
    return (x * 2654435761 % 2147483648) % MP3S_SPECTRUM_MOD - 32768


def synth_granule_pair(doc_id: int) -> list[list[int]]:
    """Pure-Python reference: the 32x18 overlap-added, frequency-
    inverted samples at the granule-A/granule-B boundary. Ground
    truth for the numpy operator's unit tests."""
    c = imdct_table()
    w = sine_window()
    out: list[list[int]] = []
    for sb in range(N_SUBBANDS):
        v = []
        for g in (0, 1):
            xs = [spectrum_value(doc_id, g, sb, k) for k in range(N_COEFF)]
            s = [
                sum(xs[k] * c[n][k] for k in range(N_COEFF))
                for n in range(N_IMDCT)
            ]
            v.append([s[n] * w[n] for n in range(N_IMDCT)])
        row = []
        for i in range(N_COEFF):
            smp = v[0][18 + i] + v[1][i]
            if sb % 2 == 1 and i % 2 == 1:
                smp = -smp
            row.append(smp)
        out.append(row)
    return out


def granule_synthesis_stats(docs_df: DataFrame) -> DataFrame:
    """Per-doc synthesis stats via one numpy einsum batch per Arrow
    chunk: (B, 2, 32, 18) spectra -> IMDCT matmul -> window ->
    overlap-add -> inversion -> exact BIGINT aggregates. 576-sample
    blocks never leave the operator; only 5 scalar columns do."""
    import numpy as np
    import pandas as pd

    C = np.array(imdct_table(), dtype=np.int64)  # (36, 18)
    W = np.array(sine_window(), dtype=np.int64)  # (36,)
    inv = np.ones((N_SUBBANDS, N_COEFF), dtype=np.int64)
    inv[1::2, 1::2] = -1

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            b = len(ids)
            if not b:
                continue
            g = np.arange(2, dtype=np.int64)
            sb = np.arange(N_SUBBANDS, dtype=np.int64)
            k = np.arange(N_COEFF, dtype=np.int64)
            idx = (
                ids[:, None, None, None] * 4096
                + g[None, :, None, None] * 1024
                + sb[None, None, :, None] * 32
                + k[None, None, None, :]
            ) % 2147483648
            x = (idx * 2654435761 % 2147483648) % MP3S_SPECTRUM_MOD - 32768
            s = np.einsum("bgsk,nk->bgsn", x, C)  # (B,2,32,36)
            v = s * W
            smp = (v[:, 0, :, 18:] + v[:, 1, :, :18]) * inv  # (B,32,18)
            flat = smp.reshape(b, -1)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_samples": np.full(b, flat.shape[1], dtype=np.int64),
                    "sum_smp": flat.sum(axis=1),
                    "sum_abs_smp": np.abs(flat).sum(axis=1),
                    "min_smp": flat.min(axis=1),
                    "max_smp": flat.max(axis=1),
                }
            )

    return docs_df.select("doc_id").mapInPandas(
        op,
        "doc_id long, n_samples long, sum_smp long, sum_abs_smp long,"
        " min_smp long, max_smp long",
    )


def duck_synthesis_oracle() -> str:
    """DuckDB replay of the full chain from the SAME quantized-integer
    tables (embedded as literals) and the same doc_id mix — total
    gate: any IMDCT/window/overlap/inversion defect shifts the sums."""
    c_rows = ", ".join(
        f"({n}, {k}, {cv})"
        for n, row in enumerate(imdct_table())
        for k, cv in enumerate(row)
    )
    w_rows = ", ".join(
        f"({n}, {wv})" for n, wv in enumerate(sine_window())
    )
    return f"""
WITH tabc(n, k, c) AS (VALUES {c_rows}),
tabw(n, w) AS (VALUES {w_rows}),
spec AS (
  SELECT d.doc_id, g.g, sb.sb, k.k,
         CAST(((d.doc_id * 4096 + g.g * 1024 + sb.sb * 32 + k.k)
               % 2147483648) * 2654435761 % 2147483648
              % {MP3S_SPECTRUM_MOD} - 32768 AS BIGINT) AS x
  FROM documents d
  CROSS JOIN (VALUES (0), (1)) g(g)
  CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS sb) sb
  CROSS JOIN (SELECT unnest(generate_series(0, 17)) AS k) k
),
s AS (
  SELECT spec.doc_id, spec.g, spec.sb, tabc.n,
         CAST(sum(spec.x * tabc.c) AS BIGINT) AS s
  FROM spec JOIN tabc ON tabc.k = spec.k
  GROUP BY 1, 2, 3, 4
),
v AS (
  SELECT s.doc_id, s.g, s.sb, s.n, s.s * tabw.w AS v
  FROM s JOIN tabw ON tabw.n = s.n
),
o AS (
  SELECT a.doc_id, a.sb, (a.n - 18) AS i,
         CASE WHEN a.sb % 2 = 1 AND (a.n - 18) % 2 = 1
              THEN -(a.v + b.v) ELSE (a.v + b.v) END AS smp
  FROM v a JOIN v b
    ON a.doc_id = b.doc_id AND a.sb = b.sb AND b.n = a.n - 18
  WHERE a.g = 0 AND b.g = 1 AND a.n >= 18
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(smp) AS BIGINT) AS sum_smp,
       CAST(sum(abs(smp)) AS BIGINT) AS sum_abs_smp,
       CAST(min(smp) AS BIGINT) AS min_smp,
       CAST(max(smp) AS BIGINT) AS max_smp
FROM o GROUP BY doc_id
"""
