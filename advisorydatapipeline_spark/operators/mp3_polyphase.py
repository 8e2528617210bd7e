"""MP3 synthesis polyphase filterbank — the FINAL decode stage (r13,
following r12 item 3): subband samples -> PCM, closing the Layer III
chain (frame walk mp3.py -> Huffman mp3_huffman.py -> IMDCT/window/
overlap mp3_synth.py -> THIS). After this, only inter-frame video
codecs remain lib-bound in operators/multimodal.py.

ISO/IEC 11172-3 §2.4.3.2.2 synthesis structure, bit-exact:
per time step t (18 per granule), the 32 subband samples S[t] are
matrixed into 64 values V_t[i] = sum_k N[i][k] * S[t][k] with
N[i][k] = cos((16+i)(2k+1)pi/64); V blocks enter a 16-deep FIFO; the
window stage gathers U from alternating FIFO blocks, multiplies by
the 512-tap window D, and folds 16 taps per output:

  PCM[t][j] = sum_{u=0}^{7} D[j+64u]   * V(t-2u)[j]
            + sum_{u=0}^{7} D[j+64u+32] * V(t-2u-1)[32+j]

(the closed form of the ISO V-shift/U-gather/W-fold; V(tau) = 0 for
tau < 0, i.e. a zeroed FIFO at granule start — steps 0..15 exercise
the partial-history regime, 16..17 the full window).

Engine-exactness (the mp3_synth technique): N is a quantized-integer
table ``floor(cos(pi/64*(16+i)*(2k+1)) * 2^14)`` generated once at
import and embedded literally in the DuckDB oracle, so the whole
chain is exact BIGINT. The 512-tap window: the exact ISO Table B.3
coefficient values are not reproducible in this offline container,
so D is a repo-canonical raised-cosine taper
``floor(cos(pi*(i-256)/512)^2 * 2^14) * (-1 if (i//64)%2 else 1)``
(the sign alternation mirrors B.3's structure) — a documented
stand-in like mp3_huffman's code tables; the matrixing N IS the ISO
formula. Magnitudes: |S| < 2^15, |N| <= 2^14 -> |V| < 2^34.1;
|D| <= 2^14 -> 16 taps -> |PCM| < 2^52.1; per-doc sums over 576
samples < 2^61.3 — int64 with headroom.

Reference twin: none — the reference contains no media code; this is
north-star multimodal surface (SURVEY.md §2 beyond-reference block).
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame

POLY_Q = 1 << 14
N_SUB = 32
N_STEPS = 18  # time steps per granule
POLY_SPECTRUM_MOD = 65536  # subband-sample fixture range


def matrix_table() -> list[list[int]]:
    """64x32 quantized matrixing table:
    N[i][k] = floor(cos(pi/64 * (16+i) * (2k+1)) * 2^14)."""
    return [
        [
            math.floor(
                math.cos(math.pi / 64 * (16 + i) * (2 * k + 1)) * POLY_Q
            )
            for k in range(N_SUB)
        ]
        for i in range(64)
    ]


def window_table() -> list[int]:
    """512-tap repo-canonical window (documented B.3 stand-in):
    D[i] = floor(cos(pi*(i-256)/512)^2 * 2^14), sign-alternated per
    64-tap phase."""
    out = []
    for i in range(512):
        base = math.floor(
            math.cos(math.pi * (i - 256) / 512) ** 2 * POLY_Q
        )
        out.append(-base if (i // 64) % 2 else base)
    return out


def subband_sample(doc_id: int, t: int, k: int) -> int:
    """Deterministic subband input from the house 2^31 mix, mapped to
    [-32768, 32767] — replayed literally by the oracle."""
    x = (doc_id * 1024 + t * 32 + k) % 2147483648
    return x * 2654435761 % 2147483648 % POLY_SPECTRUM_MOD - 32768


def synth_pcm(doc_id: int) -> list[list[int]]:
    """Pure-Python reference via the ACTUAL ISO FIFO procedure
    (shift, matrix, U-gather, window, fold) — deliberately NOT the
    closed form, so the unit test proves the closed form the numpy
    operator and the oracle share equals the procedural spec."""
    N = matrix_table()
    D = window_table()
    v_fifo = [[0] * 64 for _ in range(16)]  # newest first
    out = []
    for t in range(N_STEPS):
        s = [subband_sample(doc_id, t, k) for k in range(N_SUB)]
        v0 = [
            sum(N[i][k] * s[k] for k in range(N_SUB)) for i in range(64)
        ]
        v_fifo = [v0] + v_fifo[:15]
        u = [0] * 512
        for w in range(8):
            for j in range(32):
                u[w * 64 + j] = v_fifo[2 * w][j]
                u[w * 64 + 32 + j] = v_fifo[2 * w + 1][32 + j]
        pcm = [
            sum(u[j + 32 * w] * D[j + 32 * w] for w in range(16))
            for j in range(32)
        ]
        out.append(pcm)
    return out


def polyphase_pcm_stats(docs_df: DataFrame) -> DataFrame:
    """Per-doc PCM stats via one numpy batch per Arrow chunk:
    (B, 18, 32) subband fixtures -> matrix einsum -> closed-form
    window fold -> exact BIGINT aggregates. 576 PCM samples never
    leave the operator; 5 scalars per doc do."""
    import numpy as np
    import pandas as pd

    N = np.array(matrix_table(), dtype=np.int64)  # (64, 32)
    D = np.array(window_table(), dtype=np.int64)  # (512,)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            b = len(ids)
            if not b:
                continue
            t = np.arange(N_STEPS, dtype=np.int64)
            k = np.arange(N_SUB, dtype=np.int64)
            idx = (
                ids[:, None, None] * 1024
                + t[None, :, None] * 32
                + k[None, None, :]
            ) % 2147483648
            s = (
                idx * 2654435761 % 2147483648 % POLY_SPECTRUM_MOD
                - 32768
            )  # (B, 18, 32)
            v = np.einsum("btk,ik->bti", s, N)  # (B, 18, 64)
            # zero-padded history: vpad[:, tau+16, :] = V(tau)
            vpad = np.zeros((b, N_STEPS + 16, 64), dtype=np.int64)
            vpad[:, 16:, :] = v
            j = np.arange(32)
            pcm = np.zeros((b, N_STEPS, 32), dtype=np.int64)
            for u in range(8):
                # tau = t - 2u and t - 2u - 1, shifted by +16 in vpad
                a_idx = np.arange(N_STEPS) - 2 * u + 16
                b_idx = a_idx - 1
                pcm += D[j + 64 * u] * vpad[:, a_idx, :][:, :, j]
                pcm += (
                    D[j + 64 * u + 32] * vpad[:, b_idx, :][:, :, 32 + j]
                )
            flat = pcm.reshape(b, -1)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_samples": np.full(b, flat.shape[1], dtype=np.int64),
                    "sum_pcm": flat.sum(axis=1),
                    "sum_abs_pcm": np.abs(flat).sum(axis=1),
                    "min_pcm": flat.min(axis=1),
                    "max_pcm": flat.max(axis=1),
                }
            )

    return docs_df.select("doc_id").mapInPandas(
        op,
        "doc_id long, n_samples long, sum_pcm long, sum_abs_pcm long,"
        " min_pcm long, max_pcm long",
    )


def duck_polyphase_oracle() -> str:
    """DuckDB replay of the closed-form chain from the SAME quantized
    tables (embedded as literals) and the same doc_id mix."""
    n_rows = ", ".join(
        f"({i}, {k}, {nv})"
        for i, row in enumerate(matrix_table())
        for k, nv in enumerate(row)
    )
    d_rows = ", ".join(
        f"({i}, {dv})" for i, dv in enumerate(window_table())
    )
    return f"""
WITH tabn(i, k, n) AS (VALUES {n_rows}),
tabd(i, d) AS (VALUES {d_rows}),
spec AS (
  SELECT doc.doc_id, t.t, k.k,
         CAST((doc.doc_id * 1024 + t.t * 32 + k.k) % 2147483648
              * 2654435761 % 2147483648
              % {POLY_SPECTRUM_MOD} - 32768 AS BIGINT) AS s
  FROM documents doc
  CROSS JOIN (SELECT unnest(generate_series(0, {N_STEPS - 1})) AS t) t
  CROSS JOIN (SELECT unnest(generate_series(0, {N_SUB - 1})) AS k) k
),
vb AS (
  SELECT spec.doc_id, spec.t, tabn.i,
         CAST(sum(spec.s * tabn.n) AS BIGINT) AS v
  FROM spec JOIN tabn ON tabn.k = spec.k
  GROUP BY 1, 2, 3
),
pcm AS (
  SELECT g.doc_id, g.t, g.j,
         CAST(sum(g.term) AS BIGINT) AS pcm
  FROM (
    SELECT va.doc_id, tj.t, tj.j,
           td.d * va.v AS term
    FROM (SELECT t.t, j.j, u.u
          FROM (SELECT unnest(generate_series(0, {N_STEPS - 1})) AS t) t
          CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS j) j
          CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS u) u
          WHERE t.t - 2 * u.u >= 0) tj
    JOIN tabd td ON td.i = tj.j + 64 * tj.u
    JOIN vb va ON va.t = tj.t - 2 * tj.u AND va.i = tj.j
    UNION ALL
    SELECT va.doc_id, tj.t, tj.j,
           td.d * va.v AS term
    FROM (SELECT t.t, j.j, u.u
          FROM (SELECT unnest(generate_series(0, {N_STEPS - 1})) AS t) t
          CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS j) j
          CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS u) u
          WHERE t.t - 2 * u.u - 1 >= 0) tj
    JOIN tabd td ON td.i = tj.j + 64 * tj.u + 32
    JOIN vb va ON va.t = tj.t - 2 * tj.u - 1 AND va.i = 32 + tj.j
  ) g
  GROUP BY 1, 2, 3
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(pcm) AS BIGINT) AS sum_pcm,
       CAST(sum(abs(pcm)) AS BIGINT) AS sum_abs_pcm,
       CAST(min(pcm) AS BIGINT) AS min_pcm,
       CAST(max(pcm) AS BIGINT) AS max_pcm
FROM pcm GROUP BY doc_id
"""
