"""MP3 granule-synthesis invariants (operators/mp3_synth.py)."""

from __future__ import annotations

import math

import numpy as np

from advisorydatapipeline_spark.operators.mp3_synth import (
    IMDCT_Q,
    N_COEFF,
    N_IMDCT,
    N_SUBBANDS,
    granule_synthesis_stats,
    imdct_table,
    sine_window,
    spectrum_value,
    synth_granule_pair,
)


def test_tables_match_spec_formulas():
    c = imdct_table()
    w = sine_window()
    assert len(c) == N_IMDCT and all(len(r) == N_COEFF for r in c)
    assert len(w) == N_IMDCT
    # spot-check quantized values against the raw formulas
    assert c[0][0] == math.floor(
        math.cos(math.pi / 72 * 19) * IMDCT_Q
    )
    assert w[17] == math.floor(math.sin(math.pi / 36 * 17.5) * IMDCT_Q)
    # sine window rises through the first half (monotone, positive)
    assert all(0 < w[i] <= IMDCT_Q for i in range(N_IMDCT))
    assert all(w[i] < w[i + 1] for i in range(17))


def test_imdct_output_magnitudes_fit_int64():
    # |X| < 2^15, |C| <= 2^14, 18 terms, window <= 2^14, overlap x2,
    # 576-sample sums: every bound the module docstring claims
    max_s = (1 << 15) * IMDCT_Q * N_COEFF
    max_v = max_s * IMDCT_Q
    max_smp = 2 * max_v
    assert max_smp * N_SUBBANDS * N_COEFF < 1 << 63


def test_frequency_inversion_sign_pattern():
    out = synth_granule_pair(3)
    raw = synth_granule_pair_no_inversion(3)
    for sb in range(N_SUBBANDS):
        for i in range(N_COEFF):
            expect = -raw[sb][i] if sb % 2 and i % 2 else raw[sb][i]
            assert out[sb][i] == expect


def synth_granule_pair_no_inversion(doc_id):
    c = imdct_table()
    w = sine_window()
    out = []
    for sb in range(N_SUBBANDS):
        v = []
        for g in (0, 1):
            xs = [
                spectrum_value(doc_id, g, sb, k) for k in range(N_COEFF)
            ]
            s = [
                sum(xs[k] * c[n][k] for k in range(N_COEFF))
                for n in range(N_IMDCT)
            ]
            v.append([s[n] * w[n] for n in range(N_IMDCT)])
        out.append([v[0][18 + i] + v[1][i] for i in range(N_COEFF)])
    return out


def test_numpy_operator_matches_pure_python(spark):
    docs = spark.range(1, 9).selectExpr("id AS doc_id")
    rows = {
        r.doc_id: r for r in granule_synthesis_stats(docs).collect()
    }
    assert set(rows) == set(range(1, 9))
    for doc_id in (1, 4, 7):
        ref = synth_granule_pair(doc_id)
        flat = [s for row in ref for s in row]
        r = rows[doc_id]
        assert r.n_samples == N_SUBBANDS * N_COEFF == len(flat)
        assert r.sum_smp == sum(flat)
        assert r.sum_abs_smp == sum(abs(s) for s in flat)
        assert r.min_smp == min(flat)
        assert r.max_smp == max(flat)


def test_imdct_linearity_in_spectrum():
    # the chain up to windowing is linear in X: doubling the spectrum
    # doubles every sample — run the pure reference on a synthetic
    # doubled spectrum by exploiting linearity of the integer matmul
    c = np.array(imdct_table(), dtype=np.int64)
    w = np.array(sine_window(), dtype=np.int64)
    x = np.array(
        [spectrum_value(5, 0, 0, k) for k in range(N_COEFF)],
        dtype=np.int64,
    )
    v1 = (c @ x) * w
    v2 = (c @ (2 * x)) * w
    assert np.array_equal(v2, 2 * v1)


def test_wav_dft_bands_parseval_and_purity(spark):
    """audio_dft invariants: (a) numpy path equals a pure-Python
    Goertzel on the same fixture; (b) a synthetic pure tone at band
    k concentrates energy there (basis sanity)."""
    import numpy as np

    from advisorydatapipeline_spark.operators.audio_dft import (
        DFT_BANDS,
        DFT_N,
        DFT_Q,
        dft_tables,
        wav_band_energies,
        wav_seed,
    )

    docs = spark.range(1, 5).selectExpr("id AS doc_id")
    rows = {
        (r.media_id, r.band_k): r
        for r in wav_band_energies(docs).collect()
    }
    cos_t, sin_t = dft_tables()
    for doc_id in (1, 3):
        seed = wav_seed(doc_id)
        s = [((seed + 11 * i) % 2001) - 1000 for i in range(DFT_N)]
        for bi, k in enumerate(DFT_BANDS):
            a = sum(s[i] * cos_t[bi][i] for i in range(DFT_N))
            b = sum(s[i] * sin_t[bi][i] for i in range(DFT_N))
            r = rows[(doc_id, k)]
            assert (r.a_sum, r.b_sum, r.energy_q) == (
                a, b, a * a + b * b
            )
    # pure-tone concentration: cos wave at k=7 -> band 7 dominates
    tone = np.floor(
        900 * np.cos(2 * np.pi * 7 * np.arange(DFT_N) / DFT_N)
    ).astype(np.int64)
    C = np.array(cos_t, dtype=np.int64)
    S = np.array(sin_t, dtype=np.int64)
    e = (tone @ C.T) ** 2 + (tone @ S.T) ** 2
    k7 = list(DFT_BANDS).index(7)
    assert e[k7] > 10 * max(x for i, x in enumerate(e) if i != k7)
