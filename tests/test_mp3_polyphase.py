"""MP3 polyphase synthesis (operators/mp3_polyphase.py): the closed
form the numpy operator and the oracle share must equal the
procedural ISO FIFO spec, tables must be sane, and the Spark hop
must match the pure-Python reference.
"""

from __future__ import annotations

from advisorydatapipeline_spark.operators.mp3_polyphase import (
    N_STEPS,
    N_SUB,
    POLY_Q,
    matrix_table,
    polyphase_pcm_stats,
    subband_sample,
    synth_pcm,
    window_table,
)


def test_tables_shape_and_bounds():
    N = matrix_table()
    D = window_table()
    assert len(N) == 64 and all(len(r) == N_SUB for r in N)
    assert len(D) == 512
    assert all(abs(v) <= POLY_Q for r in N for v in r)
    assert all(abs(v) <= POLY_Q for v in D)
    # the B.3-structure sign alternation per 64-tap phase
    assert all(
        (D[i] <= 0) == (((i // 64) % 2) == 1) or D[i] == 0
        for i in range(512)
    )


def test_matrixing_is_iso_formula():
    """Spot-pin N against the ISO expression at a few (i, k)."""
    import math

    N = matrix_table()
    for i, k in ((0, 0), (16, 5), (63, 31), (32, 17)):
        want = math.floor(
            math.cos(math.pi / 64 * (16 + i) * (2 * k + 1)) * POLY_Q
        )
        assert N[i][k] == want


def test_fifo_partial_history_is_zero():
    """At t=0 only the u=0 taps can contribute (V(-1..-15) = 0):
    PCM[0][j] must equal D[j] * V(0)[j] exactly."""
    N = matrix_table()
    D = window_table()
    d = 11
    s0 = [subband_sample(d, 0, k) for k in range(N_SUB)]
    v0 = [sum(N[i][k] * s0[k] for k in range(N_SUB)) for i in range(64)]
    pcm = synth_pcm(d)
    for j in range(32):
        assert pcm[0][j] == D[j] * v0[j]


def test_spark_stats_match_procedural_reference(spark):
    """The mapInPandas closed-form hop equals the procedural FIFO
    reference (shift, gather, window, fold) for a doc sample —
    proving closed form == ISO procedure end-to-end."""
    ids = list(range(29))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r.asDict()
        for r in polyphase_pcm_stats(df).collect()
    }
    for d in ids:
        flat = [v for step in synth_pcm(d) for v in step]
        row = got[d]
        assert row["n_samples"] == N_STEPS * 32 == len(flat)
        assert row["sum_pcm"] == sum(flat)
        assert row["sum_abs_pcm"] == sum(abs(v) for v in flat)
        assert row["min_pcm"] == min(flat)
        assert row["max_pcm"] == max(flat)
