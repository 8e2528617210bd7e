"""Property-based tests (hypothesis): operator invariants that a
fixed example can miss. Each example batches all generated rows into
ONE Spark job to keep round trips cheap."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from advisorydatapipeline_spark.operators.curation import (
    chunk_text,
    pack_sequences,
    sample_by_hash,
)
from advisorydatapipeline_spark.operators.graph import connected_components

_slow = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.lists(
    st.text(alphabet="ab x", min_size=0, max_size=40), min_size=1, max_size=20
)


@_slow
@given(texts=texts, cc=st.integers(1, 12), stride=st.integers(1, 12))
def test_chunk_text_invariants(spark, texts, cc, stride):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = chunk_text(
        df, "doc_id", "text", chunk_chars=cc, stride=stride
    ).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        got = sorted(by_doc.get(i, []), key=lambda r: r.chunk_idx)
        n_expected = 0 if not t else (len(t) + stride - 1) // stride
        assert len(got) == n_expected
        for r in got:
            start = r.chunk_idx * stride
            assert r.chunk_text == t[start : start + cc]
            assert r.chunk_len == len(r.chunk_text)


@_slow
@given(
    toks=st.lists(
        st.tuples(st.sampled_from("ab"), st.integers(0, 40)),
        min_size=1,
        max_size=30,
    ),
    ctx=st.integers(1, 50),
)
def test_pack_sequences_invariants(spark, toks, ctx):
    rows = [(i, lang, n) for i, (lang, n) in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n long")
    out = pack_sequences(df, "lang", "doc_id", "n", ctx_tokens=ctx).collect()
    assert len(out) == len(rows)
    by_lang: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r.lang, r.doc_id)):
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        cum = 0
        for r in rs:
            assert 0 <= r.seq_offset < ctx
            assert r.seq_id == cum // ctx
            assert r.seq_offset == cum % ctx
            cum += r.n


@_slow
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_vs_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    # brute-force union-find reference
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.component
        for r in connected_components(df, "id_a", "id_b").collect()
    }
    assert got == expected


def test_sample_by_hash_deterministic_and_monotone(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "k long")
    all_rows = sample_by_hash(df, "k", F.lit(100)).count()
    none_rows = sample_by_hash(df, "k", F.lit(0)).count()
    half_a = {r.k for r in sample_by_hash(df, "k", F.lit(50)).collect()}
    half_b = {r.k for r in sample_by_hash(df, "k", F.lit(50)).collect()}
    bigger = {r.k for r in sample_by_hash(df, "k", F.lit(80)).collect()}
    assert all_rows == 500 and none_rows == 0
    assert half_a == half_b  # deterministic
    assert half_a <= bigger  # rate increase only adds rows


@_slow
@given(
    sizes=st.lists(st.integers(0, 500), min_size=1, max_size=12),
    budget=st.integers(0, 3000),
)
def test_waterfill_invariants(spark, sizes, budget):
    """alloc == min(size, C) for the maximal integer level C with
    sum(min(size, C)) <= budget — checked against a brute-force C."""
    from advisorydatapipeline_spark.operators.curation import (
        waterfill_allocation,
    )

    df = spark.createDataFrame(
        [(f"s{i}", s) for i, s in enumerate(sizes)], "g string, t long"
    )
    got = {
        r.g: r.alloc
        for r in waterfill_allocation(
            df, "g", "t", F.lit(budget).cast("long")
        ).collect()
    }
    c = 0
    while (
        sum(min(t, c + 1) for t in sizes) <= budget and c < max(sizes)
    ):
        c += 1
    assert got == {f"s{i}": min(s, c) for i, s in enumerate(sizes)}
    # global invariants: never over budget (when budget < total),
    # never capping when budget covers everything
    total = sum(sizes)
    if budget < total:
        assert sum(got.values()) <= budget
    else:
        assert got == {f"s{i}": s for i, s in enumerate(sizes)}


@_slow
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
        min_size=1,
        max_size=30,
    )
)
def test_zvalue_bit_interleave_property(spark, pts):
    """z de-interleaves back to exactly (a, b) — bijectivity on the
    16-bit x 16-bit domain, via a pure-Python reference."""
    from advisorydatapipeline_spark.operators.layout import zvalue

    df = spark.createDataFrame(pts, "a long, b long").select(
        "a", "b", zvalue(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        a = b = 0
        for i in range(16):
            a |= ((r.z >> (2 * i)) & 1) << i
            b |= ((r.z >> (2 * i + 1)) & 1) << i
        assert (a, b) == (r.a, r.b)


@_slow
@given(texts=texts)
def test_containment_invariants(spark, texts):
    from advisorydatapipeline_spark.operators.dedup import (
        containment_pairs,
        shingle_index,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    idx = shingle_index(df, "doc_id", "text", 2)
    rows = containment_pairs(idx, "doc_id", 0.0).collect()
    for r in rows:
        # shared can't exceed either set; overlap/containments in (0,1]
        assert r.id_a < r.id_b
        assert 1 <= r.shared <= min(r.n_a, r.n_b)
        assert r.overlap == r.shared / min(r.n_a, r.n_b)
        assert 0 < r.containment_a <= 1 and 0 < r.containment_b <= 1
        # overlap is the max of the two containments by definition
        assert abs(r.overlap - max(r.containment_a, r.containment_b)) < 1e-12


@_slow
@given(
    corpus=st.lists(
        st.text(alphabet="ab x", min_size=5, max_size=30),
        min_size=1,
        max_size=10,
    ),
    probe_from_corpus=st.booleans(),
)
def test_bloom_membership_properties(spark, corpus, probe_from_corpus):
    from advisorydatapipeline_spark.operators.dedup import (
        bloom_build,
        bloom_probe_docs,
        shingle_index,
    )

    rows = [(i, t) for i, t in enumerate(corpus)]
    # probe doc 1000 either replays corpus text (expect hit_rate 1.0 on
    # any doc that shingles) or uses novel tokens (no guarantee, but
    # counts must still be consistent)
    probe_text = corpus[0] if probe_from_corpus else "zq wq vq uq tq sq"
    df = spark.createDataFrame(
        rows + [(1000, probe_text)], "doc_id long, text string"
    )
    idx = shingle_index(df, "doc_id", "text", 2)
    bloom = bloom_build(idx.filter("doc_id < 1000"), "shingle")
    out = bloom_probe_docs(
        idx.filter("doc_id = 1000"), bloom, "doc_id"
    ).collect()
    assert len(out) <= 1
    for r in out:
        assert 0 <= r.n_maybe_in_corpus <= r.n_shingles
        assert r.hit_rate == r.n_maybe_in_corpus / r.n_shingles
        if probe_from_corpus:
            # zero false negatives: corpus shingles always hit
            assert r.n_maybe_in_corpus == r.n_shingles


@_slow
@given(
    docs=st.lists(
        st.sets(st.integers(0, 25), min_size=1, max_size=12),
        min_size=2,
        max_size=12,
    ),
    num=st.sampled_from([(1, 3), (2, 5), (1, 2), (3, 5)]),
)
def test_prefix_jaccard_equivalence(spark, docs, num):
    """PPJoin prefix filtering must equal the full all-pairs plan on
    ARBITRARY set families, at several rational thresholds — the
    candidate-completeness theorem, property-tested."""
    from advisorydatapipeline_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_prefix,
    )

    p, q = num
    idx = spark.createDataFrame(
        [(d, f"s{s}") for d, ss in enumerate(docs) for s in ss],
        "doc_id long, shingle string",
    )
    truth = {
        (r.id_a, r.id_b): (r.shared, r.n_a, r.n_b)
        for r in jaccard_pairs(idx, "doc_id", p / q).collect()
        # re-filter with exact rational arithmetic: the float
        # threshold in jaccard_pairs may keep/drop boundary pairs
        # differently than p/q — the prefix twin is the exact one
        if r.shared * q >= (r.n_a + r.n_b - r.shared) * p
    }
    got = {
        (r.id_a, r.id_b): (r.shared, r.n_a, r.n_b)
        for r in jaccard_pairs_prefix(idx, "doc_id", p, q).collect()
    }
    assert got == truth


@given(
    n=st.integers(1, 10**13),
    k=st.integers(1, 4),
    target=st.integers(16, 1024),
)
@settings(deadline=None, max_examples=200)
def test_simhash_plan_blocks_invariants(n, k, target):
    """Policy invariants for any corpus size: widths partition the
    64-bit signature; block count stays in [k+1, 8] (pigeonhole
    recall floor, C(8,k) index-entry ceiling); and whenever the
    policy did NOT hit the cap, the combination key is at least as
    wide as the required random-bucket bound."""
    from advisorydatapipeline_spark.operators.dedup import (
        simhash_plan_blocks,
    )
    import math

    w = simhash_plan_blocks(n, max_hamming=k, target_bucket=target)
    assert sum(w) == 64
    assert k + 1 <= len(w) <= 8
    assert max(w) - min(w) <= 1  # near-equal widths
    need = (
        math.ceil(math.log2(n / target)) if n > target else 1
    )
    b = len(w)
    key_bits = 64 * (b - k) // b
    if b < 8:
        assert key_bits >= need


@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    seed=st.integers(0, 300),
)
@settings(deadline=None, max_examples=60)
def test_png_roundtrip_property(w, h, seed):
    """encode_png -> decode_png reproduces the analytic pixel sum for
    arbitrary sizes/seeds (covers every filter-type phase and both
    width<bpp edge behaviors)."""
    from advisorydatapipeline_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    expect = sum(
        (seed + 7 * x + 13 * y + 29 * c) % 256
        for x in range(w)
        for y in range(h)
        for c in range(3)
    )
    assert decode_png(encode_png(w, h, seed)) == (w, h, 8, 2, expect)


@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    seed=st.integers(0, 300),
)
@settings(deadline=None, max_examples=60)
def test_gif_roundtrip_property(w, h, seed):
    """encode_gif -> decode_gif reproduces the analytic palette-mapped
    pixel sum for arbitrary sizes/seeds (GIF twin of the PNG
    round-trip property)."""
    from advisorydatapipeline_spark.operators.multimodal import (
        GIF_N_COLORS,
        _gif_palette,
        decode_gif,
        encode_gif,
    )

    pal = _gif_palette(seed)
    expect = sum(
        sum(pal[(seed + 7 * x + 13 * y) % GIF_N_COLORS])
        for y in range(h)
        for x in range(w)
    )
    assert decode_gif(encode_gif(w, h, seed)) == (
        w, h, GIF_N_COLORS, expect,
    )


@given(
    data=st.binary(min_size=1, max_size=600).map(
        lambda b: bytes(x % 16 for x in b)
    ),
)
@settings(deadline=None, max_examples=80)
def test_gif_lzw_roundtrip_property(data):
    """LZW encode->decode is the identity on arbitrary 16-color index
    streams (exercises dictionary hits, the deferred cScSc case, and
    width transitions that a fixed gradient fixture cannot)."""
    from advisorydatapipeline_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    assert _gif_lzw_decode(_gif_lzw_encode(data, 4), 4, len(data)) == data


@settings(max_examples=200, deadline=None)
@given(payload=st.binary(min_size=0, max_size=300))
def test_jpeg_header_never_raises_non_valueerror(payload):
    """parse_jpeg_header's mapInPandas skip contract on arbitrary
    bytes: decode or ValueError, never any other exception."""
    from advisorydatapipeline_spark.operators.multimodal import (
        parse_jpeg_header,
    )

    try:
        w, h, nc, prog = parse_jpeg_header(b"\xff\xd8" + payload)
        assert w > 0 and h > 0 and nc > 0 and isinstance(prog, bool)
    except ValueError:
        pass
    try:
        parse_jpeg_header(payload)
    except ValueError:
        pass


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 65535),
    h=st.integers(1, 65535),
    nc=st.integers(1, 4),
    prog=st.booleans(),
)
def test_jpeg_header_roundtrip_property(w, h, nc, prog):
    from advisorydatapipeline_spark.operators.multimodal import (
        encode_jpeg,
        parse_jpeg_header,
    )

    assert parse_jpeg_header(encode_jpeg(w, h, nc, prog)) == (w, h, nc, prog)


@_slow
@given(texts=texts)
def test_lm_surprisal_invariants(spark, texts):
    """Self-trained interpolated LM: every per-occurrence surprisal is
    >= 0 (mixture probability <= 1 by construction), totals are
    consistent with means, and short docs carry NULLs."""
    from advisorydatapipeline_spark.operators.lm import (
        ngram_lm_doc_scores,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = ngram_lm_doc_scores(df).collect()
    assert len(rows) == len(texts)
    for r in rows:
        if r.n_trigrams == 0:
            assert r.surprisal_micro is None
            assert r.mean_surprisal_micro is None
        else:
            assert r.surprisal_micro >= 0
            assert (
                r.mean_surprisal_micro
                == r.surprisal_micro // r.n_trigrams
            )


@_slow
@given(
    vecs=st.lists(
        st.lists(
            st.integers(-5, 5).map(lambda v: v / 5.0),
            min_size=3,
            max_size=3,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_semantic_dedup_vs_bruteforce(spark, vecs):
    """semantic_dedup's dup set and greedy keep-one match a plain
    Python replay of the same integer spec (quantize -> seed assign
    -> floor-mean refine -> reassign -> rational-threshold pairs ->
    min-id keep)."""
    import math

    from advisorydatapipeline_spark.operators.similarity import (
        semantic_dedup,
    )

    ids = list(range(len(vecs)))
    corpus = spark.createDataFrame(
        list(zip(ids, vecs)), "vec_id long, embedding array<float>"
    )
    cents = spark.createDataFrame(
        [(0, vecs[0]), (1, vecs[-1])],
        "centroid_id long, embedding array<float>",
    )
    got = {
        r.vec_id: r for r in semantic_dedup(corpus, cents, 2, 5).collect()
    }

    # python replay (float32 cast first, like Spark's array<float>)
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    q = {
        i: [math.floor(f32(x) * 1000) for x in v]
        for i, v in zip(ids, vecs)
    }
    seeds = {0: q[0], 1: q[ids[-1]]}

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    def assign(table):
        return {
            i: min(table, key=lambda c: (d2(q[i], table[c]), c))
            for i in ids
        }

    a0 = assign(seeds)
    ref = {}
    for c in seeds:
        members = [q[i] for i in ids if a0[i] == c]
        if members:
            ref[c] = [
                math.floor(sum(col) / len(members))
                for col in zip(*members)
            ]
        else:
            ref[c] = None
    ref = {c: v for c, v in ref.items() if v is not None}
    a1 = assign(ref)
    dups = {i: set() for i in ids}
    for i in ids:
        for j in ids:
            if i < j and a1[i] == a1[j]:
                dot = sum(x * y for x, y in zip(q[i], q[j]))
                if dot > 0 and 25 * dot * dot >= 4 * d2(q[i], [0] * 3) * d2(
                    q[j], [0] * 3
                ):
                    dups[i].add(j)
                    dups[j].add(i)
    for i in ids:
        assert got[i].centroid_id == a1[i], (i, vecs)
        assert got[i].n_dup_neighbors == len(dups[i])
        expected_kept = not dups[i] or min(dups[i]) > i
        assert got[i].kept == expected_kept


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 8),
    seed=st.integers(0, 96),
)
def test_bmp_gradient_roundtrip_property(w, h, seed):
    from advisorydatapipeline_spark.operators.multimodal import (
        decode_bmp_pixels,
        encode_bmp_gradient,
    )

    expected = sum(
        (seed + 7 * x + 13 * y + 29 * c) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    assert decode_bmp_pixels(encode_bmp_gradient(w, h, seed)) == (
        w, h, expected,
    )


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(0, 400),
    seed=st.integers(0, 96),
)
def test_wav_pattern_roundtrip_property(n, seed):
    import struct

    from advisorydatapipeline_spark.operators.multimodal import (
        decode_wav,
        encode_wav_pattern,
    )

    b = encode_wav_pattern(16000, n, seed)
    assert decode_wav(b) == (16000, n, 16)
    samples = [s for (s,) in struct.iter_unpack("<h", b[44:])]
    assert samples == [((seed + 11 * i) % 2001) - 1000 for i in range(n)]


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 10),
    h=st.integers(1, 6),
    seed=st.integers(0, 96),
    nf=st.integers(1, 6),
    every=st.integers(1, 4),
)
def test_gif_animated_roundtrip_property(w, h, seed, nf, every):
    from advisorydatapipeline_spark.operators.multimodal import (
        _gif_palette,
        decode_gif_frames,
        encode_gif_animated,
    )

    gw, gh, nc, got_nf, frames = decode_gif_frames(
        encode_gif_animated(w, h, seed, nf), every
    )
    assert (gw, gh, nc, got_nf) == (w, h, 16, nf)
    assert [f for f, _ in frames] == [f for f in range(nf) if f % every == 0]
    pal = _gif_palette(seed)
    for f, ps in frames:
        assert ps == sum(
            sum(pal[(seed + 7 * x + 13 * y + 31 * f) % 16])
            for y in range(h)
            for x in range(w)
        )
