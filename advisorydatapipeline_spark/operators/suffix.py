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
    recorded. ``posexplode`` + ``substring`` stay JVM-side."""
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
    DIRECTLY. And because positions are dense within a document, the
    shifted seed ranks are exactly ``lead(s, d)`` over one per-doc
    window — the three shift JOINS collapse into ONE doc-partitioned
    shuffle. Total: one seed ranking + one doc window + one
    count-window per depth + one final groupBy; every shuffled row
    is fixed-width longs."""
    pos = corpus_positions(docs, id_col, text_col)
    seed_ids = order_preserving_ids(pos.select("w"), ["w"])
    seeded = pos.join(seed_ids, "w").select(
        "doc_id", "p", "n_chars", F.col("_opid").alias("s0")
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
