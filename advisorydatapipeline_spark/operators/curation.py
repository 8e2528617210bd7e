"""Training-corpus curation operators (beyond-reference, north-star).

Chunking, deterministic sampling, and PII scrubbing — the
transformations between "raw corpus" and "training-ready shards".
All built-in column expressions (JVM-side, whole-stage-codegen'd,
portable-md5 keyed) so every operator is DuckDB-oracle-checkable and
shuffle-free: each is a narrow per-row transformation that pipelines
inside the scan stage, which is exactly what you want when the input
is 100 TB — no state, no skew sensitivity, linear scan cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from advisorydatapipeline_spark.functions.text import hash64

# conservative regex subset shared by Java regex (Spark) and RE2
# (DuckDB) so the oracle replays the exact scrub
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_chars: int = 256,
    stride: int = 200,
) -> DataFrame:
    """Split each document into fixed-width character chunks with
    ``chunk_chars - stride`` overlap (context-window packing prep).

    Explode of ``sequence(0, len-1, stride)`` — one generated row per
    chunk, no shuffle. Empty/null texts produce no chunks. Output:
    (id, chunk_idx, chunk_text, chunk_len)."""
    if stride <= 0 or chunk_chars <= 0:
        raise ValueError("chunk_chars and stride must be positive")
    c = F.col(text_col)
    nonempty = df.filter(F.length(c) > 0)
    starts = F.sequence(F.lit(0), F.length(c) - 1, F.lit(stride))
    out = nonempty.select(
        F.col(id_col),
        c.alias("_t"),
        F.explode(starts).alias("_start"),
    )
    return out.select(
        F.col(id_col),
        (F.col("_start") / stride).cast("int").alias("chunk_idx"),
        F.substring(F.col("_t"), F.col("_start") + 1, chunk_chars).alias(
            "chunk_text"
        ),
        F.length(
            F.substring(F.col("_t"), F.col("_start") + 1, chunk_chars)
        ).alias("chunk_len"),
    )


def hash_bucket(key: Column, salt: str, buckets: int = 100) -> Column:
    """Deterministic uniform bucket in [0, buckets) from the portable
    md5 hash of ``salt || key`` — the reproducible substitute for
    rand(): stable across runs, engines, partitionings, and restarts
    (rand() is none of those in a distributed retry/speculation
    world)."""
    return hash64(F.concat(F.lit(salt), key.cast("string"))) % buckets


def sample_by_hash(
    df: DataFrame,
    key_col: str,
    rate_pct: Column,
    *,
    salt: str = "sample#1",
) -> DataFrame:
    """Keep a row iff its hash bucket falls under ``rate_pct`` (a
    per-row Column in [0, 100]) — deterministic stratified downsampling
    keyed on a stable id. Pure filter: pushes down, no shuffle."""
    return df.filter(hash_bucket(F.col(key_col), salt) < rate_pct)


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tokens_col: str,
    *,
    ctx_tokens: int = 512,
) -> DataFrame:
    """Greedy concat-and-chop context-window packing: documents are
    concatenated per group in ``order_col`` order and chopped into
    ``ctx_tokens``-sized training sequences; each doc is assigned the
    sequence where it STARTS, plus its token offset inside it.

    One running-sum window per group (a single shuffle on the group
    key); all integer math, no data movement of text. At 100 TB the
    group key is the shard key (here: lang), so packing parallelizes
    across shards and each shard's window sorts locally."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(tokens_col).over(w) - F.col(tokens_col)).alias("_start")
    out = df.select(
        F.col(group_col), F.col(order_col), F.col(tokens_col), start
    )
    return out.select(
        group_col,
        order_col,
        tokens_col,
        (F.col("_start") / ctx_tokens).cast("long").alias("seq_id"),
        (F.col("_start") % ctx_tokens).cast("long").alias("seq_offset"),
    )


def contamination(
    index: DataFrame, eval_docs: DataFrame, id_col: str
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any shingle
    with an eval/benchmark doc.

    ``index`` is a (id, shingle) inverted index (df-capped upstream so
    ubiquitous shingles don't false-flag everything); ``eval_docs`` is
    the single-column list of benchmark doc ids. The eval side is tiny
    next to a 100 TB corpus, so its shingles are BROADCAST — the
    corpus index never shuffles; the only wide op is the per-doc
    aggregation of hits. Returns (id, n_eval_docs, n_shingles) for
    contaminated docs only."""
    ev = (
        index.join(eval_docs, id_col, "left_semi")
        .select(F.col(id_col).alias("_eval_id"), "shingle")
    )
    corpus = index.join(eval_docs, id_col, "left_anti")
    hits = corpus.join(F.broadcast(ev), "shingle")
    return hits.groupBy(id_col).agg(
        F.countDistinct("_eval_id").cast("long").alias("n_eval_docs"),
        F.countDistinct("shingle").cast("long").alias("n_shingles"),
    )


def adjacent_pairs(ts, combine, empty_type: str = "array<string>"):
    """Array of adjacent token pairs: combine(ts[i], ts[i+1]) for
    each window, empty array below 2 tokens. The 1-based element_at
    indexing and the short-doc guard live HERE, once — callers only
    choose the pair representation (joined string, struct, ...)."""
    return F.when(
        F.size(ts) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(ts) - 2),
            lambda i: combine(
                F.element_at(ts, (i + 1).cast("int")),
                F.element_at(ts, (i + 2).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast(empty_type))


def bigram_repetition(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Gopher-style repetition stats per doc: total bigram count, the
    top bigram's share, and the share of bigram occurrences that are
    repeats of an earlier one. High values = boilerplate/spam.

    Counts (not distinct sets) matter here, so this explodes raw
    bigrams and double-aggregates: (doc, bigram) counts, then per-doc
    max/sum — both partial-agg friendly; text never shuffles."""
    from advisorydatapipeline_spark.functions.text import tokens

    toked = df.select(F.col(id_col), tokens(text_col).alias("_ts"))
    bigrams = adjacent_pairs(
        F.col("_ts"), lambda a, b: F.concat_ws(" ", a, b)
    )
    per_bigram = (
        toked.select(F.col(id_col), F.explode(bigrams).alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count("*").alias("c"))
    )
    return per_bigram.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        (F.max("c") / F.sum("c")).alias("top_bigram_frac"),
        (
            (F.sum("c") - F.count("*")) / F.sum("c")
        ).alias("dup_bigram_frac"),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    quota: int,
    *,
    salt: str = "quota#1",
) -> DataFrame:
    """Keep at most ``quota`` rows per group, chosen by deterministic
    hash rank (md5 of salt||key, ties broken by key) — the per-domain
    cap every web-corpus pipeline applies so one hot domain cannot
    dominate the training mixture. Hash ranking makes the kept subset
    a stable uniform sample: reproducible across runs, engines, and
    partitionings, unlike rand() or input order.

    One shuffle on the group key; the rank window sorts only inside
    each group. At 100 TB the quota cut happens before any text-heavy
    downstream op, so the savings compound. Adds ``rank_in_group``."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash64(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
        key_col,
    )
    return (
        df.withColumn(
            "rank_in_group", F.row_number().over(w).cast("long")
        )
        .filter(F.col("rank_in_group") <= quota)
    )


def waterfill_allocation(
    per_group: DataFrame,
    group_col: str,
    size_col: str,
    budget: Column,
) -> DataFrame:
    """Water-filling allocation of a token ``budget`` across groups:
    the unique level C with sum(min(size_g, C)) <= budget (maximal
    integer C) — the standard data-mixing answer to "cap the giant
    sources, keep the tail whole". Returns ``per_group`` plus
    ``alloc`` = min(size, C).

    Closed form, no iteration: over groups sorted by size ascending,
    each rank r proposes C_r = (budget - cum_smaller) DIV slots_left,
    clamped at its own size; the water level is max_r min(C_r, size_r)
    (proved by checking the piecewise-linear fill function on each
    segment). The windows run on ONE partition — correct here because
    the per-GROUP table is tiny (sources/domains, not documents); the
    heavy per-document aggregation upstream already reduced it.
    Everything is non-negative integer DIV, exact in any engine."""
    from pyspark.sql import Window

    order = [F.col(size_col).asc(), F.col(group_col).asc()]
    w_run = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sized = (
        per_group.withColumn("_budget", budget)
        .withColumn(
            "_cum_smaller",
            F.coalesce(F.sum(size_col).over(w_run), F.lit(0)).cast("long"),
        )
        .withColumn("_rn", F.row_number().over(Window.orderBy(*order)))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
        .withColumn(
            "_cand",
            F.expr(
                "GREATEST(_budget - _cum_smaller, 0L) DIV (_n - _rn + 1)"
            ),
        )
        .withColumn(
            "_level",
            F.max(F.least(F.col("_cand"), F.col(size_col))).over(w_all),
        )
    )
    return sized.withColumn(
        "alloc", F.least(F.col(size_col), F.col("_level")).cast("long")
    ).drop("_budget", "_cum_smaller", "_rn", "_n", "_cand", "_level")


def scrub_pii(col: Column | str) -> dict[str, Column]:
    """Redact emails and count the redactions. Returns the scrubbed
    text column and the match count (for curation audit metrics)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        "scrubbed": F.regexp_replace(c, EMAIL_RE, "<EMAIL>"),
        "n_emails": F.regexp_count(c, F.lit(EMAIL_RE)).cast("int"),
    }


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    gram: int = 4,
    divisor: int = 16,
) -> DataFrame:
    """Content-defined chunking (CDC, the gear/Rabin-boundary family
    used by dedup storage systems): a chunk boundary opens wherever
    the rolling word-``gram`` hash is 0 mod ``divisor`` (expected
    chunk length ~``divisor`` grams). Unlike fixed-stride
    :func:`chunk_text`, boundaries are functions of CONTENT, so an
    insertion near the front shifts only its own chunk — downstream
    chunk fingerprints re-synchronize, which is what makes
    passage-level incremental dedup work across document revisions.

    Returns (id, chunk_idx, n_grams, pos_start, pos_end,
    chunk_min_hash) — the fingerprint row per chunk; dedup joins on
    (chunk_min_hash, n_grams).

    Plan shape: gram construction is IN-ROW (transform over the token
    array — no self-join, no explode-then-window for the gram text);
    the only shuffle is the per-doc cumulative-boundary window plus
    the chunk rollup, both partitioned by the doc id. Portable: the
    gram hash is md5-based :func:`hash64`, non-negative, so ``%`` is
    engine-identical.
    """
    from advisorydatapipeline_spark.functions.text import tokens

    toks = df.select(
        F.col(id_col), tokens(text_col).alias("_t")
    ).filter(F.size("_t") >= gram)
    grams = toks.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("_t") - gram + 1),
                lambda i: F.struct(
                    i.cast("int").alias("pos"),
                    hash64(
                        F.concat_ws(
                            " ", F.slice("_t", i.cast("int"), gram)
                        )
                    ).alias("gh"),
                ),
            )
        ).alias("g"),
    ).select(id_col, F.col("g.pos").alias("pos"), F.col("g.gh").alias("gh"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chunked = grams.withColumn(
        "chunk_idx",
        F.sum(
            F.when(F.col("gh") % divisor == 0, 1).otherwise(0)
        ).over(w).cast("int"),
    )
    return chunked.groupBy(id_col, "chunk_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.min("pos").cast("long").alias("pos_start"),
        F.max("pos").cast("long").alias("pos_end"),
        F.min("gh").cast("long").alias("chunk_min_hash"),
    )


# --- URL canonicalization (web-corpus dedup prep) ---------------------

# tracking params dropped during canonicalization; `x = ''` also drops
# the empty token split() yields for an absent query string. Shared
# verbatim between the Spark higher-order filter and the DuckDB
# list_filter so both engines apply the same predicate.
URL_TRACKING_PRED = (
    "x LIKE 'utm_%' OR x LIKE 'fbclid=%' OR x LIKE 'gclid=%' OR x = ''"
)


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``host``, ``domain``, ``canonical_url`` — the standard
    web-corpus URL canonicalization applied before exact URL dedup
    (reference has no web-corpus stage; north-star surface, SURVEY.md
    §2 beyond-reference block):

    - strip the fragment (``#...``)
    - lower-case scheme and host; drop a leading ``www.``
    - drop default ports (``:80`` for http, ``:443`` for https)
    - fold ``http`` -> ``https`` (the two almost always serve the
      same content; folding halves near-dup URL pairs)
    - strip trailing slashes from the path (root stays ``/``)
    - drop tracking params (:data:`URL_TRACKING_PRED`), sort the
      survivors byte-wise, re-join with ``&``

    ``domain`` is the last two host labels (a public-suffix list is
    out of scope; documented approximation). Pure built-in string
    expressions — whole-stage codegen, no UDFs, no shuffle; at 100 TB
    this is a map-only pass that fuses into the scan."""
    d = (
        df.withColumn(
            "_nofrag", F.expr(f"regexp_replace({url_col}, '#.*$', '')")
        )
        .withColumn(
            "_scheme_raw",
            F.expr("lower(regexp_extract(_nofrag, '^([A-Za-z]+)://', 1))"),
        )
        .withColumn(
            "_rest", F.expr("substr(_nofrag, instr(_nofrag, '://') + 3)")
        )
        .withColumn("_slash", F.expr("instr(_rest, '/')"))
        .withColumn(
            "_hostport",
            F.expr(
                "CASE WHEN _slash > 0 THEN substr(_rest, 1, _slash - 1)"
                " ELSE _rest END"
            ),
        )
        .withColumn(
            "_pathq",
            F.expr(
                "CASE WHEN _slash > 0 THEN substr(_rest, _slash)"
                " ELSE '' END"
            ),
        )
        .withColumn("_qpos", F.expr("instr(_pathq, '?')"))
        .withColumn(
            "_path_raw",
            F.expr(
                "CASE WHEN _qpos > 0 THEN substr(_pathq, 1, _qpos - 1)"
                " ELSE _pathq END"
            ),
        )
        .withColumn(
            "_qs",
            F.expr(
                "CASE WHEN _qpos > 0 THEN substr(_pathq, _qpos + 1)"
                " ELSE '' END"
            ),
        )
        .withColumn("_hp", F.expr("lower(_hostport)"))
        .withColumn("_cpos", F.expr("instr(_hp, ':')"))
        .withColumn(
            "_host0",
            F.expr(
                "CASE WHEN _cpos > 0 THEN substr(_hp, 1, _cpos - 1)"
                " ELSE _hp END"
            ),
        )
        .withColumn(
            "_port",
            F.expr(
                "CASE WHEN _cpos > 0 THEN substr(_hp, _cpos + 1)"
                " ELSE '' END"
            ),
        )
        .withColumn(
            "host",
            F.expr(
                "CASE WHEN _host0 LIKE 'www.%' THEN substr(_host0, 5)"
                " ELSE _host0 END"
            ),
        )
        .withColumn(
            "_portpart",
            F.expr(
                "CASE WHEN _port = ''"
                " OR (_scheme_raw = 'http' AND _port = '80')"
                " OR (_scheme_raw = 'https' AND _port = '443') THEN ''"
                " ELSE ':' || _port END"
            ),
        )
        .withColumn(
            "_scheme",
            F.expr(
                "CASE WHEN _scheme_raw IN ('http', 'https')"
                " THEN 'https' ELSE _scheme_raw END"
            ),
        )
        .withColumn(
            "_npath",
            F.expr(
                "CASE WHEN regexp_replace(_path_raw, '/+$', '') = ''"
                " THEN '/' ELSE regexp_replace(_path_raw, '/+$', '') END"
            ),
        )
        .withColumn(
            "_nq",
            F.expr(
                "array_join(array_sort(filter(split(_qs, '&'),"
                f" x -> NOT ({URL_TRACKING_PRED}))), '&')"
            ),
        )
        .withColumn(
            "canonical_url",
            F.expr(
                "_scheme || '://' || host || _portpart || _npath ||"
                " CASE WHEN _nq = '' THEN '' ELSE '?' || _nq END"
            ),
        )
        .withColumn(
            "domain", F.expr("regexp_extract(host, '([^.]+[.][^.]+)$', 1)")
        )
    )
    return d.drop(*[c for c in d.columns if c.startswith("_")])


def positional_grams(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(id, pos, gh): EVERY k-gram instance with its 1-based token
    position — unlike :func:`~advisorydatapipeline_spark.operators.
    dedup.shingle_index` this keeps duplicates, because span
    extension needs every anchor instance, not the distinct set.
    Same tokenize-then-repartition shape as shingle_index (spread the
    CPU-heavy gram hashing; projection barrier so the token array
    materializes once)."""
    from advisorydatapipeline_spark.functions.text import tokens

    toked = df.select(F.col(id_col), tokens(text_col).alias("_ts"))
    nparts = df.sparkSession.sparkContext.defaultParallelism
    toked = toked.repartition(nparts, id_col)
    return (
        toked.filter(F.size("_ts") >= k)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_ts") - (k - 1)),
                    lambda i: F.struct(
                        i.cast("long").alias("pos"),
                        hash64(
                            F.concat_ws(
                                " ", F.slice("_ts", i.cast("int"), k)
                            )
                        ).alias("gh"),
                    ),
                )
            ).alias("g"),
        )
        .select(id_col, F.col("g.pos").alias("pos"), F.col("g.gh").alias("gh"))
    )


def longest_contaminated_span(
    corpus_grams: DataFrame, eval_grams: DataFrame, k: int
) -> DataFrame:
    """Longest shared token span per corpus doc against ANY eval doc —
    real eval decontamination reports the longest contaminated span,
    not just fixed-n overlap. No all-pairs: anchor-join corpus k-gram
    instances to the (broadcast) eval k-gram index, then extend
    in-plan — a shared span of L tokens is exactly a run of L-k+1
    anchor matches at constant alignment diff = cpos - epos, found
    with the classic gap trick (cpos - row_number is constant within
    a consecutive run).

    Inputs: corpus_grams(doc_id, cpos, gh), eval_grams(eval_id, epos,
    gh). Output: one row per contaminated doc — (doc_id, eval_id,
    span_start, span_tokens), ties broken (span DESC, eval_id,
    span_start, diff) so the result is engine-independent.

    Scale (100 TB): eval suites are small curated benchmarks, so the
    eval gram index broadcasts — the 100 TB corpus side never
    shuffles for the join; the run-group window shuffles only the
    MATCHED anchors (corpus ∩ eval grams), a tiny fraction of the
    corpus. Join fan-out is bounded by the eval index size, not by
    corpus-side hot grams."""
    from pyspark.sql import Window

    m = corpus_grams.join(F.broadcast(eval_grams), "gh").select(
        "doc_id",
        "eval_id",
        "cpos",
        (F.col("cpos") - F.col("epos")).alias("diff"),
    )
    w = Window.partitionBy("doc_id", "eval_id", "diff").orderBy("cpos")
    spans = (
        m.withColumn("grp", F.col("cpos") - F.row_number().over(w))
        .groupBy("doc_id", "eval_id", "diff", "grp")
        .agg(
            F.min("cpos").cast("long").alias("span_start"),
            (F.count(F.lit(1)) + (k - 1)).cast("long").alias("span_tokens"),
        )
    )
    best = Window.partitionBy("doc_id").orderBy(
        F.col("span_tokens").desc(),
        F.col("eval_id").asc(),
        F.col("span_start").asc(),
        F.col("diff").asc(),
    )
    return (
        spans.withColumn("rn", F.row_number().over(best))
        .filter(F.col("rn") == 1)
        .select("doc_id", "eval_id", "span_start", "span_tokens")
    )


def nfc_normalize_stats(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Unicode NFC normalization with before/after stats — the
    canonicalization step a multilingual corpus applies before
    tokenization (decomposed accents, compatibility variants from
    different scrapers make byte-identical text compare unequal).
    NFC (not NFKC): canonical composition only, no lossy
    compatibility folds.

    Python's unicodedata implements the Unicode standard algorithm,
    identical to DuckDB's nfc_normalize (verified in the gate), so
    the operator is value-oracle-able despite being a Python hop.
    mapInPandas, narrow, Arrow-batched — one pass, no shuffle; at
    100 TB this rides the same scan as the other map-only curation
    steps."""
    import unicodedata
    from typing import Iterator as _It

    import pandas as pd

    schema = (
        f"{id_col} long, norm_text string, changed boolean, "
        "chars_before long, chars_after long"
    )

    def op(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            raw = pdf[text_col].fillna("")
            norm = raw.map(lambda s: unicodedata.normalize("NFC", s))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "norm_text": norm,
                    "changed": norm.ne(raw),
                    "chars_before": raw.str.len().astype("int64"),
                    "chars_after": norm.str.len().astype("int64"),
                }
            )

    return df.mapInPandas(op, schema)
