"""Corpus-curation queries with DuckDB oracles (north-star ops).

Chunking, deterministic stratified sampling, PII scrubbing, and corpus
n-gram statistics over the ``documents`` table — each oracle replays
the exact computation (same md5-derived hashes, same regex, same
substring arithmetic), so values are checked, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.operators.curation import (
    EMAIL_RE,
    bigram_repetition,
    chunk_text,
    contamination,
    pack_sequences,
    sample_by_hash,
    scrub_pii,
)
from advisorydatapipeline_spark.functions.text import tokens
from advisorydatapipeline_spark.operators.dedup import shingle_index
from advisorydatapipeline_spark.queries.dedup_queries import (
    DUCK_HASH64,
    DUCK_SHINGLES,
    DUCK_TOKENS,
    MAX_DOC_FREQ,
)
from advisorydatapipeline_spark.queries.helpers import load
from advisorydatapipeline_spark.registry import query

CHUNK_CHARS, CHUNK_STRIDE = 256, 200


@query(
    "doc_chunks",
    oracle=f"""
SELECT doc_id,
       CAST(st / {CHUNK_STRIDE} AS INT) AS chunk_idx,
       substr(text, st + 1, {CHUNK_CHARS}) AS chunk_text,
       CAST(length(substr(text, st + 1, {CHUNK_CHARS})) AS INT) AS chunk_len
FROM documents,
     unnest(generate_series(0, length(text) - 1, {CHUNK_STRIDE})) AS t(st)
WHERE length(text) > 0
""",
)
def doc_chunks(spark, sf_dir):
    """Fixed-width character chunking with overlap (256/200): the prep
    step before context-window packing. One exploded row per chunk,
    zero shuffles."""
    return chunk_text(
        load(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        chunk_chars=CHUNK_CHARS,
        stride=CHUNK_STRIDE,
    )


# per-language keep rates (percent): downweight the overrepresented
# language, keep the tail — the standard data-mixing move
_RATES = {"en": 50, "de": 100, "es": 100, "fr": 100}
_DEFAULT_RATE = 80
_SALT = "sample#1"

_RATE_SQL = (
    "CASE lang "
    + " ".join(f"WHEN '{lg}' THEN {r}" for lg, r in sorted(_RATES.items()))
    + f" ELSE {_DEFAULT_RATE} END"
)


@query(
    "sample_stratified",
    oracle=f"""
SELECT doc_id, lang, source
FROM documents
WHERE {DUCK_HASH64.format(x=f"'{_SALT}' || CAST(doc_id AS VARCHAR)")} % 100
      < {_RATE_SQL}
""",
)
def sample_stratified(spark, sf_dir):
    """Deterministic per-language downsampling via md5 hash buckets —
    reproducible across runs/partitionings (rand() is not), filter-only
    so it pushes into the scan."""
    rate = F.lit(_DEFAULT_RATE)
    for lg, r in sorted(_RATES.items()):
        rate = F.when(F.col("lang") == lg, F.lit(r)).otherwise(rate)
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return sample_by_hash(docs, "doc_id", rate, salt=_SALT)


@query(
    "pii_scrub",
    oracle=f"""
WITH planted AS (
  SELECT doc_id,
         'contact user' || CAST(doc_id AS VARCHAR) ||
         '@example.com re: ' || text AS t
  FROM documents
)
SELECT doc_id,
       regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g') AS scrubbed,
       CAST(length(regexp_extract_all(t, '{EMAIL_RE}')) AS INT) AS n_emails
FROM planted
""",
)
def pii_scrub(spark, sf_dir):
    """Email redaction + audit count over text with planted addresses
    (the corpus itself has none — planting proves the scrub fires).
    Regex kept to the Java-regex/RE2 shared subset so the oracle
    replays it exactly."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com re: "),
            F.col("text"),
        ).alias("t"),
    )
    cols = scrub_pii("t")
    return docs.select(
        "doc_id",
        cols["scrubbed"].alias("scrubbed"),
        cols["n_emails"].alias("n_emails"),
    )


# benchmark set: a deterministic slice standing in for an eval suite
_EVAL_MOD = 97


@query(
    "decontaminate_overlap",
    oracle=f"""
WITH {DUCK_SHINGLES},
hot AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > {MAX_DOC_FREQ}
),
shc AS (
  SELECT sh.doc_id, sh.shingle FROM sh
  WHERE sh.shingle NOT IN (SELECT shingle FROM hot)
),
ev AS (
  SELECT doc_id AS eval_id, shingle FROM shc WHERE doc_id % {_EVAL_MOD} = 0
),
corp AS (
  SELECT doc_id, shingle FROM shc WHERE doc_id % {_EVAL_MOD} <> 0
)
SELECT c.doc_id,
       CAST(count(DISTINCT e.eval_id) AS BIGINT) AS n_eval_docs,
       CAST(count(DISTINCT c.shingle) AS BIGINT) AS n_shingles
FROM corp c JOIN ev e ON c.shingle = e.shingle
GROUP BY c.doc_id
""",
)
def decontaminate_overlap(spark, sf_dir):
    """Benchmark decontamination: corpus docs sharing any (df-capped)
    3-gram shingle with the eval slice, with hit counts. The eval
    shingle set is broadcast — at 100 TB the corpus index never
    shuffles for this check."""
    docs = load(spark, sf_dir, "documents")
    idx = shingle_index(
        docs, "doc_id", "text", 3, max_doc_freq=MAX_DOC_FREQ
    )
    eval_docs = docs.filter(F.col("doc_id") % _EVAL_MOD == 0).select("doc_id")
    return contamination(idx, eval_docs, "doc_id")


@query(
    "repetition_stats",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {DUCK_TOKENS.format(x='text')} AS ts FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(ts) - 1),
                i -> ts[i] || ' ' || ts[i+1])) AS bg
  FROM toks WHERE len(ts) >= 2
),
pb AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
       max(c) / CAST(sum(c) AS DOUBLE) AS top_bigram_frac,
       (sum(c) - count(*)) / CAST(sum(c) AS DOUBLE) AS dup_bigram_frac
FROM pb GROUP BY doc_id
""",
)
def repetition_stats(spark, sf_dir):
    """Gopher-style repetition filter inputs: per-doc top-bigram share
    and duplicate-bigram share (boilerplate/spam signals). Raw-count
    bigram double-aggregation, both stages partial-agg friendly."""
    return bigram_repetition(
        load(spark, sf_dir, "documents"), "doc_id", "text"
    )


CTX_TOKENS = 512


@query(
    "sequence_packing",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len({DUCK_TOKENS.format(x='text')}) AS BIGINT) AS n_tokens
  FROM documents
),
s AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_tokens AS st
  FROM t
)
SELECT lang, doc_id, n_tokens,
       CAST(st // {CTX_TOKENS} AS BIGINT) AS seq_id,
       CAST(st % {CTX_TOKENS} AS BIGINT) AS seq_offset
FROM s
""",
)
def sequence_packing(spark, sf_dir):
    """Context-window packing prep: concat-and-chop assignment of each
    doc to its {512}-token training sequence (per-lang shards, doc_id
    order). Pure integer window math — the exact thing a tokenize-and-
    pack job computes before writing training shards."""
    from advisorydatapipeline_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    return pack_sequences(
        docs, "lang", "doc_id", "n_tokens", ctx_tokens=CTX_TOKENS
    )


TOP_NGRAMS = 20


@query(
    "corpus_ngram_stats",
    oracle=f"""
WITH {DUCK_SHINGLES},
df AS (
  SELECT shingle, CAST(count(*) AS BIGINT) AS doc_freq
  FROM sh GROUP BY shingle
),
ranked AS (
  SELECT shingle, doc_freq,
         row_number() OVER (ORDER BY doc_freq DESC, shingle) AS rk
  FROM df
)
SELECT shingle, doc_freq FROM ranked WHERE rk <= {TOP_NGRAMS}
""",
)
def corpus_ngram_stats(spark, sf_dir):
    """Top-{20} 3-gram shingles by document frequency — the corpus
    statistic behind df-caps and contamination checks. Partial-agg
    count then a single-column top-k (deterministic tiebreak on the
    shingle)."""
    idx = shingle_index(load(spark, sf_dir, "documents"), "doc_id", "text", 3)
    freq = idx.groupBy("shingle").agg(
        F.count("*").cast("long").alias("doc_freq")
    )
    return (
        freq.orderBy(F.col("doc_freq").desc(), F.col("shingle"))
        .limit(TOP_NGRAMS)
        .select("shingle", "doc_freq")
    )


from advisorydatapipeline_spark.registry import ORACLES  # noqa: E402

_udtf_count = 0


@query("doc_chunks_udtf", oracle=ORACLES["doc_chunks"])
def doc_chunks_udtf(spark, sf_dir):
    """UDTF surface: the chunker as a Python user-defined TABLE
    function (one eval per row, yields one row per chunk), lateral-
    joined in SQL — same oracle as the native `doc_chunks`, proving
    the UDTF path value-correct. The exploded-sequence native twin is
    the hot path (JVM-side, codegen); this exists to cover Spark's
    UDTF API the way `state_machine_udf` covers scalar UDFs."""
    from pyspark.sql.functions import udtf

    cc, st = CHUNK_CHARS, CHUNK_STRIDE

    @udtf(
        returnType=(
            "doc_id bigint, chunk_idx int, chunk_text string, chunk_len int"
        )
    )
    class ChunkDocs:
        def eval(self, doc_id, text):  # noqa: ANN001
            if not text:
                return
            for i, start in enumerate(range(0, len(text), st)):
                piece = text[start : start + cc]
                yield doc_id, i, piece, len(piece)

    global _udtf_count
    _udtf_count += 1
    fname = f"adp_chunk_docs_{_udtf_count}"
    vname = f"adp_docs_v_{_udtf_count}"
    spark.udtf.register(fname, ChunkDocs)
    load(spark, sf_dir, "documents").select("doc_id", "text").createOrReplaceTempView(vname)
    return spark.sql(
        f"SELECT c.* FROM {vname} v, LATERAL {fname}(v.doc_id, v.text) c"
    )


PMI_SCALE = 1_000_000
PMI_MIN_PAIR = 5
PMI_TOP_K = 50


@query(
    "pmi_collocations",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {DUCK_TOKENS.format(x='text')} AS ts FROM documents
),
bg AS (
  SELECT ts[i] AS t1, ts[i+1] AS t2
  FROM toks, unnest(generate_series(1, len(ts) - 1)) AS u(i)
  WHERE len(ts) >= 2
),
uni AS (
  SELECT t, CAST(count(*) AS BIGINT) AS cu FROM (
    SELECT unnest(ts) AS t FROM toks
  ) GROUP BY 1
),
pair AS (
  SELECT t1, t2, CAST(count(*) AS BIGINT) AS cp
  FROM bg GROUP BY 1, 2 HAVING count(*) >= {PMI_MIN_PAIR}
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM (
  SELECT unnest(ts) AS t FROM toks
)),
scored AS (
  SELECT p.t1, p.t2, p.cp,
         CAST((CAST(p.cp AS HUGEINT) * t.n * {PMI_SCALE})
              // (CAST(u1.cu AS HUGEINT) * u2.cu) AS BIGINT) AS pmi_q
  FROM pair p
  JOIN uni u1 ON u1.t = p.t1
  JOIN uni u2 ON u2.t = p.t2
  CROSS JOIN tot t
)
SELECT t1, t2, cp, pmi_q FROM (
  SELECT *, ROW_NUMBER() OVER (
    ORDER BY pmi_q DESC, t1 ASC, t2 ASC
  ) AS rn FROM scored
) WHERE rn <= {PMI_TOP_K}
""",
)
def pmi_collocations(spark, sf_dir):
    """Collocation mining: top-K adjacent token pairs by pointwise
    mutual information. PMI's log is monotone, so the ranking uses
    the EXACT integer ratio (c_xy * N * scale) DIV (c_x * c_y)
    instead of log floats — cross-engine-identical ranks (same trick
    as the integer-scaled idf in tfidf_top_terms). Bigrams are linear
    in corpus size (adjacent pairs only, never within-doc all-pairs);
    unigram counts join the pair aggregate on the token key
    (AQE broadcasts them at test scale; at corpus scale the
    vocabulary-sized table stays a hash join); the min-pair
    floor kills the hapax tail before the join. Top-K via a single
    TakeOrdered, no global sort."""
    from advisorydatapipeline_spark.functions.text import tokens as _tok

    docs = load(spark, sf_dir, "documents")
    toked = docs.select(_tok("text").alias("ts")).persist()
    from advisorydatapipeline_spark.operators.curation import (
        adjacent_pairs,
    )

    ts = F.col("ts")
    bigrams = adjacent_pairs(
        ts,
        lambda a, b: F.struct(a.alias("t1"), b.alias("t2")),
        empty_type="array<struct<t1:string,t2:string>>",
    )
    pair = (
        toked.select(F.explode(bigrams).alias("b"))
        .select("b.t1", "b.t2")
        .groupBy("t1", "t2")
        .agg(F.count("*").cast("long").alias("cp"))
        .filter(F.col("cp") >= PMI_MIN_PAIR)
    )
    uni = (
        toked.select(F.explode(ts).alias("t"))
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("cu"))
    )
    tot = toked.select(F.explode(ts).alias("t")).agg(
        F.count("*").cast("long").alias("n")
    )
    # no broadcast hint on the unigram side: it is vocabulary-sized
    # (too big to ship at corpus scale) — AQE picks broadcast at test
    # scale and a shuffled hash join on the token key at 100 TB
    scored = (
        pair.join(uni.withColumnRenamed("t", "t1"), "t1")
        .withColumnRenamed("cu", "cu1")
        .join(uni.withColumnRenamed("t", "t2"), "t2")
        .withColumnRenamed("cu", "cu2")
        .crossJoin(F.broadcast(tot))
        .select(
            "t1",
            "t2",
            "cp",
            # DECIMAL(38,0) intermediates: cp*N*scale overflows
            # int64 at real corpus sizes (N ~ 1e12 tokens); DIV on
            # decimals is exact integral division, same as the
            # oracle's HUGEINT //
            F.expr(
                f"CAST((CAST(cp AS DECIMAL(38,0)) * n * {PMI_SCALE})"
                f" DIV (CAST(cu1 AS DECIMAL(38,0)) * cu2) AS BIGINT)"
            ).alias("pmi_q"),
        )
    )
    # NOTE: no unpersist here — the returned plan executes after this
    # function returns; an unpersist at build time would evict the
    # cache before the three token branches ever read it
    return scored.orderBy(
        F.col("pmi_q").desc(), F.col("t1").asc(), F.col("t2").asc()
    ).limit(PMI_TOP_K).select("t1", "t2", "cp", "pmi_q")


# --- per-source quota cap (domain balancing) ---------------------------------

_QUOTA, _QSALT = 10, "quota#1"


@query(
    "source_quota_cap",
    oracle=f"""
SELECT doc_id, source, rank_in_group FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {DUCK_HASH64.format(x=f"'{_QSALT}' || CAST(doc_id AS VARCHAR)")},
                    doc_id) AS rank_in_group
  FROM documents)
WHERE rank_in_group <= {_QUOTA}
""",
)
def source_quota_cap(spark, sf_dir):
    """Per-domain quota: keep at most {10} docs per source, selected
    by deterministic md5 rank — the anti-domination cap a web corpus
    applies before mixing (one hot domain must not swamp the batch).
    One shuffle on the source key; reproducible under any
    partitioning (hash rank, not input order)."""
    from advisorydatapipeline_spark.operators.curation import cap_per_group

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return cap_per_group(
        docs, "source", "doc_id", _QUOTA, salt=_QSALT
    ).select("doc_id", "source", "rank_in_group")


# --- token-budget water-fill mixing ------------------------------------------


@query(
    "corpus_mixture_waterfill",
    oracle=f"""
WITH tok AS (
  SELECT source,
         CAST(len({DUCK_TOKENS.format(x='text')}) AS BIGINT) AS nt
  FROM documents
),
per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(nt) AS BIGINT) AS tokens_total
  FROM tok GROUP BY source
),
tot AS (
  SELECT CAST(CAST(sum(tokens_total) AS BIGINT) // 2 AS BIGINT) AS b
  FROM per_src
),
rk AS (
  SELECT p.source, p.tokens_total, t.b,
         row_number() OVER (ORDER BY tokens_total, source) AS rn,
         COALESCE(CAST(sum(tokens_total) OVER (
             ORDER BY tokens_total, source
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS BIGINT), 0) AS cum,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM per_src p CROSS JOIN tot t
),
lv AS (
  SELECT max(LEAST(GREATEST(b - cum, 0) // (n - rn + 1), tokens_total))
           AS c
  FROM rk
)
SELECT p.source, p.n_docs, p.tokens_total,
       CAST(LEAST(p.tokens_total, l.c) AS BIGINT) AS tokens_alloc
FROM per_src p CROSS JOIN lv l
""",
)
def corpus_mixture_waterfill(spark, sf_dir):
    """Token-budget corpus mixing: water-fill half the corpus's token
    budget across sources — big sources get capped at the common
    level C, small sources keep everything (sum of allocations ==
    budget, maximal integer C). The closed-form level computation is
    windowed integer math over the tiny per-source table; the only
    heavy work is the per-document token count, which partial-aggs
    into one row per source before any window runs."""
    from advisorydatapipeline_spark.functions.text import tokens
    from advisorydatapipeline_spark.operators.curation import (
        waterfill_allocation,
    )

    docs = load(spark, sf_dir, "documents")
    per_src = (
        docs.select("source", F.size(tokens("text")).cast("long").alias("nt"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("tokens_total"),
        )
    )
    total = per_src.agg(
        F.expr("CAST(sum(tokens_total) AS LONG) DIV 2").alias("b")
    )
    per = per_src.crossJoin(F.broadcast(total))
    out = waterfill_allocation(per, "source", "tokens_total", F.col("b"))
    return out.select(
        "source",
        "n_docs",
        "tokens_total",
        F.col("alloc").alias("tokens_alloc"),
    )


@query(
    "temperature_mix_rates",
    oracle="""
WITH s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents
  GROUP BY 1
),
w AS (
  SELECT source, n_docs,
         CAST(floor(sqrt(n_docs)) AS BIGINT) AS weight
  FROM s
)
SELECT source, n_docs, weight,
       CAST(weight * 1000000
            // CAST(sum(weight) OVER () AS BIGINT) AS BIGINT)
         AS sample_ppm
FROM w
""",
)
def temperature_mix_rates(spark, sf_dir):
    """Temperature-balanced sampling rates (the XLM-R / mBERT
    p^alpha recipe at alpha = 0.5): per-source weight = isqrt(docs),
    sampling rate = integer-ppm share of the weight total. isqrt via
    floor(sqrt(n)) is EXACT cross-engine (IEEE requires sqrt to be
    correctly rounded, and below 2^52 the floor can't straddle an
    integer boundary) — the one transcendental a hash-gated oracle
    can use; a float power/log formulation could not be value-gated.
    One partial-agg pass to the |sources|-row table; the normalizing
    window runs there."""
    s = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "weight", F.expr("CAST(floor(sqrt(n_docs)) AS BIGINT)")
        )
    )
    return s.select(
        "source",
        "n_docs",
        "weight",
        F.expr(
            "weight * 1000000 DIV sum(weight) OVER ()"
        ).alias("sample_ppm"),
    )


@query(
    "length_bucket_batching",
    oracle=f"""
WITH t AS (
  SELECT CAST(len({DUCK_TOKENS.format(x='text')}) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT CAST(length(bin(n_tokens)) - 1 AS BIGINT) AS len_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_tokens) AS BIGINT) AS min_tokens,
       CAST(max(n_tokens) AS BIGINT) AS max_tokens,
       CAST(sum(n_tokens) AS BIGINT) AS bucket_tokens,
       -- explicit floor: DuckDB's // on DOUBLE does NOT floor, and
       -- a bare BIGINT cast would round up across the boundary
       CAST(floor((CAST(count(*) AS BIGINT)
             * power(2, CAST(length(bin(n_tokens)) - 1 AS BIGINT) + 1)
             - sum(n_tokens)) * 1000000
            / (CAST(count(*) AS BIGINT)
               * power(2, CAST(length(bin(n_tokens)) - 1 AS BIGINT) + 1)))
            AS BIGINT) AS pad_waste_ppm
FROM t WHERE n_tokens > 0
GROUP BY 1
""",
)
def length_bucket_batching(spark, sf_dir):
    """Dynamic-batching prep: docs binned into power-of-two token-
    length buckets (exact floor(log2) via base-2 string length — no
    libm), with the padding waste each bucket pays if batches pad to
    the bucket ceiling (2^(b+1)) in ppm. This is the bucketing a
    training dataloader runs to keep GPU batches dense; the waste
    column is the quantity you tune bucket granularity against.
    power(2, int) is exact in doubles far past any real length, so
    the ppm arithmetic stays integer-valued on both engines."""
    t = (
        load(spark, sf_dir, "documents")
        .select(F.size(tokens("text")).cast("long").alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
        .withColumn(
            "len_bucket",
            (F.length(F.conv(F.col("n_tokens"), 10, 2)) - 1).cast(
                "long"
            ),
        )
    )
    g = t.groupBy("len_bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        F.sum("n_tokens").alias("bucket_tokens"),
    )
    cap = F.expr("n_docs * power(2, len_bucket + 1)")
    return g.select(
        "len_bucket",
        "n_docs",
        "min_tokens",
        "max_tokens",
        "bucket_tokens",
        ((cap - F.col("bucket_tokens")) * 1000000 / cap)
        .cast("long")
        .alias("pad_waste_ppm"),
    )


@query(
    "temperature_mix_apply",
    oracle="""
WITH s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents
  GROUP BY 1
),
w AS (
  SELECT source, n_docs,
         CAST(floor(sqrt(n_docs)) AS BIGINT) AS weight
  FROM s
),
r AS (
  SELECT source, n_docs,
         CAST(weight * 1000000
              // CAST(sum(weight) OVER () AS BIGINT) AS BIGINT)
           AS sample_ppm
  FROM w
),
kept AS (
  SELECT d.source,
         CASE WHEN (('0x' || substr(md5('tmix:' ||
                      CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT)
                   % 1000000 < r.sample_ppm
              THEN 1 ELSE 0 END AS keep
  FROM documents d JOIN r ON d.source = r.source
)
SELECT k.source, r.n_docs, r.sample_ppm,
       CAST(sum(k.keep) AS BIGINT) AS n_kept
FROM kept k JOIN r ON k.source = r.source
GROUP BY 1, 2, 3
""",
)
def temperature_mix_apply(spark, sf_dir):
    """The APPLY step of temperature sampling: the isqrt-weight ppm
    rates from temperature_mix_rates become a deterministic keep
    decision per doc (salted hash % 1e6 < rate — reproducible under
    reruns and engine-independent, the same mechanism as
    split_assignment), reported as per-source kept counts. Rates
    broadcast onto the scan; the only shuffle is the per-source
    rollup. Plan (rates) and apply (this) together close the
    balancing loop a multilingual corpus build runs."""
    from advisorydatapipeline_spark.functions.text import hash64

    docs = load(spark, sf_dir, "documents")
    r = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "weight", F.expr("CAST(floor(sqrt(n_docs)) AS BIGINT)")
        )
        .selectExpr(
            "source",
            "n_docs",
            "weight * 1000000 DIV sum(weight) OVER () AS sample_ppm",
        )
    )
    kept = docs.join(F.broadcast(r), "source").select(
        "source",
        "n_docs",
        "sample_ppm",
        F.when(
            hash64(
                F.concat(F.lit("tmix:"), F.col("doc_id").cast("string"))
            )
            % 1000000
            < F.col("sample_ppm"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("keep"),
    )
    return kept.groupBy("source", "n_docs", "sample_ppm").agg(
        F.sum("keep").alias("n_kept")
    )


CDC_GRAM, CDC_DIVISOR = 4, 16

_CDC_GH = DUCK_HASH64.format(
    x=f"array_to_string(t[i:i + {CDC_GRAM - 1}], ' ')"
)


@query(
    "cdc_chunk_stats",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {DUCK_TOKENS.format(x='text')} AS t FROM documents
),
grams AS (
  SELECT doc_id, CAST(i AS INT) AS pos, {_CDC_GH} AS gh
  FROM toks,
       unnest(generate_series(1, len(t) - {CDC_GRAM} + 1)) AS u(i)
  WHERE len(t) >= {CDC_GRAM}
),
chunked AS (
  SELECT doc_id, pos, gh,
         CAST(sum(CASE WHEN gh % {CDC_DIVISOR} = 0 THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos) AS INT)
           AS chunk_idx
  FROM grams
)
SELECT doc_id, chunk_idx,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(min(pos) AS BIGINT) AS pos_start,
       CAST(max(pos) AS BIGINT) AS pos_end,
       CAST(min(gh) AS BIGINT) AS chunk_min_hash
FROM chunked GROUP BY 1, 2
""",
)
def cdc_chunk_stats(spark, sf_dir):
    """Content-defined chunking over the corpus: per-chunk fingerprint
    rows whose boundaries depend on CONTENT (rolling 4-gram hash = 0
    mod 16), so edits re-synchronize and chunk-level dedup survives
    document revisions — the storage-dedup primitive fixed-stride
    doc_chunks cannot provide. Gram construction is in-row; the only
    shuffle is the per-doc boundary cumsum window + chunk rollup."""
    from advisorydatapipeline_spark.operators.curation import cdc_chunks

    return cdc_chunks(
        load(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        gram=CDC_GRAM,
        divisor=CDC_DIVISOR,
    )


# --- weighted sampling without replacement (A-ES) -------------------

_ARES_SALT = "ares#1"
_ARES_K = 12  # sample size per language stratum
# 13 hex digits = 52 bits: the hash-int stays under 2^53 so the
# int->double conversion below is EXACT in both engines
_ARES_DENOM = float(1 << 52)

_DUCK_ARES_U = (
    f"((('0x' || substr(md5('{_ARES_SALT}' || CAST(doc_id AS VARCHAR)),"
    f" 1, 13))::BIGINT + 1) / {_ARES_DENOM!r})"
)


@query(
    "weighted_sample_ares",
    oracle=f"""
SELECT lang, rn, doc_id, weight
FROM (
  SELECT lang, doc_id, n_chars AS weight,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY ln({_DUCK_ARES_U}) / n_chars DESC, doc_id ASC
         ) AS rn
  FROM documents
) WHERE rn <= {_ARES_K}
""",
)
def weighted_sample_ares(spark, sf_dir):
    """Weighted sampling WITHOUT replacement per language stratum —
    Efraimidis-Spirakis A-ES: priority u^(1/w) (compared as
    ln(u)/w), top-k by priority == a weight-proportional sample.
    Importance sampling for training mixes (here w = n_chars: longer
    docs proportionally likelier), reproducible across runs, retries
    and partitionings because u is md5-derived, not rand().

    Scale: u and the key are map-side column math; only
    (lang, key, doc_id, weight) ever shuffles for the per-stratum
    top-k — the text never moves. The float key is ordering-only and
    never output (engine ulp differences in ln() cannot perturb
    hashed values, and perturbing the order of two keys would need a
    ~1e-16 near-tie between md5-derived reals).
    """
    docs = load(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(_ARES_SALT), F.col("doc_id").cast("string")
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        + F.lit(1)
    ).cast("double") / F.lit(_ARES_DENOM)
    key = F.log(u) / F.col("n_chars").cast("double")
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        key.desc(), F.col("doc_id").asc()
    )
    return (
        docs.select(
            "lang",
            F.row_number().over(w).alias("rn"),
            "doc_id",
            F.col("n_chars").alias("weight"),
        )
        .filter(F.col("rn") <= _ARES_K)
    )


@query(
    "cdc_shared_chunks",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {DUCK_TOKENS.format(x='text')} AS t FROM documents
),
grams AS (
  SELECT doc_id, CAST(i AS INT) AS pos, {_CDC_GH} AS gh
  FROM toks,
       unnest(generate_series(1, len(t) - {CDC_GRAM} + 1)) AS u(i)
  WHERE len(t) >= {CDC_GRAM}
),
chunked AS (
  SELECT doc_id, pos, gh,
         CAST(sum(CASE WHEN gh % {CDC_DIVISOR} = 0 THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos) AS INT)
           AS chunk_idx
  FROM grams
),
chunks AS (
  SELECT doc_id, chunk_idx,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(min(gh) AS BIGINT) AS chunk_min_hash
  FROM chunked GROUP BY 1, 2
)
SELECT chunk_min_hash AS chunk_fp, n_grams,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(min(doc_id) AS BIGINT) AS first_doc_id
FROM chunks
GROUP BY 1, 2
HAVING count(DISTINCT doc_id) > 1
""",
)
def cdc_shared_chunks(spark, sf_dir):
    """Cross-document shared-passage detection on CDC fingerprints:
    chunks whose (min-gram-hash, length) key recurs in MORE THAN ONE
    document are syndicated/boilerplate passages. This is the payoff
    of content-defined boundaries (cdc_chunk_stats builds them): the
    same passage embedded at different offsets in different docs
    still chunks identically, so a plain GROUP BY finds it — no
    all-pairs comparison, no positional alignment. The storage-dedup
    shape: at 100 TB the chunk-fingerprint table IS the dedup index,
    and this rollup is one partial-agg shuffle of (fp, n_grams,
    doc_id) triples — text never moves."""
    from advisorydatapipeline_spark.operators.curation import cdc_chunks

    chunks = cdc_chunks(
        load(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        gram=CDC_GRAM,
        divisor=CDC_DIVISOR,
    )
    return (
        chunks.groupBy(
            F.col("chunk_min_hash").alias("chunk_fp"), "n_grams"
        )
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("doc_id").cast("long").alias("first_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# --- temporal train/eval split with leakage audit -------------------

_SPLIT_CUT_NS = 1_705_968_000_000_000_000  # 2024-01-23T00:00:00Z


@query(
    "temporal_split_leakage",
    oracle=f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_ns(ts) AS ns FROM events
  WHERE ts IS NOT NULL
),
labeled AS (
  SELECT *, CASE WHEN ns < {_SPLIT_CUT_NS} THEN 'train' ELSE 'eval'
            END AS split
  FROM ev
),
per_split AS (
  SELECT split, CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM labeled GROUP BY split
),
leak AS (
  SELECT CAST(count(*) AS BIGINT) AS n_leaky_users
  FROM (
    SELECT user_id FROM labeled
    GROUP BY user_id HAVING count(DISTINCT split) = 2
  )
)
SELECT p.split, p.n_events, p.n_users, l.n_leaky_users
FROM per_split p CROSS JOIN leak l
""",
)
def temporal_split_leakage(spark, sf_dir):
    """Temporal train/eval split with the LEAKAGE AUDIT attached: the
    eval window is strictly later than training (the only split that
    measures forecasting rather than interpolation), and the audit
    counts entities that straddle the boundary — the users whose eval
    rows are contaminated by their own training history. hash-based
    split_assignment is the IID twin; this is the time-series twin.
    One scan, one partial-agg per rollup, a 1-row leak scalar
    broadcast onto two rows."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    labeled = ev.select(
        "event_id",
        "user_id",
        F.when(F.col("ts") < _SPLIT_CUT_NS, "train")
        .otherwise("eval")
        .alias("split"),
    )
    per_split = labeled.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    leak = (
        labeled.groupBy("user_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") == 2)
        .agg(F.count(F.lit(1)).cast("long").alias("n_leaky_users"))
    )
    return per_split.crossJoin(F.broadcast(leak))


@query(
    "cdc_doc_coverage",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {DUCK_TOKENS.format(x='text')} AS t FROM documents
),
grams AS (
  SELECT doc_id, CAST(i AS INT) AS pos, {_CDC_GH} AS gh
  FROM toks,
       unnest(generate_series(1, len(t) - {CDC_GRAM} + 1)) AS u(i)
  WHERE len(t) >= {CDC_GRAM}
),
chunked AS (
  SELECT doc_id, pos, gh,
         CAST(sum(CASE WHEN gh % {CDC_DIVISOR} = 0 THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos) AS INT)
           AS chunk_idx
  FROM grams
),
chunks AS (
  SELECT doc_id, chunk_idx,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(min(gh) AS BIGINT) AS fp
  FROM chunked GROUP BY 1, 2
),
shared AS (
  SELECT fp, n_grams FROM chunks
  GROUP BY 1, 2 HAVING count(DISTINCT doc_id) > 1
)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(s.fp) AS BIGINT) AS n_shared_chunks,
       CAST(sum(c.n_grams) AS BIGINT) AS n_grams_total,
       CAST(COALESCE(sum(CASE WHEN s.fp IS NOT NULL
                              THEN c.n_grams END), 0) AS BIGINT)
         AS n_grams_shared,
       CAST(COALESCE(sum(CASE WHEN s.fp IS NOT NULL
                              THEN c.n_grams END), 0) * 1000000
            // sum(c.n_grams) AS BIGINT) AS shared_ppm
FROM chunks c
LEFT JOIN shared s ON s.fp = c.fp AND s.n_grams = c.n_grams
GROUP BY c.doc_id
""",
)
def cdc_doc_coverage(spark, sf_dir):
    """Per-document SYNDICATION SCORE on the CDC chunk index: the
    fraction of a doc's content (gram-weighted, in ppm) whose chunks
    recur in other documents — the doc-level rollup of
    cdc_shared_chunks' chunk-level listing, and the number a
    curation policy actually thresholds on ('drop docs more than X%
    boilerplate'). Same chunk build; the shared-fingerprint set
    (tiny) broadcast-joins back onto each doc's chunks; one per-doc
    rollup."""
    from advisorydatapipeline_spark.operators.curation import cdc_chunks

    chunks = cdc_chunks(
        load(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        gram=CDC_GRAM,
        divisor=CDC_DIVISOR,
    ).select(
        "doc_id", "n_grams", F.col("chunk_min_hash").alias("fp")
    ).persist()
    shared = (
        chunks.groupBy("fp", "n_grams")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("fp", "n_grams", F.lit(1).alias("_shared"))
    )
    return (
        chunks.join(F.broadcast(shared), ["fp", "n_grams"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.count("_shared").cast("long").alias("n_shared_chunks"),
            F.sum("n_grams").cast("long").alias("n_grams_total"),
            F.coalesce(
                F.sum(F.when(F.col("_shared").isNotNull(), F.col("n_grams"))),
                F.lit(0),
            ).cast("long").alias("n_grams_shared"),
        )
        .withColumn(
            "shared_ppm",
            F.expr(
                "CAST(n_grams_shared * 1000000 DIV n_grams_total"
                " AS BIGINT)"
            ),
        )
    )


EPOCH_COUNT = 2
SHARD_COUNT = 8
# two-round quadratic mix (same family as the multimodal fixtures):
# one linear round leaves nearby keys correlated; the squared terms
# decorrelate. ALL intermediates < 2^63: the raw key is reduced
# mod 2^31 BEFORE squaring (ADVICE r10 — squaring raw
# doc_id*E+epoch overflows BIGINT once doc_id exceeds ~1.5e9, where
# DuckDB errors and Spark wraps; the reduced square is < 2^62 and
# the linear term < 2^31 * 506952113 < 2^60, matching the h1->h2
# round, whose h1 is already < 2^31).
_SHUFFLE_MIX_SQL = (
    "((((h1 * h1) % 2147483648) * 2654435761 + h1 * 506952113)"
    " % 2147483648)"
)
_XR_SQL = "(x % 2147483648)"
_H1_SQL = (
    f"(((({_XR_SQL} * {_XR_SQL}) % 2147483648) * 2654435761"
    f" + {_XR_SQL} * 506952113) % 2147483648)"
)


@query(
    "epoch_shard_plan",
    oracle=f"""
WITH x AS (
  SELECT d.doc_id, e.e AS epoch,
         d.doc_id * {EPOCH_COUNT} + e.e AS x
  FROM documents d, range({EPOCH_COUNT}) e(e)
),
h AS (
  SELECT doc_id, epoch, {_H1_SQL} AS h1
  FROM x
),
k AS (
  SELECT doc_id, epoch,
         CAST({_SHUFFLE_MIX_SQL} AS BIGINT) AS shuffle_key
  FROM h
),
p AS (
  SELECT doc_id, epoch, shuffle_key,
         CAST(ROW_NUMBER() OVER (PARTITION BY epoch
              ORDER BY shuffle_key, doc_id) - 1 AS BIGINT) AS pos,
         CAST(count(*) OVER (PARTITION BY epoch) AS BIGINT) AS n
  FROM k
)
SELECT doc_id, CAST(epoch AS INTEGER) AS epoch, shuffle_key, pos,
       CAST((pos * {SHARD_COUNT}) // n AS INTEGER) AS shard
FROM p
""",
)
def epoch_shard_plan(spark, sf_dir):
    """Deterministic epoch-shuffle shard plan — the materialized
    ordering every pretraining run needs: for each of E epochs, every
    document gets a pseudo-random position (two-round quadratic
    integer mix of doc_id*E+epoch, the measured-decorrelated mix the
    multimodal fixtures use) and a balanced shard id
    ``(pos * S) DIV n`` (shard sizes differ by at most 1). Ties are
    impossible to matter: the rank orders by (shuffle_key, doc_id),
    so the plan is bit-identical across engines and re-runs —
    reproducibility is the whole point of materializing it.

    Scale (100 TB): the rank is a range-partitioned sort of
    (epoch, key, id) TRIPLES — 24 bytes/row, never document payloads;
    shard assignment is arithmetic on the rank. Writing the plan
    (doc_id -> epoch, shard, pos) and bucket-joining it back to the
    corpus keeps the heavy table un-sorted. E and S are compile-time
    constants here; a run parameterizes them."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    x = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(EPOCH_COUNT - 1))
        ).alias("epoch"),
    ).withColumn(
        "x", F.expr(f"doc_id * {EPOCH_COUNT} + epoch")
    )
    k = x.selectExpr(
        "doc_id",
        "epoch",
        f"CAST({_SHUFFLE_MIX_SQL.replace('h1', f'({_H1_SQL})')} AS BIGINT)"
        " AS shuffle_key",
    )
    p = k.selectExpr(
        "doc_id",
        "epoch",
        "shuffle_key",
        "CAST(ROW_NUMBER() OVER (PARTITION BY epoch"
        " ORDER BY shuffle_key, doc_id) - 1 AS BIGINT) AS pos",
        "CAST(count(*) OVER (PARTITION BY epoch) AS BIGINT) AS n",
    )
    return p.selectExpr(
        "doc_id",
        "CAST(epoch AS INTEGER) AS epoch",
        "shuffle_key",
        "pos",
        f"CAST((pos * {SHARD_COUNT}) DIV n AS INTEGER) AS shard",
    )


# --- URL canonicalization dedup + domain retention (r11) ---------------

# The documents table has no URL column, so the fixture synthesizes a
# deterministic messy URL per doc from doc_id arithmetic (the same
# replayable-fixture pattern as the multimodal entries): every group
# of 4 consecutive doc_ids presents ONE logical page four ways —
# clean; upper-cased scheme/host + www. + default port + trailing
# slash; https + :443 + tracking params (utm/fbclid); fragment +
# interleaved tracking param — and every group with k % 3 == 0
# carries the same two real params in three different orders. All
# four variants must canonicalize to one canonical_url.
_URL_BLOCKLIST = (
    "site3.com",
    "site17.com",
    "site41.com",
)
_URL_QUOTA = 2  # canonical pages kept per domain
_URLQ_SALT = "urlq#1"


def _url_fixture_sql(idiv: str, cast: str) -> str:
    """The messy-URL synthesis, dialect-parameterized (Spark: DIV /
    STRING; DuckDB: // / VARCHAR). Same bytes from both engines."""

    def s(e: str) -> str:
        return f"CAST({e} AS {cast})"

    k = f"(doc_id {idiv} 4)"
    d = f"({k} % 50)"
    pg = f"({k} {idiv} 50)"
    # every 5th site publishes under a docs. subdomain, so the
    # registered-domain extraction (last two labels) is genuinely
    # exercised: host docs.site0.com -> domain site0.com
    sub = f"(CASE WHEN {d} % 5 = 0 THEN 'docs.' ELSE '' END)"
    sub_uc = f"(CASE WHEN {d} % 5 = 0 THEN 'DOCS.' ELSE '' END)"
    host = f"{sub} || 'site' || {s(d)} || '.com'"
    host_uc = f"{sub_uc} || 'SITE' || {s(d)} || '.COM'"
    host_mixed = f"{sub} || 'Site' || {s(d)} || '.com'"
    path = f"'/cat' || {s(f'({pg} % 7)')} || '/page' || {s(pg)}"
    hasq = f"{k} % 3 = 0"
    return f"""CASE doc_id % 4
 WHEN 0 THEN 'http://' || {host} || {path}
   || (CASE WHEN {hasq} THEN '?b=' || {s(pg)} || '&a=1' ELSE '' END)
 WHEN 1 THEN 'HTTP://WWW.' || {host_uc} || ':80' || {path} || '/'
   || (CASE WHEN {hasq} THEN '?a=1&b=' || {s(pg)} ELSE '' END)
 WHEN 2 THEN 'https://' || {host_mixed} || ':443' || {path}
   || '?utm_source=feed&fbclid=fb' || {s(k)}
   || (CASE WHEN {hasq} THEN '&a=1&b=' || {s(pg)} ELSE '' END)
 ELSE 'http://' || {host} || {path}
   || (CASE WHEN {hasq} THEN '?a=1&utm_medium=email&b=' || {s(pg)} ELSE '' END)
   || '#sec' || {s(f'({k} % 5)')}
END"""


# the DuckDB replay of operators/curation.canonicalize_urls, as a CTE
# chain over a relation `raw(doc_id, url)`; the tracking-param
# predicate is the SAME string both engines compile.
def _duck_canon_ctes() -> str:
    from advisorydatapipeline_spark.operators.curation import (
        URL_TRACKING_PRED,
    )

    return f"""
c1 AS (
  SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS nofrag FROM raw
),
c2 AS (
  SELECT *, lower(regexp_extract(nofrag, '^([A-Za-z]+)://', 1)) AS scheme_raw,
         substr(nofrag, instr(nofrag, '://') + 3) AS rest
  FROM c1
),
c3 AS (
  SELECT *, instr(rest, '/') AS sl FROM c2
),
c4 AS (
  SELECT *,
         CASE WHEN sl > 0 THEN substr(rest, 1, sl - 1) ELSE rest END AS hostport,
         CASE WHEN sl > 0 THEN substr(rest, sl) ELSE '' END AS pathq
  FROM c3
),
c5 AS (
  SELECT *, instr(pathq, '?') AS qp, lower(hostport) AS hp FROM c4
),
c6 AS (
  SELECT *,
         CASE WHEN qp > 0 THEN substr(pathq, 1, qp - 1) ELSE pathq END AS path_raw,
         CASE WHEN qp > 0 THEN substr(pathq, qp + 1) ELSE '' END AS qs,
         instr(hp, ':') AS cp
  FROM c5
),
c7 AS (
  SELECT *,
         CASE WHEN cp > 0 THEN substr(hp, 1, cp - 1) ELSE hp END AS host0,
         CASE WHEN cp > 0 THEN substr(hp, cp + 1) ELSE '' END AS port
  FROM c6
),
c8 AS (
  SELECT *,
         CASE WHEN host0 LIKE 'www.%' THEN substr(host0, 5) ELSE host0 END AS host,
         CASE WHEN port = '' OR (scheme_raw = 'http' AND port = '80')
                OR (scheme_raw = 'https' AND port = '443') THEN ''
              ELSE ':' || port END AS portpart,
         CASE WHEN scheme_raw IN ('http', 'https') THEN 'https'
              ELSE scheme_raw END AS scheme,
         CASE WHEN regexp_replace(path_raw, '/+$', '') = '' THEN '/'
              ELSE regexp_replace(path_raw, '/+$', '') END AS npath,
         COALESCE(array_to_string(list_sort(list_filter(
           string_split(qs, '&'),
           x -> NOT ({URL_TRACKING_PRED}))), '&'), '') AS nq
  FROM c7
),
canon AS (
  SELECT doc_id, url, host,
         scheme || '://' || host || portpart || npath ||
           CASE WHEN nq = '' THEN '' ELSE '?' || nq END AS canonical_url,
         regexp_extract(host, '([^.]+[.][^.]+)$', 1) AS domain
  FROM c8
)"""


@query(
    "url_canonical_dedup",
    oracle=f"""
WITH raw AS (
  SELECT doc_id, {_url_fixture_sql('//', 'VARCHAR')} AS url FROM documents
),
{_duck_canon_ctes()[1:]}
SELECT doc_id, url, canonical_url, domain,
       CAST(min(doc_id) OVER (PARTITION BY canonical_url) AS BIGINT)
         AS keeper_doc_id,
       doc_id != min(doc_id) OVER (PARTITION BY canonical_url) AS is_dup
FROM canon
""",
)
def url_canonical_dedup(spark, sf_dir):
    """Canonical-URL exact dedup — the first stage of every web-corpus
    pipeline: canonicalize (operators/curation.canonicalize_urls:
    case/port/www/scheme folds, fragment + tracking-param strip,
    param sort, trailing-slash trim), then keep the minimum doc_id
    per canonical URL. Emits the full per-doc verdict (keeper id +
    is_dup), not just the survivors, so downstream stages can audit
    what was dropped and why.

    Scale (100 TB): canonicalization is a map-only codegen pass fused
    into the scan; the dedup is ONE shuffle keyed on canonical_url —
    a high-cardinality, well-distributed key (no salting needed).
    Window min, not groupBy+join: the same shuffle serves both the
    keeper choice and the per-doc verdict."""
    from pyspark.sql import Window

    from advisorydatapipeline_spark.operators.curation import (
        canonicalize_urls,
    )

    raw = load(spark, sf_dir, "documents").selectExpr(
        "doc_id", _url_fixture_sql("DIV", "STRING") + " AS url"
    )
    canon = canonicalize_urls(raw).select(
        "doc_id", "url", "canonical_url", "domain"
    )
    w = Window.partitionBy("canonical_url")
    return canon.select(
        "doc_id",
        "url",
        "canonical_url",
        "domain",
        F.min("doc_id").over(w).cast("long").alias("keeper_doc_id"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_dup"),
    )


@query(
    "domain_quota_retention",
    oracle=f"""
WITH raw AS (
  SELECT doc_id, {_url_fixture_sql('//', 'VARCHAR')} AS url FROM documents
),
{_duck_canon_ctes()[1:]},
keep AS (
  SELECT doc_id, canonical_url, domain,
         min(doc_id) OVER (PARTITION BY canonical_url) AS keeper
  FROM canon
),
ranked AS (
  SELECT canonical_url,
         CAST(row_number() OVER (
           PARTITION BY domain
           ORDER BY {DUCK_HASH64.format(x=f"'{_URLQ_SALT}' || canonical_url")},
                    canonical_url) AS BIGINT) AS url_rank
  FROM keep WHERE doc_id = keeper
)
SELECT k.doc_id, k.domain, k.canonical_url, r.url_rank,
       CASE WHEN k.domain IN {_URL_BLOCKLIST} THEN 'blocked_domain'
            WHEN k.doc_id != k.keeper THEN 'duplicate_url'
            WHEN r.url_rank > {_URL_QUOTA} THEN 'over_quota'
            ELSE 'keep' END AS reason,
       (k.domain NOT IN {_URL_BLOCKLIST} AND k.doc_id = k.keeper
        AND r.url_rank <= {_URL_QUOTA}) AS kept
FROM keep k JOIN ranked r ON r.canonical_url = k.canonical_url
""",
)
def domain_quota_retention(spark, sf_dir):
    """The per-document KEEP/DROP verdict that composes the three
    domain-level web-corpus gates in precedence order: blocked domain
    (literal blocklist on the registered domain) > duplicate URL
    (non-keeper under canonical-URL dedup) > domain quota (at most
    {2} canonical pages per domain, chosen by deterministic md5 rank
    exactly like source_quota_cap) > keep. One row per doc with the
    reason string — the auditable retention report a curation run
    ships alongside the surviving corpus.

    Scale (100 TB): canonicalize is map-only; keeper window is one
    shuffle on canonical_url; the rank window runs on the KEEPER
    subset only (one row per canonical URL) shuffled by domain —
    domains are the skew risk, but the ranked relation carries
    24-byte rows, and the rank-back join is keyed on canonical_url,
    co-partitioned with the first window's output."""
    from pyspark.sql import Window

    from advisorydatapipeline_spark.operators.curation import (
        canonicalize_urls,
    )
    from advisorydatapipeline_spark.functions.text import hash64

    raw = load(spark, sf_dir, "documents").selectExpr(
        "doc_id", _url_fixture_sql("DIV", "STRING") + " AS url"
    )
    # persist: the keeper relation feeds BOTH the rank branch and the
    # final join — without it the full canonicalize + window-min
    # subtree executes twice (measured: 4 scans, 0 reused exchanges,
    # 4.2s -> 1.6s at sf0.1). Same pattern as cdc_doc_coverage; the
    # gate harness clears caches between queries.
    keep = canonicalize_urls(raw).select(
        "doc_id",
        "canonical_url",
        "domain",
        F.min("doc_id")
        .over(Window.partitionBy("canonical_url"))
        .alias("keeper"),
    ).persist()
    ranked = (
        keep.filter(F.col("doc_id") == F.col("keeper"))
        .withColumn(
            "url_rank",
            F.row_number()
            .over(
                Window.partitionBy("domain").orderBy(
                    hash64(
                        F.concat(
                            F.lit(_URLQ_SALT), F.col("canonical_url")
                        )
                    ),
                    "canonical_url",
                )
            )
            .cast("long"),
        )
        .select("canonical_url", "url_rank")
    )
    blocked = F.col("domain").isin(*_URL_BLOCKLIST)
    return (
        keep.join(ranked, "canonical_url")
        .select(
            "doc_id",
            "domain",
            "canonical_url",
            "url_rank",
            F.when(blocked, "blocked_domain")
            .when(F.col("doc_id") != F.col("keeper"), "duplicate_url")
            .when(F.col("url_rank") > _URL_QUOTA, "over_quota")
            .otherwise("keep")
            .alias("reason"),
            (
                ~blocked
                & (F.col("doc_id") == F.col("keeper"))
                & (F.col("url_rank") <= _URL_QUOTA)
            ).alias("kept"),
        )
    )


# --- longest contaminated span (r11) ------------------------------------

_SPAN_K = 5  # anchor gram width; spans shorter than this are invisible


@query(
    "decontaminate_longest_span",
    oracle=f"""
WITH ev_src AS (
  SELECT doc_id AS src_id, {DUCK_TOKENS.format(x='text')} AS ets
  FROM documents WHERE doc_id % {_EVAL_MOD} = 0 AND doc_id < 485
),
planted AS (
  SELECT b.doc_id,
         CASE WHEN b.doc_id % {_EVAL_MOD} <> 0 AND b.doc_id % 7 = 3
              THEN b.text || ' ' ||
                   array_to_string(e.ets[4 : 8 + b.doc_id % 9], ' ')
              ELSE b.text END AS text
  FROM documents b
  LEFT JOIN ev_src e ON e.src_id = (b.doc_id % 5) * {_EVAL_MOD}
),
toks AS (
  SELECT doc_id, {DUCK_TOKENS.format(x='text')} AS ts FROM planted
),
grams AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         {DUCK_HASH64.format(x=f"array_to_string(ts[i:i+{_SPAN_K - 1}], ' ')")} AS gh
  FROM toks, unnest(generate_series(1, len(ts) - {_SPAN_K - 1})) AS u(i)
  WHERE len(ts) >= {_SPAN_K}
),
ev AS (
  SELECT doc_id AS eval_id, pos AS epos, gh FROM grams
  WHERE doc_id % {_EVAL_MOD} = 0
),
corp AS (
  SELECT doc_id, pos AS cpos, gh FROM grams
  WHERE doc_id % {_EVAL_MOD} <> 0
),
m AS (
  SELECT c.doc_id, e.eval_id, c.cpos, c.cpos - e.epos AS diff
  FROM corp c JOIN ev e USING (gh)
),
runs AS (
  SELECT *, cpos - row_number() OVER (
      PARTITION BY doc_id, eval_id, diff ORDER BY cpos) AS grp
  FROM m
),
spans AS (
  SELECT doc_id, eval_id, diff,
         CAST(min(cpos) AS BIGINT) AS span_start,
         CAST(count(*) + {_SPAN_K - 1} AS BIGINT) AS span_tokens
  FROM runs GROUP BY doc_id, eval_id, diff, grp
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
      ORDER BY span_tokens DESC, eval_id, span_start, diff) AS rn
  FROM spans
)
SELECT doc_id, eval_id, span_start, span_tokens FROM best WHERE rn = 1
""",
)
def decontaminate_longest_span(spark, sf_dir):
    """Suffix-style eval decontamination (r10 verdict item 3): the
    LONGEST contaminated token span per corpus doc against the eval
    slice (doc_id % {97} == 0), found by anchor-joining {5}-gram
    instances to the broadcast eval index and extending runs in-plan
    (constant cpos-epos alignment, gap-trick run grouping) — never an
    all-pairs doc comparison. decontaminate_overlap answers "does it
    overlap"; this answers "how badly" — the number a decontamination
    policy actually thresholds on (e.g. drop if >= 13 shared tokens,
    GPT-3 appendix C style).

    Fixture planting (pii_scrub pattern — the raw corpus has almost
    no natural 5-gram overlap): every non-eval doc with
    doc_id % 7 == 3 gets a 5-13-token slice of one of the first five
    eval docs appended, so the gate value-checks real span extension
    at every length in [K, K+8], not just the empty case."""
    from advisorydatapipeline_spark.operators.curation import (
        longest_contaminated_span,
        positional_grams,
    )

    docs = load(spark, sf_dir, "documents")
    ev_src = docs.filter(
        (F.col("doc_id") % _EVAL_MOD == 0) & (F.col("doc_id") < 485)
    ).select(F.col("doc_id").alias("src_id"), tokens("text").alias("ets"))
    planted = (
        docs.join(
            F.broadcast(ev_src),
            F.expr(f"src_id = (doc_id % 5) * {_EVAL_MOD}"),
            "left",
        )
        .select(
            "doc_id",
            F.expr(
                f"CASE WHEN doc_id % {_EVAL_MOD} <> 0 AND doc_id % 7 = 3"
                " THEN text || ' ' || array_join("
                "   slice(ets, 4, 5 + CAST(doc_id % 9 AS INT)), ' ')"
                " ELSE text END"
            ).alias("text"),
        )
    )
    grams = positional_grams(planted, "doc_id", "text", _SPAN_K)
    ev = grams.filter(F.col("doc_id") % _EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_id"),
        F.col("pos").alias("epos"),
        "gh",
    )
    corp = grams.filter(F.col("doc_id") % _EVAL_MOD != 0).select(
        "doc_id", F.col("pos").alias("cpos"), "gh"
    )
    return longest_contaminated_span(corp, ev, _SPAN_K)


# --- Unicode NFC normalization (r11) -----------------------------------

# planted prefix: decomposed e+COMBINING ACUTE (composes under NFC),
# FULLWIDTH DIGIT ONE (NFKC-only — must survive NFC unchanged, the
# negative control), precomposed U+00E9 (already NFC)
_NFC_PLANT_DUCK = (
    "'Cafe' || chr(769) || ' ' || chr(65297) || ' ' || chr(233) || ' '"
)
_NFC_PLANT_PY = "Café １ é "


@query(
    "unicode_normalize_stats",
    oracle=f"""
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN {_NFC_PLANT_DUCK} || text ELSE text END AS t
  FROM documents
)
SELECT doc_id,
       nfc_normalize(t) AS norm_text,
       nfc_normalize(t) <> t AS changed,
       CAST(length(t) AS BIGINT) AS chars_before,
       CAST(length(nfc_normalize(t)) AS BIGINT) AS chars_after
FROM raw
""",
)
def unicode_normalize_stats(spark, sf_dir):
    """Unicode NFC canonicalization with before/after stats
    (operators/curation.nfc_normalize_stats): every 3rd doc gets a
    planted prefix holding a DECOMPOSED accent (must compose, code
    point count drops by one), a FULLWIDTH digit (NFKC-only — must
    survive NFC, the negative control), and a precomposed accent
    (already canonical). Python unicodedata and DuckDB nfc_normalize
    both implement the Unicode standard algorithm, so this Python hop
    is fully value-gated — changed/chars columns pin the composition
    arithmetic, norm_text pins the bytes."""
    from advisorydatapipeline_spark.operators.curation import (
        nfc_normalize_stats,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(_NFC_PLANT_PY), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return nfc_normalize_stats(docs, "doc_id", "text")


# --- DoReMi-style domain reweighting (r11) --------------------------------

DOREMI_ETA_PPM = 100_000  # multiplicative-weights learning rate (0.1)
DOREMI_EPS_PPM = 10_000  # uniform smoothing mass (1%)
_DRM_TOK = (
    "len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),"
    " x -> x <> ''))"
)


def _doremi_sql(idiv: str, tokexpr: str) -> str:
    return f"""
WITH d AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum({tokexpr}) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
ref AS (
  SELECT CAST(sum(n_tokens) * 1000 {idiv} sum(n_docs) AS BIGINT)
           AS ref_milli,
         CAST(count(*) AS BIGINT) AS k
  FROM d
),
e AS (
  SELECT d.source, d.n_docs,
         CAST(d.n_tokens * 1000 {idiv} d.n_docs AS BIGINT)
           AS mean_tok_milli,
         GREATEST(CAST((d.n_tokens * 1000 {idiv} d.n_docs
           - ref.ref_milli) * 1000000 {idiv} ref.ref_milli
           AS BIGINT), 0) AS excess_ppm,
         ref.k
  FROM d CROSS JOIN ref
),
w AS (
  SELECT source, n_docs, mean_tok_milli, excess_ppm, k,
         CAST(1000000 + {DOREMI_ETA_PPM} * excess_ppm {idiv} 1000000
              AS BIGINT) AS mult_ppm
  FROM e
),
nrm AS (
  SELECT CAST(sum(mult_ppm) AS BIGINT) AS total FROM w
)
SELECT w.source, w.n_docs, w.mean_tok_milli, w.excess_ppm, w.mult_ppm,
       CAST((1000000 - {DOREMI_EPS_PPM})
            * (w.mult_ppm * 1000000 {idiv} nrm.total) {idiv} 1000000
            + {DOREMI_EPS_PPM} {idiv} w.k AS BIGINT) AS weight_ppm
FROM w CROSS JOIN nrm
"""


@query("doremi_domain_reweight", oracle=_doremi_sql("//", _DRM_TOK))
def doremi_domain_reweight(spark, sf_dir):
    """One DoReMi-style domain-reweighting step (Xie et al. 2023:
    boost domains with positive excess loss via multiplicative
    weights, then smooth toward uniform). The excess-loss proxy is a
    REAL corpus statistic — each domain's mean tokens-per-doc above
    the corpus mean, in ppm of the corpus mean (clipped at 0, as
    DoReMi clips excess loss) — and the update is the LINEARIZED
    multiplicative-weights rule w * (1 + eta * excess), which keeps
    every step BIGINT-exact (exp() would drift between engines; for
    eta*excess << 1 the linearization is the same first-order
    update). Final weights renormalize and mix in eps uniform mass —
    DoReMi's smoothing term — summing to ~1e6 ppm across domains.

    Scale (100 TB): one partial-agg shuffle onto k domains; the
    corpus-mean and normalization scalars ride 1-row broadcast cross
    joins. Everything after the first agg is k-row arithmetic."""
    from advisorydatapipeline_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents").select(
        "source", F.size(tokens("text")).cast("long").alias("n_tok")
    )
    docs.createOrReplaceTempView("_drm_docs")
    sql = _doremi_sql("DIV", "n_tok").replace(
        "FROM documents GROUP BY source",
        "FROM _drm_docs GROUP BY source",
    )
    return spark.sql(sql)


# --- UniMax epoch-capped mixing (r12) -------------------------------------

_UNIMAX_EPOCHS = 3  # per-source repeat cap
_UNIMAX_BUDGET_X = 2  # training budget = 2x the unique-token corpus


@query(
    "unimax_epoch_mix",
    oracle=f"""
WITH tok AS (
  SELECT source,
         CAST(len({DUCK_TOKENS.format(x='text')}) AS BIGINT) AS nt
  FROM documents
),
per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(nt) AS BIGINT) AS tokens_total,
         CAST(sum(nt) * {_UNIMAX_EPOCHS} AS BIGINT) AS capacity
  FROM tok GROUP BY source
),
tot AS (
  SELECT CAST(CAST(sum(tokens_total) AS BIGINT) * {_UNIMAX_BUDGET_X}
              AS BIGINT) AS b
  FROM per_src
),
rk AS (
  SELECT p.source, p.capacity, t.b,
         row_number() OVER (ORDER BY capacity, source) AS rn,
         COALESCE(CAST(sum(capacity) OVER (
             ORDER BY capacity, source
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS BIGINT), 0) AS cum,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM per_src p CROSS JOIN tot t
),
lv AS (
  SELECT max(LEAST(GREATEST(b - cum, 0) // (n - rn + 1), capacity))
           AS c
  FROM rk
)
SELECT p.source, p.n_docs, p.tokens_total, p.capacity,
       CAST(LEAST(p.capacity, l.c) AS BIGINT) AS tokens_alloc,
       CAST(LEAST(p.capacity, l.c) * 1000
            // GREATEST(p.tokens_total, 1) AS BIGINT) AS epochs_milli
FROM per_src p CROSS JOIN lv l
""",
)
def unimax_epoch_mix(spark, sf_dir):
    """UniMax mixing (Chung et al. 2023): spread the training budget
    as uniformly as possible across sources, but cap every source at
    {_UNIMAX_EPOCHS} epochs of its own data — the epoch cap is what
    separates UniMax from plain uniform (low-resource sources stop
    repeating before they overfit) and from proportional sampling
    (high-resource sources can't swallow the budget). The closed form
    is water-filling on CAPACITIES (epochs x tokens): alloc_s =
    min(capacity_s, level) with the unique maximal integer level
    fitting the budget — reusing waterfill_allocation
    (operators/curation.py), whose windows run on the tiny per-source
    table. epochs_milli = alloc * 1000 / tokens reports the realized
    repeat factor (1000 = one epoch, capped at {_UNIMAX_EPOCHS}000).

    Scale: the only corpus-sized work is the per-document token
    count, partial-aggregated to one row per source; everything
    after is k-row integer arithmetic."""
    from advisorydatapipeline_spark.functions.text import tokens
    from advisorydatapipeline_spark.operators.curation import (
        waterfill_allocation,
    )

    docs = load(spark, sf_dir, "documents")
    per_src = (
        docs.select(
            "source", F.size(tokens("text")).cast("long").alias("nt")
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("tokens_total"),
        )
        .withColumn(
            "capacity",
            F.expr(f"tokens_total * {_UNIMAX_EPOCHS}").cast("long"),
        )
    )
    total = per_src.agg(
        F.expr(
            f"CAST(sum(tokens_total) AS LONG) * {_UNIMAX_BUDGET_X}"
        ).alias("b")
    )
    per = per_src.crossJoin(F.broadcast(total))
    out = waterfill_allocation(per, "source", "capacity", F.col("b"))
    return out.select(
        "source",
        "n_docs",
        "tokens_total",
        "capacity",
        F.col("alloc").alias("tokens_alloc"),
        F.expr(
            "CAST(alloc * 1000 DIV GREATEST(tokens_total, 1)"
            " AS BIGINT)"
        ).alias("epochs_milli"),
    )


# --- T5 span-corruption planning (r12) -------------------------------------

_SC_RATE_PCT = 15  # corruption rate (T5 default 15%)
_SC_MEAN_SPAN = 3  # mean corrupted-span length
_SC_PACK = 128  # encoder packing bucket width


@query(
    "span_corruption_plan",
    oracle=f"""
WITH tok AS (
  SELECT doc_id,
         CAST(len({DUCK_TOKENS.format(x='text')}) AS BIGINT) AS n_tok
  FROM documents
)
SELECT doc_id, n_tok,
       CAST(n_tok * {_SC_RATE_PCT} // 100 AS BIGINT) AS n_corrupt,
       CAST((n_tok * {_SC_RATE_PCT} // 100 + {_SC_MEAN_SPAN - 1})
            // {_SC_MEAN_SPAN} AS BIGINT) AS n_spans,
       CAST(n_tok - n_tok * {_SC_RATE_PCT} // 100
            + (n_tok * {_SC_RATE_PCT} // 100 + {_SC_MEAN_SPAN - 1})
              // {_SC_MEAN_SPAN} AS BIGINT) AS enc_len,
       CAST(n_tok * {_SC_RATE_PCT} // 100
            + (n_tok * {_SC_RATE_PCT} // 100 + {_SC_MEAN_SPAN - 1})
              // {_SC_MEAN_SPAN} + 1 AS BIGINT) AS dec_len,
       CAST(((n_tok - n_tok * {_SC_RATE_PCT} // 100
            + (n_tok * {_SC_RATE_PCT} // 100 + {_SC_MEAN_SPAN - 1})
              // {_SC_MEAN_SPAN}) + {_SC_PACK - 1}) // {_SC_PACK}
            * {_SC_PACK} AS BIGINT) AS pack_bucket
FROM tok
""",
)
def span_corruption_plan(spark, sf_dir):
    """T5 span-corruption budgeting (Raffel et al. 2020): per
    document, how the {_SC_RATE_PCT}% corruption rate and
    mean-span-{_SC_MEAN_SPAN} noising turn n_tok source tokens into
    encoder/decoder sequence lengths — n_corrupt tokens drop out,
    each of the ceil(n_corrupt/{_SC_MEAN_SPAN}) spans leaves one
    sentinel on the encoder side and gains one on the decoder side
    (plus EOS). The pack_bucket column rounds the encoder length up
    to the {_SC_PACK}-token packing lane the batch planner
    (length_bucket_batching / sequence_packing) consumes — this
    entry is the seq2seq sizing step those entries assume. All
    integer floor/ceil arithmetic, identical in both engines.

    Scale: tokenize + per-row arithmetic — map-only, zero shuffle."""
    from advisorydatapipeline_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tok")
    )
    r, m, pk = _SC_RATE_PCT, _SC_MEAN_SPAN, _SC_PACK
    nc = f"n_tok * {r} DIV 100"
    ns = f"({nc} + {m - 1}) DIV {m}"
    return docs.selectExpr(
        "doc_id",
        "n_tok",
        f"CAST({nc} AS BIGINT) AS n_corrupt",
        f"CAST({ns} AS BIGINT) AS n_spans",
        f"CAST(n_tok - {nc} + {ns} AS BIGINT) AS enc_len",
        f"CAST({nc} + {ns} + 1 AS BIGINT) AS dec_len",
        f"CAST(((n_tok - {nc} + {ns}) + {pk - 1}) DIV {pk}"
        f" * {pk} AS BIGINT) AS pack_bucket",
    )


# --- dataset cartography (r14) ----------------------------------------

_CARTO_EPOCHS = 6
_CARTO_M1 = 2654435761  # Knuth multiplicative (house mix stream 1)
_CARTO_AMBIG_PPM = 150_000  # variability threshold
_CARTO_CONF_PPM = 500_000  # confidence threshold


def _carto_mix(expr: str, idiv: str) -> str:
    """Overflow-safe 2^31 double mix (the mp3_huffman lesson: the raw
    index varies in LOW bits here, but the second round costs nothing
    and keeps every fixture on the same discipline). ``idiv`` is the
    engine's integer-division token (Spark DIV / DuckDB //) — all
    operands are non-negative, so floor == truncate."""
    m1 = f"((({expr}) % 2147483648) * {_CARTO_M1} % 2147483648)"
    return (
        f"(({m1} {idiv} 65536 + {m1}) % 2147483648)"
        f" * {_CARTO_M1} % 2147483648"
    )


def _carto_sql() -> str:
    p = f"({_carto_mix('doc_id * 8 + e.e', '//')} % 1000001)"
    sq = "CAST(floor(sqrt(CAST(var_num AS DOUBLE))) AS BIGINT)"
    return f"""
WITH obs AS (
  SELECT d.doc_id, e.e, CAST({p} AS BIGINT) AS p_ppm
  FROM documents d, range({_CARTO_EPOCHS}) e(e)
),
agg AS (
  SELECT doc_id,
         CAST(sum(p_ppm) AS BIGINT) AS sum_p,
         CAST(sum(p_ppm * p_ppm) AS BIGINT) AS sum_p2,
         CAST(sum(CASE WHEN p_ppm > {_CARTO_CONF_PPM} THEN 1 ELSE 0
              END) AS BIGINT) AS n_correct
  FROM obs GROUP BY 1
),
v AS (
  SELECT *, {_CARTO_EPOCHS} * sum_p2 - sum_p * sum_p AS var_num
  FROM agg
),
s AS (
  SELECT *,
         (CASE WHEN ({sq} + 1) * ({sq} + 1) <= var_num THEN {sq} + 1
               WHEN {sq} * {sq} > var_num THEN {sq} - 1
               ELSE {sq} END) AS sd_num
  FROM v
),
m AS (
  SELECT doc_id,
         CAST(sum_p // {_CARTO_EPOCHS} AS BIGINT) AS confidence_ppm,
         CAST(sd_num // {_CARTO_EPOCHS} AS BIGINT) AS variability_ppm,
         CAST(n_correct * 1000000 // {_CARTO_EPOCHS} AS BIGINT)
           AS correctness_ppm
  FROM s
)
SELECT doc_id, confidence_ppm, variability_ppm, correctness_ppm,
       CASE WHEN variability_ppm >= {_CARTO_AMBIG_PPM} THEN 'ambiguous'
            WHEN confidence_ppm >= {_CARTO_CONF_PPM} THEN 'easy'
            ELSE 'hard' END AS region
FROM m
"""


@query("dataset_cartography", oracle=_carto_sql())
def dataset_cartography(spark, sf_dir):
    """Dataset cartography (Swayamdipta et al. 2020, "Dataset
    Cartography: Mapping and Diagnosing Datasets with Training
    Dynamics"): per training example, the gold-label probability is
    tracked across epochs and summarized as CONFIDENCE (mean),
    VARIABILITY (population std) and CORRECTNESS (fraction of epochs
    above chance), then mapped into the easy-to-learn /
    hard-to-learn / AMBIGUOUS regions — the ambiguous band is the
    one worth keeping for data selection, the hard band is where
    label errors concentrate. The per-epoch probabilities are a
    mix-derived fixture (a real run logs them from training);
    everything downstream is the real cartography computation.

    Integer-exact: confidence = sum_p DIV E; variability reuses the
    GRPO floor-sqrt identity std = isqrt(E*sum_p2 - sum_p^2) / E
    (var_num <= E^2 * 1e12 << 2^52, so the DOUBLE conversion is
    exact and the one-step bracket correction makes floor-sqrt
    exact in both engines); region thresholds are integer ppm.

    Scale: the epoch dimension is a map-side explode (E rows per
    example, no shuffle); ONE hash aggregation keyed on example.
    100 TB: examples partition freely; nothing is global."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    e = _CARTO_EPOCHS
    obs = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(e - 1))).alias("e"),
    ).select(
        "doc_id",
        F.expr(
            f"CAST({_carto_mix('doc_id * 8 + e', 'DIV')} % 1000001"
            " AS BIGINT)"
        ).alias("p_ppm"),
    )
    agg = obs.groupBy("doc_id").agg(
        F.sum("p_ppm").cast("long").alias("sum_p"),
        F.sum(F.col("p_ppm") * F.col("p_ppm")).cast("long").alias(
            "sum_p2"
        ),
        F.sum((F.col("p_ppm") > _CARTO_CONF_PPM).cast("long"))
        .cast("long")
        .alias("n_correct"),
    )
    sq = "CAST(floor(sqrt(CAST(var_num AS DOUBLE))) AS BIGINT)"
    m = agg.withColumn(
        "var_num",
        F.expr(f"{e} * sum_p2 - sum_p * sum_p"),
    ).select(
        "doc_id",
        F.expr(f"CAST(sum_p DIV {e} AS BIGINT)").alias(
            "confidence_ppm"
        ),
        F.expr(
            f"CAST((CASE WHEN ({sq} + 1) * ({sq} + 1) <= var_num "
            f"THEN {sq} + 1 WHEN {sq} * {sq} > var_num "
            f"THEN {sq} - 1 ELSE {sq} END) DIV {e} AS BIGINT)"
        ).alias("variability_ppm"),
        F.expr(
            f"CAST(n_correct * 1000000 DIV {e} AS BIGINT)"
        ).alias("correctness_ppm"),
    )
    return m.select(
        "doc_id",
        "confidence_ppm",
        "variability_ppm",
        "correctness_ppm",
        F.expr(
            f"CASE WHEN variability_ppm >= {_CARTO_AMBIG_PPM} "
            f"THEN 'ambiguous' "
            f"WHEN confidence_ppm >= {_CARTO_CONF_PPM} THEN 'easy' "
            f"ELSE 'hard' END"
        ).alias("region"),
    )


# --- packing cross-document attention audit (r15) ---------------------


@query(
    "packing_crossdoc_attention",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len({DUCK_TOKENS.format(x='text')}) AS BIGINT) AS n_tokens
  FROM documents
),
s AS (
  SELECT doc_id, lang, n_tokens,
         CAST(sum(n_tokens) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_tokens AS BIGINT) AS st
  FROM t
),
seg AS (
  SELECT s.lang, u.k AS seq_id,
         LEAST({CTX_TOKENS} * (u.k + 1), s.st + s.n_tokens)
           - GREATEST({CTX_TOKENS} * u.k, s.st) AS seg_len
  FROM s, unnest(generate_series(
         s.st // {CTX_TOKENS},
         (s.st + s.n_tokens - 1) // {CTX_TOKENS})) AS u(k)
  WHERE s.n_tokens > 0
)
SELECT lang, CAST(seq_id AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(seg_len) AS BIGINT) AS seq_tokens,
       CAST((sum(seg_len) * sum(seg_len)
             - sum(seg_len * seg_len)) // 2 AS BIGINT)
         AS polluted_pairs,
       CAST(sum(seg_len) * (sum(seg_len) - 1) // 2 AS BIGINT)
         AS total_pairs,
       CAST(((sum(seg_len) * sum(seg_len)
              - sum(seg_len * seg_len)) // 2) * 1000000
            // GREATEST(sum(seg_len) * (sum(seg_len) - 1) // 2, 1)
            AS BIGINT) AS polluted_ppm
FROM seg
GROUP BY 1, 2
""",
)
def packing_crossdoc_attention(spark, sf_dir):
    """Cross-document attention pollution audit for concat-and-chop
    packing (the reason modern packed-training stacks reset attention
    masks at document boundaries — e.g. the flash-attn varlen /
    document-mask practice): for every packed {512}-token training
    sequence produced by the `sequence_packing` assignment, count the
    causal attention pairs that CROSS a document boundary. With
    per-doc segment lengths l_i inside a sequence of S tokens, the
    polluted pair count is exactly (S^2 - sum l_i^2) / 2 and the
    causal total is S*(S-1)/2 — reported with an integer-ppm
    pollution rate. Composed entry: reuses the packing window's
    per-doc start offsets, then explodes each doc onto the sequences
    it spans (sequence() over the covered seq_id range; a doc
    contributes one fixed-width segment row per spanned sequence).

    Scale: the packing window is the existing per-lang prefix-sum
    shuffle; the segment explode adds ~(1 + L/CTX) rows per doc that
    partial-agg down to one row per packed sequence. All BIGINT
    (S <= {512} bounds every product); no driver-side anything."""
    from advisorydatapipeline_spark.functions.text import tokens
    from advisorydatapipeline_spark.operators.curation import (
        pack_sequences,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(tokens("text")).cast("long").alias("n_tokens"),
    )
    packed = pack_sequences(
        docs, "lang", "doc_id", "n_tokens", ctx_tokens=CTX_TOKENS
    )
    st = packed.select(
        "lang",
        "n_tokens",
        (
            F.col("seq_id") * CTX_TOKENS + F.col("seq_offset")
        ).alias("st"),
    ).filter(F.col("n_tokens") > 0)
    seg = st.select(
        "lang",
        F.explode(
            F.sequence(
                F.expr(f"st DIV {CTX_TOKENS}"),
                F.expr(f"(st + n_tokens - 1) DIV {CTX_TOKENS}"),
            )
        ).alias("seq_id"),
        "st",
        "n_tokens",
    ).select(
        "lang",
        "seq_id",
        (
            F.least(
                F.lit(CTX_TOKENS) * (F.col("seq_id") + 1),
                F.col("st") + F.col("n_tokens"),
            )
            - F.greatest(
                F.lit(CTX_TOKENS) * F.col("seq_id"), F.col("st")
            )
        ).alias("seg_len"),
    )
    return seg.groupBy("lang", "seq_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("seg_len").cast("long").alias("seq_tokens"),
        F.expr(
            "CAST((sum(seg_len) * sum(seg_len)"
            " - sum(seg_len * seg_len)) DIV 2 AS BIGINT)"
        ).alias("polluted_pairs"),
        F.expr(
            "CAST(sum(seg_len) * (sum(seg_len) - 1) DIV 2 AS BIGINT)"
        ).alias("total_pairs"),
        F.expr(
            "CAST(((sum(seg_len) * sum(seg_len)"
            " - sum(seg_len * seg_len)) DIV 2) * 1000000"
            " DIV GREATEST(sum(seg_len) * (sum(seg_len) - 1) DIV 2,"
            " 1) AS BIGINT)"
        ).alias("polluted_ppm"),
    ).select(
        "lang", F.col("seq_id").cast("long").alias("seq_id"),
        "n_segments", "seq_tokens", "polluted_pairs", "total_pairs",
        "polluted_ppm",
    )
