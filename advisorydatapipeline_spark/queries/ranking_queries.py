"""Corpus ranking / profiling queries with DuckDB oracles.

TF-IDF term extraction, span-duplication profiling, deterministic
train/val/test splitting, and length histograms over ``documents`` —
the statistics half of a training-data curation stack.

Oracle-portability notes:
- IDF is integer-scaled (BIGINT ``DIV``) — float ``log()`` differs in
  the last ulp across engines and can flip top-k ranks.
- The split hash is the portable md5-derived ``hash64`` (same as the
  stratified sampler), never engine-private murmur/xxhash.
- Histogram buckets are pure integer division.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.operators.ranking import (
    IDF_SCALE,
    span_dup_profile,
    tfidf_topk,
)
from advisorydatapipeline_spark.functions.text import hash64
from advisorydatapipeline_spark.queries.dedup_queries import (
    DUCK_HASH64,
    DUCK_SHINGLES,
    DUCK_TOKENS,
)
from advisorydatapipeline_spark.queries.helpers import load
from advisorydatapipeline_spark.registry import query

TFIDF_K = 5


@query(
    "tfidf_top_terms",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({DUCK_TOKENS.format(x='text')}) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         t.tf * ((n.n * {IDF_SCALE}) // d.df) AS score
  FROM tf t JOIN dfreq d USING (term), n
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term) AS INT) AS rn
  FROM scored
)
SELECT doc_id, term, tf, df, score, rn
FROM ranked WHERE rn <= {TFIDF_K}
""",
)
def tfidf_top_terms(spark, sf_dir):
    """Top-5 TF-IDF terms per doc. Integer-scaled idf
    (``tf * ((N*1e6) DIV df)``) keeps ranking bit-identical across
    engines; the corpus-size scalar arrives via a broadcast 1-row
    aggregate, not a collect."""
    return tfidf_topk(
        load(spark, sf_dir, "documents"), "doc_id", "text", k=TFIDF_K
    )


HOT_DF = 4


@query(
    "dup_span_fraction",
    oracle=f"""
WITH {DUCK_SHINGLES},
dfreq AS (
  SELECT shingle, CAST(count(*) AS BIGINT) AS doc_freq FROM sh GROUP BY 1
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN d.doc_freq >= {HOT_DF} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hot,
       CAST(sum(CASE WHEN d.doc_freq >= {HOT_DF} THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS hot_frac
FROM sh s JOIN dfreq d USING (shingle)
GROUP BY s.doc_id
""",
)
def dup_span_fraction(spark, sf_dir):
    """Per-doc duplicated-span profile: fraction of distinct 3-gram
    shingles shared with >=4 docs corpus-wide (Lee et al. span-dup
    detection). Flags boilerplate that exact/near dedup misses."""
    return span_dup_profile(
        load(spark, sf_dir, "documents"), "doc_id", "text", n=3, hot_df=HOT_DF
    )


_SPLIT_SALT = "split#1"
TRAIN_PCT, VAL_PCT = 80, 10  # test gets the remainder


@query(
    "split_assignment",
    oracle=f"""
WITH assigned AS (
  SELECT lang, n_chars,
         CASE
           WHEN {DUCK_HASH64.format(x=f"'{_SPLIT_SALT}' || CAST(doc_id AS VARCHAR)")} % 100
                < {TRAIN_PCT} THEN 'train'
           WHEN {DUCK_HASH64.format(x=f"'{_SPLIT_SALT}' || CAST(doc_id AS VARCHAR)")} % 100
                < {TRAIN_PCT + VAL_PCT} THEN 'val'
           ELSE 'test'
         END AS split
  FROM documents
)
SELECT split, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM assigned GROUP BY 1, 2
""",
)
def split_assignment(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment by portable
    md5-hash bucket (reproducible across runs, partitionings, and
    engines — rand() is none of those), validated by per-split
    per-language counts. Filter+agg only: the assignment itself is a
    narrow per-row expression that pipelines inside the scan."""
    docs = load(spark, sf_dir, "documents")
    b = hash64(
        F.concat(F.lit(_SPLIT_SALT), F.col("doc_id").cast("string"))
    ) % 100
    split = (
        F.when(b < TRAIN_PCT, F.lit("train"))
        .when(b < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


BUCKET_CHARS, MAX_BUCKET = 64, 15


@query(
    "length_histogram",
    oracle=f"""
SELECT lang,
       LEAST(n_chars // {BUCKET_CHARS}, {MAX_BUCKET}) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY 1, 2
""",
)
def length_histogram(spark, sf_dir):
    """Doc-length histogram per language (64-char integer buckets,
    clamped tail) — the length-filter calibration step of a curation
    pipeline. Single partial-aggregated shuffle on (lang, bucket)."""
    docs = load(spark, sf_dir, "documents")
    bucket = F.expr(f"LEAST(n_chars DIV {BUCKET_CHARS}, {MAX_BUCKET})")
    return (
        docs.select("lang", bucket.alias("bucket"), "n_chars")
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )


# target language mix (percent) for the training blend and the share
# of the corpus token budget to spend
MIX_WEIGHTS = {"en": 40, "de": 25, "es": 20, "fr": 15}
BUDGET_NUM, BUDGET_DEN = 1, 2  # spend half the corpus tokens

_WEIGHT_SQL = (
    "CASE lang "
    + " ".join(f"WHEN '{lg}' THEN {w}" for lg, w in sorted(MIX_WEIGHTS.items()))
    + " ELSE 0 END"
)


@query(
    "training_mix_plan",
    oracle=f"""
WITH toks AS (
  SELECT lang,
         CAST(sum(len({DUCK_TOKENS.format(x='text')})) AS BIGINT)
           AS avail_tokens
  FROM documents GROUP BY 1
),
tot AS (SELECT CAST(sum(avail_tokens) AS BIGINT) AS total FROM toks)
SELECT t.lang, t.avail_tokens,
       ((x.total * {BUDGET_NUM} // {BUDGET_DEN}) * ({_WEIGHT_SQL}) // 100)
         AS target_tokens,
       least(t.avail_tokens,
             (x.total * {BUDGET_NUM} // {BUDGET_DEN}) * ({_WEIGHT_SQL}) // 100)
         AS expected_tokens,
       least(CAST(100 AS BIGINT),
             ((x.total * {BUDGET_NUM} // {BUDGET_DEN}) * ({_WEIGHT_SQL}) // 100)
               * 100 // t.avail_tokens) AS rate_pct
FROM toks t, tot x
""",
)
def training_mix_plan(spark, sf_dir):
    """Data-mix planner: given per-language available tokens, target
    mix weights, and a token budget (half the corpus), derive per-
    language sampling targets and integer keep-rates — the planning
    step before `sample_stratified` executes the mix. All BIGINT
    arithmetic; the corpus total arrives as a broadcast 1-row
    aggregate. Undersupplied languages cap at rate 100 (expected =
    available), oversupplied ones get a proportional down-rate."""
    from advisorydatapipeline_spark.functions.text import token_count

    docs = load(spark, sf_dir, "documents")
    toks = docs.groupBy("lang").agg(
        F.sum(token_count("text")).cast("long").alias("avail_tokens")
    )
    tot = toks.agg(F.sum("avail_tokens").cast("long").alias("total"))
    weight = F.lit(0)
    for lg, wt in sorted(MIX_WEIGHTS.items()):
        weight = F.when(F.col("lang") == lg, F.lit(wt)).otherwise(weight)
    j = toks.crossJoin(F.broadcast(tot)).withColumn(
        "target_tokens",
        F.expr(
            f"((total * {BUDGET_NUM}) DIV {BUDGET_DEN}) "
            f"* ({_WEIGHT_SQL}) DIV 100"
        ),
    )
    return j.select(
        "lang",
        "avail_tokens",
        "target_tokens",
        F.least("avail_tokens", "target_tokens").alias("expected_tokens"),
        F.least(
            F.lit(100).cast("long"),
            F.expr("(target_tokens * 100) DIV avail_tokens"),
        ).alias("rate_pct"),
    )


CAP_PER_GROUP = 8
_CAP_SALT = "cap#1"


@query(
    "sample_capped_per_group",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, lang, source,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang, source
           ORDER BY {DUCK_HASH64.format(x=f"'{_CAP_SALT}' || CAST(doc_id AS VARCHAR)")},
                    doc_id) AS INT) AS rn
  FROM documents
)
SELECT doc_id, lang, source, rn
FROM ranked WHERE rn <= {CAP_PER_GROUP}
""",
)
def sample_capped_per_group(spark, sf_dir):
    """Exact per-stratum caps (at most 8 docs per (lang, source)),
    chosen by deterministic hash order — the other half of sampling:
    `sample_stratified` keeps a *rate* per stratum, this keeps a
    *count* (what you need for eval-set construction and per-source
    quotas). One window shuffle on the stratum key; the hash order
    makes the kept set stable across runs and engines, unlike any
    rand()-based reservoir."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    h = hash64(
        F.concat(F.lit(_CAP_SALT), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("lang", "source").orderBy(h.asc(), F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", "source")
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= CAP_PER_GROUP)
    )


BM25_TERMS = ["join", "spark", "window"]
BM25_K = 10


def _bm25_oracle() -> str:
    from advisorydatapipeline_spark.operators.ranking import (
        BM25_B_S,
        BM25_IDF_SCALE,
        BM25_K1_S,
        BM25_S,
    )

    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH tokd AS (
  SELECT doc_id, {DUCK_TOKENS.format(x='text')} AS ts FROM documents
),
dl AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl FROM tokd),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(ts) AS term FROM tokd)
  WHERE term IN ({terms})
  GROUP BY 1, 2
),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
stats AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS sumdl
),
scored AS (
  SELECT tf.term, tf.doc_id, tf.tf, dl.dl, d.df,
         (tf.tf * ({BM25_K1_S} + {BM25_S})
            * ((s.n * {BM25_IDF_SCALE}) // d.df))
         // (tf.tf * {BM25_S}
             + ({BM25_K1_S} * (({BM25_S} - {BM25_B_S})
                + ({BM25_B_S} * dl.dl * {BM25_S})
                  // ((s.sumdl * {BM25_S}) // s.n))) // {BM25_S})
           AS score
  FROM tf JOIN dl USING (doc_id) JOIN dfreq d USING (term), stats s
)
SELECT term, doc_id, tf, dl, df, CAST(score AS BIGINT) AS score,
       CAST(rn AS INT) AS rn
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY term ORDER BY score DESC, doc_id ASC
  ) AS rn FROM scored
) WHERE rn <= {BM25_K}
"""


@query("bm25_doc_ranking", oracle=_bm25_oracle())
def bm25_doc_ranking(spark, sf_dir):
    """Search relevance over the corpus: top-10 documents per query
    term by integer fixed-point BM25 (k1=1.2, b=0.75; BIGINT-only
    arithmetic so ranks are engine-identical — see
    operators/ranking.bm25_topk). Query-term filter lands BEFORE the
    tf aggregation, so the wide stages only ever see matching rows."""
    from advisorydatapipeline_spark.operators.ranking import bm25_topk

    return bm25_topk(
        load(spark, sf_dir, "documents"), "doc_id", "text",
        BM25_TERMS, k=BM25_K,
    )


def _bm25_maxscore_oracle() -> str:
    from advisorydatapipeline_spark.operators.ranking import (
        BM25_B_S,
        BM25_IDF_SCALE,
        BM25_K1_S,
        BM25_S,
    )

    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH tokd AS (
  SELECT doc_id, {DUCK_TOKENS.format(x='text')} AS ts FROM documents
),
dl AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl FROM tokd),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(ts) AS term FROM tokd)
  WHERE term IN ({terms})
  GROUP BY 1, 2
),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
stats AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS sumdl
),
scored AS (
  SELECT tf.doc_id, tf.term,
         (tf.tf * ({BM25_K1_S} + {BM25_S})
            * ((s.n * {BM25_IDF_SCALE}) // d.df))
         // (tf.tf * {BM25_S}
             + ({BM25_K1_S} * (({BM25_S} - {BM25_B_S})
                + ({BM25_B_S} * dl.dl * {BM25_S})
                  // ((s.sumdl * {BM25_S}) // s.n))) // {BM25_S})
           AS score
  FROM tf JOIN dl USING (doc_id) JOIN dfreq d USING (term), stats s
),
u AS (SELECT term, CAST(max(score) AS BIGINT) AS u FROM scored
      GROUP BY term),
topterm AS (SELECT term FROM u ORDER BY u DESC, term ASC LIMIT 1),
facts AS (
  SELECT doc_id, CAST(sum(score) AS BIGINT) AS fscore,
         CAST(count(*) AS BIGINT) AS n_terms
  FROM scored GROUP BY doc_id
),
p1 AS (
  SELECT f.* FROM facts f
  WHERE f.doc_id IN (SELECT doc_id FROM scored
                     WHERE term = (SELECT term FROM topterm))
),
theta AS (
  SELECT CASE WHEN count(*) >= {BM25_MAXSCORE_K}
              THEN CAST(min(fscore) AS BIGINT) ELSE 0 END AS th
  FROM (SELECT fscore FROM p1
        ORDER BY fscore DESC, doc_id ASC LIMIT {BM25_MAXSCORE_K})
),
p2 AS (
  SELECT f.* FROM facts f
  JOIN (
    SELECT s.doc_id, CAST(sum(u.u) AS BIGINT) AS ub
    FROM scored s JOIN u USING (term)
    WHERE s.doc_id NOT IN (SELECT doc_id FROM p1)
    GROUP BY s.doc_id
  ) o ON o.doc_id = f.doc_id
  WHERE o.ub >= (SELECT th FROM theta)
),
cand AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
SELECT doc_id, n_terms, fscore, CAST(rn AS INT) AS rn,
       (SELECT CAST(count(*) AS BIGINT) FROM facts) AS n_matched,
       (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_scored
FROM (
  SELECT *, ROW_NUMBER() OVER (
    ORDER BY fscore DESC, doc_id ASC
  ) AS rn FROM cand
) WHERE rn <= {BM25_MAXSCORE_K}
"""


BM25_MAXSCORE_K = 10


@query("bm25_maxscore_topk", oracle=_bm25_maxscore_oracle())
def bm25_maxscore_topk_query(spark, sf_dir):
    """Disjunctive multi-term BM25 search with MaxScore dynamic
    pruning — exact top-k while fully scoring only the top-impact
    term's postings plus the docs whose per-term score ceilings could
    still reach the running threshold. The n_matched/n_scored audit
    columns quantify the pruning; at web-corpus scale this bound is
    what makes disjunctive search tractable (operators/ranking
    docstring has the invariant proof sketch)."""
    from advisorydatapipeline_spark.operators.ranking import (
        bm25_maxscore_topk,
    )

    return bm25_maxscore_topk(
        load(spark, sf_dir, "documents"), "doc_id", "text",
        BM25_TERMS, k=BM25_MAXSCORE_K,
    )


# --- hybrid-retrieval reciprocal-rank fusion (r14) --------------------

_RRF_C = 60  # the standard RRF constant (Cormack et al. 2009)
_RRF_POOL = 20  # per-arm candidate list depth
_RRF_K = 5  # fused results per query
_RRF_QMOD = 100  # query sample: doc_id % 100 == 0 (with an embedding)
_RRF_SCALE = 1_000_000_000  # floor(1e9/(C+rank)) per-arm contribution


def _rrf_oracle() -> str:
    toks = DUCK_TOKENS.format(x="text")
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest({toks}) AS term FROM documents
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY 1
),
e AS (
  SELECT vec_id, CAST({{q}} AS DOUBLE[]) AS v FROM embeddings
),
qs AS (
  SELECT d.doc_id AS query_id FROM documents d
  JOIN e ON e.vec_id = d.doc_id
  WHERE d.doc_id % {_RRF_QMOD} = 0
),
lex AS (
  SELECT qt.doc_id AS query_id, dt.doc_id,
         CAST(sum(n.n * 1000 // df.df) AS BIGINT) AS score
  FROM tok qt
  JOIN qs ON qs.query_id = qt.doc_id
  JOIN tok dt ON dt.term = qt.term AND dt.doc_id <> qt.doc_id
  JOIN df ON df.term = qt.term
  CROSS JOIN n
  GROUP BY 1, 2
),
lr AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
           ORDER BY score DESC, doc_id ASC) AS r
  FROM lex
),
dense AS (
  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         CAST(floor(1000000 * (list_dot_product(c.v, q.v)
           / sqrt(list_dot_product(c.v, c.v)
                  * list_dot_product(q.v, q.v)))) AS BIGINT) AS cm
  FROM e c
  JOIN e q ON q.vec_id % {_RRF_QMOD} = 0 AND c.vec_id <> q.vec_id
  JOIN qs ON qs.query_id = q.vec_id
),
dr AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
           ORDER BY cm DESC, doc_id ASC) AS r
  FROM dense
),
fused AS (
  SELECT COALESCE(l.query_id, d.query_id) AS query_id,
         COALESCE(l.doc_id, d.doc_id) AS doc_id,
         CAST(COALESCE(l.r, 0) AS BIGINT) AS lex_rank,
         CAST(COALESCE(d.r, 0) AS BIGINT) AS dense_rank,
         CAST(COALESCE({_RRF_SCALE} // ({_RRF_C} + l.r), 0)
              + COALESCE({_RRF_SCALE} // ({_RRF_C} + d.r), 0)
              AS BIGINT) AS rrf_scaled
  FROM (SELECT * FROM lr WHERE r <= {_RRF_POOL}) l
  FULL OUTER JOIN (SELECT * FROM dr WHERE r <= {_RRF_POOL}) d
    ON d.query_id = l.query_id AND d.doc_id = l.doc_id
)
SELECT query_id,
       CAST(row_number() OVER (PARTITION BY query_id
         ORDER BY rrf_scaled DESC, doc_id ASC) AS BIGINT) AS rnk,
       doc_id, rrf_scaled, lex_rank, dense_rank
FROM fused
QUALIFY rnk <= {_RRF_K}
""".replace("{q}", "list_transform(embedding, x -> CAST(floor("
            "CAST(x AS DOUBLE) * 1000) AS BIGINT))")


def _rrf_lex_ranks(docs, emb, spark_unused=None):
    """Shared lexical arm of the RRF family: inverted-index scoring
    of the query sample against the term postings (integer-scaled IDF
    N*1000 DIV df), per-query top-:data:`_RRF_POOL` ranks. Returns
    ``(qs, lr)`` — the query sample (query_id) and the ranked lexical
    candidates (query_id, doc_id, lex_r)."""
    from pyspark.sql import Window

    from advisorydatapipeline_spark.functions.text import tokens

    tok = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens("text"))).alias("term"),
    )
    n_df = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    qs = (
        docs.filter(F.col("doc_id") % _RRF_QMOD == 0)
        .join(emb.select(F.col("vec_id").alias("doc_id")), "doc_id")
        .select(F.col("doc_id").alias("query_id"))
    )
    df = tok.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    qtok = tok.join(
        qs.withColumnRenamed("query_id", "doc_id"), "doc_id"
    ).withColumnRenamed("doc_id", "query_id")
    lex = (
        qtok.join(df, "term")
        .crossJoin(F.broadcast(n_df))
        .select(
            "query_id",
            "term",
            F.expr("CAST(n * 1000 DIV df AS BIGINT)").alias("idf"),
        )
        .join(
            tok.withColumnRenamed("doc_id", "cand_id"), "term"
        )
        .filter(F.col("cand_id") != F.col("query_id"))
        .groupBy("query_id", F.col("cand_id").alias("doc_id"))
        .agg(F.sum("idf").cast("long").alias("score"))
    )
    wl = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    lr = (
        lex.withColumn("r", F.row_number().over(wl))
        .filter(F.col("r") <= _RRF_POOL)
        .select("query_id", "doc_id", F.col("r").alias("lex_r"))
    )
    return qs, lr


def _rrf_fuse(lr, dr):
    """Shared RRF fusion: full-outer-join the two per-query top-POOL
    arm lists, score sum_arms floor(SCALE/(C+rank)) — floored PER
    TERM so both engines add identical integers — and keep the fused
    top-:data:`_RRF_K` with both per-arm ranks (0 = arm missed)."""
    from pyspark.sql import Window

    fused = (
        lr.join(dr, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.coalesce("lex_r", F.lit(0)).cast("long").alias(
                "lex_rank"
            ),
            F.coalesce("dense_r", F.lit(0)).cast("long").alias(
                "dense_rank"
            ),
            (
                F.coalesce(
                    F.expr(f"{_RRF_SCALE} DIV ({_RRF_C} + lex_r)"),
                    F.lit(0),
                )
                + F.coalesce(
                    F.expr(f"{_RRF_SCALE} DIV ({_RRF_C} + dense_r)"),
                    F.lit(0),
                )
            ).cast("long").alias("rrf_scaled"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("rrf_scaled").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= _RRF_K)
        .select("query_id", "rnk", "doc_id", "rrf_scaled",
                "lex_rank", "dense_rank")
    )


@query("rrf_fusion_topk", oracle=_rrf_oracle())
def rrf_fusion_topk(spark, sf_dir):
    """Hybrid-retrieval reciprocal-rank fusion (Cormack et al. 2009;
    the standard lexical+dense fusion in 2024 RAG stacks): a LEXICAL
    arm (inverted-index shared-term scoring with integer-scaled IDF
    N*1000 DIV df — no float log, the module's rank-portability
    rule) and a DENSE arm (quantized-integer cosine in floor'd
    micros, the clip discipline) each produce a top-20 candidate
    list per query; fusion scores each candidate
    sum_arms floor(1e9 / (60 + rank)) — floored PER TERM so both
    engines add identical integers — and the fused top-5 ships with
    both per-arm ranks (0 = arm missed it), the explainability a
    hybrid stack needs.

    Like the recall gauges, the dense arm here is the brute
    gauge-scale ceiling on a query sample; the PRODUCTION fusion is
    :func:`rrf_fusion_ivf` below (IVF-bucketed dense arm), with
    :func:`rrf_ivf_recall_eval` measuring the gap — RRF only needs
    the (query, doc, rank) lists.

    Scale: the lexical join is inverted-index-shaped (query terms
    join the term index — shuffle on term, bounded by document
    frequency); the dense arm broadcasts the query sample
    (nested-loop expected, ann precedent); every window is
    per-query bounded."""
    from pyspark.sql import Window

    from advisorydatapipeline_spark.operators.similarity import (
        cosine_q,
        dot_q,
        norm_sq_q,
        quantize,
    )

    from advisorydatapipeline_spark.queries.similarity_queries import (
        gauge_pair_guard,
    )

    docs = load(spark, sf_dir, "documents")
    n_emb = load(spark, sf_dir, "embeddings").count()
    gauge_pair_guard(
        max(n_emb // _RRF_QMOD, 1), n_emb, "rrf_fusion_topk"
    )
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", quantize("embedding").alias("q")
    )
    qs, lr = _rrf_lex_ranks(docs, emb)
    qv = qs.join(
        emb.select(F.col("vec_id").alias("query_id"),
                   F.col("q").alias("qq")),
        "query_id",
    )
    dense = (
        emb.select(F.col("vec_id").alias("doc_id"),
                   F.col("q").alias("cq"))
        .crossJoin(F.broadcast(qv))
        .filter(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            F.floor(
                1_000_000
                * cosine_q(
                    dot_q(F.col("cq"), F.col("qq")),
                    norm_sq_q(F.col("cq")),
                    norm_sq_q(F.col("qq")),
                )
            ).cast("long").alias("cm"),
        )
    )
    wd = Window.partitionBy("query_id").orderBy(
        F.col("cm").desc(), F.col("doc_id").asc()
    )
    dr = (
        dense.withColumn("r", F.row_number().over(wd))
        .filter(F.col("r") <= _RRF_POOL)
        .select("query_id", "doc_id", F.col("r").alias("dense_r"))
    )
    return _rrf_fuse(lr, dr)


# --- hybrid retrieval, PRODUCTION dense arm: IVF-bucketed (r15) -------

_RRF_NCENT = 8  # deterministic centroids: vec_id < 8 (the IVF house set)
_RRF_NPROBE = 2  # probed clusters per query

_RRF_QUANT = (
    "list_transform(embedding,"
    " x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
)


def _rrf_lex_cte() -> str:
    """The lexical-arm CTE stack shared by every RRF oracle: distinct
    term postings, integer IDF, per-query top-POOL lexical ranks."""
    toks = DUCK_TOKENS.format(x="text")
    return f"""
tok AS (
  SELECT DISTINCT doc_id, unnest({toks}) AS term FROM documents
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY 1
),
e AS (
  SELECT vec_id, CAST({_RRF_QUANT} AS DOUBLE[]) AS v FROM embeddings
),
qs AS (
  SELECT d.doc_id AS query_id FROM documents d
  JOIN e ON e.vec_id = d.doc_id
  WHERE d.doc_id % {_RRF_QMOD} = 0
),
lex AS (
  SELECT qt.doc_id AS query_id, dt.doc_id,
         CAST(sum(n.n * 1000 // df.df) AS BIGINT) AS score
  FROM tok qt
  JOIN qs ON qs.query_id = qt.doc_id
  JOIN tok dt ON dt.term = qt.term AND dt.doc_id <> qt.doc_id
  JOIN df ON df.term = qt.term
  CROSS JOIN n
  GROUP BY 1, 2
),
lr AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
           ORDER BY score DESC, doc_id ASC) AS r
  FROM lex
)"""


def _rrf_fuse_sql() -> str:
    """The fusion tail shared by every RRF oracle — expects CTEs
    ``lr`` and ``dr`` with (query_id, doc_id, r)."""
    return f"""
fused AS (
  SELECT COALESCE(l.query_id, d.query_id) AS query_id,
         COALESCE(l.doc_id, d.doc_id) AS doc_id,
         CAST(COALESCE(l.r, 0) AS BIGINT) AS lex_rank,
         CAST(COALESCE(d.r, 0) AS BIGINT) AS dense_rank,
         CAST(COALESCE({_RRF_SCALE} // ({_RRF_C} + l.r), 0)
              + COALESCE({_RRF_SCALE} // ({_RRF_C} + d.r), 0)
              AS BIGINT) AS rrf_scaled
  FROM (SELECT * FROM lr WHERE r <= {_RRF_POOL}) l
  FULL OUTER JOIN (SELECT * FROM dr WHERE r <= {_RRF_POOL}) d
    ON d.query_id = l.query_id AND d.doc_id = l.doc_id
)
SELECT query_id,
       CAST(row_number() OVER (PARTITION BY query_id
         ORDER BY rrf_scaled DESC, doc_id ASC) AS BIGINT) AS rnk,
       doc_id, rrf_scaled, lex_rank, dense_rank
FROM fused
QUALIFY rnk <= {_RRF_K}"""


def _rrf_ivf_oracle() -> str:
    return f"""
WITH {_rrf_lex_cte()},
cent AS (
  SELECT vec_id AS centroid_id, v FROM e WHERE vec_id < {_RRF_NCENT}
),
assign_scored AS (
  SELECT c.vec_id, cent.centroid_id,
         list_dot_product(c.v, c.v) + list_dot_product(cent.v, cent.v)
           - 2 * list_dot_product(c.v, cent.v) AS dist_sq
  FROM e c, cent
),
assigned AS (
  SELECT vec_id, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY dist_sq ASC, centroid_id ASC
    ) AS rn FROM assign_scored
  ) WHERE rn = 1
),
probe_scored AS (
  SELECT qs.query_id, cent.centroid_id,
         list_dot_product(q.v, q.v) + list_dot_product(cent.v, cent.v)
           - 2 * list_dot_product(q.v, cent.v) AS dist_sq
  FROM qs JOIN e q ON q.vec_id = qs.query_id, cent
),
probes AS (
  SELECT query_id, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY dist_sq ASC, centroid_id ASC
    ) AS rn FROM probe_scored
  ) WHERE rn <= {_RRF_NPROBE}
),
ivf_scored AS (
  SELECT p.query_id, c.vec_id AS doc_id,
         list_dot_product(c.v, q.v)
           / sqrt(list_dot_product(c.v, c.v)
                  * list_dot_product(q.v, q.v)) AS cosine
  FROM probes p
  JOIN e q ON q.vec_id = p.query_id
  JOIN assigned a ON a.centroid_id = p.centroid_id
  JOIN e c ON c.vec_id = a.vec_id
  WHERE c.vec_id <> p.query_id
),
dr AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, doc_id ASC) AS r
  FROM ivf_scored
),
{_rrf_fuse_sql()}
"""


@query("rrf_fusion_ivf", oracle=_rrf_ivf_oracle())
def rrf_fusion_ivf(spark, sf_dir):
    """PRODUCTION hybrid-retrieval RRF (r14 verdict item 1): the same
    inverted-index lexical arm and per-term-floored fusion as
    :func:`rrf_fusion_topk`, but the dense arm is the repo's
    IVF-bucketed candidate machinery (operators/similarity.ivf_topk:
    assign corpus vectors to the 8 deterministic centroids, probe the
    2 nearest clusters per query) instead of the brute all-pairs
    gauge — candidate pairs grow with the PROBED BUCKETS' population,
    never corpus^2, completing the gauge->production pairing every
    other ANN family has (bitext_margin_mining ->
    bitext_margin_mining_ivf precedent). Dense ranks order by the
    exact quantized cosine (one IEEE division over integer dot/norms,
    the ann_ivf_topk exactness discipline) with doc_id tiebreak.
    :func:`rrf_ivf_recall_eval` measures the fused-list recall vs the
    brute arm.

    Scale: lexical arm shuffles on term (bounded by document
    frequency); IVF assignment broadcasts 8 centroids; the candidate
    join is an equi-join on centroid_id (at 100 TB the assignment is
    written partitionBy(centroid_id) so probing prunes partitions);
    every window is per-query or per-vector bounded. No quadratic
    stage, so no gauge_pair_guard — this arm is the scale path."""
    from pyspark.sql import Window

    from advisorydatapipeline_spark.operators.similarity import (
        ivf_topk,
        quantize,
    )

    docs = load(spark, sf_dir, "documents")
    emb_raw = load(spark, sf_dir, "embeddings")
    embq = emb_raw.select("vec_id", quantize("embedding").alias("q"))
    qs, lr = _rrf_lex_ranks(docs, embq)
    queries = qs.join(
        emb_raw.select(F.col("vec_id").alias("query_id"), "embedding"),
        "query_id",
    )
    centroids = emb_raw.filter(F.col("vec_id") < _RRF_NCENT).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    cand = ivf_topk(
        emb_raw, queries, centroids, _RRF_POOL, _RRF_NPROBE
    )
    wd = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    dr = (
        cand.withColumn("r", F.row_number().over(wd))
        .select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            F.col("r").alias("dense_r"),
        )
    )
    return _rrf_fuse(lr, dr)


def _rrf_ivf_eval_oracle() -> str:
    """Fused-list recall of the IVF production fusion against the
    brute-dense fusion: replay BOTH full oracle stacks (shared no
    structure with the Spark side) and count (query, doc) hits."""
    truth = _rrf_oracle().strip()
    approx = _rrf_ivf_oracle().strip()
    return f"""
WITH truth AS (
  {truth}
),
approx AS (
  {approx}
),
hits AS (
  SELECT t.query_id FROM truth t
  JOIN approx a
    ON a.query_id = t.query_id AND a.doc_id = t.doc_id
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
       (SELECT CAST(count(*) AS BIGINT) FROM approx) AS n_approx,
       (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_hits,
       CAST((SELECT count(*) FROM hits) * 1000000
            // GREATEST((SELECT count(*) FROM truth), 1) AS BIGINT)
         AS recall_ppm
"""


@query("rrf_ivf_recall_eval", oracle=_rrf_ivf_eval_oracle())
def rrf_ivf_recall_eval(spark, sf_dir):
    """Measure, don't guess — the hybrid-retrieval leg of the
    recall-gauge family (ivf/lsh/rhp/pq/bitext precedents): exact
    fused-top-5 overlap between the IVF production fusion
    (:func:`rrf_fusion_ivf`) and the brute-dense fusion
    (:func:`rrf_fusion_topk`), in integer ppm. The tuning dial for
    (n_centroids, nprobe) on the HYBRID metric — dense-arm recall
    loss that RRF's lexical arm compensates for is visible here and
    invisible to ivf_recall_eval. The brute side inherits
    rrf_fusion_topk's gauge_pair_guard (labeled quadratic ceiling,
    query-sample only)."""
    # r15 NOTE: persisting the two fused lists was A/B-measured and
    # REJECTED (3.44 -> 5.20 s same box) — the repeated fusion
    # subtrees already share shuffles via ReuseExchange.
    truth = rrf_fusion_topk(spark, sf_dir).select("query_id", "doc_id")
    approx = rrf_fusion_ivf(spark, sf_dir).select("query_id", "doc_id")
    hits = truth.join(approx, ["query_id", "doc_id"])
    one = (
        truth.agg(F.count("*").cast("long").alias("n_true"))
        .crossJoin(
            F.broadcast(
                approx.agg(F.count("*").cast("long").alias("n_approx"))
            )
        )
        .crossJoin(
            F.broadcast(hits.agg(F.count("*").cast("long").alias("n_hits")))
        )
    )
    return one.select(
        "n_true",
        "n_approx",
        "n_hits",
        F.expr("n_hits * 1000000L DIV GREATEST(n_true, 1L)").alias(
            "recall_ppm"
        ),
    )
