"""Preference-data and classifier-evaluation queries (r11,
beyond-reference north-star block): Bradley-Terry strength fitting
over pairwise comparison data (the RLHF preference-aggregation
primitive) and a full binary-classifier evaluation — rank-sum
ROC-AUC, decile precision/recall, per-bin calibration — the numbers a
quality-classifier gate (hashed_ngram_classifier, dsir) is tuned by.

Both fixtures synthesize from doc_id with the house 2^31
multiplicative mixes; every statistic is BIGINT-exact (doubled-count
tie handling, integer ppm) so Spark and DuckDB replay identical
values. No reference analogue (the reference has no ML-eval surface);
pattern source: Hunter 2004 (BT minorization-maximization),
Mann-Whitney/AUC rank identity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.queries.helpers import load
from advisorydatapipeline_spark.registry import query

N_MODELS = 8
_MIX1 = 2654435761  # Knuth multiplicative; odd -> bijection mod 2^31
_MIX2 = 2246822519  # xxhash prime; independent second stream
BT_SCALE = 1_000_000  # strengths in ppm
BT_TERM_SCALE = 1_000_000_000  # per-opponent MM terms


def _mix(expr: str, const: int) -> str:
    """Overflow-safe 2^31 mix: reduce BEFORE multiplying (the
    epoch_shard_plan lesson — intermediates stay < 2^63 for any
    BIGINT input)."""
    return f"(({expr}) % 2147483648) * {const} % 2147483648"


# --- Bradley-Terry two-step MM fit ---------------------------------------

# comparison fixture: each doc is one game between model a and b;
# the winner is drawn from the TRUE BT model with strengths m+1 via
# mix(doc_id) % (sa+sb) < sa — so the fitted ranking must recover
# 7 > 6 > ... > 0 from game outcomes, not from the fixture directly.
def _bt_games(idiv: str) -> str:
    return f"""
  SELECT doc_id % {N_MODELS} AS a,
         (doc_id {idiv} {N_MODELS}) % {N_MODELS} AS b,
         CASE WHEN {_mix('doc_id', _MIX1)}
                % ((doc_id % {N_MODELS}) + ((doc_id {idiv} {N_MODELS})
                   % {N_MODELS}) + 2)
              < (doc_id % {N_MODELS}) + 1
              THEN doc_id % {N_MODELS}
              ELSE (doc_id {idiv} {N_MODELS}) % {N_MODELS} END AS winner
  FROM documents
  WHERE doc_id % {N_MODELS}
        <> (doc_id {idiv} {N_MODELS}) % {N_MODELS}"""


def _bt_sql(idiv: str) -> str:
    """The whole two-step MM fit as engine-portable SQL (only the
    integer-division operator differs)."""
    return f"""
WITH games AS ({_bt_games(idiv)}),
-- directed per-(i, opponent) stats: n games, wins for i
d AS (
  SELECT a AS i, b AS j,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN winner = a THEN 1 ELSE 0 END) AS BIGINT)
           AS w
  FROM games GROUP BY a, b
),
sym AS (
  SELECT i, j, n, w FROM d
  UNION ALL
  SELECT j AS i, i AS j, n, n - w AS w FROM d
),
pairs AS (
  SELECT i, j, CAST(sum(n) AS BIGINT) AS n_ij,
         CAST(sum(w) AS BIGINT) AS w_ij
  FROM sym GROUP BY i, j
),
tot AS (
  SELECT i, CAST(sum(n_ij) AS BIGINT) AS n_games,
         CAST(sum(w_ij) AS BIGINT) AS n_wins
  FROM pairs GROUP BY i
),
-- MM step 1 from the uniform start s0 = BT_SCALE
s1 AS (
  SELECT t.i, t.n_games, t.n_wins,
         CAST(t.n_wins * {BT_TERM_SCALE} {idiv} d1.den AS BIGINT)
           AS s1_ppm
  FROM tot t JOIN (
    SELECT i, CAST(sum(n_ij * {BT_TERM_SCALE}
                   {idiv} ({BT_SCALE} + {BT_SCALE})) AS BIGINT) AS den
    FROM pairs GROUP BY i
  ) d1 ON d1.i = t.i
),
-- MM step 2 at s1
s2 AS (
  SELECT s.i, s.n_games, s.n_wins, s.s1_ppm,
         CAST(s.n_wins * {BT_TERM_SCALE} {idiv} d2.den AS BIGINT)
           AS s2_ppm
  FROM s1 s JOIN (
    SELECT p.i,
           CAST(sum(p.n_ij * {BT_TERM_SCALE}
                {idiv} (si.s1_ppm + sj.s1_ppm)) AS BIGINT) AS den
    FROM pairs p
    JOIN s1 si ON si.i = p.i
    JOIN s1 sj ON sj.i = p.j
    GROUP BY p.i
  ) d2 ON d2.i = s.i
),
norm AS (
  SELECT CAST(sum(s2_ppm) AS BIGINT) AS total FROM s2
)
SELECT s2.i AS model,
       s2.n_games, s2.n_wins, s2.s1_ppm, s2.s2_ppm,
       CAST(s2.s2_ppm * {N_MODELS * BT_SCALE} {idiv} norm.total
            AS BIGINT) AS s2_norm_ppm,
       CAST(row_number() OVER (ORDER BY s2.s2_ppm DESC, s2.i)
            AS BIGINT) AS strength_rank
FROM s2 CROSS JOIN norm
"""


@query("bradley_terry_mm_step", oracle=_bt_sql("//"))
def bradley_terry_mm_step(spark, sf_dir):
    """Bradley-Terry strength estimation over pairwise preference
    games — TWO minorization-maximization steps (Hunter 2004:
    s_i <- W_i / sum_j n_ij / (s_i + s_j)) from a uniform start, all
    in BIGINT (strengths in ppm, per-opponent terms at 1e9 scale, so
    truncation order is identical in both engines). The fixture draws
    each game's winner from a TRUE BT model (strength m+1) with the
    2^31 mix as the noise source, so the recovered ranking is fitted
    from outcomes; step 1 from uniform reduces to 2x win rate — the
    step-2 column is where opponent strength actually matters
    (beating strong opponents counts for more).

    Scale (100 TB): the game stream collapses to <= k^2 directed
    pair rows in ONE partial-agg shuffle; every later hop (the two MM
    steps, normalization, ranking) runs on the k x k table —
    broadcast joins, driver-free. More MM steps = more tiny
    self-joins, linear in k^2, independent of corpus size."""
    games = load(spark, sf_dir, "documents").selectExpr(
        f"doc_id % {N_MODELS} AS a",
        f"(doc_id DIV {N_MODELS}) % {N_MODELS} AS b",
        f"CASE WHEN {_mix('doc_id', _MIX1)}"
        f" % ((doc_id % {N_MODELS}) + ((doc_id DIV {N_MODELS})"
        f" % {N_MODELS}) + 2) < (doc_id % {N_MODELS}) + 1"
        f" THEN doc_id % {N_MODELS}"
        f" ELSE (doc_id DIV {N_MODELS}) % {N_MODELS} END AS winner",
    ).where("a <> b")
    games.createOrReplaceTempView("_bt_games")
    sql = _bt_sql("DIV").replace(
        f"WITH games AS ({_bt_games('DIV')}),", "WITH games AS (SELECT * FROM _bt_games),"
    )
    return spark.sql(sql)


# --- ROC-AUC / PR deciles / calibration bins ------------------------------

_POS_CUT = 1_000_000
_NOISE = 400_000


def _clf_scored(idiv: str) -> str:
    """score in [0, 1e6); positive iff score + independent noise
    >= 1e6 — P(pos | score) ramps linearly over the top 40% of the
    score range, the realistic quality-classifier shape."""
    return f"""
  SELECT doc_id,
         {_mix('doc_id', _MIX1)} % 1000000 AS score_ppm,
         ({_mix('doc_id', _MIX1)} % 1000000)
           + ({_mix('doc_id + 13', _MIX2)} % {_NOISE})
           >= {_POS_CUT} AS label
  FROM documents"""


def _clf_sql(idiv: str) -> str:
    return f"""
WITH scored AS ({_clf_scored(idiv)}),
-- per-distinct-score tallies for the exact rank-sum AUC
g AS (
  SELECT score_ppm,
         CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS np,
         CAST(sum(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS nn
  FROM scored GROUP BY score_ppm
),
c AS (
  SELECT score_ppm, np, nn,
         CAST(COALESCE(sum(nn) OVER (ORDER BY score_ppm
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS nn_below
  FROM g
),
-- doubled pair count (ties count once) -> exact tied AUC
auc AS (
  SELECT CAST(sum(np * (2 * nn_below + nn)) AS BIGINT) AS auc2,
         CAST(sum(np) AS BIGINT) AS p,
         CAST(sum(nn) AS BIGINT) AS n
  FROM c
),
b AS (
  SELECT score_ppm {idiv} 100000 AS bucket,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pos,
         CAST(sum(score_ppm) AS BIGINT) AS sum_score
  FROM scored GROUP BY 1
),
cb AS (
  SELECT bucket, n_docs, n_pos,
         CAST(sum_score {idiv} n_docs AS BIGINT) AS avg_score_ppm,
         CAST(n_pos * 1000000 {idiv} n_docs AS BIGINT) AS pos_rate_ppm,
         CAST(sum(n_pos) OVER (ORDER BY bucket DESC) AS BIGINT)
           AS cum_pos,
         CAST(sum(n_docs) OVER (ORDER BY bucket DESC) AS BIGINT)
           AS cum_docs
  FROM b
)
SELECT cb.bucket, cb.n_docs, cb.n_pos, cb.avg_score_ppm,
       cb.pos_rate_ppm,
       CAST(abs(cb.avg_score_ppm - cb.pos_rate_ppm) AS BIGINT)
         AS cal_err_ppm,
       CAST(cb.cum_pos * 1000000 {idiv} cb.cum_docs AS BIGINT)
         AS precision_ppm,
       CAST(cb.cum_pos * 1000000 {idiv} auc.p AS BIGINT) AS recall_ppm,
       CAST(auc.auc2 * 1000000 {idiv} (2 * auc.p * auc.n) AS BIGINT)
         AS auc_ppm
FROM cb CROSS JOIN auc
"""


@query("roc_pr_calibration", oracle=_clf_sql("//"))
def roc_pr_calibration(spark, sf_dir):
    """Binary-classifier evaluation in one plan: exact rank-sum
    ROC-AUC (the Mann-Whitney identity, doubled pair counts so ties
    stay integer — the mannwhitney_value_drift machinery pointed at
    classification), top-down decile precision/recall (threshold
    sweep), and per-bin calibration error |mean score - positive
    rate| — the ECE ingredients. The fixture's labels are drawn with
    independent mix noise so P(pos | score) ramps linearly over the
    top 40% of scores: AUC is genuinely between 0.5 and 1 and the
    top decile calibrates near its score mean.

    Scale (100 TB): one partial-agg shuffle onto distinct scores
    (bounded by the 1e6 score domain, like mannwhitney's cents
    table), a second onto 10 buckets; the AUC scalar rides a 1-row
    broadcast cross join. Cumulative windows run over the bounded
    distinct-score/bucket tables, never the corpus."""
    scored = load(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"{_mix('doc_id', _MIX1)} % 1000000 AS score_ppm",
        f"({_mix('doc_id', _MIX1)} % 1000000)"
        f" + ({_mix('doc_id + 13', _MIX2)} % {_NOISE})"
        f" >= {_POS_CUT} AS label",
    )
    scored.createOrReplaceTempView("_clf_scored")
    sql = _clf_sql("DIV").replace(
        f"WITH scored AS ({_clf_scored('DIV')}),",
        "WITH scored AS (SELECT * FROM _clf_scored),",
    )
    return spark.sql(sql)


# --- NDCG ranking evaluation (r11) ----------------------------------------

NDCG_K = 10


def _ndcg_sql(idiv: str) -> str:
    """NDCG@k over a synthesized retrieval run: query q = doc_id % 50,
    rank r = row over the house mix, graded relevance 0-3 from an
    independent mix stream correlated with rank (better ranks are
    more often relevant, so NDCG lands strictly between 0 and 1e6).
    Discount weights floor(1e6 / log2(r+1)) — log2 of small integers
    is bit-identical libm on both engines (the lm.py precedent), and
    the floor freezes it into BIGINT before any aggregation."""
    rel = (
        f"CASE WHEN ({_mix('doc_id + 101', _MIX2)} % 100)"
        " < 80 - 7 * ((doc_id {I} 50) % 10)"
        " THEN 3 - ((doc_id {I} 50) % 10) % 3 ELSE 0 END"
    ).replace("{I}", idiv)
    return f"""
WITH run AS (
  SELECT doc_id % 50 AS q,
         CAST((doc_id {idiv} 50) % 10 + 1 AS BIGINT) AS r,
         CAST({rel} AS BIGINT) AS rel
  FROM documents
  WHERE (doc_id {idiv} 50) % 10 < {NDCG_K} AND doc_id < 500
),
w AS (
  SELECT q, r, rel,
         CAST(floor(1000000 / log2(r + 1)) AS BIGINT) AS w_ppm,
         CAST((power(2, rel) - 1) AS BIGINT) AS gain
  FROM run
),
dcg AS (
  SELECT q, CAST(sum(gain * w_ppm) AS BIGINT) AS dcg_scaled
  FROM w GROUP BY q
),
ideal AS (
  SELECT q,
         CAST(sum(gain * CAST(floor(1000000 / log2(ir + 1))
              AS BIGINT)) AS BIGINT) AS idcg_scaled
  FROM (
    SELECT q, gain,
           row_number() OVER (PARTITION BY q
             ORDER BY gain DESC, r) AS ir
    FROM w
  ) GROUP BY q
)
SELECT dcg.q AS query_id, dcg.dcg_scaled, ideal.idcg_scaled,
       CAST(CASE WHEN ideal.idcg_scaled = 0 THEN 0
            ELSE dcg.dcg_scaled * 1000000 {idiv} ideal.idcg_scaled
            END AS BIGINT) AS ndcg_ppm
FROM dcg JOIN ideal ON ideal.q = dcg.q
"""


@query("ndcg_ranking_eval", oracle=_ndcg_sql("//"))
def ndcg_ranking_eval(spark, sf_dir):
    """NDCG@10 per query over a synthesized retrieval run — the
    retrieval-quality gauge for embedding/ANN curation stages
    (Jarvelin & Kekalainen 2002). Exponential gains 2^rel - 1,
    log-discounts frozen to BIGINT via floor(1e6 / log2(r+1)) (libm
    log2 of small ints is bit-identical across engines — the lm.py
    precedent — and flooring BEFORE aggregation removes any float
    reduction), ideal ordering by gain with rank tie-break, zero-gain
    queries defined as ndcg 0.

    Scale (100 TB): one partial-agg shuffle per run keyed on query;
    the ideal ranking windows over per-query top-k slices (k rows
    each), never the corpus."""
    run = load(spark, sf_dir, "documents").selectExpr(
        "doc_id"
    )
    run.createOrReplaceTempView("_ndcg_docs")
    sql = _ndcg_sql("DIV").replace("FROM documents", "FROM _ndcg_docs")
    return spark.sql(sql)


# --- leave-one-out source diversity (r11) ---------------------------------


def _loo_sql(idiv: str, tokexpr: str) -> str:
    return f"""
WITH d AS (
  SELECT source, CAST(sum({tokexpr}) AS BIGINT) AS toks
  FROM documents GROUP BY source
),
t AS (
  SELECT CAST(sum(toks) AS BIGINT) AS total,
         CAST(sum(toks * toks) AS BIGINT) AS sumsq
  FROM d
)
SELECT d.source, d.toks,
       CAST(d.toks * 1000000 {idiv} t.total AS BIGINT) AS share_ppm,
       CAST(1000000 - t.sumsq {idiv} GREATEST(t.total {idiv} 1000
            * (t.total {idiv} 1000), 1) AS BIGINT) AS simpson_all_ppm,
       CAST(1000000 - (t.sumsq - d.toks * d.toks)
            {idiv} GREATEST((t.total - d.toks) {idiv} 1000
            * ((t.total - d.toks) {idiv} 1000), 1) AS BIGINT)
         AS simpson_loo_ppm,
       CAST((1000000 - t.sumsq {idiv} GREATEST(t.total {idiv} 1000
            * (t.total {idiv} 1000), 1))
            - (1000000 - (t.sumsq - d.toks * d.toks)
            {idiv} GREATEST((t.total - d.toks) {idiv} 1000
            * ((t.total - d.toks) {idiv} 1000), 1)) AS BIGINT)
         AS loo_delta_ppm
FROM d CROSS JOIN t
"""


@query(
    "source_diversity_loo",
    oracle=_loo_sql(
        "//",
        "len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),"
        " x -> x <> ''))",
    ),
)
def source_diversity_loo(spark, sf_dir):
    """Leave-one-out data valuation against corpus diversity: each
    source's contribution to the token-share Simpson diversity index
    (1 - sum of squared shares — the integer-exact stand-in for
    entropy; Shannon would drift through log). LOO recomputation is
    FREE from the global aggregates — Simpson decomposes, so
    removing a source needs only (total, sum-of-squares, own share),
    never a per-source rescan: the Shapley-flavored loop that looks
    quadratic is one partial-agg pass plus k-row arithmetic. Shares
    square through a DIV-1000 reduction so intermediates stay under
    2^63 for corpora up to ~9e18 tokens.

    A positive loo_delta_ppm means dropping the source would RAISE
    diversity (it is an over-dominant source); mixture stages
    (corpus_mixture_waterfill, doremi_domain_reweight) consume
    exactly this signal."""
    from advisorydatapipeline_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents").select(
        "source", F.size(tokens("text")).cast("long").alias("n_tok")
    )
    docs.createOrReplaceTempView("_loo_docs")
    sql = _loo_sql("DIV", "n_tok").replace(
        "FROM documents GROUP BY source",
        "FROM _loo_docs GROUP BY source",
    )
    return spark.sql(sql)


# --- unbiased pass@k (r12) ------------------------------------------------

_PK_SQL_TMPL = """
WITH t AS (
  SELECT doc_id,
         CAST(5 + doc_id % 12 AS BIGINT) AS n,
         CAST({mix} % (5 + doc_id % 12 + 1) AS BIGINT) AS c
  FROM documents
)
SELECT doc_id, n, c,
       CAST(1000000 - (n - c) * 1000000 {idiv} n AS BIGINT)
         AS pass1_ppm,
       CAST(CASE WHEN n - c >= 5 THEN 1000000
              - ((n-c) * (n-c-1) * (n-c-2) * (n-c-3) * (n-c-4))
                * 1000000
                {idiv} (n * (n-1) * (n-2) * (n-3) * (n-4))
            ELSE 1000000 END AS BIGINT) AS pass5_ppm
FROM t
"""


def _pk_sql(idiv: str) -> str:
    return _PK_SQL_TMPL.format(
        idiv=idiv, mix=_mix("doc_id * 31 + 7", _MIX2)
    )


@query("pass_at_k_eval", oracle=_pk_sql("//"))
def pass_at_k_eval(spark, sf_dir):
    """Unbiased pass@k estimator (Chen et al. 2021, the Codex
    combinatorial form): per task, n sampled attempts with c
    successes give pass@k = 1 - C(n-c, k) / C(n, k) — the expectation
    over all size-k subsets, NOT the biased 1-(1-c/n)^k plug-in. The
    falling-factorial ratio is evaluated as one integer product per
    side (n <= 16, so products stay far under 2^63) and floored to
    ppm — bit-identical in both engines, including the n-c < k edge
    where pass@k is exactly 1. Fixture: (n, c) derive from doc_id via
    the house mix, c uniform on [0, n].

    Scale: pure per-row arithmetic over the task table — map-only,
    no shuffle, no window; the eval rollup a harness would add is one
    partial agg."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    docs.createOrReplaceTempView("_pk_docs")
    return spark.sql(
        _pk_sql("DIV").replace("FROM documents", "FROM _pk_docs")
    )


# --- best-of-n rejection sampling (r12) -----------------------------------

_BON_MARGIN_CENTS = 50


@query(
    "best_of_n_reward_selection",
    oracle=f"""
WITH cand AS (
  SELECT user_id, event_id,
         CAST(floor(value * 100) AS BIGINT) AS reward_cents
  FROM events
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id
           ORDER BY reward_cents DESC, event_id) AS rn
  FROM cand
)
SELECT b.user_id,
       CAST(n.n AS BIGINT) AS n_candidates,
       b.event_id AS best_event_id,
       b.reward_cents AS best_reward_cents,
       CAST(b.reward_cents - COALESCE(s.reward_cents, b.reward_cents)
            AS BIGINT) AS margin_cents,
       b.reward_cents - COALESCE(s.reward_cents, b.reward_cents)
         >= {_BON_MARGIN_CENTS} AS accepted
FROM (SELECT * FROM r WHERE rn = 1) b
LEFT JOIN (SELECT * FROM r WHERE rn = 2) s ON s.user_id = b.user_id
JOIN (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM cand
      GROUP BY user_id) n ON n.user_id = b.user_id
""",
)
def best_of_n_reward_selection(spark, sf_dir):
    """Best-of-n rejection sampling (the RLHF data-selection step):
    each prompt's n candidate responses (events per user) are ranked
    by an integer reward; the argmax is selected, and the prompt is
    ACCEPTED only when the best-vs-second margin clears a threshold —
    a margin gate rejects prompts whose reward model can't
    distinguish its own top candidates (label noise in, garbage
    preference pairs out). Single-candidate prompts have margin 0 by
    definition (nothing beaten).

    Scale: one hash shuffle keyed on prompt; the rank window is
    per-prompt (bounded by candidates-per-prompt), top-1/top-2 via
    WindowGroupLimit; rewards are exact cents."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    cand = ev.select(
        "user_id",
        "event_id",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias(
            "reward_cents"
        ),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("reward_cents").desc(), F.col("event_id")
    )
    r = cand.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 2
    )
    n = cand.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates")
    )
    best = r.filter(F.col("rn") == 1).select(
        "user_id",
        F.col("event_id").alias("best_event_id"),
        F.col("reward_cents").alias("best_reward_cents"),
    )
    second = r.filter(F.col("rn") == 2).select(
        "user_id", F.col("reward_cents").alias("_second")
    )
    margin = F.expr(
        "CAST(best_reward_cents"
        " - COALESCE(_second, best_reward_cents) AS BIGINT)"
    )
    return (
        best.join(second, "user_id", "left")
        .join(n, "user_id")
        .select(
            "user_id",
            "n_candidates",
            "best_event_id",
            "best_reward_cents",
            margin.alias("margin_cents"),
            (margin >= _BON_MARGIN_CENTS).alias("accepted"),
        )
    )


# --- Brier score + Murphy decomposition (r12) ------------------------------


def _brier_sql(idiv: str) -> str:
    return f"""
WITH scored AS ({_clf_scored(idiv)}),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS p,
         CAST(sum((score_ppm - CASE WHEN label THEN 1000000 ELSE 0
                   END) * (score_ppm - CASE WHEN label THEN 1000000
                   ELSE 0 END)) AS BIGINT) AS sse
  FROM scored
),
b AS (
  SELECT score_ppm {idiv} 100000 AS bucket,
         CAST(count(*) AS BIGINT) AS nb,
         CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
           AS np,
         CAST(sum(score_ppm) AS BIGINT) AS ss
  FROM scored GROUP BY 1
),
bb AS (
  SELECT bucket, nb,
         CAST(ss {idiv} nb AS BIGINT) AS conf,
         CAST(np * 1000000 {idiv} nb AS BIGINT) AS acc
  FROM b
),
base AS (SELECT CAST(p * 1000000 {idiv} n AS BIGINT) AS base_ppm FROM t),
agg AS (
  SELECT CAST(sum(bb.nb * (bb.conf - bb.acc) * (bb.conf - bb.acc))
              AS BIGINT) AS rel_num,
         CAST(sum(bb.nb * (bb.acc - base.base_ppm)
                  * (bb.acc - base.base_ppm)) AS BIGINT) AS res_num
  FROM bb CROSS JOIN base
)
SELECT t.n, t.p, base.base_ppm,
       CAST(t.sse {idiv} t.n AS BIGINT) AS brier_e12,
       CAST(agg.rel_num {idiv} t.n AS BIGINT) AS rel_e12,
       CAST(agg.res_num {idiv} t.n AS BIGINT) AS res_e12,
       CAST(base.base_ppm * (1000000 - base.base_ppm) AS BIGINT)
         AS unc_e12,
       CAST(t.sse {idiv} t.n - (agg.rel_num {idiv} t.n
            - agg.res_num {idiv} t.n
            + base.base_ppm * (1000000 - base.base_ppm)) AS BIGINT)
         AS within_bin_gap_e12
FROM t CROSS JOIN base CROSS JOIN agg
"""


@query("brier_decomposition_eval", oracle=_brier_sql("//"))
def brier_decomposition_eval(spark, sf_dir):
    """Brier score with the Murphy (1973) decomposition —
    reliability - resolution + uncertainty — over the same
    linear-ramp classifier fixture roc_pr_calibration evaluates: the
    proper-scoring-rule view of a quality classifier (AUC can't see
    miscalibration; Brier charges for it). Everything in integer
    ppm^2 ('e12') units: squared errors, bin means (floored —
    identical floors in both engines), and the decomposition terms.
    `within_bin_gap_e12` reports Brier - (REL - RES + UNC): the
    Murphy identity is exact only when forecasts equal their bin
    means, so the gap is the within-bin forecast variance plus
    integer-floor error (flooring conf/acc/base to whole ppm before
    squaring shifts each weighted square by up to ~2e6, so the floor
    term is bounded by ~4e6 * n and can locally outweigh the
    variance) — an honest discretization disclosure, not an error
    term. BIGINT headroom: sum of ppm^2 errors bounds at
    ~9.2e6 docs; beyond that pre-scale per-doc by 1000 (same move as
    the LM entries).

    Scale: two partial-agg passes over the scored stream (global +
    10-bin), then 1-row arithmetic via broadcast cross joins."""
    scored = load(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"{_mix('doc_id', _MIX1)} % 1000000 AS score_ppm",
        f"({_mix('doc_id', _MIX1)} % 1000000)"
        f" + ({_mix('doc_id + 13', _MIX2)} % {_NOISE})"
        f" >= {_POS_CUT} AS label",
    )
    scored.createOrReplaceTempView("_brier_scored")
    sql = _brier_sql("DIV").replace(
        f"WITH scored AS ({_clf_scored('DIV')}),",
        "WITH scored AS (SELECT * FROM _brier_scored),",
    )
    return spark.sql(sql)


# --- DPO preference-pair construction (r13) --------------------------------

_DPO_MARGIN_CENTS = 100
_DPO_LEN_RATIO = 2  # keep pairs whose lengths are within 2x


def _dpo_sql(idiv: str) -> str:
    return f"""
WITH cand AS (
  SELECT user_id, event_id,
         CAST(floor(value * 100) AS BIGINT) AS reward_cents,
         CAST(20 + {_mix('event_id * 17 + 3', _MIX2)} % 200 AS BIGINT)
           AS resp_len
  FROM events
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id
           ORDER BY reward_cents DESC, event_id ASC) AS rn_top,
         row_number() OVER (PARTITION BY user_id
           ORDER BY reward_cents ASC, event_id DESC) AS rn_bot,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
  FROM cand
)
SELECT c.user_id,
       c.n AS n_candidates,
       c.event_id AS chosen_event_id,
       j.event_id AS rejected_event_id,
       c.reward_cents AS chosen_reward_cents,
       j.reward_cents AS rejected_reward_cents,
       CAST(c.reward_cents - j.reward_cents AS BIGINT) AS margin_cents,
       c.resp_len AS len_chosen,
       j.resp_len AS len_rejected,
       (c.reward_cents - j.reward_cents >= {_DPO_MARGIN_CENTS}
        AND GREATEST(c.resp_len, j.resp_len)
            <= {_DPO_LEN_RATIO} * LEAST(c.resp_len, j.resp_len))
         AS kept
FROM (SELECT * FROM r WHERE rn_top = 1 AND n >= 2) c
JOIN (SELECT * FROM r WHERE rn_bot = 1) j ON j.user_id = c.user_id
"""


@query("dpo_pair_builder", oracle=_dpo_sql("//"))
def dpo_pair_builder(spark, sf_dir):
    """DPO preference-pair construction (Rafailov et al. 2023 data
    prep): per prompt (user), the reward-argmax candidate is CHOSEN
    and the reward-argmin REJECTED (max-vs-min pairing — the
    highest-signal pair the candidate set offers), then two standard
    curation gates decide ``kept``: a reward MARGIN (pairs the reward
    model can't separate are label noise) and a LENGTH-RATIO guard
    (response lengths within 2x — otherwise DPO learns 'longer is
    better' instead of the preference; the verbosity-bias control).
    Deterministic tiebreaks make chosen != rejected whenever the
    prompt has >= 2 candidates (desc ties break to the smallest
    event_id, asc ties to the largest). Response lengths are a
    mix-derived fixture; rewards are exact cents.

    Scale: one hash shuffle keyed on prompt; both rank windows and
    the count ride the same per-prompt partition (bounded by
    candidates-per-prompt, WindowGroupLimit-friendly)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    cand = ev.select(
        "user_id",
        "event_id",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias(
            "reward_cents"
        ),
        F.expr(
            f"CAST(20 + {_mix('event_id * 17 + 3', _MIX2)} % 200"
            " AS BIGINT)"
        ).alias("resp_len"),
    )
    wt = Window.partitionBy("user_id").orderBy(
        F.col("reward_cents").desc(), F.col("event_id").asc()
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.col("reward_cents").asc(), F.col("event_id").desc()
    )
    wn = Window.partitionBy("user_id")
    r = cand.select(
        "*",
        F.row_number().over(wt).alias("rn_top"),
        F.row_number().over(wb).alias("rn_bot"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n"),
    )
    chosen = r.filter((F.col("rn_top") == 1) & (F.col("n") >= 2)).select(
        "user_id",
        F.col("n").alias("n_candidates"),
        F.col("event_id").alias("chosen_event_id"),
        F.col("reward_cents").alias("chosen_reward_cents"),
        F.col("resp_len").alias("len_chosen"),
    )
    rejected = r.filter(F.col("rn_bot") == 1).select(
        "user_id",
        F.col("event_id").alias("rejected_event_id"),
        F.col("reward_cents").alias("rejected_reward_cents"),
        F.col("resp_len").alias("len_rejected"),
    )
    margin = F.expr(
        "CAST(chosen_reward_cents - rejected_reward_cents AS BIGINT)"
    )
    return chosen.join(rejected, "user_id").select(
        "user_id",
        "n_candidates",
        "chosen_event_id",
        "rejected_event_id",
        "chosen_reward_cents",
        "rejected_reward_cents",
        margin.alias("margin_cents"),
        "len_chosen",
        "len_rejected",
        (
            (margin >= _DPO_MARGIN_CENTS)
            & (
                F.greatest("len_chosen", "len_rejected")
                <= _DPO_LEN_RATIO
                * F.least("len_chosen", "len_rejected")
            )
        ).alias("kept"),
    )


# --- self-consistency majority voting (r13) --------------------------------

_SC_ANSWERS = 7


def _sc_sql(idiv: str) -> str:
    return f"""
WITH s AS (
  SELECT user_id, event_id,
         CAST({_mix('event_id * 29 + 11', _MIX1)} % {_SC_ANSWERS}
              AS BIGINT) AS ans
  FROM events
),
v AS (
  SELECT user_id, ans, CAST(count(*) AS BIGINT) AS votes
  FROM s GROUP BY 1, 2
),
m AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id
           ORDER BY votes DESC, ans ASC) AS rn,
         CAST(sum(votes) OVER (PARTITION BY user_id) AS BIGINT) AS n
  FROM v
)
SELECT user_id,
       n AS n_samples,
       ans AS modal_answer,
       votes AS modal_votes,
       CAST(votes * 1000000 {idiv} n AS BIGINT) AS consensus_ppm,
       CAST(user_id % {_SC_ANSWERS} AS BIGINT) AS gold_answer,
       ans = user_id % {_SC_ANSWERS} AS correct
FROM m WHERE rn = 1
"""


@query("self_consistency_vote", oracle=_sc_sql("//"))
def self_consistency_vote(spark, sf_dir):
    """Self-consistency decoding eval (Wang et al. 2023): per
    question (user), the n sampled chain-of-thought answers (events,
    answer = mix of event_id over a {_SC_ANSWERS}-way answer space)
    are MAJORITY-VOTED — modal answer with deterministic min-answer
    tiebreak — and compared against the gold answer (user_id mod
    {_SC_ANSWERS}); ``consensus_ppm`` is the vote share, the
    standard confidence proxy ("consistency") used to gate
    low-agreement questions out of eval/distillation sets.

    Scale: one hash partial-agg keyed (question, answer), then a
    per-question bounded window (<= {_SC_ANSWERS} rows per
    question); exact integer vote shares."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    s = ev.select(
        "user_id",
        F.expr(
            f"CAST({_mix('event_id * 29 + 11', _MIX1)} % {_SC_ANSWERS}"
            " AS BIGINT)"
        ).alias("ans"),
    )
    v = s.groupBy("user_id", "ans").agg(
        F.count(F.lit(1)).cast("long").alias("votes")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("votes").desc(), F.col("ans").asc()
    )
    wn = Window.partitionBy("user_id")
    m = v.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.sum("votes").over(wn).cast("long").alias("n"),
    )
    return m.filter(F.col("rn") == 1).select(
        "user_id",
        F.col("n").alias("n_samples"),
        F.col("ans").alias("modal_answer"),
        F.col("votes").alias("modal_votes"),
        F.expr("CAST(votes * 1000000 DIV n AS BIGINT)").alias(
            "consensus_ppm"
        ),
        (F.col("user_id") % _SC_ANSWERS).cast("long").alias(
            "gold_answer"
        ),
        (F.col("ans") == F.col("user_id") % _SC_ANSWERS).alias(
            "correct"
        ),
    )


# --- nucleus (top-p) truncation planning (r13) ------------------------------

_TOPP_PPM = 900_000  # p = 0.9


def _topp_sql(idiv: str) -> str:
    return f"""
WITH cand AS (
  SELECT user_id, event_id,
         CAST(1 + {_mix('event_id * 37 + 5', _MIX1)} % 1000 AS BIGINT)
           AS weight
  FROM events
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id
           ORDER BY weight DESC, event_id ASC) AS rn,
         CAST(sum(weight) OVER (PARTITION BY user_id) AS BIGINT)
           AS total,
         CAST(sum(weight) OVER (PARTITION BY user_id
           ORDER BY weight DESC, event_id ASC
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
  FROM cand
),
kept AS (
  SELECT * FROM r
  WHERE (cum - weight) * 1000000 < {_TOPP_PPM} * total
)
SELECT user_id,
       n AS n_candidates,
       CAST(count(*) AS BIGINT) AS k_kept,
       CAST(max(cum) * 1000000 {idiv} max(total) AS BIGINT)
         AS mass_kept_ppm,
       CAST(min(weight) AS BIGINT) AS cutoff_weight
FROM kept
GROUP BY user_id, n
"""


@query("nucleus_topp_plan", oracle=_topp_sql("//"))
def nucleus_topp_plan(spark, sf_dir):
    """Nucleus / top-p truncation planning (Holtzman et al. 2020):
    per prompt (user), candidates sort by weight (integer fixture
    probabilities) and the NUCLEUS keeps the smallest weight-ordered
    prefix whose mass reaches p — membership is the standard
    exclusive-prefix rule (a candidate is kept iff the mass BEFORE it
    is still under p·total, so the crossing candidate is included),
    evaluated by exact integer cross-multiplication
    ((cum - w) * 1e6 < p_ppm * total; no float thresholds).
    Deterministic weight-desc/event-id tiebreak. Reports nucleus
    size, exact kept-mass share, and the cutoff weight — the
    distillation/inference-planning statistic ("how many candidates
    does p=0.9 actually admit per prompt").

    Scale: one hash shuffle keyed on prompt; rank/cumulative windows
    are per-prompt bounded."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    cand = ev.select(
        "user_id",
        "event_id",
        F.expr(
            f"CAST(1 + {_mix('event_id * 37 + 5', _MIX1)} % 1000"
            " AS BIGINT)"
        ).alias("weight"),
    )
    wo = Window.partitionBy("user_id").orderBy(
        F.col("weight").desc(), F.col("event_id").asc()
    )
    wp = Window.partitionBy("user_id")
    r = cand.select(
        "*",
        F.sum("weight").over(wp).cast("long").alias("total"),
        F.sum("weight")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum"),
        F.count(F.lit(1)).over(wp).cast("long").alias("n"),
    )
    kept = r.filter(
        (F.col("cum") - F.col("weight")) * 1_000_000
        < _TOPP_PPM * F.col("total")
    )
    return kept.groupBy("user_id", "n").agg(
        F.count(F.lit(1)).cast("long").alias("k_kept"),
        F.expr(
            "CAST(max(cum) * 1000000 DIV max(total) AS BIGINT)"
        ).alias("mass_kept_ppm"),
        F.min("weight").cast("long").alias("cutoff_weight"),
    ).select(
        "user_id",
        F.col("n").alias("n_candidates"),
        "k_kept",
        "mass_kept_ppm",
        "cutoff_weight",
    )


# --- GRPO group-normalized advantages (r14) ---------------------------

# exactness bound for the integer-sqrt trick: var_num must stay exactly
# representable in DOUBLE so both engines' sqrt sees the identical
# value (then one +/-1 correction makes floor-sqrt exact)
_GRPO_SQRT_SAFE = 1 << 52


def _isqrt_sql(v: str) -> str:
    """Exact integer floor-sqrt of a BIGINT < 2^52, identical in
    Spark and DuckDB: both convert v to DOUBLE exactly, both sqrt
    correctly rounded (IEEE), so s0 is off by at most 1 after floor;
    one bracket correction pins it."""
    s0 = f"CAST(floor(sqrt(CAST(({v}) AS DOUBLE))) AS BIGINT)"
    return (
        f"(CASE WHEN ({s0} + 1) * ({s0} + 1) <= ({v}) THEN {s0} + 1 "
        f"WHEN {s0} * {s0} > ({v}) THEN {s0} - 1 ELSE {s0} END)"
    )


def _grpo_sql(idiv: str) -> str:
    num = "n * reward_cents - sum_r"
    return f"""
WITH cand AS (
  SELECT user_id, event_id,
         CAST(floor(value * 100) AS BIGINT) AS reward_cents
  FROM events
),
g AS (
  SELECT *,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
         CAST(sum(reward_cents) OVER (PARTITION BY user_id)
              AS BIGINT) AS sum_r,
         CAST(sum(reward_cents * reward_cents)
              OVER (PARTITION BY user_id) AS BIGINT) AS sum_r2
  FROM cand
),
v AS (
  SELECT *, n * sum_r2 - sum_r * sum_r AS var_num FROM g
),
s AS (
  SELECT *, {_isqrt_sql('var_num')} AS sd_num FROM v
)
SELECT user_id, event_id, reward_cents,
       n AS n_samples,
       sum_r AS group_sum_cents,
       CAST(CASE WHEN var_num = 0 THEN 0
            ELSE (CASE WHEN {num} < 0 THEN -1 ELSE 1 END)
                 * ((abs({num}) * 1000000) {idiv} sd_num)
            END AS BIGINT) AS adv_ppm
FROM s
"""


@query("grpo_advantage_baseline", oracle=_grpo_sql("//"))
def grpo_advantage_baseline(spark, sf_dir):
    """GRPO group-relative advantages (Shao et al. 2024,
    DeepSeekMath — the PPO-critic-free RL objective): per prompt
    (user), each sampled response's advantage is its reward
    standardized WITHIN the group, A_i = (r_i - mean(r)) / std(r).
    Integer-exact formulation: A_i = (n*r_i - sum_r) / sqrt(n*sum_r2
    - sum_r^2) (multiply through by n; the population-std
    denominator becomes one integer floor-sqrt), quantized to ppm
    with sign split out so Spark ``DIV`` (truncate-toward-zero) and
    DuckDB ``//`` (floor) agree on the negative side — the
    (|num| * 1e6) DIV s form runs on non-negative operands only.
    Zero-variance groups (all rewards equal) emit advantage 0, the
    GRPO degenerate-group convention.

    The floor-sqrt is EXACT by construction (``_isqrt_sql``): the
    variance numerator is bounded by n^2 * max_r^2 (< 2^52 for this
    fixture's 99-sample groups and <=56021-cent rewards), so both
    engines see the identical DOUBLE, IEEE sqrt is correctly
    rounded, and the one-step bracket correction pins floor(sqrt).
    TWO in-plan guards raise (remediation: rescale rewards) instead
    of silently degrading: the variance numerator against the 2^52
    exactness bound, and the advantage numerator against the
    (2^63-1) DIV 1e6 ppm-quantization bound (r14 ADVICE item 2 —
    independent bounds: a huge group of small rewards trips the
    second without the first).

    Scale: ONE hash shuffle keyed on prompt; the three group
    statistics ride the same per-prompt window partition. No
    driver-side anything."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    cand = ev.select(
        "user_id",
        "event_id",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias(
            "reward_cents"
        ),
    )
    wp = Window.partitionBy("user_id")
    g = cand.select(
        "*",
        F.count(F.lit(1)).over(wp).cast("long").alias("n"),
        F.sum("reward_cents").over(wp).cast("long").alias("sum_r"),
        F.sum(F.col("reward_cents") * F.col("reward_cents"))
        .over(wp)
        .cast("long")
        .alias("sum_r2"),
    )
    num = "n * reward_cents - sum_r"
    return g.select(
        "user_id",
        "event_id",
        "reward_cents",
        F.col("n").alias("n_samples"),
        F.col("sum_r").alias("group_sum_cents"),
        F.expr(
            # guards first: the exact-sqrt contract needs var_num
            # representable in DOUBLE, and the ppm quantization needs
            # |num| * 1e6 inside BIGINT (r14 ADVICE item 2: Spark is
            # non-ANSI here and would WRAP silently where DuckDB
            # raises — the unguarded product was the one hole in the
            # exactness story). Both guards are division-form
            # comparisons, so neither can itself overflow. Note the
            # 2^52 variance guard does NOT subsume this one: var_num
            # bounds n*sum_r2, but num is linear in reward while
            # sum_r is linear in n*reward — a 2^40-sized group of
            # small rewards passes the variance guard while
            # n*reward_cents alone tops 2^63/1e6.
            f"CAST(CASE WHEN sum_r2 > {_GRPO_SQRT_SAFE} DIV n THEN "
            f"raise_error(CONCAT('grpo_advantage_baseline: group ', "
            f"user_id, ' variance numerator would exceed 2^52; ', "
            f"'rescale rewards (cents -> dollars)')) "
            f"WHEN abs({num}) > {(2**63 - 1) // 1_000_000} THEN "
            f"raise_error(CONCAT('grpo_advantage_baseline: group ', "
            f"user_id, ' advantage numerator would overflow ppm ', "
            f"'quantization in BIGINT; rescale rewards')) "
            f"WHEN n * sum_r2 - sum_r * sum_r = 0 THEN 0 "
            f"ELSE (CASE WHEN {num} < 0 THEN -1 ELSE 1 END) * "
            f"((abs({num}) * 1000000) DIV "
            f"{_isqrt_sql('n * sum_r2 - sum_r * sum_r')}) "
            f"END AS BIGINT)"
        ).alias("adv_ppm"),
    )


# --- rejection-sampling fine-tuning keep set (r14) --------------------

_RFT_ANSWERS = 8  # answer space
_RFT_FP_BUCKETS = 512  # rationale fingerprint space (collisions = dups)
_RFT_KEEP = 4  # max kept per prompt, shortest-first


def _rft_sql(idiv: str) -> str:
    return f"""
WITH s AS (
  SELECT user_id, event_id,
         CAST({_mix('event_id * 41 + 7', _MIX2)} % {_RFT_ANSWERS}
              AS BIGINT) AS ans,
         CAST({_mix('event_id * 13 + 5', _MIX1)} % {_RFT_FP_BUCKETS}
              AS BIGINT) AS fp,
         CAST(30 + {_mix('event_id * 23 + 9', _MIX2)} % 300
              AS BIGINT) AS resp_len
  FROM events
),
c AS (
  SELECT * FROM s WHERE ans = user_id % {_RFT_ANSWERS}
),
d AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id, fp
           ORDER BY resp_len ASC, event_id ASC) AS rn_fp
  FROM c
),
k AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id
           ORDER BY resp_len ASC, event_id ASC) AS rn_len
  FROM d WHERE rn_fp = 1
),
agg AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(sum(CASE WHEN rn_len <= {_RFT_KEEP} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_kept,
         CAST(sum(CASE WHEN rn_len <= {_RFT_KEEP} THEN resp_len
                  ELSE 0 END) AS BIGINT) AS kept_len_sum,
         CAST(min(resp_len) AS BIGINT) AS min_len_kept
  FROM k GROUP BY 1
),
tot AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_samples,
         CAST(sum(CASE WHEN ans = user_id % {_RFT_ANSWERS}
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
  FROM s GROUP BY 1
)
SELECT t.user_id, t.n_samples, t.n_correct,
       COALESCE(a.n_distinct, 0) AS n_distinct,
       COALESCE(a.n_kept, 0) AS n_kept,
       COALESCE(a.kept_len_sum, 0) AS kept_len_sum,
       COALESCE(a.min_len_kept, 0) AS min_len_kept
FROM tot t LEFT JOIN agg a ON a.user_id = t.user_id
"""


@query("rejection_sampling_keep", oracle=_rft_sql("//"))
def rejection_sampling_keep(spark, sf_dir):
    """Rejection-sampling fine-tuning keep-set construction (STaR,
    Zelikman et al. 2022 / RFT, Yuan et al. 2023 — the standard
    reasoning-data bootstrap): per prompt (user), sampled solutions
    (events) are FILTERED to those whose answer matches gold,
    DEDUPLICATED by rationale fingerprint (identical chains add no
    signal — smallest length/event-id wins a bucket), then CAPPED at
    the 4 SHORTEST survivors (short correct rationales
    generalize better; the RFT length-preference). Per-prompt
    summary: samples, correct, distinct-after-dedup, kept count,
    kept length mass, shortest kept length; prompts with zero
    correct samples still emit an all-zero row (the retry queue).

    Answers / fingerprints / lengths are mix-derived fixtures
    replayed verbatim by the oracle. Scale: two per-prompt window
    ranks + one per-(prompt,fp) rank, all on the SAME prompt-keyed
    shuffle; output is one row per prompt."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    s = ev.select(
        "user_id",
        "event_id",
        F.expr(
            f"CAST({_mix('event_id * 41 + 7', _MIX2)} % {_RFT_ANSWERS}"
            " AS BIGINT)"
        ).alias("ans"),
        F.expr(
            f"CAST({_mix('event_id * 13 + 5', _MIX1)} %"
            f" {_RFT_FP_BUCKETS} AS BIGINT)"
        ).alias("fp"),
        F.expr(
            f"CAST(30 + {_mix('event_id * 23 + 9', _MIX2)} % 300"
            " AS BIGINT)"
        ).alias("resp_len"),
    )
    c = s.filter(
        F.col("ans") == F.col("user_id") % _RFT_ANSWERS
    )
    wfp = Window.partitionBy("user_id", "fp").orderBy(
        F.col("resp_len").asc(), F.col("event_id").asc()
    )
    wlen = Window.partitionBy("user_id").orderBy(
        F.col("resp_len").asc(), F.col("event_id").asc()
    )
    k = (
        c.withColumn("rn_fp", F.row_number().over(wfp))
        .filter(F.col("rn_fp") == 1)
        .withColumn("rn_len", F.row_number().over(wlen))
    )
    agg = k.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum((F.col("rn_len") <= _RFT_KEEP).cast("long"))
        .cast("long")
        .alias("n_kept"),
        F.sum(
            F.when(F.col("rn_len") <= _RFT_KEEP, F.col("resp_len"))
            .otherwise(F.lit(0))
        ).cast("long").alias("kept_len_sum"),
        F.min("resp_len").cast("long").alias("min_len_kept"),
    )
    tot = s.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_samples"),
        F.sum(
            (F.col("ans") == F.col("user_id") % _RFT_ANSWERS).cast(
                "long"
            )
        ).cast("long").alias("n_correct"),
    )
    return tot.join(agg, "user_id", "left").select(
        "user_id",
        "n_samples",
        "n_correct",
        F.coalesce("n_distinct", F.lit(0).cast("long")).alias(
            "n_distinct"
        ),
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce("kept_len_sum", F.lit(0).cast("long")).alias(
            "kept_len_sum"
        ),
        F.coalesce("min_len_kept", F.lit(0).cast("long")).alias(
            "min_len_kept"
        ),
    )


# --- speculative decoding acceptance audit (r14) ----------------------

_SPEC_T = 32  # draft positions per prompt
_SPEC_K = 8  # draft window (gamma)
_SPEC_V = 50  # token space
_SPEC_REJ_MOD = 4  # 1-in-4 target disagreement rate


def _spec_sql(idiv: str) -> str:
    d = f"CAST({_mix('d.doc_id * 64 + t.t', _MIX1)} % {_SPEC_V} AS BIGINT)"
    rej = f"({_mix('d.doc_id * 64 + t.t + 7', _MIX2)} % {_SPEC_REJ_MOD})"
    return f"""
WITH tok AS (
  SELECT d.doc_id, t.t,
         CAST(t.t {idiv} {_SPEC_K} AS BIGINT) AS w,
         CAST(t.t % {_SPEC_K} AS BIGINT) AS pos,
         {d} AS draft,
         CASE WHEN {rej} = 0
              THEN ({d} + 1) % {_SPEC_V}
              ELSE {d} END AS target
  FROM documents d, range({_SPEC_T}) t(t)
),
win AS (
  SELECT doc_id, w,
         CAST(COALESCE(min(CASE WHEN draft != target THEN pos END),
                       {_SPEC_K}) AS BIGINT) AS accepted
  FROM tok GROUP BY 1, 2
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(accepted) AS BIGINT) AS accepted_total,
       CAST(sum(accepted + 1) AS BIGINT) AS emitted_total,
       CAST(sum(accepted) * 1000000
            {idiv} ({_SPEC_K} * count(*)) AS BIGINT)
         AS accept_rate_ppm,
       CAST(sum(accepted + 1) * 1000000 {idiv} count(*) AS BIGINT)
         AS tokens_per_call_micro
FROM win GROUP BY 1
"""


@query("speculative_decode_accept", oracle=_spec_sql("//"))
def speculative_decode_accept(spark, sf_dir):
    """Speculative-decoding acceptance audit (Leviathan et al. 2023 /
    Chen et al. 2023): per prompt (document), the draft model
    proposes windows of gamma=8 tokens and the target model accepts
    the longest agreeing prefix; each target forward pass then emits
    accepted+1 tokens (the correction/bonus token). The audit
    reports, per prompt, the window count, total accepted draft
    tokens, total emitted tokens, the acceptance RATE (ppm of draft
    positions accepted) and TOKENS PER TARGET CALL (micro; the
    speedup factor vs one-token-per-call autoregressive decoding) —
    the numbers a serving stack uses to pick gamma and decide whether
    the draft model pays for itself.

    Draft/target streams are mix-derived fixtures with a 1-in-4
    disagreement; the acceptance scan is the real computation
    (min-mismatch-position per window). Scale: the token dimension
    explodes map-side (32 rows per prompt, no shuffle); ONE hash
    aggregation per (prompt, window) then per prompt."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    d = f"CAST({_mix('doc_id * 64 + t', _MIX1)} % {_SPEC_V} AS BIGINT)"
    rej = f"({_mix('doc_id * 64 + t + 7', _MIX2)} % {_SPEC_REJ_MOD})"
    tok = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_SPEC_T - 1))).alias("t"),
    ).select(
        "doc_id",
        F.expr(f"CAST(t DIV {_SPEC_K} AS BIGINT)").alias("w"),
        F.expr(f"CAST(t % {_SPEC_K} AS BIGINT)").alias("pos"),
        F.expr(d).alias("draft"),
        F.expr(
            f"CASE WHEN {rej} = 0 THEN ({d} + 1) % {_SPEC_V} "
            f"ELSE {d} END"
        ).alias("target"),
    )
    win = tok.groupBy("doc_id", "w").agg(
        F.expr(
            f"CAST(COALESCE(min(CASE WHEN draft != target THEN pos "
            f"END), {_SPEC_K}) AS BIGINT)"
        ).alias("accepted")
    )
    return win.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.sum("accepted").cast("long").alias("accepted_total"),
        F.sum(F.col("accepted") + 1).cast("long").alias(
            "emitted_total"
        ),
        F.expr(
            f"CAST(sum(accepted) * 1000000 DIV ({_SPEC_K} * count(*))"
            " AS BIGINT)"
        ).alias("accept_rate_ppm"),
        F.expr(
            "CAST(sum(accepted + 1) * 1000000 DIV count(*) AS BIGINT)"
        ).alias("tokens_per_call_micro"),
    )


# --- MoE router load-balance audit (r15) ------------------------------

MOE_EXPERTS = 8  # expert count (top-2 routing, the Switch/GShard shape)
_MOE_SCALE = 1_000_000


def _moe_score(idiv: str, e: str) -> str:
    """Deterministic router logit for (token, expert) in [1, 1000]:
    the house double mix (high-bit diffusion) over event_id*8+e,
    replayable verbatim in both engines."""
    raw = f"(event_id * {MOE_EXPERTS} + {e})"
    m1 = _mix(raw, _MIX2)
    return (
        f"(1 + {_mix(f'({m1}) {idiv} 65536 + {raw}', _MIX2)} % 1000)"
    )


def _moe_sql(idiv: str) -> str:
    return f"""
WITH t AS (
  SELECT event_id FROM events
),
s AS (
  SELECT event_id, ex.e AS e,
         CAST({_moe_score(idiv, 'ex.e')} AS BIGINT) AS s
  FROM t, (SELECT unnest(generate_series(0, {MOE_EXPERTS - 1})) AS e)
       ex
),
tot AS (
  SELECT event_id, CAST(sum(s) AS BIGINT) AS sum_all
  FROM s GROUP BY 1
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY event_id ORDER BY s DESC, e ASC) AS rk
  FROM s
),
top AS (
  SELECT event_id,
         max(CASE WHEN rk = 1 THEN e END) AS e1,
         max(CASE WHEN rk = 1 THEN s END) AS s1,
         max(CASE WHEN rk = 2 THEN e END) AS e2,
         max(CASE WHEN rk = 2 THEN s END) AS s2
  FROM r GROUP BY 1
),
per AS (
  SELECT s.e,
         CAST(sum(CASE WHEN s.e = top.e1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_top1,
         CAST(sum(CASE WHEN s.e IN (top.e1, top.e2) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_top2,
         CAST(sum(CASE WHEN s.e = top.e1
                       THEN top.s1 * {_MOE_SCALE} {idiv}
                            (top.s1 + top.s2)
                       WHEN s.e = top.e2
                       THEN top.s2 * {_MOE_SCALE} {idiv}
                            (top.s1 + top.s2)
                       ELSE 0 END) AS BIGINT) AS gate_sum,
         CAST(sum(s.s * {_MOE_SCALE} {idiv} tot.sum_all) AS BIGINT)
           AS p_sum
  FROM s
  JOIN top USING (event_id)
  JOIN tot USING (event_id)
  GROUP BY 1
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM t)
SELECT CAST(per.e AS BIGINT) AS expert,
       per.n_top1,
       per.n_top2,
       per.n_top1 * {_MOE_SCALE} {idiv} n.n_tokens AS f_ppm,
       per.p_sum {idiv} n.n_tokens AS p_mean_ppm,
       ({MOE_EXPERTS} * (per.n_top1 * {_MOE_SCALE} {idiv} n.n_tokens)
        * (per.p_sum {idiv} n.n_tokens)) {idiv} {_MOE_SCALE}
         AS aux_ppm,
       per.gate_sum {idiv} GREATEST(per.n_top2, 1) AS gate_mean_ppm
FROM per, n
"""


@query("moe_router_load", oracle=_moe_sql("//"))
def moe_router_load(spark, sf_dir):
    """Mixture-of-Experts router load-balance audit (Shazeer et al.
    2017 top-k routing; Fedus et al. 2021 Switch auxiliary loss) —
    the training-infra health check every MoE run watches: per
    expert, the top-1 token fraction f, the mean (linear-normalized)
    router probability P, their Switch aux-loss contribution
    E*f_e*P_e, top-2 routed counts, and the mean top-2 gate share.
    Router logits are deterministic double-mixed hashes in [1,1000]
    (the fixture stands in for a learned router; the AUDIT
    arithmetic is the real thing); P uses the linear score
    normalization score/sum — not softmax — so the whole audit is
    integer-ppm exact (float exp diverges between engines by design
    rule; documented deviation).

    Plan: the 8 per-token logits and the top-2 selection are PURE
    MAP-SIDE — an array of (-score, expert) structs sorted
    ascending (= score desc, expert asc) inside the row, no window,
    no shuffle; the only shuffle is the 8-rows-per-token explode's
    partial-agg down to 8 expert rows, plus one broadcast token
    count. The oracle selects top-2 via window row_number instead —
    structurally different. At 100 TB: per-token work is constant
    (E=8), the shuffle carries 8 fixed-width rows per token pre-agg
    (map-side combine collapses them to 8 rows per partition)."""
    ev = load(spark, sf_dir, "events").select("event_id")
    scores = [
        F.expr(_moe_score("DIV", str(e))).cast("long").alias(f"sc{e}")
        for e in range(MOE_EXPERTS)
    ]
    st = ev.select("event_id", *scores)
    arr = F.array(
        *[
            F.struct(
                (-F.col(f"sc{e}")).alias("ns"),
                F.lit(e).cast("long").alias("e"),
                F.col(f"sc{e}").alias("s"),
            )
            for e in range(MOE_EXPERTS)
        ]
    )
    srt = F.sort_array(arr)  # asc on (-score, expert)
    t = st.select(
        "event_id",
        *[F.col(f"sc{e}") for e in range(MOE_EXPERTS)],
        F.element_at(srt, 1)["e"].alias("e1"),
        F.element_at(srt, 1)["s"].alias("s1"),
        F.element_at(srt, 2)["e"].alias("e2"),
        F.element_at(srt, 2)["s"].alias("s2"),
        sum(
            [F.col(f"sc{e}") for e in range(MOE_EXPERTS)], F.lit(0)
        ).cast("long").alias("sum_all"),
    )
    ex = t.select(
        "event_id",
        "e1",
        "s1",
        "e2",
        "s2",
        "sum_all",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(e).cast("long").alias("e"),
                        F.col(f"sc{e}").alias("s"),
                    )
                    for e in range(MOE_EXPERTS)
                ]
            )
        ).alias("es"),
    ).select(
        "event_id", "e1", "s1", "e2", "s2", "sum_all",
        F.col("es.e").alias("e"), F.col("es.s").alias("s"),
    )
    per = ex.groupBy("e").agg(
        F.sum((F.col("e") == F.col("e1")).cast("long"))
        .cast("long").alias("n_top1"),
        F.sum(
            ((F.col("e") == F.col("e1")) | (F.col("e") == F.col("e2")))
            .cast("long")
        ).cast("long").alias("n_top2"),
        F.sum(
            F.when(
                F.col("e") == F.col("e1"),
                F.expr(f"s1 * {_MOE_SCALE} DIV (s1 + s2)"),
            )
            .when(
                F.col("e") == F.col("e2"),
                F.expr(f"s2 * {_MOE_SCALE} DIV (s1 + s2)"),
            )
            .otherwise(F.lit(0))
        ).cast("long").alias("gate_sum"),
        F.sum(F.expr(f"s * {_MOE_SCALE} DIV sum_all"))
        .cast("long").alias("p_sum"),
    )
    n = ev.agg(F.count(F.lit(1)).cast("long").alias("n_tokens"))
    return (
        per.crossJoin(F.broadcast(n))
        .select(
            F.col("e").alias("expert"),
            "n_top1",
            "n_top2",
            F.expr(f"n_top1 * {_MOE_SCALE} DIV n_tokens").alias(
                "f_ppm"
            ),
            F.expr("p_sum DIV n_tokens").alias("p_mean_ppm"),
            F.expr(
                f"({MOE_EXPERTS} * (n_top1 * {_MOE_SCALE} DIV n_tokens)"
                f" * (p_sum DIV n_tokens)) DIV {_MOE_SCALE}"
            ).alias("aux_ppm"),
            F.expr("gate_sum DIV GREATEST(n_top2, 1)").alias(
                "gate_mean_ppm"
            ),
        )
    )


# --- RLHF KL budget audit (Schulman 2020 estimators; r15) -------------

KL_BUDGET_MICRO = 42_000  # per-prompt k2 budget in micro-nats


def _kl_delta(idiv: str) -> str:
    """Synthetic per-sample logprob difference log pi - log rho in
    micro-nats, uniform on [-500000, 500000] via the house double
    mix — the ESTIMATOR arithmetic is the real thing."""
    raw = "(event_id * 29 + 11)"
    m1 = _mix(raw, _MIX1)
    return (
        f"({_mix(f'({m1}) {idiv} 65536 + {raw}', _MIX1)}"
        f" % 1000001 - 500000)"
    )


def _kl_sql(idiv: str) -> str:
    return f"""
WITH s AS (
  SELECT user_id, CAST({_kl_delta(idiv)} AS BIGINT) AS d
  FROM events
),
g AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_samples,
         CAST(sum(d) AS BIGINT) AS sum_d_micro,
         CAST(sum(d * d) AS BIGINT) AS sum_d2
  FROM s GROUP BY 1
)
SELECT user_id, n_samples, sum_d_micro,
       (CASE WHEN sum_d_micro < 0 THEN -1 ELSE 1 END)
         * (abs(sum_d_micro) {idiv} n_samples) AS k1_micro,
       sum_d2 {idiv} (2 * n_samples * 1000000) AS k2_micro,
       CAST(sum_d2 {idiv} (2 * n_samples * 1000000)
            > {KL_BUDGET_MICRO} AS BIGINT) AS over_budget
FROM g
"""


@query("rlhf_kl_budget", oracle=_kl_sql("//"))
def rlhf_kl_budget(spark, sf_dir):
    """Per-prompt KL-divergence budget audit for RLHF/RLVR training
    (Schulman 2020, "Approximating KL Divergence"): given sampled
    per-token logprob differences d = log pi - log rho (micro-nats;
    synthesized deterministically here — the estimator arithmetic is
    the audited artifact), report the k1 estimator mean(d) (unbiased,
    high-variance, sign-split integer division so Spark DIV and
    DuckDB // agree on negative sums — the GRPO lesson) and the k2
    estimator mean(d^2)/2 (low-variance, always >= 0; the PPO-KL
    penalty default), plus a budget flag. k3 = mean(exp(-d) - 1 + d)
    is deliberately OMITTED: float exp diverges between engines (the
    module's exactness rule); k1/k2 are the integer-exact pair.

    Scale: ONE prompt-keyed partial-agg shuffle of (count, sum,
    sum-of-squares) — the classic mergeable-moments shape; d^2 sums
    stay < 2^63 for any group below ~3.7e4 billion samples."""
    ev = load(spark, sf_dir, "events")
    s = ev.select(
        "user_id",
        F.expr(_kl_delta("DIV")).cast("long").alias("d"),
    )
    g = s.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_samples"),
        F.sum("d").cast("long").alias("sum_d_micro"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sum_d2"),
    )
    return g.select(
        "user_id",
        "n_samples",
        "sum_d_micro",
        F.expr(
            "(CASE WHEN sum_d_micro < 0 THEN -1 ELSE 1 END)"
            " * (abs(sum_d_micro) DIV n_samples)"
        ).alias("k1_micro"),
        F.expr("sum_d2 DIV (2 * n_samples * 1000000)").alias(
            "k2_micro"
        ),
        F.expr(
            f"CAST(sum_d2 DIV (2 * n_samples * 1000000)"
            f" > {KL_BUDGET_MICRO} AS LONG)"
        ).alias("over_budget"),
    )


# --- distillation disagreement mining (r15) ---------------------------

_DIST_CLASSES = 8
_DIST_KEEP = 16  # per-teacher-class cap, smallest-margin first


def _dist_t(idiv: str, c: str) -> str:
    raw = f"(event_id * {_DIST_CLASSES} + {c})"
    m1 = _mix(raw, _MIX1)
    return f"({_mix(f'({m1}) {idiv} 65536 + {raw}', _MIX1)} % 1000)"


def _dist_noise(idiv: str, c: str) -> str:
    """The bounded-noise term of the student logit (0..400); the
    student logit itself is ``t + noise - 200`` (see _dist_s)."""
    raw = f"(event_id * {_DIST_CLASSES} + {c} + 7919)"
    m1 = _mix(raw, _MIX2)
    return f"({_mix(f'({m1}) {idiv} 65536 + {raw}', _MIX2)} % 401)"


def _dist_s(idiv: str, c: str) -> str:
    return f"({_dist_t(idiv, c)} + {_dist_noise(idiv, c)} - 200)"


def _dist_sql(idiv: str) -> str:
    return f"""
WITH s AS (
  SELECT event_id, cx.c AS c,
         CAST({_dist_t(idiv, 'cx.c')} AS BIGINT) AS t,
         CAST({_dist_s(idiv, 'cx.c')} AS BIGINT) AS st
  FROM events,
       (SELECT unnest(generate_series(0, {_DIST_CLASSES - 1})) AS c)
       cx
),
preds AS (
  SELECT event_id,
         max(CASE WHEN rt = 1 THEN c END) AS teacher_pred,
         max(CASE WHEN rs = 1 THEN c END) AS student_pred
  FROM (
    SELECT *,
           row_number() OVER (PARTITION BY event_id
             ORDER BY t DESC, c ASC) AS rt,
           row_number() OVER (PARTITION BY event_id
             ORDER BY st DESC, c ASC) AS rs
    FROM s
  ) GROUP BY 1
),
dis AS (
  SELECT p.event_id, p.teacher_pred, p.student_pred,
         tt.t - ts.t AS margin
  FROM preds p
  JOIN s tt ON tt.event_id = p.event_id AND tt.c = p.teacher_pred
  JOIN s ts ON ts.event_id = p.event_id AND ts.c = p.student_pred
  WHERE p.teacher_pred <> p.student_pred
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY teacher_pred
    ORDER BY margin ASC, event_id ASC) AS rn
  FROM dis
)
SELECT event_id, CAST(teacher_pred AS BIGINT) AS teacher_pred,
       CAST(student_pred AS BIGINT) AS student_pred,
       CAST(margin AS BIGINT) AS margin,
       CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {_DIST_KEEP}
"""


@query("distill_disagreement_set", oracle=_dist_sql("//"))
def distill_disagreement_set(spark, sf_dir):
    """Active distillation data selection (Hinton et al. 2015
    distillation + uncertainty-sampling active learning): examples
    where the student's argmax DISAGREES with the teacher's, ranked
    by the teacher's confidence margin (logit gap between its own
    pick and the student's pick — small margin = boundary example,
    the informative kind), capped at {16} per teacher class. Teacher
    logits are deterministic double-mixed integers; student logits
    are teacher + bounded noise, so agreement is the common case and
    the disagreement set is the interesting tail — the SELECTION
    arithmetic is the audited artifact.

    Plan: both argmaxes are PURE MAP-SIDE (sorted struct arrays, the
    moe_router discipline — the oracle uses window ranks instead, no
    shared structure); margins come from the same row's logit
    columns (no self-join, unlike the oracle's); the only shuffle is
    the per-teacher-class cap window over the DISAGREEMENT SUBSET
    (the tail, not the corpus).

    Perf (r15 optimization round): two map-side fixes, same values.
    (a) The student logit is teacher + noise; writing both fields as
    independent expressions evaluated the teacher double-mix TWICE
    per class element — the nested transform binds the teacher value
    once (``x.t``) and derives ``u`` from it. (b) The disagreement
    filter used to be pushed below the logit projection, re-inlining
    the whole 8-class mix array into the Filter node twice (one full
    argmax per side, per row, on top of the projection's own copy —
    3x the map work); ``preds`` is persisted (registry cache
    contract) so the filter and the cap window read the 4 cached
    BIGINT columns instead."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select("event_id")
    # ONE array-of-structs expression over a class lambda variable:
    # writing the 8 teacher + 8 student logits as separate columns
    # made CollapseProject re-inline the big mix expressions into
    # every downstream reference (~30 s of codegen at sf0.001); the
    # transform form keeps the plan one compact expression. The inner
    # transform computes the teacher logit and the raw noise term
    # once per class; the outer one assembles u = t + noise - 200
    # without re-evaluating the mixes.
    lg = F.expr(
        "transform(transform(sequence(0, "
        + str(_DIST_CLASSES - 1)
        + "), c -> struct(CAST(c AS LONG) AS c, "
        "CAST(" + _dist_t("DIV", "c") + " AS LONG) AS t, "
        "CAST(" + _dist_noise("DIV", "c") + " AS LONG) AS nz)), "
        "x -> struct(x.c AS c, x.t AS t, x.t + x.nz - 200 AS u))"
    )
    base = ev.select("event_id", lg.alias("lg"))
    tp = F.element_at(
        F.array_sort(
            F.expr("transform(lg, x -> struct(-x.t AS ns, x.c AS c))")
        ),
        1,
    )["c"]
    sp = F.element_at(
        F.array_sort(
            F.expr("transform(lg, x -> struct(-x.u AS ns, x.c AS c))")
        ),
        1,
    )["c"]
    preds = base.select(
        "event_id",
        tp.alias("teacher_pred"),
        sp.alias("student_pred"),
        F.expr("transform(lg, x -> x.t)").alias("_t"),
    ).select(
        "event_id",
        "teacher_pred",
        "student_pred",
        (
            F.element_at(
                "_t", (F.col("teacher_pred") + 1).cast("int")
            )
            - F.element_at(
                "_t", (F.col("student_pred") + 1).cast("int")
            )
        ).cast("long").alias("margin"),
    ).persist().filter(F.col("teacher_pred") != F.col("student_pred"))
    w = Window.partitionBy("teacher_pred").orderBy(
        F.col("margin").asc(), F.col("event_id").asc()
    )
    return (
        preds.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _DIST_KEEP)
        .select("event_id", "teacher_pred", "student_pred",
                "margin", "rn")
    )
