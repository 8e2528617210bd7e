"""Interpolated n-gram language-model perplexity scoring
(beyond-reference; north-star text analysis).

The standard LLM-corpus quality filter (CCNet / Gopher / RedPajama
style): train a word-level n-gram LM on the corpus, score each
document by its cross-entropy under that model, and gate on the
score — gibberish and wrong-charset text scores high surprisal,
boilerplate scores low. This module trains and applies the model in
ONE distributed plan: a Jelinek-Mercer-interpolated trigram model

    p(w3 | w1 w2) = 0.5 * C(w1w2w3)/C(w1w2)      (trigram ML)
                  + 0.3 * C(w2w3)/C(w2)          (bigram backoff)
                  + 0.2 * C(w3)/N                (unigram backoff)

with counts taken from the corpus being scored, so every n-gram in a
document has nonzero ML probability and no smoothing floor is needed.

Oracle-exactness (the reason for the integer staging): each ML
component is quantized ONCE per distinct trigram type to integer
parts-per-billion via BIGINT ``DIV`` (``(C_num * 1e9) DIV C_den``),
the interpolation is exact integer arithmetic
(``(5*p3 + 3*p2 + 2*p1) DIV 10``), and only then does a single
``floor(1e6 * ln(1e9 / p_ppb))`` convert the rational probability to
integer micro-nats — the same discipline as
``char_unigram_surprisal`` (queries/text_analysis.py), so every
per-document sum is exact BIGINT arithmetic that DuckDB replays
bit-identically. Perplexity = exp(mean_surprisal_micro / 1e6); the
exp is left to the consumer to keep the gated columns integral.

Scale design (100 TB):
- Trigrams are built by a map-side ``transform`` over each doc's own
  token array — no window, no per-doc shuffle. The only shuffles are
  hash partial-aggregations on n-gram keys (<= 3 small string cols;
  document text never moves) and the score join on the trigram key.
- The scored-trigram table is corpus-sized (distinct trigram types),
  so the apply join is a shuffle hash join on (w1,w2,w3) — NOT a
  broadcast. Unigram/bigram denominators join the trigram table on
  term keys the same way; N joins as a broadcast 1-row aggregate.
- The tokenized corpus is persisted once and read by the four count
  branches + the final doc rollup within the single materializing
  action (registry cache contract, registry.py:12).
- ppb quantization bounds: ``C * 1e9`` overflows BIGINT at
  C > ~9.2e9 token occurrences for one n-gram type; a 100 TB corpus
  needs the scale dropped to 1e6 (ppm) via the ``scale`` parameter
  (the interpolation weights and plan shape are unchanged by the
  scale constant). This is GUARDED, not just documented: the plan
  carries ``max(unigram count)`` on the same broadcast 1-row
  aggregate as N and raises in-plan (``raise_error``) the moment any
  count could overflow ``count * scale`` — every numerator in the
  ppb expressions (trigram, bigram, unigram counts) is bounded by
  the max unigram count, so one comparison covers all three. A
  100 TB run fails loud with the remediation in the message instead
  of silently wrapping.

Reference twin: none — the reference (Idanconley123/advisoryDataPipeline)
has no text-statistics code; this is north-star LLM-pipeline surface
(SURVEY.md §2 beyond-reference block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from advisorydatapipeline_spark.functions.text import tokens

PPB = 1_000_000_000  # probability quantum: parts-per-billion
MICRO = 1_000_000  # surprisal quantum: micro-nats

# Jelinek-Mercer interpolation weights (tri, bi, uni) in tenths:
# exact integer mix  (5*p3 + 3*p2 + 2*p1) DIV 10.
LAMBDA_TENTHS = (5, 3, 2)


def kneser_ney_bigram_scores(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = PPB,
) -> DataFrame:
    """Per-document surprisal under an INTERPOLATED KNESER-NEY bigram
    LM (Kneser & Ney 1995; the KenLM default) — the canonical n-gram
    smoothing, distinguished from the Jelinek-Mercer mix in
    :func:`ngram_lm_doc_scores` by its two hallmarks:

    - the lower-order distribution is the CONTINUATION probability
      P_cont(w2) = N1+(.w2) / N1+(..)  (type counts: in how many
      distinct contexts does w2 appear — "Francisco" is frequent but
      follows only "San", so its continuation mass is tiny);
    - the higher order is ABSOLUTE-DISCOUNTED with D estimated from
      the corpus's own count-of-counts, D = n1 / (n1 + 2*n2), and the
      freed mass lambda(w1) = D * N1+(w1.) / c(w1.) backs off.

    Exactness: D stays the exact RATIONAL dn/dd (dn = n1,
    dd = n1 + 2*n2), so the discounted term is
    (cb*dd - dn) / (dd*ctx1) with NO float discount; the model is
    quantized at exactly three documented floor points the oracle
    replays verbatim:

      disc_ppb = ((cb*dd - dn) * scale) DIV (dd * ctx1)
      lam_ppb  = ((dn * n1w1) * scale) DIV (dd * ctx1)
      p_ppb    = GREATEST(disc_ppb + (lam_ppb * ncw2) DIV nall, 1)

    then one float ln to micro-nats (the char_unigram_surprisal
    discipline). cb >= 1 and dn < dd make cb*dd - dn > 0 — observed
    bigrams need no max(.., 0) clamp.

    Scale (100 TB): counts/type-counts are hash partial-aggs on
    string keys; the context totals ctx(w1) = sum_w2 cb reuse the
    bigram table (no second corpus pass); count-of-counts (n1, n2,
    nall, max bounds) ride ONE broadcast 1-row aggregate; the apply
    join is a shuffle hash join on (w1, w2). Overflow is GUARDED
    in-plan like ngram_lm_doc_scores, and every guard is a DIVISION
    comparison over broadcast 1-row aggregates (r13 ADVICE: the
    guard products themselves must not wrap before the comparison):
    cb*dd*scale AND dn*n1w1*scale via GREATEST(max_cb, max_t1) vs
    max_safe DIV dd (dn <= dd, n1w1 <= max_t1 the max per-context
    type count — the TIGHT r15 bound; the earlier dn-vs-nall form
    false-tripped on corpora whose singleton-type count is large
    even though every real per-row product is small, the kn5 sf0.1
    lesson); lam_ppb*ncw2 via nall > max_safe (lam_ppb <= scale,
    ncw2 <= nall); and the raw denominator dd*ctx1 via dd vs
    (2^63-1) DIV sum_cb (ctx1 <= sum_cb). Any trip raises with the
    remediation (scale=1_000_000).

    Returns: doc_id, n_tokens, n_bigrams, surprisal_micro,
    mean_surprisal_micro (NULL when the doc has < 2 tokens).
    """
    out, handles = kneser_ney_bigram_plan(
        docs, id_col=id_col, text_col=text_col, scale=scale
    )
    # eager materialize + unpersist: the leak discipline shared with
    # the trigram version below; the un-materialized plan stays
    # inspectable via kneser_ney_bigram_plan (r15 — the r14 ADVICE
    # blind spot: the checkpointed result is a Scan ExistingRDD, so
    # plan-shape coverage lives in tests/test_explain_plans.py and
    # tools/plan_audit.py's CHECKPOINTED seam table, both of which
    # audit THIS lazy plan).
    try:
        res = out.localCheckpoint(eager=True)
    finally:
        for h in handles:
            h.unpersist()
    return res


def kneser_ney_bigram_plan(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = PPB,
) -> tuple[DataFrame, list[DataFrame]]:
    """The lazy plan behind :func:`kneser_ney_bigram_scores`: returns
    ``(result, persisted handles)`` so plan-only callers (the pinned
    plan-shape pytest and tools/plan_audit.py) can inspect the real
    physical plan and unpersist without materializing."""
    max_safe = (2**63 - 1) // scale
    tk = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("tk")
    ).persist()

    bi_doc = (
        _ngram_rows(tk, 2, ("w1", "w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .persist()
    )
    bi = bi_doc.groupBy("w1", "w2").agg(
        F.sum("cnt").cast("long").alias("cb")
    ).persist()
    ctx = bi.groupBy("w1").agg(
        F.sum("cb").cast("long").alias("ctx1"),
        F.count(F.lit(1)).cast("long").alias("n1w1"),
    )
    cont = bi.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("ncw2")
    )
    # max per-context type count for the lam-numerator bound: the r15
    # tight guard (the old dn-vs-nall bound false-tripped on corpora
    # where dn*nall is astronomical but the REAL product dn*t is tiny
    # — the kn5 sf0.1 lesson; dn <= dd, so dd*max_t bounds dn*t)
    mt = ctx.agg(F.max("n1w1").cast("long").alias("max_t1"))
    # D = n1/(n1+2n2) is undefined on a corpus with NO count-1/2
    # bigram types (possible on low-entropy synthetic corpora);
    # textbook fallback is the default discount D = 1/2, kept
    # rational as (dn, dd) = (1, 2) so exactness is untouched.
    model = bi.agg(
        F.sum((F.col("cb") == 1).cast("long")).cast("long").alias("_n1"),
        (
            F.sum((F.col("cb") == 1).cast("long"))
            + 2 * F.sum((F.col("cb") == 2).cast("long"))
        ).cast("long").alias("_dd"),
        F.count(F.lit(1)).cast("long").alias("nall"),
        F.max("cb").cast("long").alias("max_cb"),
        F.sum("cb").cast("long").alias("sum_cb"),
    ).select(
        F.when(F.col("_dd") == 0, F.lit(1).cast("long"))
        .otherwise(F.col("_n1")).alias("dn"),
        F.when(F.col("_dd") == 0, F.lit(2).cast("long"))
        .otherwise(F.col("_dd")).alias("dd"),
        "nall",
        "max_cb",
        "sum_cb",
    )

    sc = (
        bi.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(model))
        .crossJoin(F.broadcast(mt))
        .select(
            "w1",
            "w2",
            F.expr(
                # Division-form guards: every comparison operand is a
                # pre-bounded BIGINT off the broadcast rows, so the
                # guards themselves cannot wrap (r14, closing r13
                # ADVICE item 1). Covered products, in order: cb*dd
                # (then *scale) via max_cb; dn*n1w1 (then *scale) via
                # dd*max_t1 (dn<=dd, n1w1<=max_t1 — the TIGHT r15
                # bound; the old dn-vs-nall form false-tripped at
                # corpus scale); lam_ppb*ncw2 (lam_ppb<=scale,
                # ncw2<=nall) via nall; the raw denominator dd*ctx1
                # (ctx1<=sum_cb, vs 2^63-1).
                f"CASE WHEN GREATEST(max_cb, max_t1) > {max_safe} DIV dd"
                f" OR nall > {max_safe}"
                f" OR dd > {2**63 - 1} DIV GREATEST(sum_cb, 1) THEN "
                f"CAST(raise_error(CONCAT("
                f"'kneser_ney_bigram_scores: count-of-counts scale ', "
                f"dd, ' would overflow count*{scale} in BIGINT; ', "
                f"'re-run with scale=1000000 (ppm)')) AS BIGINT) "
                f"ELSE GREATEST("
                f"(((cb * dd - dn) * {scale}) DIV (dd * ctx1))"
                f" + (((((dn * n1w1) * {scale}) DIV (dd * ctx1))"
                f" * ncw2) DIV nall), CAST(1 AS BIGINT)) END"
            ).alias("p_ppb"),
        )
        .select(
            "w1",
            "w2",
            F.floor(
                MICRO * F.log(F.lit(float(scale)) / F.col("p_ppb"))
            ).cast("long").alias("s_micro"),
        )
    )

    agg = (
        bi_doc.join(sc, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_bigrams"),
            F.sum(F.col("cnt") * F.col("s_micro")).cast("long").alias(
                "surprisal_micro"
            ),
            F.expr(
                "CAST(sum(cnt * s_micro) DIV sum(cnt) AS BIGINT)"
            ).alias("mean_surprisal_micro"),
        )
    )
    out = (
        tk.select("doc_id", F.size("tk").cast("long").alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias(
                "n_bigrams"
            ),
            "surprisal_micro",
            "mean_surprisal_micro",
        )
    )
    return out, [tk, bi_doc, bi]


def kneser_ney_trigram_scores(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = PPB,
) -> DataFrame:
    """Per-document surprisal under an interpolated KNESER-NEY
    TRIGRAM LM with full backoff recursion (Chen & Goodman 1999's
    interpolated-KN formulation; KenLM's default order is 5 — the
    trigram proves the recursion generalizes beyond
    :func:`kneser_ney_bigram_scores`'s single backoff level):

        p(w3|w1w2) = (c(w1w2w3) - D3)+ / c(w1w2.)
                   + lam3(w1w2) * p_KN(w3|w2)
        p_KN(w3|w2) = (cc(w2w3) - D2)+ / cc(w2.)
                   + lam2(w2) * P_cont(w3)

    with MODIFIED lower-order counts (the KN hallmark, one level
    deeper than the bigram version): cc(w2w3) = N1+(.w2w3) — in how
    many distinct left contexts w1 does the bigram occur — and
    P_cont(w3) = N1+(.w3) / N1+(..) taken over those modified
    bigram types, so each lower level counts TYPES of the level
    above, never raw tokens. Each level's absolute discount is the
    exact RATIONAL D = n1/(n1+2n2) from that level's own
    count-of-counts, with the independent degenerate fallback
    (dn, dd) = (1, 2) when a level has no count-1/2 types (the
    sf0.1 synthetic-corpus lesson, pytest-pinned per level).

    Exactness: five documented ppb floor points replayed verbatim
    by the oracle —

      p2_ppb   = ((cc*dd2 - dn2) * scale) DIV (dd2 * ctxc)
      lam2_ppb = ((dn2 * t2) * scale) DIV (dd2 * ctxc)
      pl_ppb   = p2_ppb + (lam2_ppb * ncw3) DIV nall
      p3_ppb   = ((c3*dd3 - dn3) * scale) DIV (dd3 * c2ctx)
      lam3_ppb = ((dn3 * t3) * scale) DIV (dd3 * c2ctx)
      p_ppb    = GREATEST(p3_ppb + (lam3_ppb * pl_ppb) DIV scale, 1)

    then one float ln to micro-nats. Scored trigrams are observed
    by construction (model trained on the corpus being scored), so
    cc >= 1 and the discounted numerators never go negative
    (cb*dd - dn >= dd*(cb-1) >= 0).

    Scale (100 TB): counts are hash partial-aggs on <=3 string keys
    (the modified counts cc are a count(*) over distinct trigram
    TYPES — one extra shuffle on (w2,w3), never a second corpus
    pass); both count-of-counts rows ride broadcast 1-row
    aggregates; the apply join is a shuffle hash join on
    (w1,w2,w3). Overflow guards are DIVISION comparisons over the
    broadcast rows (pre-bounded operands, the r14 lm discipline,
    TIGHTENED r15 — the kn5 sf0.1 lesson: lam numerators are bounded
    by dd*max_t, the max per-context type count, not by the global
    type count, which false-trips on singleton-heavy corpora):
    GREATEST(max_c3, max_t3) vs max_safe DIV dd3 (dn3 <= dd3,
    t3 <= max_t3), GREATEST(max_cc, max_t2) vs max_safe DIV dd2,
    nall vs max_safe (lam2_ppb <= scale, ncw3 <= nall), and the raw
    denominators dd3*c2ctx / dd2*ctxc via (2^63-1) DIV
    sum-of-counts bounds. lam3_ppb*pl_ppb <=
    2*scale^2 < 2^63 for scale <= 1e9, so the final mix needs no
    guard. Any trip raises in-plan with the scale=1_000_000
    remediation.

    Returns: doc_id, n_tokens, n_trigrams, surprisal_micro,
    mean_surprisal_micro (NULL when the doc has < 3 tokens).
    """
    out, handles = kneser_ney_trigram_plan(
        docs, id_col=id_col, text_col=text_col, scale=scale
    )
    # eager materialize + unpersist: same leak discipline as the
    # bigram version above; the un-materialized plan stays
    # inspectable via kneser_ney_trigram_plan
    try:
        res = out.localCheckpoint(eager=True)
    finally:
        for h in handles:
            h.unpersist()
    return res


def kneser_ney_trigram_plan(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = PPB,
) -> tuple[DataFrame, list[DataFrame]]:
    """The lazy plan behind :func:`kneser_ney_trigram_scores`:
    returns ``(result, persisted handles)`` so plan-only callers can
    unpersist without materializing."""
    max_safe = (2**63 - 1) // scale
    abs_max = 2**63 - 1
    tk = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("tk")
    ).persist()

    tri_doc = (
        _ngram_rows(tk, 3, ("w1", "w2", "w3"))
        .groupBy("doc_id", "w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .persist()
    )
    tri = tri_doc.groupBy("w1", "w2", "w3").agg(
        F.sum("cnt").cast("long").alias("c3")
    ).persist()
    ctx3 = tri.groupBy("w1", "w2").agg(
        F.sum("c3").cast("long").alias("c2ctx"),
        F.count(F.lit(1)).cast("long").alias("t3"),
    )
    # modified bigram counts: cc(w2,w3) = distinct w1 types above
    # (tri rows are distinct types, so count(*) IS the type count)
    cc2 = tri.groupBy("w2", "w3").agg(
        F.count(F.lit(1)).cast("long").alias("cc")
    ).persist()
    ctxc = cc2.groupBy("w2").agg(
        F.sum("cc").cast("long").alias("ctxc"),
        F.count(F.lit(1)).cast("long").alias("t2"),
    )
    cont3 = cc2.groupBy("w3").agg(
        F.count(F.lit(1)).cast("long").alias("ncw3")
    )

    def _coc(frame: DataFrame, cnt: str, lvl: str) -> DataFrame:
        # per-level count-of-counts -> exact-rational discount, with
        # the independent degenerate (1, 2) fallback
        return frame.agg(
            F.sum((F.col(cnt) == 1).cast("long")).cast("long").alias("_n1"),
            (
                F.sum((F.col(cnt) == 1).cast("long"))
                + 2 * F.sum((F.col(cnt) == 2).cast("long"))
            ).cast("long").alias("_dd"),
            F.count(F.lit(1)).cast("long").alias(f"n{lvl}all"),
            F.max(cnt).cast("long").alias(f"max_{cnt}"),
            F.sum(cnt).cast("long").alias(f"sum_{cnt}"),
        ).select(
            F.when(F.col("_dd") == 0, F.lit(1).cast("long"))
            .otherwise(F.col("_n1")).alias(f"dn{lvl}"),
            F.when(F.col("_dd") == 0, F.lit(2).cast("long"))
            .otherwise(F.col("_dd")).alias(f"dd{lvl}"),
            f"n{lvl}all",
            f"max_{cnt}",
            f"sum_{cnt}",
        )

    m3 = _coc(tri, "c3", "3")
    m2 = _coc(cc2, "cc", "2").withColumnRenamed("n2all", "nall")
    # tight lam-numerator bounds (r15, the kn5 sf0.1 lesson): dn <= dd
    # and t <= max_t, so dd*max_t bounds dn*t without the false-trip
    # of the old dn-vs-nall form
    mt3 = ctx3.agg(F.max("t3").cast("long").alias("max_t3"))
    mt2 = ctxc.agg(F.max("t2").cast("long").alias("max_t2"))

    sc = (
        tri.join(ctx3, ["w1", "w2"])
        .join(cc2, ["w2", "w3"])
        .join(ctxc, "w2")
        .join(cont3, "w3")
        .crossJoin(F.broadcast(m3))
        .crossJoin(F.broadcast(m2))
        .crossJoin(F.broadcast(mt3))
        .crossJoin(F.broadcast(mt2))
        .select(
            "w1",
            "w2",
            "w3",
            F.expr(
                f"CASE WHEN GREATEST(max_c3, max_t3) > {max_safe} DIV dd3"
                f" OR GREATEST(max_cc, max_t2) > {max_safe} DIV dd2"
                f" OR nall > {max_safe}"
                f" OR dd3 > {abs_max} DIV GREATEST(sum_c3, 1)"
                f" OR dd2 > {abs_max} DIV GREATEST(sum_cc, 1) THEN "
                f"CAST(raise_error(CONCAT("
                f"'kneser_ney_trigram_scores: count magnitudes would "
                f"overflow count*{scale} in BIGINT; ', "
                f"'re-run with scale=1000000 (ppm)')) AS BIGINT) "
                f"ELSE GREATEST("
                f"(((c3 * dd3 - dn3) * {scale}) DIV (dd3 * c2ctx))"
                f" + (((((dn3 * t3) * {scale}) DIV (dd3 * c2ctx))"
                f" * ("
                f"(((cc * dd2 - dn2) * {scale}) DIV (dd2 * ctxc))"
                f" + (((((dn2 * t2) * {scale}) DIV (dd2 * ctxc))"
                f" * ncw3) DIV nall)"
                f")) DIV {scale}), CAST(1 AS BIGINT)) END"
            ).alias("p_ppb"),
        )
        .select(
            "w1",
            "w2",
            "w3",
            F.floor(
                MICRO * F.log(F.lit(float(scale)) / F.col("p_ppb"))
            ).cast("long").alias("s_micro"),
        )
    )

    agg = (
        tri_doc.join(sc, ["w1", "w2", "w3"])
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_trigrams"),
            F.sum(F.col("cnt") * F.col("s_micro")).cast("long").alias(
                "surprisal_micro"
            ),
            F.expr(
                "CAST(sum(cnt * s_micro) DIV sum(cnt) AS BIGINT)"
            ).alias("mean_surprisal_micro"),
        )
    )
    out = (
        tk.select("doc_id", F.size("tk").cast("long").alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_trigrams"), F.lit(0).cast("long")).alias(
                "n_trigrams"
            ),
            "surprisal_micro",
            "mean_surprisal_micro",
        )
    )
    return out, [tk, tri_doc, tri, cc2]


def _ngram_rows(tk: DataFrame, n: int, names: tuple[str, ...]) -> DataFrame:
    """Explode each doc's token array into its order-n n-grams.

    Pure map-side (``transform`` over the array index range) — the
    per-doc sliding window never becomes a window function or a
    shuffle. Docs shorter than ``n`` tokens contribute nothing.
    """
    fields = ", ".join(
        f"tk[i+{j}] AS {name}" for j, name in enumerate(names)
    )
    grams = F.expr(
        f"CASE WHEN size(tk) >= {n} THEN "
        f"transform(sequence(0, size(tk)-{n}), i -> struct({fields})) "
        f"ELSE array() END"
    )
    return tk.select("doc_id", F.explode(grams).alias("g")).select(
        "doc_id", "g.*"
    )


def ngram_lm_doc_scores(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = PPB,
) -> DataFrame:
    """Per-document interpolated-trigram-LM surprisal, integer-exact.

    Returns one row per input document:
      doc_id, n_tokens, n_trigrams,
      surprisal_micro       (sum of per-occurrence micro-nats),
      mean_surprisal_micro  (integer DIV; log-perplexity in micro-nats;
                             NULL when the doc has < 3 tokens).

    ``scale`` is the probability quantum (default parts-per-billion).
    The plan fails loud — in-plan ``raise_error`` naming the fix —
    if any n-gram count could overflow ``count * scale`` in BIGINT
    (at ppb that's a count > ~9.2e9; drop ``scale`` to 1_000_000 for
    corpora hot-word-heavy enough to hit it).
    """
    max_safe_count = (2**63 - 1) // scale
    tk = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("tk")
    )
    # Read by 4 count branches + the final rollup in one action.
    tk = tk.persist()

    uni = (
        tk.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cu"))
    )
    # max_cu rides the same 1-row broadcast as N: every numerator in
    # the ppb components (ct <= cb23 <= cu, cu3 <= max_cu) is bounded
    # by the max unigram count, so one guard covers all three.
    tot = uni.agg(
        F.sum("cu").cast("long").alias("n"),
        F.max("cu").cast("long").alias("max_cu"),
    )
    bi = _ngram_rows(tk, 2, ("w1", "w2")).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("cb")
    )
    tri_doc = (
        _ngram_rows(tk, 3, ("w1", "w2", "w3"))
        .groupBy("doc_id", "w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    # Doc-trigram counts feed both the corpus trigram table and the
    # apply join below.
    tri_doc = tri_doc.persist()
    tri = tri_doc.groupBy("w1", "w2", "w3").agg(
        F.sum("cnt").cast("long").alias("ct")
    )

    # Score each distinct trigram TYPE once: integer-ppb components,
    # integer interpolation, one float ln at the very end.
    sc = (
        tri.join(
            bi.select(
                F.col("w1"), F.col("w2"), F.col("cb").alias("cb12")
            ),
            ["w1", "w2"],
        )
        .join(
            bi.select(
                F.col("w1").alias("w2"),
                F.col("w2").alias("w3"),
                F.col("cb").alias("cb23"),
            ),
            ["w2", "w3"],
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("cu").alias("cu2")),
            "w2",
        )
        .join(
            uni.select(F.col("w").alias("w3"), F.col("cu").alias("cu3")),
            "w3",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "w3",
            F.expr(
                # overflow guard first: fails the job loud (with the
                # remediation) instead of silently wrapping BIGINT
                f"CASE WHEN max_cu > {max_safe_count} THEN "
                f"CAST(raise_error(CONCAT("
                f"'ngram_lm_doc_scores: max n-gram count ', max_cu, "
                f"' would overflow count*{scale} in BIGINT; ', "
                f"'re-run with scale=1000000 (ppm) or pre-bucket "
                f"counts')) AS BIGINT) "
                # GREATEST(..., 1): on corpora large enough that every
                # component floors to 0 (possible exactly at the ppm
                # remediation scale), clamp to 1 quantum so
                # log(scale/p) stays finite instead of s_micro
                # becoming an undefined floor(inf) cast
                f"ELSE GREATEST(CAST((({LAMBDA_TENTHS[0]} * ((ct * {scale}) DIV cb12)"
                f" + {LAMBDA_TENTHS[1]} * ((cb23 * {scale}) DIV cu2)"
                f" + {LAMBDA_TENTHS[2]} * ((cu3 * {scale}) DIV n))"
                f" DIV 10) AS BIGINT), CAST(1 AS BIGINT)) END"
            ).alias("p_ppb"),
        )
        .select(
            "w1",
            "w2",
            "w3",
            F.floor(
                MICRO * F.log(F.lit(float(scale)) / F.col("p_ppb"))
            ).cast("long").alias("s_micro"),
        )
    )

    agg = (
        tri_doc.join(sc, ["w1", "w2", "w3"])
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_trigrams"),
            F.sum(F.col("cnt") * F.col("s_micro")).cast("long").alias(
                "surprisal_micro"
            ),
            F.expr(
                "CAST(sum(cnt * s_micro) DIV sum(cnt) AS BIGINT)"
            ).alias("mean_surprisal_micro"),
        )
    )
    return (
        tk.select("doc_id", F.size("tk").cast("long").alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_trigrams"), F.lit(0).cast("long")).alias(
                "n_trigrams"
            ),
            "surprisal_micro",
            "mean_surprisal_micro",
        )
    )


def kneser_ney_5gram_scores(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = PPB,
) -> DataFrame:
    """Per-document surprisal under an interpolated KNESER-NEY
    5-GRAM LM — KenLM's DEFAULT order (r14 verdict item 8; the
    trigram proved the backoff recursion generalizes, this runs it
    at production depth). Four discounted levels + the continuation
    unigram, each lower level built from MODIFIED counts (types of
    the level above, never raw tokens — Chen & Goodman 1999's
    recursive c_KN definition):

        p5(w5|w1..w4) = (c5 - D5)+/c(w1..w4.) + lam5 * p4
        p4(w5|w2..w4) = (cc4 - D4)+/cc(w2..w4.) + lam4 * p3
        p3(w5|w3w4)   = (cc3 - D3)+/cc(w3w4.) + lam3 * p2
        p2(w5|w4)     = (cc2 - D2)+/cc(w4.) + lam2 * P_cont(w5)

    where cc4(w2..w5) = N1+(.w2..w5) over raw 5-gram types,
    cc3(w3w4w5) = N1+(.w3w4w5) over cc4 types, cc2(w4w5) =
    N1+(.w4w5) over cc3 types, and P_cont(w5) = N1+(.w5)/N1+(..)
    over cc2 types. Each level's absolute discount is the exact
    RATIONAL D = n1/(n1+2n2) from THAT level's own count-of-counts,
    with the independent degenerate (1, 2) fallback per level (the
    synthetic-corpus lesson, pytest-pinned).

    Exactness: nine documented ppb floor points replayed verbatim by
    the oracle — per level k in {2,3,4,5}:

      pk_ppb   = ((ck*ddk - dnk) * scale) DIV (ddk * ctxk)
      lamk_ppb = ((dnk * tk) * scale) DIV (ddk * ctxk)

    mixed bottom-up as pl2 = p2 + (lam2 * ncw5) DIV nall, then
    pl_k = pk + (lamk * pl_{k-1}) DIV scale, finally
    p_ppb = GREATEST(pl5, 1), one float ln to micro-nats. Scored
    5-grams are observed by construction, so every modified count
    >= 1 and the discounted numerators never go negative.

    Scale (100 TB): each level is ONE hash partial-agg on string
    keys over the level above (5-gram types -> 4 -> 3 -> 2 -> 1;
    the corpus itself is read once); context totals / per-context
    type counts are PARTITIONED WINDOWS over each level's own frame
    (r15, guide §2.4 — the former groupBy-ctx + join-back pair cost
    two corpus-sized exchanges per level where the window costs
    one), so the scoring chain is 3 level equi-joins + the apply
    join instead of 8; all four count-of-counts rows (each carrying
    its level's max_t bound — one pass) ride broadcast 1-row
    aggregates. Overflow guards are DIVISION comparisons
    over the broadcast rows, one per level
    (GREATEST(max_count, max_t) vs max_safe DIV dd — max_t is the
    level's max per-context type count, bounding the lam numerator
    dn*t by dd*max_t; bounding it by the GLOBAL type count instead
    false-trips on singleton-heavy corpora, which this operator's
    own sf0.1 fixture proved) plus the raw denominator bounds (dd
    vs (2^63-1) DIV sum) and nall <= max_safe; every lam*pl mix is
    <= 2*scale^2 < 2^63. Any trip raises in-plan with the
    scale=1_000_000 remediation.

    Returns: doc_id, n_tokens, n_5grams, surprisal_micro,
    mean_surprisal_micro (NULL when the doc has < 5 tokens).
    """
    out, handles = kneser_ney_5gram_plan(
        docs, id_col=id_col, text_col=text_col, scale=scale
    )
    try:
        res = out.localCheckpoint(eager=True)
    finally:
        for h in handles:
            h.unpersist()
    return res


def kneser_ney_5gram_plan(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = PPB,
) -> tuple[DataFrame, list[DataFrame]]:
    """The lazy plan behind :func:`kneser_ney_5gram_scores`: returns
    ``(result, persisted handles)`` so plan-only callers (pytest,
    plan_audit's CHECKPOINTED seam) can inspect the real plan."""
    max_safe = (2**63 - 1) // scale
    abs_max = 2**63 - 1
    tk = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("tk")
    ).persist()

    W5 = ("w1", "w2", "w3", "w4", "w5")
    g5_doc = (
        _ngram_rows(tk, 5, W5)
        .groupBy("doc_id", *W5)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .persist()
    )
    g5 = g5_doc.groupBy(*W5).agg(
        F.sum("cnt").cast("long").alias("c5")
    )

    # Context totals / per-context type counts as WINDOWS over each
    # level's own frame (r15 optimization, guide §2.4: a window
    # partitioned by the same key as a preceding aggregation needs no
    # second shuffle pair) — the former groupBy-ctx + join-back per
    # level cost two exchanges of corpus-sized string-keyed tables
    # each; the window costs one. The scoring chain below then joins
    # only the four ENRICHED level frames (3 equi-joins instead of 8).
    from pyspark.sql.window import Window

    def _ctx_enriched(
        frame: DataFrame, cnt: str, ctx_cols: list[str], lvl: str
    ) -> DataFrame:
        w = Window.partitionBy(*ctx_cols)
        return frame.select(
            "*",
            F.sum(cnt).over(w).cast("long").alias(f"ctx{lvl}c"),
            F.count(F.lit(1)).over(w).cast("long").alias(f"t{lvl}"),
        )

    # modified counts, one type-collapse per level (g5 rows are
    # distinct types, so count(*) IS the distinct-left-context count)
    g5e = _ctx_enriched(g5, "c5", ["w1", "w2", "w3", "w4"], "5").persist()
    cc4 = g5e.groupBy("w2", "w3", "w4", "w5").agg(
        F.count(F.lit(1)).cast("long").alias("cc4")
    )
    cc4e = _ctx_enriched(cc4, "cc4", ["w2", "w3", "w4"], "4").persist()
    cc3 = cc4e.groupBy("w3", "w4", "w5").agg(
        F.count(F.lit(1)).cast("long").alias("cc3")
    )
    cc3e = _ctx_enriched(cc3, "cc3", ["w3", "w4"], "3").persist()
    cc2 = cc3e.groupBy("w4", "w5").agg(
        F.count(F.lit(1)).cast("long").alias("cc2")
    )
    # continuation type count ncw5 = count over (w5) rides a second
    # window on the same (small) cc2 frame
    cc2e = _ctx_enriched(cc2, "cc2", ["w4"], "2").select(
        "*",
        F.count(F.lit(1))
        .over(Window.partitionBy("w5"))
        .cast("long")
        .alias("ncw5"),
    ).persist()

    def _coc(frame: DataFrame, cnt: str, lvl: str) -> DataFrame:
        # count-of-counts + the tight lam-numerator bound max_t in
        # ONE pass over the enriched frame (t{lvl} repeats within a
        # context; its max is unaffected)
        return frame.agg(
            F.sum((F.col(cnt) == 1).cast("long")).cast("long").alias("_n1"),
            (
                F.sum((F.col(cnt) == 1).cast("long"))
                + 2 * F.sum((F.col(cnt) == 2).cast("long"))
            ).cast("long").alias("_dd"),
            F.count(F.lit(1)).cast("long").alias(f"n{lvl}all"),
            F.max(cnt).cast("long").alias(f"max_{cnt}"),
            F.sum(cnt).cast("long").alias(f"sum_{cnt}"),
            F.max(f"t{lvl}").cast("long").alias(f"max_t{lvl}"),
        ).select(
            F.when(F.col("_dd") == 0, F.lit(1).cast("long"))
            .otherwise(F.col("_n1")).alias(f"dn{lvl}"),
            F.when(F.col("_dd") == 0, F.lit(2).cast("long"))
            .otherwise(F.col("_dd")).alias(f"dd{lvl}"),
            f"n{lvl}all",
            f"max_{cnt}",
            f"sum_{cnt}",
            f"max_t{lvl}",
        )

    # tight lam-numerator bounds (r15): each level's dn*t*scale is
    # bounded by dd*max_t*scale where max_t is that level's max
    # per-context type count — the dn-vs-nall form false-trips on
    # singleton-heavy corpora (this operator's own sf0.1 corpus has
    # 225k singleton 5-gram types: dn5*n5all is astronomical while
    # the largest REAL product is dd5 * 4 * scale)
    m5 = _coc(g5e, "c5", "5")
    m4 = _coc(cc4e, "cc4", "4")
    m3 = _coc(cc3e, "cc3", "3")
    m2 = _coc(cc2e, "cc2", "2").withColumnRenamed("n2all", "nall")

    guard = (
        f"GREATEST(max_c5, max_t5) > {max_safe} DIV dd5"
        f" OR GREATEST(max_cc4, max_t4) > {max_safe} DIV dd4"
        f" OR GREATEST(max_cc3, max_t3) > {max_safe} DIV dd3"
        f" OR GREATEST(max_cc2, max_t2) > {max_safe} DIV dd2"
        f" OR nall > {max_safe}"
        f" OR dd5 > {abs_max} DIV GREATEST(sum_c5, 1)"
        f" OR dd4 > {abs_max} DIV GREATEST(sum_cc4, 1)"
        f" OR dd3 > {abs_max} DIV GREATEST(sum_cc3, 1)"
        f" OR dd2 > {abs_max} DIV GREATEST(sum_cc2, 1)"
    )
    pl2 = (
        f"(((cc2 * dd2 - dn2) * {scale}) DIV (dd2 * ctx2c))"
        f" + (((((dn2 * t2) * {scale}) DIV (dd2 * ctx2c))"
        f" * ncw5) DIV nall)"
    )
    pl3 = (
        f"(((cc3 * dd3 - dn3) * {scale}) DIV (dd3 * ctx3c))"
        f" + (((((dn3 * t3) * {scale}) DIV (dd3 * ctx3c))"
        f" * ({pl2})) DIV {scale})"
    )
    pl4 = (
        f"(((cc4 * dd4 - dn4) * {scale}) DIV (dd4 * ctx4c))"
        f" + (((((dn4 * t4) * {scale}) DIV (dd4 * ctx4c))"
        f" * ({pl3})) DIV {scale})"
    )
    pl5 = (
        f"(((c5 * dd5 - dn5) * {scale}) DIV (dd5 * ctx5c))"
        f" + (((((dn5 * t5) * {scale}) DIV (dd5 * ctx5c))"
        f" * ({pl4})) DIV {scale})"
    )
    sc = (
        g5e.join(cc4e, ["w2", "w3", "w4", "w5"])
        .join(cc3e, ["w3", "w4", "w5"])
        .join(cc2e, ["w4", "w5"])
        .crossJoin(F.broadcast(m5))
        .crossJoin(F.broadcast(m4))
        .crossJoin(F.broadcast(m3))
        .crossJoin(F.broadcast(m2))
        .select(
            *W5,
            F.expr(
                f"CASE WHEN {guard} THEN "
                f"CAST(raise_error(CONCAT("
                f"'kneser_ney_5gram_scores: count magnitudes would "
                f"overflow count*{scale} in BIGINT; ', "
                f"'re-run with scale=1000000 (ppm)')) AS BIGINT) "
                f"ELSE GREATEST({pl5}, CAST(1 AS BIGINT)) END"
            ).alias("p_ppb"),
        )
        .select(
            *W5,
            F.floor(
                MICRO * F.log(F.lit(float(scale)) / F.col("p_ppb"))
            ).cast("long").alias("s_micro"),
        )
    )

    agg = (
        g5_doc.join(sc, list(W5))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_5grams"),
            F.sum(F.col("cnt") * F.col("s_micro")).cast("long").alias(
                "surprisal_micro"
            ),
            F.expr(
                "CAST(sum(cnt * s_micro) DIV sum(cnt) AS BIGINT)"
            ).alias("mean_surprisal_micro"),
        )
    )
    out = (
        tk.select("doc_id", F.size("tk").cast("long").alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_5grams"), F.lit(0).cast("long")).alias(
                "n_5grams"
            ),
            "surprisal_micro",
            "mean_surprisal_micro",
        )
    )
    return out, [tk, g5_doc, g5e, cc4e, cc3e, cc2e]
