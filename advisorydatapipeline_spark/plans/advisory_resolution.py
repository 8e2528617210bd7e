"""Flagship plan: advisory state resolution.

The reference's signature composition (SURVEY.md §7 Phase 1), mapped
onto the synthetic star schema per FIXTURES.md:

  customers  -> master advisory list     (reference: raw_data)
  events     -> enrichment feed          (reference: normalized_enrichment)
  orders     -> prior prod state         (reference: prod_cve_state_machine)
  customers with negative balance -> manual overrides
                                         (reference: raw_not_applicable_cves)

Pipeline: window top-1 dedup of the enrichment feed per key by
(priority DESC, ts DESC) [reference map_new_info_with_udf.py:41-50] ->
case-insensitive compound-key override join
[packages_to_enrich.py:34] -> double left join merge [:110-114] ->
COALESCE source precedence (manual > enrichment > keep) [:70-104] ->
native FSM transition [state_transitions.py] -> change-type
classification [:160-166] -> CASE-ranked ORDER BY [:170-178].

The DuckDB oracle is generated from the same portable SQL snippet
builders the Spark plan evaluates via ``F.expr`` — one definition of
the CASE logic, two engines.

Scale notes (100 TB): the only wide shuffles are the window dedup
(one shuffle on user key) and the two fact-side left joins (shuffled
on the same key — AQE coalesces). The override dim and the per-key
prod snapshot are broadcast-sized in any realistic advisory workload;
we hint ``broadcast`` for the override dim explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from advisorydatapipeline_spark.operators.state_machine import (
    apply_sql,
    explanation_sql,
    valid_sql,
)
from advisorydatapipeline_spark.operators.window_ops import top_k_per_key

# event_type -> (priority, candidate state): the enrichment feed's
# normalization table (plays the role of nvd_normalization.py:18-57)
EVENT_NORMALIZATION: dict[str, tuple[int, str]] = {
    "purchase": (3, "fixed"),
    "signup": (2, "pending_upstream"),
    "click": (1, "not_applicable"),
    "view": (1, "pending_upstream"),
    "error": (0, "will_not_fix"),
}

ORDERSTATUS_STATE: dict[str, str] = {
    "O": "pending_upstream",
    "F": "fixed",
    "P": "unknown",
}

CHANGE_RANK: dict[str, int] = {
    "new": 1,
    "status_changed": 2,
    "blocked": 3,
    "enriched_unchanged": 4,
}


def _case_map_sql(expr: str, mapping: dict[str, str | int], else_sql: str) -> str:
    arms = " ".join(
        f"WHEN {expr} = '{k}' THEN "
        + (f"'{v}'" if isinstance(v, str) else str(v))
        for k, v in mapping.items()
    )
    return f"CASE {arms} ELSE {else_sql} END"


def _priority_sql(expr: str) -> str:
    return _case_map_sql(expr, {k: v[0] for k, v in EVENT_NORMALIZATION.items()}, "0")


def _cand_state_sql(expr: str) -> str:
    return _case_map_sql(
        expr, {k: v[1] for k, v in EVENT_NORMALIZATION.items()}, "'unknown'"
    )


def _derive_sql(prefix: str = "") -> dict[str, str]:
    """The shared post-join derivation expressions (portable SQL)."""
    ov, cand, prod = "ov_state", "enrich_state", "prod_state"
    from_state = f"coalesce({prod}, 'unknown')"
    candidate = f"coalesce({ov}, {cand})"
    eff = f"coalesce({ov}, {cand}, {prod}, 'unknown')"
    valid = valid_sql(from_state, eff)
    new_state = apply_sql(from_state, eff)
    change = (
        f"CASE WHEN {prod} IS NULL THEN 'new' "
        f"WHEN {candidate} IS NULL THEN 'unchanged' "
        f"WHEN NOT ({valid}) THEN 'blocked' "
        f"WHEN ({new_state}) <> ({from_state}) THEN 'status_changed' "
        f"ELSE 'enriched_unchanged' END"
    )
    return {
        "from_state": from_state,
        "candidate_state": candidate,
        "transition_valid": valid,
        "new_state": new_state,
        "transition_reason": explanation_sql(from_state, eff),
        "change_type": change,
        "data_source": (
            f"CASE WHEN {ov} IS NOT NULL THEN 'manual' "
            f"WHEN {cand} IS NOT NULL THEN 'enrichment' "
            f"ELSE 'production' END"
        ),
        "priority": (
            f"CAST(CASE WHEN {ov} IS NOT NULL THEN 100 ELSE enrich_priority END AS INT)"
        ),
        "sort_rank": "CAST("
        + _case_map_sql("change_type", CHANGE_RANK, "5")
        + " AS INT)",
    }


def advisory_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-first implementation (DataFrame API + shared CASE text)."""
    # local import: queries/__init__ imports this module via registry
    from advisorydatapipeline_spark.queries.helpers import load

    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    events = load(spark, sf_dir, "events")

    master = customer.select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_name").alias("cust_name"),
        F.lower("c_mktsegment").alias("package"),
    )

    # manual overrides, deliberately upper-cased to exercise the
    # case-insensitive compound-key join (reference J1)
    overrides = customer.filter(F.col("c_acctbal") < 0).select(
        F.upper("c_name").alias("ov_name"),
        F.upper("c_mktsegment").alias("ov_seg"),
        F.lit("not_applicable").alias("ov_state"),
    )

    # enrichment feed: normalize then window-dedup top-1 per key (W1)
    enriched = events.select(
        F.col("user_id").alias("cust_key"),
        F.expr(_priority_sql("event_type")).alias("enrich_priority"),
        F.expr(_cand_state_sql("event_type")).alias("enrich_state"),
        F.col("ts"),
        F.col("event_id"),
    )
    enrich_top1 = top_k_per_key(
        enriched,
        ["cust_key"],
        [
            F.col("enrich_priority").desc(),
            F.col("ts").desc(),
            F.col("event_id").desc(),
        ],
        k=1,
    ).select("cust_key", "enrich_priority", "enrich_state")

    # prior prod state: latest order per customer -> state (W1 again)
    prod = (
        top_k_per_key(
            orders,
            ["o_custkey"],
            [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
            k=1,
        )
        .select(
            F.col("o_custkey").alias("cust_key"),
            F.expr(
                _case_map_sql("o_orderstatus", ORDERSTATUS_STATE, "'unknown'")
            ).alias("prod_state"),
        )
    )

    combined = (
        master.join(
            F.broadcast(overrides),
            (F.lower(master.cust_name) == F.lower(overrides.ov_name))
            & (F.lower(master.package) == F.lower(overrides.ov_seg)),
            "left",
        )
        .join(enrich_top1, "cust_key", "left")
        .join(prod, "cust_key", "left")
    )

    d = _derive_sql()
    resolved = combined.select(
        "cust_key",
        "package",
        F.col("prod_state").alias("previous_status"),
        F.expr(d["from_state"]).alias("from_state"),
        F.expr(d["candidate_state"]).alias("candidate_state"),
        F.expr(d["new_state"]).alias("new_state"),
        F.expr(d["transition_valid"]).alias("transition_valid"),
        F.expr(d["transition_reason"]).alias("transition_reason"),
        F.expr(d["change_type"]).alias("change_type"),
        F.expr(d["data_source"]).alias("data_source"),
        F.expr(d["priority"]).alias("priority"),
    )
    return resolved.withColumn(
        "sort_rank", F.expr(_derive_sql()["sort_rank"])
    ).orderBy("sort_rank", "cust_key")


def advisory_resolution_oracle(tables_prefix: str = "") -> str:
    """The same plan as one ANSI SQL query (DuckDB oracle)."""
    d = _derive_sql()
    return f"""
WITH master AS (
  SELECT c_custkey AS cust_key, c_name AS cust_name,
         lower(c_mktsegment) AS package
  FROM customer
), overrides AS (
  SELECT upper(c_name) AS ov_name, upper(c_mktsegment) AS ov_seg,
         'not_applicable' AS ov_state
  FROM customer WHERE c_acctbal < 0
), enriched AS (
  SELECT user_id AS cust_key,
         {_priority_sql("event_type")} AS enrich_priority,
         {_cand_state_sql("event_type")} AS enrich_state,
         ts, event_id,
         ROW_NUMBER() OVER (
           PARTITION BY user_id
           ORDER BY {_priority_sql("event_type")} DESC, ts DESC, event_id DESC
         ) AS rn
  FROM events
), enrich_top1 AS (
  SELECT cust_key, enrich_priority, enrich_state FROM enriched WHERE rn = 1
), prod_ranked AS (
  SELECT o_custkey AS cust_key,
         {_case_map_sql("o_orderstatus", ORDERSTATUS_STATE, "'unknown'")} AS prod_state,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
         ) AS rn
  FROM orders
), prod AS (
  SELECT cust_key, prod_state FROM prod_ranked WHERE rn = 1
), combined AS (
  SELECT m.cust_key, m.package, o.ov_state, e.enrich_priority,
         e.enrich_state, p.prod_state
  FROM master m
  LEFT JOIN overrides o
    ON lower(m.cust_name) = lower(o.ov_name)
   AND lower(m.package) = lower(o.ov_seg)
  LEFT JOIN enrich_top1 e ON m.cust_key = e.cust_key
  LEFT JOIN prod p ON m.cust_key = p.cust_key
), resolved AS (
  SELECT cust_key, package,
         prod_state AS previous_status,
         {d["from_state"]} AS from_state,
         {d["candidate_state"]} AS candidate_state,
         {d["new_state"]} AS new_state,
         {d["transition_valid"]} AS transition_valid,
         {d["transition_reason"]} AS transition_reason,
         {d["change_type"]} AS change_type,
         {d["data_source"]} AS data_source,
         {d["priority"]} AS priority
  FROM combined
)
SELECT *, {d["sort_rank"]} AS sort_rank
FROM resolved
ORDER BY sort_rank, cust_key
"""
