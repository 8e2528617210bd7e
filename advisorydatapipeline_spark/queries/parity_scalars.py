"""Scalar-function and state-machine parity queries (SURVEY.md §2.8,
§2.10).

``scalar_derivation`` mirrors the reference's normalization query
shape (enrichment/queries/nvd_normalization.py:18-57): COALESCE
precedence chains, CASE classification, CONCAT message building,
lower(). The state-machine queries run the FSM natively (CASE) and
via Python UDFs against the *same* SQL oracle — proving the two
surfaces equivalent, which the reference only asserted via unit tests
(its own history migrated between the two, SURVEY.md dead-code note).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from advisorydatapipeline_spark.operators.state_machine import (
    with_transition,
    with_transition_udf,
)
from advisorydatapipeline_spark.operators.state_machine import (
    apply_sql,
    explanation_sql,
    valid_sql,
)
from advisorydatapipeline_spark.queries.helpers import load
from advisorydatapipeline_spark.registry import query


@query(
    "scalar_derivation",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderstatus = 'F' THEN 'fixed'
            WHEN o_orderstatus = 'O' THEN 'pending_upstream'
            ELSE 'unknown' END AS derived_state,
       coalesce(nullif(o_orderpriority, ''), '5-LOW') AS effective_priority,
       concat('Order ', CAST(o_orderkey AS VARCHAR), ' is ',
              lower(o_orderstatus), ' at ',
              CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)) AS customer_text
FROM orders
""",
)
def scalar_derivation(spark, sf_dir):
    """§2.8: COALESCE / NULLIF / CASE / CONCAT / lower / cast chain.
    The monetary value is formatted via DECIMAL(18,2) so Spark and the
    oracle render identical digits."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "fixed")
        .when(F.col("o_orderstatus") == "O", "pending_upstream")
        .otherwise("unknown")
        .alias("derived_state"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("")), F.lit("5-LOW")
        ).alias("effective_priority"),
        F.concat(
            F.lit("Order "),
            F.col("o_orderkey").cast("string"),
            F.lit(" is "),
            F.lower("o_orderstatus"),
            F.lit(" at "),
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
        ).alias("customer_text"),
    )


# from/to state derivation exercising every normalization edge:
# mixed case, stray whitespace, NULL, empty string, unrecognized state
_FROM_SQL = (
    "CASE WHEN o_orderstatus = 'O' THEN 'pending_upstream' "
    "WHEN o_orderstatus = 'F' THEN 'Fixed' "  # case-normalization edge
    "ELSE 'unknown' END"
)
_TO_SQL = (
    "CASE WHEN o_orderpriority = '1-URGENT' THEN '  FIXED  ' "  # ws+case
    "WHEN o_orderpriority = '2-HIGH' THEN 'not_applicable' "
    "WHEN o_orderpriority = '3-MEDIUM' THEN NULL "
    "WHEN o_orderpriority = '4-NOT SPECIFIED' THEN '' "
    "ELSE 'bogus_state' END"
)

_STATE_MACHINE_ORACLE = f"""
WITH derived AS (
  SELECT o_orderkey,
         {_FROM_SQL} AS from_state,
         {_TO_SQL} AS to_state
  FROM orders
)
SELECT o_orderkey, from_state, to_state,
       {valid_sql('from_state', 'to_state')} AS transition_valid,
       {apply_sql('from_state', 'to_state')} AS new_state,
       {explanation_sql('from_state', 'to_state')} AS transition_reason
FROM derived
"""


def _derived_states(spark, sf_dir):
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(_FROM_SQL).alias("from_state"),
        F.expr(_TO_SQL).alias("to_state"),
    )


@query("state_machine_native", oracle=_STATE_MACHINE_ORACLE)
def state_machine_native(spark, sf_dir):
    """F1–F3 natively: CASE-only FSM — whole-stage codegen, no Python
    workers."""
    return with_transition(_derived_states(spark, sf_dir), "from_state", "to_state")


@query("state_machine_udf", oracle=_STATE_MACHINE_ORACLE)
def state_machine_udf(spark, sf_dir):
    """F1–F3 via row-at-a-time Python UDFs (the reference's live
    surface, state_machine/udf.py:77-81), checked against the same SQL
    oracle as the native version — an executed equivalence proof."""
    return with_transition_udf(
        _derived_states(spark, sf_dir), "from_state", "to_state"
    )


@query(
    "scalar_pandas_udf_quantize",
    oracle="""
SELECT event_id,
       CAST(floor(value * 100) AS BIGINT) AS cents,
       CAST(floor(value * 100) AS BIGINT) % 97 AS shard
FROM events
""",
)
def scalar_pandas_udf_quantize(spark, sf_dir):
    """The remaining UDF flavor: a scalar (series->series) pandas UDF
    — Arrow-batched, vectorized numpy inside, ~10-100x the throughput
    of row-at-a-time Python UDFs (the state_machine_udf twin). Output
    is integer-quantized so the oracle value-checks the Arrow round
    trip exactly; the built-in-expression equivalent is what the hot
    path would use (see udaf_quantized_sum's docstring rule)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def cents(v: pd.Series) -> pd.Series:
        return pd.Series(np.floor(v.to_numpy() * 100).astype("int64"))

    ev = load(spark, sf_dir, "events")
    q = ev.select("event_id", cents("value").alias("cents"))
    return q.select(
        "event_id", "cents", (F.col("cents") % 97).alias("shard")
    )


@query(
    "string_functions_suite",
    oracle="""
SELECT c_custkey,
       translate(c_name, '#0', '-O') AS translated,
       lpad(CAST(c_custkey AS VARCHAR), 12, '*') AS padded,
       reverse(c_name) AS reversed,
       split_part(c_name, '#', 2) AS id_part,
       CAST(strpos(c_name, '#') AS INT) AS hash_pos,
       left(c_name, 8) AS prefix8,
       right(c_name, 4) AS suffix4,
       repeat(right(c_name, 1), 3) AS tail3
FROM customer
""",
)
def string_functions_suite(spark, sf_dir):
    """Scalar string-function breadth beyond the reference's
    lower/concat set: translate, lpad, reverse, split_part, instr
    (DuckDB strpos — same 1-based/0-absent contract), left/right,
    repeat. All codegen'd JVM expressions; value-hashed cross-engine
    so each function's edge semantics (padding overflows, missing
    separators) are pinned, not assumed."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.translate("c_name", "#0", "-O").alias("translated"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "*").alias("padded"),
        F.reverse("c_name").alias("reversed"),
        F.expr("split_part(c_name, '#', 2)").alias("id_part"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.expr("left(c_name, 8)").alias("prefix8"),
        F.expr("right(c_name, 4)").alias("suffix4"),
        F.repeat(F.expr("right(c_name, 1)"), 3).alias("tail3"),
    )


@query(
    "safe_arithmetic",
    oracle="""
WITH planted AS (
  SELECT event_id,
         CASE WHEN event_id % 10 = 0
              THEN 'x' || CAST(event_id AS VARCHAR)
              ELSE CAST(event_id AS VARCHAR) END AS raw_id,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events WHERE props IS NOT NULL
)
SELECT event_id,
       try_cast(raw_id AS BIGINT) AS parsed_id,
       CASE WHEN (k % 5) = 0 THEN NULL
            ELSE CAST(k AS DOUBLE) / (k % 5) END AS ratio
FROM planted
""",
)
def safe_arithmetic(spark, sf_dir):
    """ANSI-safe scalar arithmetic: try_cast over a column with
    planted unparseable values (NULL, never a job-killing exception —
    one bad row must not fail a 100 TB job under ANSI mode) and
    try_divide across planted zero denominators. The oracle replays
    the same null semantics with portable SQL."""
    ev = load(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    raw = F.when(
        F.col("event_id") % 10 == 0,
        F.concat(F.lit("x"), F.col("event_id").cast("string")),
    ).otherwise(F.col("event_id").cast("string"))
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id",
        raw.try_cast("bigint").alias("parsed_id"),
        F.try_divide(k.cast("double"), k % 5).alias("ratio"),
    )
