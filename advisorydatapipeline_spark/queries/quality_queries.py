"""Data-quality queries with DuckDB oracles (reference TODO at
ingest/ingestion_pipeline.py:71, delivered as an engine feature)."""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.operators.quality import (
    Rule,
    duplicate_key_rows,
    in_range,
    non_empty,
    not_null,
    quality_report,
    referential_violations,
)
from advisorydatapipeline_spark.queries.helpers import load
from advisorydatapipeline_spark.registry import query


@query(
    "quality_report_docs",
    oracle="""
WITH base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN text IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT)
           AS v_text,
         CAST(SUM(CASE WHEN lang IS NOT NULL AND trim(lang) <> ''
                       THEN 0 ELSE 1 END) AS BIGINT) AS v_lang,
         CAST(SUM(CASE WHEN n_chars BETWEEN 1 AND 100000
                       THEN 0 ELSE 1 END) AS BIGINT) AS v_chars
  FROM documents
)
SELECT 'text_not_null' AS rule, n_rows, v_text AS n_violations,
       v_text / CAST(n_rows AS DOUBLE) AS violation_rate FROM base
UNION ALL
SELECT 'lang_non_empty', n_rows, v_lang,
       v_lang / CAST(n_rows AS DOUBLE) FROM base
UNION ALL
SELECT 'n_chars_in_range', n_rows, v_chars,
       v_chars / CAST(n_rows AS DOUBLE) FROM base
""",
)
def quality_report_docs(spark, sf_dir):
    """Per-rule violation counts in one aggregate pass."""
    docs = load(spark, sf_dir, "documents")
    return quality_report(
        docs,
        [
            not_null("text"),
            non_empty("lang"),
            in_range("n_chars", 1, 100_000),
        ],
    )


@query(
    "referential_orphans",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber
FROM lineitem l
LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders
           WHERE o_orderstatus <> 'O') o
  ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IS NULL
""",
)
def referential_orphans(spark, sf_dir):
    """FK-integrity check as a left-anti join (open orders removed
    from the parent set to guarantee a non-empty violation sample)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    parents = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") != "O")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return referential_violations(li, parents, ["l_orderkey"])
