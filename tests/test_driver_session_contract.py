"""Pin the external-driver session contract.

The driver harness builds its OWN SparkSession (none of session.py's
confs apply), so every registry query must be correct on a session
that starts without ``spark.sql.legacy.parquet.nanosAsLong``. Round 1
shipped exactly that coupling bug (19/50 oracle rows red); this test
unsets the conf and asserts the read path re-establishes it, so the
regression fails locally before the driver ever sees it.
"""

from __future__ import annotations

import pytest

from advisorydatapipeline_spark.registry import QUERIES

# one events-reader per module family that was red in round 1, plus
# one probe per later-added surface (Spark 4 features, streaming
# upsert, iterative graph, pandas recurrence)
PROBE_QUERIES = [
    "flagship_advisory_resolution",
    "ttl_cutoff_filter",
    "asof_join_last_view",
    "window_top1_per_key",
    "recursive_cte_chain",
    "variant_extract",
    "ewma_user_values",
    "pagerank_suppliers",
    "streaming_dedup_watermarked",
    "canonical_corpus",
    "parameterized_sql_filter",
    "sql_udf_revenue",
    "contrastive_triplets",
    "streaming_append_windows",
    "dpp_partitioned_join",
    "xml_scan_roundtrip",
    "binary_file_scan",
    "log_parse_text",
    "session_window_api",
    "sql_dml_roundtrip",
    "kmeans_lloyd_step",
    "hll_shard_union",
    "theta_set_overlap",
    "modern_sql_aggregates",
    "forecast_revenue_band",
    "returned_item_ranking",
    "promo_revenue_share",
    "winnowing_fingerprints",
    "winnow_neardup_pairs",
    "session_membership_join",
    "bitmap_exact_distinct",
    "incremental_rollup_merge",
    "nation_volume_shipping",
    "regional_market_share",
    # round-4 additions
    "merge_into_customers",
    "source_quota_cap",
    "corpus_mixture_waterfill",
    "zorder_chunk_stats",
    "lsh_recall_eval",
]

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


@pytest.fixture()
def bare_conf_session(spark):
    """The shared session with the nanos conf stripped — equivalent to a
    caller-provided session that never ran session.get_spark."""
    spark.conf.unset(NANOS_CONF)
    yield spark
    spark.conf.set(NANOS_CONF, "true")


@pytest.mark.parametrize("name", PROBE_QUERIES)
def test_query_survives_bare_session(bare_conf_session, sf_dir, name):
    bare_conf_session.conf.unset(NANOS_CONF)
    df = QUERIES[name](bare_conf_session, sf_dir)
    assert df.count() >= 0


def test_entry_survives_bare_session(bare_conf_session):
    import __spark_entry__ as e

    bare_conf_session.conf.unset(NANOS_CONF)
    assert e.entry(bare_conf_session).count() > 0


PYFILTER_CONF = "spark.sql.python.filterPushdown.enabled"


def test_advisory_source_survives_bare_session(spark, sf_dir):
    """The custom DataSource implements pushFilters, which Spark
    refuses to read unless the python filterPushdown conf is on; the
    source's register() must re-establish it (same contract as
    nanosAsLong in helpers.load)."""
    spark.conf.unset(PYFILTER_CONF)
    try:
        df = QUERIES["advisory_datasource_scan"](spark, sf_dir)
        assert df.count() > 0
    finally:
        spark.conf.set(PYFILTER_CONF, "true")
