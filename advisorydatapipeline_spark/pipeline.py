"""End-to-end advisory pipeline driver: ingest -> enrich -> state machine.

The run.py analogue (reference: run.py:57-59) composed from this
engine's operators, over the reference's actual data model
(schemas.py). A user of the reference runs the same three phases with
the same guarantees:

- **run-id staging isolation** (SURVEY.md §1.4): every intermediate
  lands under ``staging/run_id=<id>/...``; only the final upsert
  touches prod, so failed runs never corrupt production state.
- **TTL-cached incremental enrichment** (enrichment/cache.py
  semantics, deterministic injected clock).
- **priority conflict resolution** across sources (W1 window), COALESCE
  precedence manual > enrichment > prior state, native FSM transition
  validation, change-type classification, CASE-ranked audit ordering.

Differences from the reference, by design (SURVEY.md §7):
- enrichment runs on the executors (operators/enrichment.py
  mapInPandas) instead of driver collect() + thread pool;
- the prod upsert materializes to a temp path then swaps
  (operators/upsert.upsert_to_path) instead of reading and
  overwriting the same files in one query;
- counts for logging are lazy ``observe()`` metrics, not extra jobs.
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from advisorydatapipeline_spark import schemas
from advisorydatapipeline_spark.config import PipelineConfig
from advisorydatapipeline_spark.operators.enrichment import UpstreamSource, enrich_map_in_pandas
from advisorydatapipeline_spark.operators.state_machine import (
    apply_sql,
    explanation_sql,
    valid_sql,
)
from advisorydatapipeline_spark.operators.ttl_cache import (
    pending_work,
    update_cache,
)
from advisorydatapipeline_spark.operators.upsert import upsert_to_path
from advisorydatapipeline_spark.operators.window_ops import top_k_per_key
from advisorydatapipeline_spark.sources.io import (
    observed,
    read_table,
    register_view,
    write_table,
)

KEYS = ("cve_id", "package")


@dataclass(frozen=True)
class NormalizedSource:
    """An enrichment source whose raw fetch + normalization are both
    pluggable (reference enrichment/definitions.py:25-37)."""

    upstream: UpstreamSource
    # raw enrichment df -> NORMALIZED_ENRICHMENT_SCHEMA df
    normalize: "callable"


def default_normalize(source_name: str, priority: int, now: datetime):
    """Reference nvd_normalization.py:18-57 semantics on our raw
    schema: found+version -> fixed; found w/o version ->
    pending_upstream; not found -> will_not_fix."""

    def _norm(raw: DataFrame) -> DataFrame:
        state = (
            F.when(
                F.col("found") & F.col("upstream_fixed_version").isNotNull(),
                "fixed",
            )
            .when(F.col("found"), "pending_upstream")
            .otherwise("will_not_fix")
        )
        text = F.when(
            F.col("found") & F.col("upstream_fixed_version").isNotNull(),
            F.concat(F.lit("Fixed upstream in "), F.col("upstream_fixed_version")),
        ).otherwise(F.lit("Awaiting upstream fix"))
        return raw.select(
            "cve_id",
            "package",
            text.alias("customer_text"),
            F.col("upstream_fixed_version").alias("fixed_version"),
            F.lit(priority).cast("int").alias("priority"),
            state.alias("state"),
            F.lit(now).alias("enrichment_timestamp"),
            F.lit(source_name).alias("enrichment_source"),
        )

    return _norm


def run_ingest_phase(
    spark: SparkSession,
    config: PipelineConfig,
    run_id: str,
    advisories: DataFrame,
    overrides: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Stage both raw inputs under the run prefix and read back."""
    adv_path = f"{config.run_path(run_id)}/sources/data"
    ov_path = f"{config.run_path(run_id)}/sources/not_applicable_cves"
    write_table(advisories, adv_path, schema=schemas.ADVISORY_SCHEMA)
    write_table(overrides, ov_path, schema=schemas.NOT_APPLICABLE_SCHEMA)
    adv = read_table(spark, adv_path, schemas.ADVISORY_SCHEMA)
    ov = read_table(spark, ov_path, schemas.NOT_APPLICABLE_SCHEMA)
    register_view(adv, "raw_data")
    register_view(ov, "raw_not_applicable_cves")
    return adv, ov


def run_enrich_phase(
    spark: SparkSession,
    config: PipelineConfig,
    run_id: str,
    advisories: DataFrame,
    overrides: DataFrame,
    sources: list[NormalizedSource],
) -> DataFrame:
    """TTL-cache-gated enrichment per source; returns the union of all
    normalized enrichment staged this run."""
    now = config.clock()

    # worklist: advisory keys not manually overridden (reference
    # packages_to_enrich.py: case-insensitive compound-key left anti)
    adv_keys = advisories.select(
        F.col("cve_id"), F.col("package_name").alias("package")
    )
    ov_keys = overrides.select(
        F.lower("cve_id").alias("_ck"), F.lower("package").alias("_pk")
    ).distinct()
    worklist = (
        adv_keys.join(
            F.broadcast(ov_keys),
            (F.lower(adv_keys.cve_id) == ov_keys._ck)
            & (F.lower(adv_keys.package) == ov_keys._pk),
            "left_anti",
        )
        .distinct()
    )

    # cache stores the key as package_name (reference cache_schema);
    # in-flight we align it to the worklist's `package`
    cache = read_table(
        spark, config.cache_path, schemas.ENRICHMENT_CACHE_SCHEMA
    ).withColumnRenamed("package_name", "package")
    normalized_parts: list[DataFrame] = []
    for src in sources:
        ttl_h = config.cache_ttl_hours
        cutoff = now - timedelta(hours=ttl_h)
        todo = pending_work(worklist, cache, KEYS, src.upstream.name, cutoff)
        todo, n_obs = observed(todo, f"enrich_{src.upstream.name}_{run_id}")

        raw = enrich_map_in_pandas(todo, src.upstream, KEYS)
        raw_path = f"{config.run_path(run_id)}/enrichment/raw/{src.upstream.name}"
        write_table(raw, raw_path, schema=schemas.RAW_ENRICHMENT_SCHEMA)
        raw_staged = read_table(spark, raw_path, schemas.RAW_ENRICHMENT_SCHEMA)

        normalized = src.normalize(raw_staged)
        norm_path = (
            f"{config.run_path(run_id)}/enrichment/normalized/"
            f"enrichment_source={src.upstream.name}"
        )
        write_table(
            normalized, norm_path, schema=schemas.NORMALIZED_ENRICHMENT_SCHEMA
        )
        normalized_parts.append(
            read_table(spark, norm_path, schemas.NORMALIZED_ENRICHMENT_SCHEMA)
        )

        # cache merge AFTER successful staging (reference cache.py:109)
        cache = update_cache(cache, todo, KEYS, src.upstream.name, now)

    # persist the merged cache once for all sources (temp-then-swap to
    # avoid planning over files we are deleting)
    tmp = config.cache_path + "__tmp"
    write_table(
        cache.withColumnRenamed("package", "package_name"),
        tmp,
        schema=schemas.ENRICHMENT_CACHE_SCHEMA,
    )
    cache_final = read_table(spark, tmp, schemas.ENRICHMENT_CACHE_SCHEMA)
    write_table(cache_final, config.cache_path, schema=schemas.ENRICHMENT_CACHE_SCHEMA)
    shutil.rmtree(tmp.removeprefix("file:"), ignore_errors=True)

    merged = normalized_parts[0]
    for part in normalized_parts[1:]:
        merged = merged.unionByName(part)
    register_view(merged, "normalized_enrichment")
    return merged


def run_state_machine_phase(
    spark: SparkSession,
    config: PipelineConfig,
    run_id: str,
    advisories: DataFrame,
    overrides: DataFrame,
    normalized: DataFrame,
) -> DataFrame:
    """W1 priority dedup -> J2 double left join -> COALESCE precedence
    -> native FSM -> change classification -> upsert into prod."""
    prod_path = f"{config.prod_path}/state_machine/cve_state_machine"
    prod = read_table(spark, prod_path, schemas.STATE_MACHINE_SCHEMA)

    best = top_k_per_key(
        normalized,
        ["cve_id", "package"],
        [
            F.col("priority").desc(),
            F.col("enrichment_timestamp").desc(),
            F.col("enrichment_source").desc(),
        ],
        k=1,
    ).select(
        "cve_id",
        "package",
        F.col("state").alias("enrich_state"),
        F.col("customer_text").alias("enrich_text"),
        F.col("fixed_version").alias("enrich_version"),
        F.col("priority").alias("enrich_priority"),
        F.col("enrichment_timestamp").alias("enrich_ts"),
        F.col("enrichment_source").alias("enrich_source"),
    )

    master = advisories.select(
        "cve_id",
        F.col("package_name").alias("package"),
        F.col("fixed_version").alias("advisory_version"),
    ).dropDuplicates(["cve_id", "package"])

    ov = overrides.select(
        F.lower("cve_id").alias("_ck"),
        F.lower("package").alias("_pk"),
        F.col("internal_status").alias("ov_state"),
        F.col("status").alias("ov_text"),
        F.col("fixed_version").alias("ov_version"),
    ).dropDuplicates(["_ck", "_pk"])

    prior = prod.select(
        "cve_id", "package", F.col("status").alias("prod_state")
    )

    combined = (
        master.join(
            F.broadcast(ov),
            (F.lower(master.cve_id) == ov._ck)
            & (F.lower(master.package) == ov._pk),
            "left",
        )
        .join(best, ["cve_id", "package"], "left")
        .join(prior, ["cve_id", "package"], "left")
    )

    from_state = "coalesce(prod_state, 'unknown')"
    candidate = "coalesce(ov_state, enrich_state)"
    eff = "coalesce(ov_state, enrich_state, prod_state, 'unknown')"
    valid = valid_sql(from_state, eff)
    # manual overrides are authoritative: they SET the state (the
    # reference feeds internal_status in as the current state,
    # packages_to_enrich.py:25-32), bypassing FSM gating; enrichment
    # candidates must pass the FSM
    from advisorydatapipeline_spark.operators.state_machine import norm_sql

    new_state = (
        f"CASE WHEN ov_state IS NOT NULL THEN {norm_sql('ov_state')} "
        f"ELSE {apply_sql(from_state, eff)} END"
    )
    change = (
        f"CASE WHEN prod_state IS NULL THEN 'new' "
        f"WHEN ({candidate}) IS NULL THEN 'unchanged' "
        f"WHEN ov_state IS NULL AND NOT ({valid}) THEN 'blocked' "
        f"WHEN ({new_state}) <> ({from_state}) THEN 'status_changed' "
        f"ELSE 'enriched_unchanged' END"
    )
    processed = combined.select(
        "cve_id",
        "package",
        F.expr(new_state).alias("status"),
        F.col("prod_state").alias("previous_status"),
        F.coalesce("ov_version", "enrich_version", "advisory_version").alias(
            "fixed_version"
        ),
        F.coalesce("ov_text", "enrich_text").alias("customer_text"),
        F.expr(
            "CASE WHEN ov_state IS NOT NULL THEN 'manual' "
            "WHEN enrich_state IS NOT NULL THEN enrich_source "
            "ELSE 'production' END"
        ).alias("data_source"),
        F.expr(
            "CAST(CASE WHEN ov_state IS NOT NULL THEN 100 "
            "ELSE enrich_priority END AS INT)"
        ).alias("priority"),
        F.col("enrich_ts").alias("enrichment_timestamp"),
        F.expr(valid).alias("transition_valid"),
        F.expr(explanation_sql(from_state, eff)).alias("transition_reason"),
        F.expr(change).alias("change_type"),
    )

    staged_path = f"{config.run_path(run_id)}/state_machine/processed"
    write_table(processed, staged_path, schema=schemas.STATE_MACHINE_SCHEMA)
    staged = read_table(spark, staged_path, schemas.STATE_MACHINE_SCHEMA)
    register_view(staged, "processed_cve_state_machine")

    upsert_to_path(
        spark,
        staged,
        prod_path,
        list(KEYS),
        schemas.STATE_MACHINE_SCHEMA,
        read_table=read_table,
        write_table=write_table,
    )
    return read_table(spark, prod_path, schemas.STATE_MACHINE_SCHEMA)


def run_pipeline(
    spark: SparkSession,
    config: PipelineConfig,
    run_id: str,
    *,
    advisories: DataFrame,
    overrides: DataFrame,
    sources: list[NormalizedSource],
) -> DataFrame:
    """The full three-phase run. Returns the post-upsert prod state."""
    adv, ov = run_ingest_phase(spark, config, run_id, advisories, overrides)
    normalized = run_enrich_phase(spark, config, run_id, adv, ov, sources)
    return run_state_machine_phase(
        spark, config, run_id, adv, ov, normalized
    )
