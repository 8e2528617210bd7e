"""End-to-end pipeline integration: two consecutive runs over the
reference's data model — bootstrap from empty prod, TTL-cache skip,
terminal-state stickiness, change-type classification, run isolation.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from pathlib import Path

import pytest
from pyspark.sql import types as T

from advisorydatapipeline_spark.config import PipelineConfig
from advisorydatapipeline_spark.operators.enrichment import UpstreamSource
from advisorydatapipeline_spark.pipeline import (
    NormalizedSource,
    default_normalize,
    run_pipeline,
)

T0 = datetime(2026, 1, 1, tzinfo=timezone.utc)

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("found", T.BooleanType(), True),
        T.StructField("upstream_fixed_version", T.StringType(), True),
        T.StructField("upstream_status", T.StringType(), True),
        T.StructField("query_timestamp", T.TimestampType(), True),
    ]
)


def make_fetch(version_map):
    ts = T0

    def fetch(cve_id, package):
        v = version_map.get((cve_id, package))
        if v is None:
            return {"found": False, "query_timestamp": ts}
        return {
            "found": True,
            "upstream_fixed_version": v,
            "upstream_status": "analyzed",
            "query_timestamp": ts,
        }

    return fetch


def adv_df(spark, rows):
    return spark.createDataFrame(
        rows, "package_name string, cve_id string, fixed_version string"
    )


def ov_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "cve_id string, package string, status string, "
        "fixed_version string, internal_status string",
    )


def source(name, fetch, priority, now):
    return NormalizedSource(
        upstream=UpstreamSource(name, fetch, RESULT_SCHEMA, priority=priority),
        normalize=default_normalize(name, priority, now),
    )


@pytest.fixture
def cfg_base(tmp_path):
    return str(tmp_path / "pipeline")


def test_two_runs_full_lifecycle(spark, cfg_base):
    advisories = adv_df(
        spark,
        [
            ("alpha", "CVE-1", None),
            ("beta", "CVE-2", None),
            ("gamma", "CVE-3", None),
        ],
    )
    overrides = ov_df(
        spark,
        [("cve-3", "GAMMA", "Not applicable here", None, "not_applicable")],
    )

    # ---- run 1: bootstrap (prod does not exist yet) ----
    cfg1 = PipelineConfig(cfg_base, cache_ttl_hours=24.0, clock=lambda: T0)
    fetch1 = make_fetch({("CVE-1", "alpha"): "1.2.3"})  # CVE-2 not found
    prod1 = run_pipeline(
        spark, cfg1, "r1",
        advisories=advisories, overrides=overrides,
        sources=[source("nvd", fetch1, 5, T0)],
    )
    rows1 = {(r.cve_id, r.package): r for r in prod1.collect()}
    assert len(rows1) == 3
    r1_a = rows1[("CVE-1", "alpha")]
    assert r1_a.status == "fixed" and r1_a.change_type == "new"
    assert r1_a.fixed_version == "1.2.3" and r1_a.data_source == "nvd"
    r1_b = rows1[("CVE-2", "beta")]
    # not found -> will_not_fix candidate; unknown->will_not_fix is
    # INVALID so the state stays unknown and the row is new+invalid
    assert r1_b.status == "unknown" and r1_b.transition_valid is False
    r1_c = rows1[("CVE-3", "gamma")]
    assert r1_c.status == "not_applicable" and r1_c.data_source == "manual"
    assert r1_c.priority == 100

    # ---- run 2: an hour later (inside TTL) ----
    t1 = T0 + timedelta(hours=1)
    cfg2 = PipelineConfig(cfg_base, cache_ttl_hours=24.0, clock=lambda: t1)
    # upstream now claims CVE-1 lost its fix and CVE-2 got one — but
    # CVE-1/CVE-2 are fresh in the cache, so NOTHING is re-fetched;
    # a new advisory CVE-4 is fetched and enriched
    advisories2 = adv_df(
        spark,
        [
            ("alpha", "CVE-1", None),
            ("beta", "CVE-2", None),
            ("gamma", "CVE-3", None),
            ("delta", "CVE-4", None),
        ],
    )
    # capture the inner closure (pickled by value); referencing the
    # module-global make_fetch from inside the shipped function would
    # pickle by reference to this unimportable test module
    inner2 = make_fetch({("CVE-4", "delta"): "9.9"})

    def spying_fetch(cve_id, package):
        return inner2(cve_id, package)

    prod2 = run_pipeline(
        spark, cfg2, "r2",
        advisories=advisories2, overrides=overrides,
        sources=[source("nvd", spying_fetch, 5, t1)],
    )
    rows2 = {(r.cve_id, r.package): r for r in prod2.collect()}
    assert len(rows2) == 4
    assert rows2[("CVE-4", "delta")].status == "fixed"
    assert rows2[("CVE-4", "delta")].change_type == "new"
    # fixed is terminal -> sticky even with no fresh enrichment
    assert rows2[("CVE-1", "alpha")].status == "fixed"

    # ---- run 3: past the TTL; CVE-2 now has an upstream fix ----
    t2 = T0 + timedelta(hours=25)
    cfg3 = PipelineConfig(cfg_base, cache_ttl_hours=24.0, clock=lambda: t2)
    fetch3 = make_fetch(
        {("CVE-2", "beta"): "2.0", ("CVE-1", "alpha"): "1.2.3"}
    )
    prod3 = run_pipeline(
        spark, cfg3, "r3",
        advisories=advisories2, overrides=overrides,
        sources=[source("nvd", fetch3, 5, t2)],
    )
    rows3 = {(r.cve_id, r.package): r for r in prod3.collect()}
    r3_b = rows3[("CVE-2", "beta")]
    # unknown -> fixed is valid: status change recorded
    assert r3_b.status == "fixed" and r3_b.change_type == "status_changed"
    assert r3_b.previous_status == "unknown"
    # terminal stickiness again for CVE-1 (fixed -> fixed, unchanged)
    assert rows3[("CVE-1", "alpha")].status == "fixed"
    assert rows3[("CVE-1", "alpha")].change_type == "enriched_unchanged"

    # ---- structural guarantees ----
    base = Path(cfg_base)
    # every run staged under its own prefix (run isolation)
    for rid in ("r1", "r2", "r3"):
        assert (base / "staging" / f"run_id={rid}" / "sources" / "data").exists()
    # exactly one prod table, no leftover temp swap dir
    assert (base / "prod" / "state_machine" / "cve_state_machine").exists()
    assert not (
        base / "prod" / "state_machine" / "cve_state_machine__tmp"
    ).exists()


def test_ttl_cache_skips_fresh_keys(spark, cfg_base):
    advisories = adv_df(spark, [("alpha", "CVE-1", None)])
    overrides = ov_df(spark, [])
    calls = []

    def counting_fetch(cve_id, package):
        calls.append((cve_id, package))
        return {"found": True, "upstream_fixed_version": "1.0",
                "upstream_status": "analyzed", "query_timestamp": T0}

    cfg = PipelineConfig(cfg_base, cache_ttl_hours=24.0, clock=lambda: T0)
    src = [source("nvd", counting_fetch, 5, T0)]
    run_pipeline(spark, cfg, "a", advisories=advisories,
                 overrides=overrides, sources=src)
    run_pipeline(spark, cfg, "b", advisories=advisories,
                 overrides=overrides, sources=src)
    # the fetch function runs on executors; len(calls) is only visible
    # driver-side in local mode, where the closure is shared — the
    # robust signal is the staged raw table: run b stages an EMPTY raw
    # enrichment because the only key was cache-fresh
    import pyarrow.parquet as pq
    from pathlib import Path

    raw_b = Path(cfg_base) / "staging" / "run_id=b" / "enrichment" / "raw" / "nvd"
    files = list(raw_b.glob("*.parquet"))
    n = sum(pq.read_metadata(f).num_rows for f in files)
    assert n == 0
