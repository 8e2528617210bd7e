"""HTTP-JSON advisory source (reference S7), engine-side.

The reference fetches ``{package: {cve_id: {fixed_version}}}`` JSON
and flattens it *in driver Python* before any DataFrame exists
(ingest/fetch/echo_advisory/fetch.py:16-43). Here the flatten is a
Spark plan — ``from_json`` into nested maps + two ``explode``s — so
at scale the raw payload(s) can land as a text table and fan out
across executors; only the fetch itself (if used) touches the driver.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ADVISORY_JSON_TYPE = T.MapType(
    T.StringType(),
    T.MapType(
        T.StringType(),
        T.StructType([T.StructField("fixed_version", T.StringType(), True)]),
    ),
)


def advisories_from_json(spark: SparkSession, payloads: list[str]) -> DataFrame:
    """Flatten advisory JSON documents into (package_name, cve_id,
    fixed_version) rows, engine-side.

    Keys that don't start with ``CVE-`` are dropped (the reference's
    driver-side filter, fetch.py:24-29, expressed as a Column
    predicate)."""
    raw = spark.createDataFrame([(p,) for p in payloads], "raw string")
    parsed = raw.select(
        F.explode(F.from_json("raw", ADVISORY_JSON_TYPE)).alias(
            "package_name", "cves"
        )
    )
    rows = parsed.select(
        "package_name", F.explode("cves").alias("cve_id", "info")
    )
    return rows.filter(F.col("cve_id").startswith("CVE-")).select(
        "package_name",
        "cve_id",
        F.col("info.fixed_version").alias("fixed_version"),
    )


def fetch_json(url: str, timeout: float = 30.0) -> str:
    """Driver-side HTTP GET (import-try gated: ``requests``/urllib may
    be unavailable or offline in test containers)."""
    try:
        import urllib.request

        with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
            return resp.read().decode("utf-8")
    except Exception as exc:  # pragma: no cover
        raise ConnectionError(f"fetch failed for {url}: {exc}") from exc


def ingest_advisory_source(
    spark: SparkSession,
    *,
    url: str | None = None,
    payload: dict | None = None,
) -> DataFrame:
    """Fetch (or accept injected) advisory JSON and flatten. Injected
    payloads keep tests hermetic — the reference hits the network
    unconditionally."""
    if payload is not None:
        text = json.dumps(payload)
    elif url is not None:
        text = fetch_json(url)
    else:
        raise ValueError("either url or payload is required")
    return advisories_from_json(spark, [text])
