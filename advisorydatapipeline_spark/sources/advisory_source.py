"""Custom Python DataSource (Spark 4 API): the advisory feed as a
first-class ``spark.read.format("advisory")`` source.

The reference's HTTP-JSON advisory feed
(`ingest/fetch/echo_advisory/fetch.py:16-43`) is a driver-side fetch
+ Python flatten. `sources/http_json.py` re-expresses the flatten as
a DataFrame plan; THIS module goes one step further and makes the
feed a real pluggable source: schema declaration, partitioned
parallel reads (packages hash-bucketed across ``numPartitions``), and
the ``CVE-`` prefix filter applied at the source. Executors each
parse only their package bucket — on a real deployment the payload
sits in object storage and each partition range-reads it; the
partition/read split is exactly the shape that needs.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

ADVISORY_SCHEMA = "package_name string, cve_id string, fixed_version string"


def _bucket(pkg: str, n: int) -> int:
    # process-stable hash (builtin hash() is salted per interpreter)
    return int(hashlib.md5(pkg.encode()).hexdigest()[:8], 16) % n


class AdvisoryDataSource(DataSource):
    """``format("advisory")`` — options: path (JSON file of
    ``{package: {cve_id: {fixed_version}}}``), numPartitions."""

    @classmethod
    def name(cls) -> str:
        return "advisory"

    def schema(self) -> str:
        return ADVISORY_SCHEMA

    def reader(self, schema):  # noqa: ANN001
        return AdvisoryReader(self.options)

    def simpleStreamReader(self, schema):  # noqa: ANN001
        return AdvisorySimpleStreamReader(self.options)

    def writer(self, schema, overwrite):  # noqa: ANN001
        return AdvisoryWriter(self.options)


class AdvisoryReader(DataSourceReader):
    def __init__(self, options):  # noqa: ANN001
        self.path = options["path"]
        self.n = int(options.get("numPartitions", "4"))
        self.pkg_eq: str | None = None
        self.cve_prefix: str | None = None

    def pushFilters(self, filters):  # noqa: ANN001
        """Source-side pushdown: package equality prunes whole package
        buckets before parse; cve prefix narrows inside a package.
        Everything else is returned for Spark to evaluate."""
        from pyspark.sql.datasource import EqualTo, StringStartsWith

        remaining = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("package_name",):
                self.pkg_eq = f.value
            elif isinstance(f, StringStartsWith) and f.attribute == (
                "cve_id",
            ):
                self.cve_prefix = f.value
            else:
                remaining.append(f)
        return remaining

    def partitions(self):
        if self.pkg_eq is not None:
            # equality on the bucket key -> a single-partition read
            return [InputPartition(_bucket(self.pkg_eq, self.n))]
        return [InputPartition(i) for i in range(self.n)]

    def read(self, partition):  # noqa: ANN001
        # yields ONE pyarrow.RecordBatch per partition instead of
        # per-row tuples: Arrow-vectorized transfer to the JVM skips
        # the row pickler entirely (same fast path as mapInArrow)
        import pyarrow as pa

        with open(self.path) as f:
            payload = json.load(f)
        want = partition.value
        pkgs: list[str] = []
        cve_ids: list[str] = []
        fixed: list[str | None] = []
        for pkg, cves in payload.items():
            if _bucket(pkg, self.n) != want:
                continue
            if self.pkg_eq is not None and pkg != self.pkg_eq:
                continue
            for cve_id, info in cves.items():
                if not cve_id.startswith("CVE-"):
                    continue
                if self.cve_prefix is not None and not cve_id.startswith(
                    self.cve_prefix
                ):
                    continue
                pkgs.append(pkg)
                cve_ids.append(cve_id)
                fixed.append((info or {}).get("fixed_version"))
        if pkgs:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(pkgs, pa.string()),
                    pa.array(cve_ids, pa.string()),
                    pa.array(fixed, pa.string()),
                ],
                names=["package_name", "cve_id", "fixed_version"],
            )


class _PartFile(WriterCommitMessage):
    """Per-partition commit message: (temp part path, row count)."""

    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class AdvisoryWriter(DataSourceWriter):
    """Write side of ``format("advisory")`` — the Spark 4 Python
    DataSource WRITER protocol: executors each ``write()`` their
    partition to a private temp part file and return a commit
    message; the driver's ``commit()`` merges the parts into the
    single nested-JSON advisory document the READER consumes (so
    write -> read round-trips through the same format), then removes
    the parts. A failed/speculated task never publishes: only files
    named in commit messages are merged, the two-phase shape object
    stores need."""

    def __init__(self, options):  # noqa: ANN001
        self.path = options["path"]

    def write(self, iterator):  # noqa: ANN001
        import os

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        attempt = TaskContext.get().taskAttemptId()
        os.makedirs(f"{self.path}.parts", exist_ok=True)
        part = f"{self.path}.parts/part-{pid:05d}-{attempt}.jsonl"
        n = 0
        with open(part, "w") as f:
            for row in iterator:
                f.write(
                    json.dumps(
                        {
                            "package_name": row.package_name,
                            "cve_id": row.cve_id,
                            "fixed_version": row.fixed_version,
                        }
                    )
                    + "\n"
                )
                n += 1
        return _PartFile(part, n)

    def commit(self, messages):  # noqa: ANN001
        # The upstream DataSourceWriter contract types ``messages``
        # as List[Optional[WriterCommitMessage]] and notes a failed
        # task's message "will be None" — but it also states commit()
        # is "invoked on the driver when all tasks run successfully",
        # so inside commit() a None is a broken invariant (Spark
        # should have failed the job or called abort()), and skipping
        # it would silently drop a partition's rows from an
        # atomically-published "successful" output. We deliberately
        # diverge from the permissive typing and raise; None-skipping
        # belongs only in abort(), where failed tasks are expected.
        # The .parts staging dir is removed before raising so an
        # aborted publish leaves no stragglers for a retry to merge.
        import os
        import shutil

        none_idx = [i for i, m in enumerate(messages) if m is None]
        if none_idx:
            shutil.rmtree(self.path + ".parts", ignore_errors=True)
            raise RuntimeError(
                "commit() received None commit message(s) for task(s) "
                f"{none_idx}: a failed task reached the publish phase; "
                "refusing to publish a partial result"
            )
        merged: dict[str, dict[str, dict[str, str]]] = {}
        total = 0
        for m in messages:
            with open(m.path) as f:
                for line in f:
                    r = json.loads(line)
                    merged.setdefault(r["package_name"], {})[
                        r["cve_id"]
                    ] = {"fixed_version": r["fixed_version"]}
            total += m.n_rows
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(merged, f, sort_keys=True)
        os.replace(tmp, self.path)  # atomic publish
        # Remove the whole .parts dir, not just the committed files:
        # failed/speculated attempts leave orphan part files that a
        # bare rmdir would silently keep forever.
        shutil.rmtree(self.path + ".parts", ignore_errors=True)

    def abort(self, messages):  # noqa: ANN001
        import shutil

        # messages may contain None for failed tasks (dereferencing
        # would mask the original task error with AttributeError);
        # removing the .parts dir also sweeps orphan attempt files
        # that never produced a commit message.
        shutil.rmtree(self.path + ".parts", ignore_errors=True)


def register(spark) -> None:  # noqa: ANN001
    """Idempotent registration of the advisory source. Also enables
    Python-source filter pushdown — without the conf, Spark refuses to
    read ANY source whose reader implements pushFilters (and the conf
    must hold under a caller-provided bare session, like nanosAsLong
    in queries/helpers.py)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(AdvisoryDataSource)


class AdvisorySimpleStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the advisory feed (Spark 4
    ``SimpleDataSourceStreamReader``): one logical cursor over the
    feed file. Offset = {"version": n} — a real deployment would
    carry the feed's publish cursor; here the file is a single
    version, so the first ``read`` drains it and every later batch is
    empty. ``readBetweenOffsets`` makes recovery replays exact."""

    def __init__(self, options):  # noqa: ANN001
        self.path = options["path"]

    def initialOffset(self) -> dict:
        return {"version": 0}

    def _rows(self) -> list:
        # a LIST, not a generator: the simple-reader prefetcher
        # pickles the returned batch driver-side for replay caching
        with open(self.path) as f:
            payload = json.load(f)
        return [
            (pkg, cve_id, (info or {}).get("fixed_version"))
            for pkg, cves in payload.items()
            for cve_id, info in cves.items()
            if cve_id.startswith("CVE-")
        ]

    def read(self, start: dict):  # noqa: ANN001
        if start.get("version", 0) >= 1:
            return [], start
        return self._rows(), {"version": 1}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: ANN001
        if start.get("version", 0) >= 1:
            return []
        return self._rows()
