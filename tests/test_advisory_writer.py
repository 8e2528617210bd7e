"""Round-trip the Spark 4 Python DataSource WRITER: df.write
.format("advisory") -> part files -> driver commit merges into the
nested advisory JSON -> spark.read.format("advisory") reads it back.
"""

from __future__ import annotations

import json
import os

from advisorydatapipeline_spark.sources.advisory_source import register

ROWS = [
    ("pkg-a", "CVE-2024-0001", "1.2.3"),
    ("pkg-a", "CVE-2024-0002", "1.2.4"),
    ("pkg-b", "CVE-2023-9999", "0.9.1"),
    ("pkg-c", "CVE-2024-1234", "7.0.0"),
]


def test_writer_reader_roundtrip(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "advisories.json")
    df = spark.createDataFrame(
        ROWS, "package_name string, cve_id string, fixed_version string"
    ).repartition(3)
    df.write.format("advisory").option("path", path).mode(
        "append"
    ).save()

    # the committed artifact is ONE merged nested-JSON document
    assert os.path.exists(path)
    merged = json.load(open(path))
    assert merged["pkg-a"]["CVE-2024-0001"] == {"fixed_version": "1.2.3"}
    # no stray part files survive the commit
    assert not os.path.exists(path + ".parts")

    back = (
        spark.read.format("advisory")
        .option("path", path)
        .load()
        .collect()
    )
    got = {(r.package_name, r.cve_id, r.fixed_version) for r in back}
    assert got == set(ROWS)


def test_writer_empty_partitions_ok(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "sparse.json")
    df = spark.createDataFrame(
        ROWS[:1], "package_name string, cve_id string, fixed_version string"
    ).repartition(8)  # 7 empty partitions still write + commit
    df.write.format("advisory").option("path", path).mode(
        "append"
    ).save()
    merged = json.load(open(path))
    assert merged == {"pkg-a": {"CVE-2024-0001": {"fixed_version": "1.2.3"}}}


def test_commit_refuses_none_messages(tmp_path):
    """ADVICE r6: commit() only runs after every task succeeded, so a
    None commit message there is a broken invariant — publishing
    around it would silently drop a partition. It must raise; only
    abort() may skip Nones (failed tasks are expected there)."""
    import pytest

    from advisorydatapipeline_spark.sources.advisory_source import (
        AdvisoryWriter,
        _PartFile,
    )

    path = str(tmp_path / "out.json")
    w = AdvisoryWriter({"path": path})
    os.makedirs(path + ".parts", exist_ok=True)
    part = path + ".parts/part-00000-0.jsonl"
    with open(part, "w") as f:
        f.write(
            json.dumps(
                {
                    "package_name": "pkg-a",
                    "cve_id": "CVE-2024-0001",
                    "fixed_version": "1.2.3",
                }
            )
            + "\n"
        )
    with pytest.raises(RuntimeError, match="None commit message"):
        w.commit([_PartFile(part, 1), None])
    assert not os.path.exists(path)  # nothing published
    # abort() tolerates Nones and sweeps the parts dir
    w.abort([_PartFile(part, 1), None])
    assert not os.path.exists(path + ".parts")
