"""Streaming tests: availableNow micro-batch runs must agree with the
batch twins."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from advisorydatapipeline_spark.streaming.pipeline import (
    read_event_stream,
    session_event_counts,
    start_streaming_upsert,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    # FileStreamSource requires a *directory*; stage the single-file
    # events table into one
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_windowed_counts_match_batch(spark, sf_dir, events_dir):
    stream = read_event_stream(spark, events_dir)
    q = (
        windowed_event_counts(stream, window="1 hour")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }

    from advisorydatapipeline_spark.queries.helpers import load

    batch = (
        load(spark, sf_dir, "events")
        .withColumn("event_time", F.timestamp_micros(F.expr("ts DIV 1000")))
        .groupBy(F.window("event_time", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )
    want = {
        (r.win.start, r.event_type): (r.n, r["total_value"])
        for r in batch.collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-6


def test_session_counts_stream_runs(spark, sf_dir, events_dir):
    stream = read_event_stream(spark, events_dir)
    q = (
        session_event_counts(stream, gap="1 hour")
        .writeStream.format("memory")
        .queryName("sess_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM sess_counts")
    # session totals must cover every event exactly once
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == spark.read.parquet(f"{sf_dir}/events.parquet").count()


def test_streaming_upsert_converges_to_latest_state(spark, sf_dir, tmp_path, events_dir):
    prod = str(tmp_path / "prod_state")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), False),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("event_time", T.TimestampType(), True),
        ]
    )
    stream = read_event_stream(spark, events_dir).select(
        "user_id", "event_type", "event_time"
    )
    q = start_streaming_upsert(stream, prod, ["user_id"], schema, ckpt)
    q.awaitTermination(120)

    from advisorydatapipeline_spark.operators.window_ops import top_k_per_key
    from advisorydatapipeline_spark.sources.io import read_table

    got = {
        (r.user_id, r.event_type)
        for r in read_table(spark, prod, schema).collect()
    }
    from advisorydatapipeline_spark.queries.helpers import load

    batch = load(spark, sf_dir, "events").withColumn(
        "event_time", F.timestamp_micros(F.expr("ts DIV 1000"))
    )
    want = {
        (r.user_id, r.event_type)
        for r in top_k_per_key(
            batch, ["user_id"], [F.col("event_time").desc()], k=1
        ).select("user_id", "event_type").collect()
    }
    assert got == want
    shutil.rmtree(ckpt, ignore_errors=True)


def test_stateful_running_counts_across_batches(spark, sf_dir, tmp_path):
    import shutil as _sh

    from advisorydatapipeline_spark.streaming.pipeline import (
        running_user_counts,
    )

    # two files -> two micro-batches -> state must carry across
    d = tmp_path / "two_batches"
    d.mkdir()
    src = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = src.filter(F.col("event_id") % 2 == 0)
    b = src.filter(F.col("event_id") % 2 == 1)
    a.coalesce(1).write.parquet(str(d / "a"))
    b.coalesce(1).write.parquet(str(d / "b"))
    for i, sub in enumerate(["a", "b"]):
        for f in (d / sub).glob("*.parquet"):
            _sh.move(str(f), d / f"part-{i}.parquet")
        _sh.rmtree(d / sub)

    stream = read_event_stream(spark, str(d), max_files_per_trigger=1)
    q = (
        running_user_counts(stream.select("user_id", "value", "event_time"))
        .writeStream.format("memory")
        .queryName("running_counts")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update-mode sink accumulates one row per key per batch; the
    # running count is monotone so max() is the converged value
    got = {
        r.user_id: (r.n, r.mx)
        for r in spark.sql(
            "SELECT user_id, max(n_events) n, max(max_value) mx "
            "FROM running_counts GROUP BY user_id"
        ).collect()
    }
    want = {
        r.user_id: (r.n, r.mx)
        for r in src.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    assert got == want


def test_tws_plan_construction(spark, sf_dir):
    """transformWithStateInPandas (Spark 4 stateful API): the plan
    must construct and analyze with the declared output schema.
    Execution needs the protobuf package for the TWS driver worker,
    which this container lacks — gated accordingly; the executable
    stateful twin is running_user_counts (applyInPandasWithState)."""
    import importlib.util

    import pytest

    from advisorydatapipeline_spark.streaming.pipeline import (
        read_event_stream,
        running_value_totals_tws,
    )
    import shutil
    import tempfile
    from pathlib import Path

    d = tempfile.mkdtemp(prefix="tws_plan_")
    shutil.copy(f"{sf_dir}/events.parquet", Path(d) / "p0.parquet")
    stream = read_event_stream(spark, d).select(
        "user_id", "value", "event_time"
    )
    out = running_value_totals_tws(stream)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id",
        "n_events",
        "qvalue_sum",
    ]
    try:
        has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        has_protobuf = False
    if not has_protobuf:
        pytest.skip("protobuf absent: TWS execution not runnable here")
    # with protobuf present this would drain and match the batch
    # GROUP BY; see running_value_totals_tws docstring.


def test_checkpoint_recovery_resumes_offsets(spark, sf_dir, tmp_path):
    """Kill a checkpointed stream mid-input, restart it, and the
    final aggregate must equal the batch answer — file-source offsets
    recover exactly from the checkpoint (no replayed or skipped
    files). This is the property a production restart relies on."""
    import pyspark.sql.functions as SF

    src = tmp_path / "src"
    src.mkdir()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        SF.col("ts").isNotNull()
    )
    # split the input into 3 files so maxFilesPerTrigger=1 gives
    # 3 deterministic micro-batches
    parts = ev.withColumn("_b", SF.col("event_id") % 3)
    for b in range(3):
        parts.filter(SF.col("_b") == b).drop("_b").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{b}"))
    paths = sorted(str(p) for p in src.glob("b*/part-*.parquet"))
    feed = tmp_path / "feed"
    feed.mkdir()
    shutil.copy(paths[0], feed / "f0.parquet")

    from advisorydatapipeline_spark.streaming.pipeline import (
        read_event_stream as res,
    )

    ckpt = str(tmp_path / "ckpt")
    counts = (
        res(spark, str(feed), max_files_per_trigger=1)
        .groupBy("event_type")
        .agg(SF.count("*").alias("n"))
    )

    def start(name):
        return (
            counts.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start("ckpt_run1")
    q.awaitTermination(300)
    q.stop()  # "crash" after batch 1

    # more input lands while the query is down
    shutil.copy(paths[1], feed / "f1.parquet")
    shutil.copy(paths[2], feed / "f2.parquet")

    q2 = start("ckpt_run2")
    q2.awaitTermination(300)
    q2.stop()

    got = {
        r.event_type: r.n for r in spark.table("ckpt_run2").collect()
    }
    want = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(SF.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_streaming_merge_accumulates_across_batches(
    spark, sf_dir, tmp_path
):
    """Per-batch MERGE with accumulate clauses: counts must SUM across
    micro-batches (last-writer-wins upsert would keep only the final
    batch's count). Three single-file triggers force three batches."""
    from advisorydatapipeline_spark.operators.merge import MergeClause
    from advisorydatapipeline_spark.streaming.pipeline import (
        start_streaming_merge,
    )

    src_dir = tmp_path / "ev_split"
    src_dir.mkdir()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id"
    )
    # deterministic 3-way split, one file each
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src_dir / f"b{i}"))
    stage = tmp_path / "stream_in"
    stage.mkdir()
    import glob
    import shutil as sh

    for i in range(3):
        (f,) = glob.glob(str(src_dir / f"b{i}" / "part-*.parquet"))
        sh.copy(f, stage / f"part-{i}.parquet")

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage))
    )
    prod = str(tmp_path / "prod_counts")
    q = start_streaming_merge(
        stream,
        prod,
        ["user_id"],
        schema,
        str(tmp_path / "ckpt"),
        prepare=lambda b: b.groupBy("user_id").agg(
            F.count("*").cast("long").alias("n")
        ),
        when_matched=[MergeClause("update", None, {"n": "t.n + s.n"})],
        when_not_matched=[MergeClause("insert")],
    )
    q.awaitTermination(180)

    got = {
        r.user_id: r.n for r in spark.read.parquet(prod).collect()
    }
    want = {
        r.user_id: r.n
        for r in ev.groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n"))
        .collect()
    }
    assert got == want
    # multiple micro-batches actually ran, so the accumulate clause
    # (not a single-batch insert) produced the totals
    ran = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(ran) >= 2


def test_running_transitions_chain_across_batches(spark, tmp_path):
    """The remembered-last-event state must chain transitions across
    micro-batch boundaries: with one file per trigger, the first
    event of batch 2 forms a pair with the LAST event of batch 1."""
    import time

    import pandas as pd

    from advisorydatapipeline_spark.streaming.pipeline import (
        EVENT_STREAM_SCHEMA,
        read_event_stream,
        running_transitions,
    )

    d = tmp_path / "ev"
    d.mkdir()
    base = 1_700_000_000_000_000  # epoch-us
    f1 = [(1, base + 1, 7, "view", 1.0, None),
          (2, base + 2, 7, "click", 1.0, None)]
    f2 = [(3, base + 3, 7, "purchase", 1.0, None)]
    sch = ("event_id long, ts_us long, user_id long, event_type string,"
           " value double, props string")

    def write(rows, sub):
        # the stream schema reads ts as TIMESTAMP_NTZ (what the
        # driver's parquet carries); render it from exact us ints
        df = spark.createDataFrame(rows, sch).selectExpr(
            "event_id",
            "CAST(timestamp_micros(ts_us) AS timestamp_ntz) AS ts",
            "user_id", "event_type", "value", "props",
        )
        df.coalesce(1).write.parquet(str(d / sub), mode="overwrite")

    write(f1, "b1")
    time.sleep(1.1)  # file source orders batches by mod time
    write(f2, "b2")
    stream = read_event_stream(
        spark, str(d / "*"), max_files_per_trigger=1
    )
    q = (
        running_transitions(
            stream.select("user_id", "event_id", "ts", "event_type")
        )
        .writeStream.format("memory")
        .queryName("tr_x_batch")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = {
        (r.from_type, r.to_type): r.n
        for r in spark.sql(
            "SELECT from_type, to_type, sum(n) AS n FROM tr_x_batch"
            " GROUP BY 1, 2"
        ).collect()
    }
    assert got == {("view", "click"): 1, ("click", "purchase"): 1}


def test_derived_stream_width_clamps_and_scales():
    """r15: streaming state width derives from input bytes —
    ceil(bytes / STREAM_BYTES_PER_PART) clamped to [1, session width].
    Small inputs collapse the per-batch state-store commit tax; any
    input >= width*target keeps the FULL configured width (the 100 TB
    regime is untouched)."""
    from advisorydatapipeline_spark.queries.streaming_queries import (
        STREAM_BYTES_PER_PART as B,
        derived_stream_width,
    )

    assert derived_stream_width(0, 32) == 1
    assert derived_stream_width(1, 32) == 1
    assert derived_stream_width(B, 32) == 1
    assert derived_stream_width(B + 1, 32) == 2
    assert derived_stream_width(5 * B, 32) == 5
    # saturates to the session width for big inputs (scale regime)
    assert derived_stream_width(32 * B, 32) == 32
    assert derived_stream_width(10**15, 32) == 32
    assert derived_stream_width(10**15, 400) == 400
    # heavy-state target: same rule, smaller bytes/partition (per-key
    # Python bodies and complete-mode state rewrites cost ~30x more
    # CPU per input byte); still saturates to the session width
    from advisorydatapipeline_spark.queries.streaming_queries import (
        STREAM_BYTES_PER_PART_HEAVY as BH,
    )

    assert BH < B
    assert derived_stream_width(BH + 1, 32, BH) == 2
    assert derived_stream_width(10**15, 32, BH) == 32


def test_adaptive_state_width_restores_session_conf(spark, events_dir):
    """The context manager scopes spark.sql.shuffle.partitions to the
    derived width and ALWAYS restores the session value."""
    from advisorydatapipeline_spark.queries.streaming_queries import (
        _adaptive_state_width,
        _dir_bytes,
        derived_stream_width,
    )

    base = spark.conf.get("spark.sql.shuffle.partitions")
    want = derived_stream_width(_dir_bytes(events_dir), int(base))
    with _adaptive_state_width(spark, events_dir):
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == want
    assert spark.conf.get("spark.sql.shuffle.partitions") == base
    # restore also happens when the body raises
    try:
        with _adaptive_state_width(spark, events_dir):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == base
