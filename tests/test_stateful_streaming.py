"""applyInPandasWithState sessionization + streaming pipeline through the
executor/runner (rate connector → windowed insert → smart stop)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipegen_spark.streaming.stateful import sessionize_stream


def test_sessionize_stateful(spark, tmp_path):
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),
        (1, "2024-01-01 02:00:00"),  # > 30 min gap → closes session 1
        (2, "2024-01-01 01:00:00"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts_s"]).withColumn(
        "ts", F.to_timestamp("ts_s")
    ).select("user_id", "ts")
    src = str(tmp_path / "sess-in")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    out = sessionize_stream(stream, gap="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT * FROM sessions_out ORDER BY user_id, session_start"
        ).collect()
        # user 1's first session closed by the 02:00 event; user 1's second
        # session and user 2's only session remain OPEN in state
        assert len(got) == 1
        r = got[0]
        assert r.user_id == 1 and r.n_events == 2
        assert r.session_start.minute == 0 and r.session_end.minute == 10
    finally:
        q.stop()


def test_sessionize_update_mode_multibatch_compaction(spark, tmp_path):
    """emit_open + batch-stamped idempotent sink + compaction must equal
    batch sessionization across MULTIPLE micro-batches, including the
    degenerate single-event interval growing from its own start point
    (the inclusive-overlap edge) and a session closed then followed by a
    new one."""
    import os
    import time as _time

    from pipegen_spark.streaming.sink import (
        compact_session_updates,
        idempotent_dir_sink,
        read_committed,
    )
    from pipegen_spark.streaming.stateful import sessionize_stream

    def write_file(rows, name, mtime):
        import glob
        import shutil

        df = spark.createDataFrame(rows, ["user_id", "ts_s"]).withColumn(
            "ts", F.to_timestamp("ts_s")
        ).select("user_id", "ts")
        staging = str(tmp_path / "staging" / name)
        df.coalesce(1).write.parquet(staging)
        (tmp_path / "in").mkdir(exist_ok=True)
        # The file source lists plain FILES in the watched dir — move the
        # single part file there; its mtime orders the micro-batches.
        dest = str(tmp_path / "in" / f"{name}.parquet")
        shutil.copyfile(glob.glob(f"{staging}/part-*.parquet")[0], dest)
        os.utime(dest, (mtime, mtime))

    t0 = _time.time() - 1000
    # Batch 1: user 1 single event (degenerate [t,t] open session);
    # user 2 two events (open session).
    write_file(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 01:00:00"),
         (2, "2024-01-01 01:10:00")],
        "f1",
        t0,
    )
    # Batch 2: user 1's session grows from exactly its start point; then a
    # >gap jump closes it and opens a second session. User 3 appears.
    write_file(
        [(1, "2024-01-01 00:20:00"), (1, "2024-01-01 03:00:00"),
         (3, "2024-01-01 05:00:00")],
        "f2",
        t0 + 100,
    )
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in"))
    )
    out = sessionize_stream(stream, gap="30 minutes", emit_open=True)
    sink_dir = str(tmp_path / "out")
    q = (
        out.writeStream.foreachBatch(
            idempotent_dir_sink(sink_dir, stamp_batch=True)
        )
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    committed = read_committed(spark, sink_dir)
    assert committed.select("_batch_id").distinct().count() == 2
    got = [
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in compact_session_updates(
            committed, "user_id", "session_start", "session_end"
        ).collect()
    ]
    assert sorted(got) == [
        (1, "2024-01-01 00:00:00", "2024-01-01 00:20:00", 2),
        (1, "2024-01-01 03:00:00", "2024-01-01 03:00:00", 1),
        (2, "2024-01-01 01:00:00", "2024-01-01 01:10:00", 2),
        (3, "2024-01-01 05:00:00", "2024-01-01 05:00:00", 1),
    ]


@pytest.fixture
def rate_project(tmp_path):
    proj = tmp_path / "rproj"
    (proj / "sql").mkdir(parents=True)
    (proj / "sql" / "01_source.sql").write_text(
        """CREATE TABLE clicks (
            event_time TIMESTAMP,
            user_id BIGINT,
            event_type STRING
        ) WITH ('connector' = 'rate', 'rows-per-second' = '200');"""
    )
    (proj / "sql" / "02_sink.sql").write_text(
        "CREATE TABLE click_counts (event_type STRING, cnt BIGINT) "
        "WITH ('connector' = 'memory');"
    )
    (proj / "sql" / "03_process.sql").write_text(
        "INSERT INTO click_counts "
        "SELECT event_type, COUNT(*) AS cnt FROM clicks GROUP BY event_type;"
    )
    return str(proj)


def test_streaming_pipeline_runner(spark, rate_project, tmp_path):
    """Full unbounded pipeline: rate source → continuous aggregate →
    memory sink, smart-stopped after the configured duration."""
    from pipegen_spark.plans.runner import PipelineRunner, RunnerConfig

    cfg = RunnerConfig(
        project_dir=rate_project,
        duration_seconds=6.0,
        report_dir=str(tmp_path / "reports"),
    )
    result = PipelineRunner(spark, cfg).run()
    assert result.producer_stats["mode"] == "streaming"
    assert result.producer_stats["stop_reasons"]  # smart stop engaged
    rows = {r["name"]: r for r in result.statement_results}
    assert rows["03_process"]["status"] == "OK"
    assert rows["03_process"].get("rows", 0) >= 1  # event types counted
    # listener metrics captured streaming progress
    assert any(m["input_rows"] > 0 for m in result.metrics)
