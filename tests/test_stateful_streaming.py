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
