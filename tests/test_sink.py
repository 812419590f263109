"""Idempotent foreachBatch sink: exactly-once per batch, replay-safe."""

from __future__ import annotations

import os

import pytest

from pipegen_spark.streaming.sink import (
    committed_batches,
    idempotent_dir_sink,
    read_committed,
)


def test_idempotent_sink_end_to_end(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    spark.range(100).coalesce(2).write.parquet(src)
    stream = spark.readStream.schema("id long").parquet(src)
    q = (
        stream.writeStream.foreachBatch(idempotent_dir_sink(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    batches = committed_batches(out)
    assert batches, "at least one committed batch"
    df = read_committed(spark, out)
    assert df.count() == 100


def test_replayed_batch_not_double_written(spark, tmp_path):
    out = str(tmp_path / "out2")
    sink = idempotent_dir_sink(out)
    df = spark.range(10)
    sink(df, 0)
    first_files = sorted(os.listdir(os.path.join(out, "batch=0")))
    sink(df.union(df), 0)  # replay with different content — must be a no-op
    assert sorted(os.listdir(os.path.join(out, "batch=0"))) == first_files
    assert read_committed(spark, out).count() == 10


def test_uncommitted_batch_invisible(spark, tmp_path):
    out = str(tmp_path / "out3")
    sink = idempotent_dir_sink(out)
    sink(spark.range(5), 0)
    # simulate a crash mid-batch-1: data written, marker missing
    spark.range(7).write.mode("overwrite").parquet(
        os.path.join(out, "batch=1")
    )
    assert committed_batches(out) == [0]
    assert read_committed(spark, out).count() == 5
    with pytest.raises(FileNotFoundError):
        read_committed(spark, str(tmp_path / "nothing"))
