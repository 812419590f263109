"""Streaming sinks beyond the built-ins.

`idempotent_dir_sink` — exactly-once-per-batch file output via foreachBatch:
each micro-batch writes to `<path>/batch=<id>` and drops a `_COMMIT` marker
last. On restart, already-committed batch ids are skipped, so replays after
a failure never double-write (the classic batchId-keyed idempotence
pattern; the built-in file sink is also exactly-once but locks you into its
own log format — this one produces plain directories any reader can
consume with `committed_batches`/`read_committed`).

Marker existence/creation and directory listing go through the Hadoop
FileSystem API (the same filesystem the DataFrame writer resolves), so the
exactly-once contract holds for hdfs:// and s3a:// paths, not just the
driver's local disk. A driver-local os fallback remains only for calls made
with no live SparkSession.

The reference is at-least-once end-to-end (auto-commit consumer,
SURVEY.md §2C) — this is a strict upgrade, documented as such.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

COMMIT_MARKER = "_COMMIT"


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path-class, Path) for `path` on the session's Hadoop
    conf — resolves the scheme (file://, hdfs://, s3a://, ...) the same way
    `df.write.save(path)` does."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jvm.org.apache.hadoop.fs.Path, jpath


def idempotent_dir_sink(path: str, fmt: str = "parquet"):
    """Returns a foreachBatch callable: exactly-once batch directories."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_dir = f"{path.rstrip('/')}/batch={batch_id}"
        fs, jpath_cls, _ = _hadoop_fs(spark, path)
        marker = jpath_cls(f"{batch_dir}/{COMMIT_MARKER}")
        if fs.exists(marker):
            return  # replayed batch — already committed
        batch_df.write.mode("overwrite").format(fmt).save(batch_dir)
        out = fs.create(marker, True)
        try:
            out.write(bytearray(str(batch_id), "utf-8"))
        finally:
            out.close()

    return write


def committed_batches(path: str, spark: SparkSession | None = None) -> list[int]:
    spark = spark or SparkSession.getActiveSession()
    if spark is None:  # driver-local fallback (plain local paths only)
        if not os.path.isdir(path):
            return []
        return sorted(
            int(e.split("=", 1)[1])
            for e in os.listdir(path)
            if e.startswith("batch=")
            and os.path.exists(os.path.join(path, e, COMMIT_MARKER))
        )
    fs, jpath_cls, jpath = _hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return []
    out = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if name.startswith("batch=") and fs.exists(
            jpath_cls(status.getPath(), COMMIT_MARKER)
        ):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def read_committed(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Read only committed batch directories (uncommitted ones are invisible
    to consumers — the other half of the exactly-once contract)."""
    dirs = [
        f"{path.rstrip('/')}/batch={b}"
        for b in committed_batches(path, spark)
    ]
    if not dirs:
        raise FileNotFoundError(f"no committed batches under {path}")
    return spark.read.format(fmt).load(dirs)
