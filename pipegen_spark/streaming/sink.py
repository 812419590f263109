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
from pyspark.sql import functions as F

COMMIT_MARKER = "_COMMIT"


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path-class, Path) for `path` on the session's Hadoop
    conf — resolves the scheme (file://, hdfs://, s3a://, ...) the same way
    `df.write.save(path)` does."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jvm.org.apache.hadoop.fs.Path, jpath


def idempotent_dir_sink(path: str, fmt: str = "parquet", stamp_batch: bool = False):
    """Returns a foreachBatch callable: exactly-once batch directories.

    With `stamp_batch`, each row carries a `_batch_id` column — required by
    `compact_session_updates` (update-mode readers need to know which of
    several emissions of the same evolving aggregate is newest)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_dir = f"{path.rstrip('/')}/batch={batch_id}"
        fs, jpath_cls, _ = _hadoop_fs(spark, path)
        marker = jpath_cls(f"{batch_dir}/{COMMIT_MARKER}")
        if fs.exists(marker):
            return  # replayed batch — already committed
        if stamp_batch:
            batch_df = batch_df.withColumn("_batch_id", F.lit(batch_id))
        batch_df.write.mode("overwrite").format(fmt).save(batch_dir)
        out = fs.create(marker, True)
        try:
            out.write(bytearray(str(batch_id), "utf-8"))
        finally:
            out.close()

    return write


def compact_session_updates(
    df: DataFrame,
    by: str,
    start_col: str,
    end_col: str,
    batch_col: str = "_batch_id",
) -> DataFrame:
    """Resolve an update-mode session-window stream (written batch-stamped
    through `idempotent_dir_sink`) to its final session set.

    Update mode re-emits a session every micro-batch that changes it, and
    session windows only ever GROW or MERGE — a later emission's interval
    contains every earlier interval of its chain. So a row is stale iff a
    LATER batch emitted an overlapping interval for the same key; the
    anti-join keeps exactly the newest version of each chain plus every
    session that never changed again.

    Overlap is tested with INCLUSIVE bounds: a one-event session is the
    degenerate interval [t, t] (under the raw last-event end convention),
    and its grown successor starts at exactly t — strict bounds would
    leave the stale row alive. Inclusive bounds cannot conflate two
    DISTINCT sessions of one key: a new session only opens when the next
    event is strictly more than the gap after the previous session's last
    event, so consecutive intervals never touch (under either the
    last-event or the +gap end convention).

    Physical shape: one hash join partitioned on the session key — per-key
    cardinality is (sessions x batches-that-touched-them), bounded per
    compaction horizon, so the compaction scales with state size, not
    stream length.
    """
    a, b = df.alias("a"), df.alias("b")
    newer_overlap = (
        (F.col(f"a.{by}") == F.col(f"b.{by}"))
        & (F.col(f"b.{batch_col}") > F.col(f"a.{batch_col}"))
        & (F.col(f"b.{start_col}") <= F.col(f"a.{end_col}"))
        & (F.col(f"b.{end_col}") >= F.col(f"a.{start_col}"))
    )
    return a.join(b, newer_overlap, "left_anti").drop(batch_col)


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
