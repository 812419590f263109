"""Streaming sinks beyond the built-ins.

`idempotent_dir_sink` — exactly-once-per-batch file output via foreachBatch:
each micro-batch writes to `<path>/batch=<id>` and drops a `_COMMIT` marker
last. On restart, already-committed batch ids are skipped, so replays after
a failure never double-write (the classic batchId-keyed idempotence
pattern; the built-in file sink is also exactly-once but locks you into its
own log format — this one produces plain directories any reader can
consume with `committed_batches`/`read_committed`).

The reference is at-least-once end-to-end (auto-commit consumer,
SURVEY.md §2C) — this is a strict upgrade, documented as such.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

COMMIT_MARKER = "_COMMIT"


def idempotent_dir_sink(path: str, fmt: str = "parquet"):
    """Returns a foreachBatch callable: exactly-once batch directories."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_dir = os.path.join(path, f"batch={batch_id}")
        marker = os.path.join(batch_dir, COMMIT_MARKER)
        if os.path.exists(marker):
            return  # replayed batch — already committed
        batch_df.write.mode("overwrite").format(fmt).save(batch_dir)
        with open(marker, "w", encoding="utf-8") as fh:
            fh.write(str(batch_id))

    return write


def committed_batches(path: str) -> list[int]:
    out = []
    if not os.path.isdir(path):
        return out
    for entry in os.listdir(path):
        if entry.startswith("batch=") and os.path.exists(
            os.path.join(path, entry, COMMIT_MARKER)
        ):
            out.append(int(entry.split("=", 1)[1]))
    return sorted(out)


def read_committed(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Read only committed batch directories (uncommitted ones are invisible
    to consumers — the other half of the exactly-once contract)."""
    dirs = [
        os.path.join(path, f"batch={b}") for b in committed_batches(path)
    ]
    if not dirs:
        raise FileNotFoundError(f"no committed batches under {path}")
    return spark.read.format(fmt).load(dirs)
