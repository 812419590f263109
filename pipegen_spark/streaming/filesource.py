"""File-backed streaming source over the driver testdata.

Structured Streaming's file source requires a *directory* of files, while
the testdata ships one `events.parquet` per scale factor — and the testdata
tree is read-only. Stage a per-sf-dir symlink directory under /tmp once and
readStream from it. Timestamp handling mirrors `catalog.table` for both
testdata generations: the current generation's TIMESTAMP_NTZ `ts` is cast
NTZ->LTZ (value-preserving under the UTC session zone the catalog pins —
watermarks need the instant type), and the legacy TIMESTAMP(NANOS)
generation is read as long and truncated to micros.

Used by the streaming parity queries (q39-q42): on a finite input the
streaming result equals the batch result, which is what their DuckDB
oracles compute.
"""

from __future__ import annotations

import hashlib
import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@contextmanager
def state_partitions(spark: SparkSession, n: int = 8):
    """Size stateful-stream shuffles to the state, not the batch corpus.

    A streaming query fixes its state partition count from
    `spark.sql.shuffle.partitions` at START and every micro-batch pays a
    per-partition state-store open/commit, so running a small-state stream
    at batch parallelism (32) is overhead-dominated — measured 13.2 s →
    3.0 s on the stream-stream join parity query and 1.45x throughput on
    the 50k rows/s bench probe when resized 32 → 8. The conf is restored
    on exit; it only pins the partitioning of queries STARTED inside the
    block.

    Size `n` per operator to its STATE volume, not the core count (r13
    interleaved A/B at sf0.1, hashes identical): the stream-stream
    joins, streaming dedup and the tumbling-window enrich all run
    fastest at n=4 (state is a watermark-bounded hour of keys; the
    per-partition state-store open/commit dominates above that), while
    the session-window query q39 keeps the n=8 default (update-mode
    session state re-emits per batch — more state rows per key, so it
    still profits from the extra parallelism: 2.4 s at 8 vs 3.1 s at 4).
    At cluster scale both are deployment-conf overrides; neither value
    depends on the local core count."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _events_bytes(sf_dir: str) -> int:
    """On-disk size of the sf dir's events table (file or part-file
    directory) — the state-volume proxy session_state_partitions sizes
    against."""
    path = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path)
            for f in fs
        )
    try:
        return os.path.getsize(path)
    except OSError:
        return 0


def session_state_partitions(spark: SparkSession, sf_dir: str):
    """SCALE-ADAPTIVE state sizing for session-window streams (r14,
    guide §2 'partitioning derived from input size, not a constant').

    Session state holds every open session, so it grows with event
    volume — unlike the watermark-bounded hour of stream-stream
    join/dedup state that stays fastest at the n=4 constant at every
    measured scale. The r14 sf1 sweep (10x events, hashes identical)
    moved the session query's optimum from the sf0.1-tuned n=8 to n=16
    (9.24 s -> 7.60 s), exactly the drift a fixed constant cannot
    follow. One state partition per ~1 MiB of events parquet, floored
    at the measured sf0.1 optimum (8: 2 MiB -> 8 at sf0.1, 16 MiB ->
    16 at sf1) and capped at defaultParallelism so a small box is
    never oversubscribed; on a cluster the cap scales with the
    executor count."""
    size = _events_bytes(sf_dir)
    cores = spark.sparkContext.defaultParallelism
    n = max(8, min(cores, size // (1 << 20)))
    return state_partitions(spark, n)


def events_file_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the sf dir's events table (micros `ts` column)."""
    from pipegen_spark.catalog import table as _table

    _table(spark, sf_dir, "events")  # sets the nanos-as-long conf
    path = os.path.join(sf_dir, "events.parquet")
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    stream_dir = os.path.join("/tmp", f"pipegen_stream_events_{digest}")
    os.makedirs(stream_dir, exist_ok=True)
    if os.path.isdir(path):
        # Engine-written tables (e.g. the derived sf1 corpus) are
        # DIRECTORIES of part files; the file-stream source does not
        # descend into a non-partition subdirectory, so link each part
        # file flat into the stream dir.
        for part in sorted(os.listdir(path)):
            if part.endswith(".parquet"):
                link = os.path.join(stream_dir, part)
                if not os.path.exists(link):
                    os.symlink(os.path.join(path, part), link)
    else:
        link = os.path.join(stream_dir, "events.parquet")
        if not os.path.exists(link):
            os.symlink(path, link)
    raw_schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(raw_schema).parquet(stream_dir)
    dt = dict(stream.dtypes).get("ts")
    if dt == "bigint":  # legacy NANOS generation, read raw
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dt == "timestamp_ntz":
        # Watermarks require the instant (LTZ) type; under the UTC session
        # zone pinned by catalog.table the cast is value-preserving.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream




def run_to_file_sink(
    spark: SparkSession, df: DataFrame, prefix: str
) -> DataFrame:
    """Run a finite APPEND-mode stream to completion through the
    idempotent file sink and read the committed output back — how the
    append-mode parity queries (q41, q42) terminate. Append emissions
    are final, so unlike q39's update stream no compaction step is
    needed and no batch stamp is carried — replay safety comes from the
    per-batch commit markers alone. The sink write happens executor-side
    through the Hadoop FS API; nothing driver-bound."""
    import tempfile

    from pipegen_spark.streaming.sink import (
        idempotent_dir_sink,
        read_committed,
    )

    work = tempfile.mkdtemp(prefix=prefix)
    sink_dir = os.path.join(work, "out")
    q = (
        df.writeStream.foreachBatch(idempotent_dir_sink(sink_dir))
        .outputMode("append")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_committed(spark, sink_dir)
