"""SparkSession factory tuned for the engine.

The reference delegates physical execution to Flink with static defaults
(parallelism 1, 4 slots — internal/templates/files/config/flink-conf.yaml:11-17).
Here the equivalent knobs are Spark confs, sized so the same code runs on
local[N] for tests and on a large cluster unchanged:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  dynamic broadcast conversion replace hand-tuned parallelism.
- shuffle.partitions defaults to 2x cores locally; on a real cluster the
  value is overridden by the deployer (or left to AQE's coalescing).
- Arrow enabled: pandas_udf / toPandas exchange is vectorized.
- Session timezone pinned to UTC so event-time semantics are stable across
  driver environments (parquet timestamps are UTC-normalized).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pin_utc_tz() -> None:
    """Pin the driver PROCESS timezone to UTC.

    `spark.sql.session.timeZone` governs SQL semantics, but a non-Arrow
    `collect()` converts TIMESTAMP (LTZ) values to Python datetimes through
    the driver's OS timezone — on a TZ=America/New_York host, collected
    event-time results would shift by the UTC offset even with the session
    conf pinned (round-3 ADVICE finding, reproduced on q13). Setting TZ
    before (or after — tzset reapplies it) JVM start closes that last
    host-dependent surface."""
    os.environ["TZ"] = "UTC"
    if hasattr(time, "tzset"):  # POSIX; harmless no-op guard elsewhere
        time.tzset()


def get_spark(
    app_name: str = "pipegen-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    `cpus` defaults to $SPARK_GRAFT_CPUS (driver contract) or all cores.
    """
    pin_utc_tz()
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    try:
        n = int(cpus)
    except (TypeError, ValueError):
        n = os.cpu_count() or 8
    if shuffle_partitions is None:
        # One partition per core, measured best on the sf0.1 corpus in
        # clean per-process runs (cores: 43s, half: 48s, 2x: 45s). NOTE:
        # same-process A/B comparisons are invalid — the second session
        # reuses a warm JVM and wins by ~20% regardless of setting. At real
        # scale size this from data volume instead — see
        # plans/layout.py:recommend_shuffle_partitions.
        shuffle_partitions = max(8, n)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # local[N] puts executors AND every broadcast relation inside the
        # driver JVM; the 1g default OOMed the bench's 8-thread warm pool
        # once the corpus passed ~118 queries (broadcast build while other
        # threads hold theirs). Only effective when this process starts
        # the JVM — exactly the bench/test/driver entry paths.
        .config("spark.driver.memory", os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
