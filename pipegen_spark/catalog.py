"""Table catalog over the driver-provided parquet testdata.

Mirrors the reference's dynamic-table registry (Flink `CREATE TABLE ... WITH`
DDL per topic/path — internal/generator/generator.go:184-196): a table name
maps to a storage location; the engine registers it lazily as a DataFrame.
Parquet scans get predicate pushdown + column pruning from Catalyst for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table as a DataFrame (lazy parquet scan).

    Timestamp handling: the testdata's temporal columns are parquet
    TIMESTAMP(isAdjustedToUTC=false) (naive wall-clock values; some earlier
    generations used NANOS precision). THREE normalizations make every
    downstream query deterministic regardless of the host timezone —
    deliberately ENFORCED here rather than asserted, because the driver
    harness builds its own vanilla SparkSession and calls queries directly;
    this function is the one chokepoint every query passes through:

    - `spark.sql.session.timeZone` is (re)pinned to UTC, so TIMESTAMP
      literals in predicates and any NTZ<->LTZ coercion Catalyst inserts
      resolve to the same instants on every machine (a host-local timezone
      would shift `col <= TIMESTAMP '...'` cutoffs by the UTC offset).
      Callers that need a non-UTC session must not route through this
      catalog — the engine's query/oracle contract is UTC-only.
    - The driver PROCESS timezone is pinned to UTC (`session.pin_utc_tz`):
      a non-Arrow `collect()` converts TIMESTAMP (LTZ) to Python datetimes
      through the OS timezone, not the session conf — without this, a
      TZ=America/New_York host shifts collected event-time results by the
      UTC offset even though SQL semantics are correct (round-3 ADVICE
      finding, reproduced on q13).
    - `events.ts` is cast to TIMESTAMP (LTZ): event-time operators —
      `window()`, watermarks, `unix_micros()` — require the instant type.
      Under the UTC session zone the cast is value-preserving (naive value
      == UTC wall-clock), so collected results still match a naive oracle.
    """
    from pipegen_spark.session import pin_utc_tz

    pin_utc_tz()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":  # legacy NANOS generation, read raw
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif dt == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; return the DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in TPCH_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
