"""Physical-layout helpers for the 100 TB path: bucketing for co-located
joins, partitioned writes for pruning, partition-count guidance.

The reference never touches physical layout (Flink's concern); at Spark
scale it's the single biggest lever: a fact⋈fact join on bucketed tables
with matching bucket counts needs NO shuffle of either side, and a
date-partitioned write turns time filters into directory pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+ sorted) managed table. Joins/aggregations
    on `bucket_cols` between tables with EQUAL bucket counts skip the
    shuffle entirely; the sort makes sort-merge join read-ready."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table_name)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned write: filters on partition_cols become
    directory pruning (zero I/O for excluded partitions)."""
    df.write.mode(mode).format(fmt).partitionBy(*partition_cols).save(path)


def shuffle_free_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two bucketed tables on their bucket keys. With matching bucket
    counts the plan contains no Exchange on either side (verify with
    `.explain()` — the test asserts it)."""
    return spark.table(left_table).join(spark.table(right_table), on)


def recommend_shuffle_partitions(
    input_bytes: int, target_partition_bytes: int = 128 * 1024 * 1024
) -> int:
    """Partition-count guidance: size shuffle partitions so each holds
    ~128 MB (the classic rule of thumb; AQE coalescing refines at runtime).
    """
    return max(1, (input_bytes + target_partition_bytes - 1) // target_partition_bytes)
