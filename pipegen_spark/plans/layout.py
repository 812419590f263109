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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Skew-mitigating equi-join: the (large, skewed) left side scatters
    each row to a random salt bucket; the right side is replicated
    n_salts times so every (key, salt) combination still matches.

    Turns one giant hot-key partition into `n_salts` even ones at the cost
    of replicating the right side — use when AQE's skew split isn't enough
    (single key >> one partition) and the right side is mid-sized (too big
    to broadcast, small enough to replicate). Result is identical to the
    plain join (asserted in tests).
    """
    from pyspark.sql import functions as F

    salted_l = left.withColumn(
        "_salt", F.floor(F.rand(seed) * n_salts).cast("int")
    )
    salted_r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_l.join(salted_r, [on, "_salt"], how).drop("_salt")


def recommend_shuffle_partitions(
    input_bytes: int, target_partition_bytes: int = 128 * 1024 * 1024
) -> int:
    """Partition-count guidance: size shuffle partitions so each holds
    ~128 MB (the classic rule of thumb; AQE coalescing refines at runtime).
    """
    return max(1, (input_bytes + target_partition_bytes - 1) // target_partition_bytes)


def with_zorder_key(
    df: DataFrame, x_col: str, y_col: str, key_col: str = "zkey"
) -> DataFrame:
    """Attach a 16-bit Morton key interleaving the low 8 bits of two
    integer columns (dialect.zorder16). Repartitioning by range on this
    key before a parquet write clusters files in BOTH dimensions, so
    min/max stats prune range predicates on either column — the
    DataFrame-level equivalent of Delta/Iceberg ZORDER BY.

    Buckets via `& 255` (not `% 256`): the bitmask is total over signed
    inputs, where a signed remainder would send negatives into the top
    tiles through their two's-complement bits and break the pruning
    story for columns that can go negative."""
    from pyspark.sql import functions as F

    from pipegen_spark.functions import dialect as dl

    z = dl.zorder16(f"({x_col} & 255)", f"({y_col} & 255)", dl.SPARK)
    return df.withColumn(key_col, F.expr(z))


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet write: range-partition on the Morton key
    (so each output file owns a contiguous zkey band — a 2-D tile), sort
    within partitions, drop the key from the payload. Readers filtering
    on either dimension skip whole files via footer min/max stats."""
    keyed = with_zorder_key(df, x_col, y_col)
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode(mode)
        .parquet(path)
    )
