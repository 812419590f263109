"""Schema-driven synthetic data generation as DataFrame expressions.

Reference parity (internal/pipeline/producer.go:268-402): per-field
type-dispatched values with field-NAME-aware string pools (id/email/
event_type/url/status/category/country...). The reference generates one Go
map per message on the driver; here every field is a Catalyst expression
over `spark.range(n)` (batch) or the `rate` source (streaming), so
generation is distributed, vectorized, and rate-scalable to millions of
rows/sec — no Python in the loop.

Randomness is seeded per column (seed = base_seed + column index) so runs
are reproducible, unlike the reference's global RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# name → pool (producer.go:376-402)
STRING_POOLS: dict[str, list[str]] = {
    "event_type": ["click", "view", "purchase", "signup", "login"],
    "type": ["click", "view", "purchase", "signup", "login"],
    "url": ["/home", "/product", "/checkout", "/profile", "/search"],
    "page_url": ["/home", "/product", "/checkout", "/profile", "/search"],
    "status": ["active", "pending", "completed", "failed"],
    "category": ["electronics", "clothing", "books", "food", "sports"],
    "country": ["US", "CA", "GB", "DE", "FR"],
    "region": ["US", "CA", "GB", "DE", "FR"],
}

ID_LIKE = ("id", "event_id", "user_id", "session_id")
NAME_LIKE = ("name", "username", "user_name")


def _pool_pick(pool: list[str], seed: int) -> Column:
    arr = F.array(*[F.lit(x) for x in pool])
    idx = (F.floor(F.rand(seed) * len(pool)) + 1).cast("int")
    return F.element_at(arr, idx)


def string_value(field_name: str, id_col: Column, seed: int) -> Column:
    """Field-name-aware string generator (producer.go:376-402)."""
    if field_name in ID_LIKE:
        return F.concat(F.lit(field_name + "-"), id_col.cast("string"))
    if field_name in NAME_LIKE:
        return F.concat(
            F.lit("user-"), F.floor(F.rand(seed) * 1000).cast("long").cast("string")
        )
    if field_name == "email":
        return F.concat(
            F.lit("user"),
            F.floor(F.rand(seed) * 1000).cast("long").cast("string"),
            F.lit("@example.com"),
        )
    if field_name in STRING_POOLS:
        return _pool_pick(STRING_POOLS[field_name], seed)
    return F.concat(F.lit(field_name + "-"), id_col.cast("string"))


def avro_field_value(field: dict, id_col: Column, seed: int) -> Column:
    """AVRO-type-dispatched value (producer.go:303-373)."""
    ftype = field["type"]
    name = field["name"]
    if isinstance(ftype, list):  # union: first non-null branch
        branches = [b for b in ftype if b != "null"]
        if not branches:
            return F.lit(None)
        return avro_field_value({"name": name, "type": branches[0]}, id_col, seed)
    if isinstance(ftype, dict):
        inner = ftype.get("type")
        if inner == "map":
            return F.create_map(
                F.lit("key1"),
                F.lit("value1"),
                F.lit("key2"),
                F.concat(F.lit("value-"), id_col.cast("string")),
            )
        if inner == "array":
            return F.array(
                F.lit("item1"), F.concat(F.lit("item-"), id_col.cast("string"))
            )
        if inner == "enum":
            symbols = [str(s) for s in ftype.get("symbols", ["UNKNOWN"])]
            return _pool_pick(symbols, seed)
        if inner == "record":
            return F.struct(
                F.concat(F.lit("nested-value-"), id_col.cast("string")).alias(
                    "nested_field"
                )
            )
        return avro_field_value({"name": name, "type": inner}, id_col, seed)
    # simple types
    if ftype == "string":
        return string_value(name, id_col, seed)
    if ftype == "int":
        return F.floor(F.rand(seed) * 10000).cast("int")
    if ftype == "long":
        return F.unix_millis(F.current_timestamp())
    if ftype == "float":
        return (F.rand(seed) * 1000).cast("float")
    if ftype == "double":
        return F.rand(seed) * 1000
    if ftype == "boolean":
        return F.rand(seed) > 0.5
    if ftype == "bytes":
        return F.encode(
            F.concat(F.lit("data-"), id_col.cast("string")), "UTF-8"
        )
    return F.concat(F.lit("value-"), id_col.cast("string"))


_SPARK_TO_AVRO = {
    "string": "string",
    "int": "int",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "binary": "bytes",
    "timestamp": "long",
    "date": "string",
}


def generate_from_avro_fields(
    spark: SparkSession, fields: list[dict], rows: int, seed: int = 42
) -> DataFrame:
    """Batch generator: spark.range(rows) + one expression per field."""
    base = spark.range(rows)
    cols = [
        avro_field_value(f, F.col("id"), seed + i).alias(f["name"])
        for i, f in enumerate(fields)
    ]
    return base.select(*cols)


def generate_from_spec(spark: SparkSession, spec, rows: int, seed: int = 42):
    """Generator for a connector-DDL TableSpec ('datagen' connector)."""
    fields = [
        {"name": n, "type": _SPARK_TO_AVRO.get(t.split("<")[0], "string")}
        for n, t in spec.columns
    ]
    df = generate_from_avro_fields(spark, fields, rows, seed)
    # cast to the declared schema (e.g. timestamp columns from long millis)
    casts = []
    for (n, t), f in zip(spec.columns, fields):
        c = F.col(n)
        if t == "timestamp" and f["type"] == "long":
            c = F.timestamp_millis(F.col(n))
        elif dict(df.dtypes)[n] != t:
            c = F.col(n).cast(t)
        casts.append(c.alias(n))
    return df.select(*casts)


def synthetic_stream(
    spark: SparkSession,
    fields: list[dict],
    rows_per_second: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Streaming generator: `rate` source + the same field expressions
    (the rate source's `value` is the message id). Rate control happens at
    the source; traffic-pattern spikes are applied by the producer wrapper
    (streaming/producer.py) via fractional filtering. `num_partitions`
    sizes the rate source's task count — co-size it with the stream's
    state partitions rather than inheriting defaultParallelism: 32
    near-empty generator tasks per micro-batch are pure scheduling
    overhead on a small-state stream (measured 109k -> 133k rows/s
    median at 8, tools/stream_profile.py)."""
    reader = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
    )
    if num_partitions is not None:
        reader = reader.option("numPartitions", num_partitions)
    base = reader.load()
    cols = [
        avro_field_value(f, F.col("value"), seed + i).alias(f["name"])
        for i, f in enumerate(fields)
    ]
    return base.select(F.col("timestamp").alias("_emit_ts"), *cols)
