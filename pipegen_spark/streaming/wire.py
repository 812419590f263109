"""Confluent Schema Registry wire format: magic 0x00 + 4-byte big-endian
schema id + Avro binary (internal/pipeline/producer.go:424-447).

`from_avro`/`to_avro` need the external spark-avro package on the
classpath; availability is probed lazily and a clear error raised if the
jar is absent (this container ships pyspark without it). The header
composition/stripping itself is plain binary expression work and fully
usable/testable without Avro.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAGIC = b"\x00"


def wire_header(schema_id: int) -> bytes:
    """5-byte Confluent wire-format prefix for a schema id."""
    return MAGIC + schema_id.to_bytes(4, "big")


def wrap_payload(payload: Column, schema_id: int) -> Column:
    """payload(binary) → magic + schema_id + payload."""
    return F.concat(F.lit(wire_header(schema_id)), payload)


def strip_header(value_col: str = "value") -> Column:
    """Drop the 5-byte prefix (from_avro cannot skip it itself)."""
    return F.expr(
        f"substring({value_col}, 6, length({value_col})-5)"
    )


def extract_schema_id(value_col: str = "value") -> Column:
    """Big-endian int32 schema id from bytes 2..5."""
    return F.expr(
        f"CAST(conv(hex(substring({value_col}, 2, 4)), 16, 10) AS INT)"
    ).alias("schema_id")


def validate_magic(value_col: str = "value") -> Column:
    """True iff the first byte is the Confluent magic byte
    (consumer.go:219-242 validation)."""
    return F.expr(f"substring({value_col}, 1, 1) = X'00'")


def _require_avro(spark) -> None:
    try:
        from pyspark.sql.avro.functions import to_avro  # noqa: F401

        spark.range(1).select(
            to_avro(F.struct(F.col("id")), '{"type":"record","name":"probe",'
            '"fields":[{"name":"id","type":"long"}]}')
        ).collect()
    except Exception as e:  # pragma: no cover — environment-dependent
        raise RuntimeError(
            "spark-avro is not on the classpath; start the session with "
            "spark.jars.packages=org.apache.spark:spark-avro_2.13:<version> "
            "to use Confluent-format encode/decode"
        ) from e


def encode_confluent_avro(
    df: DataFrame, avro_schema_json: str, schema_id: int, cols: list[str]
) -> DataFrame:
    """struct(cols) → wire-format `value` column (needs spark-avro)."""
    _require_avro(df.sparkSession)
    from pyspark.sql.avro.functions import to_avro

    payload = to_avro(F.struct(*[F.col(c) for c in cols]), avro_schema_json)
    return df.select(wrap_payload(payload, schema_id).alias("value"))


def decode_confluent_avro(df: DataFrame, spec) -> DataFrame:
    """Kafka `value` → typed columns using the TableSpec's schema
    (needs spark-avro). For JSON-format topics use decode_json instead."""
    from pipegen_spark.schema.avsc import struct_to_avro

    _require_avro(df.sparkSession)
    from pyspark.sql.avro.functions import from_avro
    from pyspark.sql.types import _parse_datatype_string

    st = _parse_datatype_string(spec.schema_ddl())
    avro_json = struct_to_avro(st, spec.name)
    payload = F.expr("substring(value, 6, length(value)-5)")
    return df.select(
        from_avro(payload, avro_json).alias("r")
    ).select("r.*")


def decode_json(df: DataFrame, schema_ddl: str) -> DataFrame:
    """JSON-format topic decode — works without extra jars."""
    return df.select(
        F.from_json(F.col("value").cast("string"), schema_ddl).alias("r")
    ).select("r.*")


def encode_json(df: DataFrame, cols: list[str]) -> DataFrame:
    return df.select(
        F.to_json(F.struct(*[F.col(c) for c in cols])).cast("binary").alias("value")
    )
