"""Confluent Schema Registry wire format: magic 0x00 + 4-byte big-endian
schema id + Avro binary (internal/pipeline/producer.go:424-447).

Body encode/decode prefers the JVM spark-avro `to_avro`/`from_avro`
(whole-stage, zero Python) when the jar is on the classpath, and falls
back automatically to the pure-Python Avro codec
(schema/avro_codec.py) over Arrow-batched `mapInPandas` — the same
role goavro plays for the reference's producer. The fallback is
distributed (per-partition Arrow batches, codec built once per task),
so it scales with the cluster; the jar path is simply faster per row.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAGIC = b"\x00"
_EPOCH = _dt.date(1970, 1, 1)


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


_AVRO_JAR_STATE: dict[str, bool] = {}


def have_avro_jar(spark) -> bool:
    """Probe (once per session) whether spark-avro is on the classpath."""
    key = str(id(spark))
    if key not in _AVRO_JAR_STATE:
        try:
            from pyspark.sql.avro.functions import to_avro  # noqa: F401

            spark.range(1).select(
                to_avro(
                    F.struct(F.col("id")),
                    '{"type":"record","name":"probe",'
                    '"fields":[{"name":"id","type":"long"}]}',
                )
            ).collect()
            _AVRO_JAR_STATE[key] = True
        except Exception:  # pragma: no cover — environment-dependent
            _AVRO_JAR_STATE[key] = False
    return _AVRO_JAR_STATE[key]


def _to_avro_native(v, dtype):
    """One pandas cell → Avro-native value for the pure-Python codec."""
    import pandas as pd

    if v is None or v is pd.NaT or (isinstance(v, float) and v != v):
        return None
    if isinstance(v, pd.Timestamp):
        return v.value // 1_000  # ns → logical timestamp-micros long
    if isinstance(v, _dt.datetime):
        return int(v.timestamp() * 1_000_000)
    if isinstance(v, _dt.date):
        return (v - _EPOCH).days  # logical date int
    if hasattr(v, "item"):  # numpy scalar
        return v.item()
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def encode_confluent_avro(
    df: DataFrame, avro_schema_json: str, schema_id: int, cols: list[str]
) -> DataFrame:
    """struct(cols) → wire-format `value` column.

    JVM to_avro when spark-avro is present; otherwise the pure-Python
    codec over mapInPandas (distributed, Arrow-batched)."""
    if have_avro_jar(df.sparkSession):
        from pyspark.sql.avro.functions import to_avro

        payload = to_avro(
            F.struct(*[F.col(c) for c in cols]), avro_schema_json
        )
        return df.select(wrap_payload(payload, schema_id).alias("value"))
    return encode_confluent_avro_py(df, avro_schema_json, schema_id, cols)


def encode_confluent_avro_py(
    df: DataFrame, avro_schema_json: str, schema_id: int, cols: list[str]
) -> DataFrame:
    """Pure-Python wire encode (no jar): header + AvroCodec body."""
    header = wire_header(schema_id)
    dtypes = dict(df.select(*cols).dtypes)

    def _encode(batches):
        import pandas as pd

        from pipegen_spark.schema.avro_codec import AvroCodec

        codec = AvroCodec(avro_schema_json)
        for pdf in batches:
            values = [
                header
                + codec.encode(
                    {
                        c: _to_avro_native(v, dtypes[c])
                        for c, v in zip(cols, row)
                    }
                )
                for row in pdf[cols].itertuples(index=False, name=None)
            ]
            yield pd.DataFrame({"value": values})

    return df.select(*cols).mapInPandas(_encode, "value binary")


def decode_confluent_avro(df: DataFrame, spec) -> DataFrame:
    """Kafka `value` → typed columns using the TableSpec's schema.

    JVM from_avro when spark-avro is present; otherwise the pure-Python
    codec. For JSON-format topics use decode_json instead."""
    from pipegen_spark.schema.avsc import struct_to_avro
    from pyspark.sql.types import _parse_datatype_string

    st = _parse_datatype_string(spec.schema_ddl())
    avro_json = struct_to_avro(st, spec.name)
    if have_avro_jar(df.sparkSession):
        from pyspark.sql.avro.functions import from_avro

        payload = F.expr("substring(value, 6, length(value)-5)")
        return df.select(
            from_avro(payload, avro_json).alias("r")
        ).select("r.*")
    return decode_confluent_avro_py(df, avro_json, st)


def decode_confluent_avro_py(df: DataFrame, avro_json: str, st) -> DataFrame:
    """Pure-Python wire decode (no jar): strip header, AvroCodec body."""
    from pyspark.sql.types import DateType, TimestampType

    names = [f.name for f in st.fields]
    ts_cols = [f.name for f in st.fields if isinstance(f.dataType, TimestampType)]
    date_cols = [f.name for f in st.fields if isinstance(f.dataType, DateType)]

    def _decode(batches):
        import pandas as pd

        from pipegen_spark.schema.avro_codec import AvroCodec

        codec = AvroCodec(avro_json)
        for pdf in batches:
            recs = [codec.decode(bytes(v)[5:]) for v in pdf["value"]]
            out = pd.DataFrame.from_records(recs, columns=names)
            for c in ts_cols:
                out[c] = pd.to_datetime(out[c], unit="us")
            for c in date_cols:
                out[c] = out[c].map(
                    lambda d: _EPOCH + _dt.timedelta(days=int(d))
                    if d is not None
                    else None
                )
            yield out

    return df.select("value").mapInPandas(_decode, st)


def decode_json(df: DataFrame, schema_ddl: str) -> DataFrame:
    """JSON-format topic decode — works without extra jars."""
    return df.select(
        F.from_json(F.col("value").cast("string"), schema_ddl).alias("r")
    ).select("r.*")


def encode_json(df: DataFrame, cols: list[str]) -> DataFrame:
    return df.select(
        F.to_json(F.struct(*[F.col(c) for c in cols])).cast("binary").alias("value")
    )
