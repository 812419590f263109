"""AVRO `.avsc` ⇄ Spark `StructType` conversion with reference-parity
validation.

Validation semantics follow internal/pipeline/schema.go:153-194:
- top-level type must be record/array/map,
- record schemas need non-empty, uniquely-named fields,
- content must re-parse as JSON.

Filename→role resolution follows schema.go:196-216: normalized names
containing "input"/"event" → input, "output"/"result" → output.

Type mapping (SURVEY.md §1.2): unions ["null", T] become nullable T;
logical date/timestamp-millis/micros map to DateType/TimestampType;
array/map/record stay *typed* (ArrayType/MapType/StructType) instead of the
reference's STRING flattening (internal/generator/generator.go:571-585).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import types as T

_PRIMITIVES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "bytes": T.BinaryType(),
    "null": T.NullType(),
}

_LOGICAL: dict[str, T.DataType] = {
    "date": T.DateType(),
    "timestamp-millis": T.TimestampType(),
    "timestamp-micros": T.TimestampType(),
    # AVRO time-millis/micros have no Spark TIME type; keep the raw int/long
}


class SchemaValidationError(ValueError):
    pass


@dataclass
class AvroSchema:
    name: str
    namespace: str
    type: str
    fields: list[dict] = field(default_factory=list)
    content: str = ""
    file_path: str = ""

    def to_struct(self) -> T.StructType:
        return avro_to_struct(json.loads(self.content))


def _validate(doc: dict, content: str) -> None:
    if not doc.get("name"):
        raise SchemaValidationError("schema must have a name")
    typ = doc.get("type")
    if not typ:
        raise SchemaValidationError("schema must have a type")
    if typ not in ("record", "array", "map"):
        raise SchemaValidationError(f"unsupported schema type: {typ}")
    if typ == "record":
        fields = doc.get("fields") or []
        if not fields:
            raise SchemaValidationError("record schema must have fields")
        seen: set[str] = set()
        for f in fields:
            nm = f.get("name", "")
            if not nm:
                raise SchemaValidationError("field must have a name")
            if nm in seen:
                raise SchemaValidationError(f"duplicate field name: {nm}")
            seen.add(nm)
    json.loads(content)  # re-parse: invalid JSON → ValueError


def parse_schema(content: str, file_path: str = "") -> AvroSchema:
    try:
        doc = json.loads(content)
    except json.JSONDecodeError as e:
        raise SchemaValidationError(f"invalid JSON syntax: {e}") from e
    if not isinstance(doc, dict):
        raise SchemaValidationError("schema must be a JSON object")
    _validate(doc, content)
    return AvroSchema(
        name=doc.get("name", ""),
        namespace=doc.get("namespace", ""),
        type=doc.get("type", ""),
        fields=doc.get("fields", []),
        content=content,
        file_path=file_path,
    )


def schema_key(filename: str) -> str:
    """Filename → role key (input/output/other), schema.go:196-216."""
    key = filename
    for suffix in (".avsc", ".json"):
        key = key.removesuffix(suffix)
    key = key.lower().replace("_", "").replace("-", "")
    if "input" in key or "event" in key:
        return "input"
    if "output" in key or "result" in key:
        return "output"
    return key


def load_schemas(project_dir: str) -> dict[str, AvroSchema]:
    """Load all `.avsc`/`.json` schemas from <project>/schemas/."""
    schema_dir = os.path.join(project_dir, "schemas")
    if not os.path.isdir(schema_dir):
        raise FileNotFoundError(f"schemas directory not found: {schema_dir}")
    out: dict[str, AvroSchema] = {}
    for entry in sorted(os.listdir(schema_dir)):
        if not entry.endswith((".avsc", ".json")):
            continue
        path = os.path.join(schema_dir, entry)
        with open(path, encoding="utf-8") as fh:
            out[schema_key(entry)] = parse_schema(fh.read(), path)
    if not out:
        raise FileNotFoundError(f"no AVRO schema files found in {schema_dir}")
    return out


def registry_subjects(
    schemas: dict[str, AvroSchema], topic_prefix: str
) -> dict[str, str]:
    """Confluent `<topic>-value` subject naming (schema.go:219-234)."""
    out = {}
    for key in schemas:
        if key in ("input", "output"):
            out[key] = f"{topic_prefix}-{key}-value"
        else:
            out[key] = f"{topic_prefix}-{key}-value"
    return out


# --- AVRO type → Spark type --------------------------------------------------


def _avro_type_to_spark(t) -> tuple[T.DataType, bool]:
    """Returns (dtype, nullable)."""
    if isinstance(t, str):
        if t in _PRIMITIVES:
            return _PRIMITIVES[t], t == "null"
        raise SchemaValidationError(f"unknown AVRO type: {t}")
    if isinstance(t, list):  # union — nullable T for ["null", T]
        nullable = "null" in t
        branches = [b for b in t if b != "null"]
        if not branches:
            return T.NullType(), True
        dt, _ = _avro_type_to_spark(branches[0])  # first non-null branch
        return dt, nullable
    if isinstance(t, dict):
        logical = t.get("logicalType")
        if logical in _LOGICAL:
            return _LOGICAL[logical], False
        inner = t.get("type")
        if inner == "array":
            it, inull = _avro_type_to_spark(t.get("items", "string"))
            return T.ArrayType(it, inull), False
        if inner == "map":
            vt, vnull = _avro_type_to_spark(t.get("values", "string"))
            return T.MapType(T.StringType(), vt, vnull), False
        if inner == "enum":
            return T.StringType(), False
        if inner == "record":
            return avro_to_struct(t), False
        if inner == "fixed":
            return T.BinaryType(), False
        if isinstance(inner, (str, list, dict)):
            return _avro_type_to_spark(inner)
    raise SchemaValidationError(f"unsupported AVRO type: {t!r}")


def avro_to_struct(doc: dict) -> T.StructType:
    if doc.get("type") != "record":
        raise SchemaValidationError("top-level conversion expects a record")
    fields = []
    for f in doc.get("fields", []):
        dt, nullable = _avro_type_to_spark(f["type"])
        fields.append(T.StructField(f["name"], dt, nullable))
    return T.StructType(fields)


# --- Spark type → AVRO -------------------------------------------------------

_TO_AVRO: list[tuple[type, str]] = [
    (T.StringType, "string"),
    (T.IntegerType, "int"),
    (T.ShortType, "int"),
    (T.ByteType, "int"),
    (T.LongType, "long"),
    (T.FloatType, "float"),
    (T.DoubleType, "double"),
    (T.BooleanType, "boolean"),
    (T.BinaryType, "bytes"),
]


def _spark_type_to_avro(dt: T.DataType):
    for klass, name in _TO_AVRO:
        if isinstance(dt, klass):
            return name
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _spark_type_to_avro(dt.elementType)}
    if isinstance(dt, T.MapType):
        return {"type": "map", "values": _spark_type_to_avro(dt.valueType)}
    if isinstance(dt, T.StructType):
        return {
            "type": "record",
            "name": "nested",
            "fields": [
                {"name": f.name, "type": _spark_type_to_avro(f.dataType)}
                for f in dt.fields
            ],
        }
    raise SchemaValidationError(f"cannot map Spark type {dt} to AVRO")


def struct_to_avro(
    st: T.StructType, name: str, namespace: str = "pipegen.generated"
) -> str:
    fields = []
    for f in st.fields:
        at = _spark_type_to_avro(f.dataType)
        fields.append(
            {"name": f.name, "type": ["null", at] if f.nullable else at}
        )
    return json.dumps(
        {"type": "record", "name": name, "namespace": namespace, "fields": fields},
        indent=2,
    )
