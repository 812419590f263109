"""AVRO schema conversion/validation + CSV inference tests — ports the
reference's unit coverage (csv_analyzer_test.go, generator_types_test.go,
schema.go validation) to the Spark build (FIXTURES.md F2/F3)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from pipegen_spark.schema import avsc
from pipegen_spark.schema.inference import (
    CSVAnalyzer,
    analysis_to_avro,
    analysis_to_ddl,
)

SIMPLE_CSV = """id,name,active,score,created_at
1,Alice,true,10.5,2024-12-31
2,Bob,false,11.0,2025-01-01 12:30:00
3,Charlie,true,,2025-01-02T08:15:10
"""

WIDEN_CSV = """val
1
2
3000000000
4
"""


@pytest.fixture
def csv_file(tmp_path):
    def write(content: str, name: str = "data.csv") -> str:
        p = tmp_path / name
        p.write_text(content)
        return str(p)

    return write


def test_simple_csv_inference(csv_file):
    """FIXTURES.md F2: mixed timestamp formats, empty cell → nullable."""
    res = CSVAnalyzer(csv_file(SIMPLE_CSV)).analyze()
    types = {c.name: c.type for c in res.columns}
    nullable = {c.name: c.nullable for c in res.columns}
    assert types == {
        "id": "int",
        "name": "string",
        "active": "boolean",
        "score": "double",
        "created_at": "timestamp",
    }
    assert nullable["score"] is True
    assert nullable["id"] is False


def test_numeric_widening(csv_file):
    """FIXTURES.md F3: 3000000000 exceeds int32 → long."""
    res = CSVAnalyzer(csv_file(WIDEN_CSV)).analyze()
    assert res.columns[0].type == "long"


def test_bool_as_digits_stays_int(csv_file):
    """'0'/'1' parse as int before the boolean regex — reference order."""
    res = CSVAnalyzer(csv_file("flag\n0\n1\n0\n")).analyze()
    assert res.columns[0].type == "int"


def test_all_null_column_is_nullable_string(csv_file):
    res = CSVAnalyzer(csv_file("a,b\n1,\n2,\n")).analyze()
    col = res.columns[1]
    assert col.type == "string" and col.nullable


def test_avro_demotes_temporal_types(csv_file):
    """date/timestamp → AVRO string (csv_analyzer.go:359-376)."""
    res = CSVAnalyzer(csv_file(SIMPLE_CSV)).analyze()
    schema = analysis_to_avro("proj", res)
    import json

    doc = json.loads(schema)
    by_name = {f["name"]: f["type"] for f in doc["fields"]}
    assert by_name["created_at"] == "string"
    assert by_name["score"] == ["null", "double"]
    assert doc["namespace"] == "pipegen.generated"


def test_ddl_keeps_temporal_types(csv_file):
    res = CSVAnalyzer(csv_file(SIMPLE_CSV)).analyze()
    assert "created_at timestamp" in analysis_to_ddl(res)


# --- AVRO ⇄ StructType -------------------------------------------------------


def test_avro_to_struct_primitives_and_unions():
    doc = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "boolean"},
            {"name": "by", "type": "bytes"},
            {"name": "opt", "type": ["null", "string"]},
            {"name": "dt", "type": {"type": "int", "logicalType": "date"}},
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "timestamp-millis"},
            },
            {"name": "arr", "type": {"type": "array", "items": "int"}},
            {"name": "mp", "type": {"type": "map", "values": "double"}},
            {
                "name": "en",
                "type": {"type": "enum", "name": "e", "symbols": ["A", "B"]},
            },
        ],
    }
    st = avsc.avro_to_struct(doc)
    by_name = {f.name: f for f in st.fields}
    assert isinstance(by_name["s"].dataType, T.StringType)
    assert isinstance(by_name["i"].dataType, T.IntegerType)
    assert isinstance(by_name["l"].dataType, T.LongType)
    assert isinstance(by_name["f"].dataType, T.FloatType)
    assert isinstance(by_name["d"].dataType, T.DoubleType)
    assert isinstance(by_name["b"].dataType, T.BooleanType)
    assert isinstance(by_name["by"].dataType, T.BinaryType)
    assert by_name["opt"].nullable and isinstance(
        by_name["opt"].dataType, T.StringType
    )
    assert isinstance(by_name["dt"].dataType, T.DateType)
    assert isinstance(by_name["ts"].dataType, T.TimestampType)
    # typed complex types — superset of the reference's STRING flattening
    assert isinstance(by_name["arr"].dataType, T.ArrayType)
    assert isinstance(by_name["mp"].dataType, T.MapType)
    assert isinstance(by_name["en"].dataType, T.StringType)


def test_struct_to_avro_roundtrip():
    st = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.StringType(), True),
        ]
    )
    schema = avsc.parse_schema(avsc.struct_to_avro(st, "rt"))
    st2 = schema.to_struct()
    assert [f.name for f in st2.fields] == ["a", "b"]
    assert st2.fields[1].nullable


@pytest.mark.parametrize(
    "bad,msg",
    [
        ('{"type":"record","fields":[]}', "name"),
        ('{"name":"x"}', "type"),
        ('{"name":"x","type":"fixed"}', "unsupported"),
        ('{"name":"x","type":"record","fields":[]}', "fields"),
        (
            '{"name":"x","type":"record","fields":[{"name":"a","type":"int"},'
            '{"name":"a","type":"int"}]}',
            "duplicate",
        ),
        (
            '{"name":"x","type":"record","fields":[{"type":"int"}]}',
            "field must have a name",
        ),
    ],
)
def test_schema_validation_errors(bad, msg):
    with pytest.raises(avsc.SchemaValidationError, match=msg):
        avsc.parse_schema(bad)


def test_schema_key_resolution():
    assert avsc.schema_key("My_Input-Schema.avsc") == "input"
    assert avsc.schema_key("events.json") == "input"
    assert avsc.schema_key("pipeline_output.avsc") == "output"
    assert avsc.schema_key("final-results.avsc") == "output"
    assert avsc.schema_key("other.avsc") == "other"


def test_load_schemas_dir(tmp_path):
    d = tmp_path / "proj" / "schemas"
    d.mkdir(parents=True)
    (d / "input.avsc").write_text(
        '{"type":"record","name":"in","fields":[{"name":"a","type":"int"}]}'
    )
    schemas = avsc.load_schemas(str(tmp_path / "proj"))
    assert set(schemas) == {"input"}
    with pytest.raises(FileNotFoundError):
        avsc.load_schemas(str(tmp_path / "missing"))
