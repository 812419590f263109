"""JSON repair ladder tests — exercises the failure modes the reference's
ladder was built for (internal/llm/service_test.go:11-341)."""

from __future__ import annotations

import pytest

from pipegen_spark.llm.repair import (
    coerce_string_field,
    coerce_string_list,
    extract_json_from_markdown,
    parse_generated_pipeline,
    repair_json,
)


def test_extract_from_fenced_block():
    resp = 'Here you go:\n```json\n{"a": 1}\n```\nEnjoy!'
    assert extract_json_from_markdown(resp) == '{"a": 1}'


def test_extract_first_balanced_object():
    resp = 'prefix {"a": {"b": 2}} suffix {"c": 3}'
    assert extract_json_from_markdown(resp) == '{"a": {"b": 2}}'


def test_clean_json_passes_through():
    assert repair_json('{"a": 1}') == {"a": 1}


def test_trailing_commas():
    assert repair_json('{"a": [1, 2,], "b": {"c": 3,},}') == {
        "a": [1, 2],
        "b": {"c": 3},
    }


def test_string_concatenation():
    assert repair_json('{"sql": "SELECT a" + " FROM t"}') == {
        "sql": "SELECT a FROM t"
    }


def test_triple_quotes():
    resp = '{"sql": """SELECT *\nFROM t"""}'
    assert repair_json(resp) == {"sql": "SELECT *\nFROM t"}


def test_backtick_template_literals():
    resp = '{"sql": `SELECT 1`}'
    assert repair_json(resp) == {"sql": "SELECT 1"}


def test_raw_newlines_inside_strings():
    resp = '{"sql": "SELECT a\nFROM t"}'
    assert repair_json(resp) == {"sql": "SELECT a\nFROM t"}


def test_single_quotes_last_resort():
    assert repair_json("{'name': 'pipeline'}") == {"name": "pipeline"}


def test_unrepairable_raises():
    with pytest.raises(ValueError, match="could not repair"):
        repair_json("not json at all {{{{")


def test_coercion_variants():
    assert coerce_string_field({"type": "record"}).startswith("{")
    assert coerce_string_field(["a", "b"]) == "a\nb"
    assert coerce_string_list("- one\n- two") == ["one", "two"]
    assert coerce_string_list({"k": "v"}) == ["k: v"]
    assert coerce_string_list(None) == []


def test_parse_generated_pipeline_normalizes():
    resp = """```json
    {
      "input_schema": {"type": "record", "name": "in", "fields": []},
      "output_schema": "{}",
      "sql_statements": ["CREATE TABLE t (a INT) WITH ('connector'='memory')",
                         "INSERT INTO t SELECT 1"],
      "description": "demo",
      "optimizations": "- use watermarks\\n- filter early"
    }
    ```"""
    out = parse_generated_pipeline(resp)
    assert out["input_schema"].startswith("{")
    assert len(out["sql_statements"]) == 2
    assert out["optimizations"] == ["use watermarks", "filter early"]
