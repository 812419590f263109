"""Parity against the reference's OWN pipeline artifacts: the exact SQL a
pipegen user runs today must load, validate, classify, and translate in
this engine.

The statement text below reproduces the reference's template pipeline
(internal/templates/files/sql/local/01-03) verbatim — it is user-facing
config, the very input contract we claim to support. Broker-dependent
execution is exercised by swapping only the connector options (the
documented local-mode move), keeping the schema and the processing SQL
untouched.
"""

from __future__ import annotations

import pytest

from pipegen_spark.plans import ddl
from pipegen_spark.plans import statements as st
from pipegen_spark.plans.executor import SQLPipelineExecutor

REF_01 = """-- Create source table for Kafka stream with AVRO format
CREATE TABLE transactions_v4 (
  `name` STRING,
  `amount` INT
) WITH (
  'connector' = 'kafka',
  'topic' = 'transactions',
  'properties.bootstrap.servers' = 'broker:29092',
  'properties.group.id' = 'flink_table_transactions_v4',
  'scan.startup.mode' = 'earliest-offset',
  'properties.auto.offset.reset' = 'earliest',
  'properties.enable.auto.commit' = 'true',
  'format' = 'avro-confluent',
  'avro-confluent.url' = 'http://schema-registry:8082'
);
"""

REF_02 = """-- Create output table for results with AVRO format
CREATE TABLE revenue (
  `name` STRING,
  `total` INT
) WITH (
  'connector' = 'kafka',
  'topic' = 'output-results',
  'properties.bootstrap.servers' = 'broker:29092',
  'format' = 'avro-confluent',
  'avro-confluent.url' = 'http://schema-registry:8082'
);
"""

REF_03 = """-- Stream processing job - continuous insert
INSERT INTO revenue
SELECT name, amount as total
FROM transactions_v4;
"""


def test_reference_templates_load_validate_classify(tmp_path):
    d = tmp_path / "refproj" / "sql"
    d.mkdir(parents=True)
    (d / "01_create_source_table.sql").write_text(REF_01)
    (d / "02_create_output_table.sql").write_text(REF_02)
    (d / "03_create_processing.sql").write_text(REF_03)
    stmts = st.load_statements(str(tmp_path / "refproj"))
    assert [st.classify_statement(s.content) for s in stmts] == [
        "CREATE_TABLE",
        "CREATE_TABLE",
        "INSERT",
    ]
    for s in stmts:
        st.validate_statement(s)
    assert st.extract_topics(stmts) == ["transactions", "output-results"]


def test_reference_source_ddl_translates():
    spec = ddl.parse_create_table(st.clean_sql(REF_01))
    assert spec.name == "transactions_v4"
    assert spec.columns == [("name", "string"), ("amount", "int")]
    assert spec.connector == "kafka"
    assert spec.options["topic"] == "transactions"
    assert spec.options["scan.startup.mode"] == "earliest-offset"
    assert spec.options["format"] == "avro-confluent"


def test_reference_pipeline_executes_with_local_connectors(spark, tmp_path):
    """Same schema, same processing SQL; only the connector options change
    (kafka → datagen/memory), which is the reference's own local-mode
    pattern. The continuous insert must produce `revenue(name, total)`."""
    d = tmp_path / "localproj" / "sql"
    d.mkdir(parents=True)
    (d / "01_source.sql").write_text(
        "CREATE TABLE transactions_v4 (`name` STRING, `amount` INT) "
        "WITH ('connector' = 'datagen', 'number-of-rows' = '200');"
    )
    (d / "02_output.sql").write_text(
        "CREATE TABLE revenue (`name` STRING, `total` INT) "
        "WITH ('connector' = 'memory');"
    )
    (d / "03_processing.sql").write_text(REF_03)
    stmts = st.load_statements(str(tmp_path / "localproj"))
    SQLPipelineExecutor(spark).execute(stmts)
    rows = spark.sql("SELECT * FROM revenue").collect()
    assert len(rows) == 200
    assert set(rows[0].asDict()) == {"name", "total"}
    assert all(r.name.startswith("user-") for r in rows[:5])


def test_reference_kafka_source_requires_broker_is_explicit(spark):
    """Executing the kafka DDL without a broker/avro jar fails with a
    actionable error, not silence."""
    spec = ddl.parse_create_table(st.clean_sql(REF_01))
    ex = SQLPipelineExecutor(spark)
    ex.specs[spec.name] = spec
    with pytest.raises(Exception, match="avro|kafka|classpath|Failed to find"):
        ex._materialize(spec)
