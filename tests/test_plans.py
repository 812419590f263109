"""Statement loading/validation/classification, DDL translation, TUMBLE
rewrites, and end-to-end pipeline execution through the runner."""

from __future__ import annotations

import os

import pytest

from pipegen_spark.plans import ddl, statements as st
from pipegen_spark.plans.executor import SQLPipelineExecutor
from pipegen_spark.plans.resources import generate_resources


def test_clean_sql_strips_comments():
    sql = "-- header\nSELECT 1 -- trailing\n\n  -- full line\nFROM t\n"
    assert st.clean_sql(sql) == "SELECT 1\nFROM t"


def test_load_statements_order(tmp_path):
    d = tmp_path / "sql"
    d.mkdir()
    (d / "02_b.sql").write_text("INSERT INTO x SELECT 1")
    (d / "01_a.sql").write_text("CREATE TABLE x (a INT) WITH ('connector'='memory')")
    stmts = st.load_statements(str(tmp_path))
    assert [s.name for s in stmts] == ["01_a", "02_b"]
    assert [s.order for s in stmts] == [0, 1]


@pytest.mark.parametrize(
    "sql", ["DROP DATABASE x", "TRUNCATE TABLE t", "DELETE FROM t", "SHOW TABLES"]
)
def test_validate_rejects(sql):
    with pytest.raises(st.StatementValidationError):
        st.validate_statement(st.SQLStatement("s", sql, "", 0))


@pytest.mark.parametrize(
    "sql,kind",
    [
        ("CREATE TABLE t (a INT) WITH ('connector'='kafka')", "CREATE_TABLE"),
        ("INSERT INTO out SELECT * FROM t", "INSERT"),
        ("CREATE VIEW v AS SELECT 1", "CREATE_VIEW"),
        ("SELECT * FROM t", "QUERY"),
    ],
)
def test_classify(sql, kind):
    assert st.classify_statement(sql) == kind


def test_substitute_variables():
    out = st.substitute_variables(
        "topic '${INPUT_TOPIC}' at ${BOOTSTRAP_SERVERS} keeps ${UNKNOWN}",
        {"INPUT_TOPIC": "in", "BOOTSTRAP_SERVERS": "k:9092"},
    )
    assert out == "topic 'in' at k:9092 keeps ${UNKNOWN}"


def test_extract_topics_dedup():
    s1 = st.SQLStatement(
        "a",
        "CREATE TABLE x (a INT) WITH ('connector'='kafka','topic' = 'alpha')",
        "",
        0,
    )
    s2 = st.SQLStatement(
        "b",
        "CREATE TABLE y (a INT) WITH ('topic'='beta')\n"
        "CREATE TABLE z (a INT) WITH ('topic'='alpha')",
        "",
        1,
    )
    assert st.extract_topics([s1, s2]) == ["alpha", "beta"]


# --- DDL translation ---------------------------------------------------------


def test_parse_create_table_full():
    sql = """CREATE TABLE user_events (
        user_id BIGINT,
        name VARCHAR(50) NOT NULL,
        amount DECIMAL(10,2),
        tags ARRAY<STRING>,
        props MAP<STRING, INT>,
        event_time TIMESTAMP(3),
        WATERMARK FOR event_time AS event_time - INTERVAL '5' SECOND,
        PRIMARY KEY (user_id)
    ) WITH (
        'connector' = 'kafka',
        'topic' = 'events',
        'format' = 'avro-confluent'
    )"""
    spec = ddl.parse_create_table(sql)
    assert spec.name == "user_events"
    cols = dict(spec.columns)
    assert cols["user_id"] == "bigint"
    assert cols["name"] == "string"
    assert cols["amount"] == "decimal(10,2)"
    assert cols["tags"] == "array<string>"
    assert cols["props"] == "map<string,int>"
    assert cols["event_time"] == "timestamp"
    assert spec.watermark == ("event_time", "event_time - INTERVAL '5' SECOND")
    assert spec.primary_key == ["user_id"]
    assert spec.connector == "kafka"
    assert spec.options["topic"] == "events"


@pytest.mark.parametrize(
    "flink,spark",
    [
        ("STRING", "string"),
        ("INT", "int"),
        ("BIGINT", "bigint"),
        ("FLOAT", "float"),
        ("DOUBLE", "double"),
        ("BOOLEAN", "boolean"),
        ("BYTES", "binary"),
        ("DATE", "date"),
        ("TIMESTAMP(3)", "timestamp"),
        ("TIMESTAMP_LTZ(3)", "timestamp"),
        ("TIME(3)", "string"),
        ("DECIMAL(18,2)", "decimal(18,2)"),
        ("ARRAY<BIGINT>", "array<bigint>"),
        ("MAP<STRING, DOUBLE>", "map<string,double>"),
    ],
)
def test_flink_type_mapping(flink, spark):
    """Table mirrors generator_types_test.go:91-130 (superset: typed
    array/map instead of STRING flattening)."""
    assert ddl.flink_type_to_spark(flink) == spark


def test_tumble_tvf_rewrite():
    sql = (
        "SELECT user_id, window_start, window_end, COUNT(*) AS cnt "
        "FROM TABLE(TUMBLE(TABLE customer_events, DESCRIPTOR(event_time), "
        "INTERVAL '1' HOUR)) "
        "GROUP BY user_id, window_start, window_end"
    )
    out = ddl.rewrite_tumble(sql)
    assert "TUMBLE" not in out.upper() or "window(" in out
    assert "FROM customer_events" in out
    assert "window(event_time, '1 hours')" in out
    assert "window.start AS window_start" in out
    assert "window.end AS window_end" in out


def test_tumble_legacy_rewrite():
    sql = (
        "SELECT TUMBLE_START(event_time, INTERVAL '5' MINUTE) AS ws, COUNT(*) "
        "FROM events GROUP BY TUMBLE(event_time, INTERVAL '5' MINUTE)"
    )
    out = ddl.rewrite_tumble(sql)
    assert "window(event_time, '5 minutes')" in out
    assert "window.start" in out


# --- execution through Spark -------------------------------------------------


def test_tvf_rewrite_executes(spark):
    from pipegen_spark.catalog import table

    ev = table(spark, "/root/testdata/sf0.001", "events")
    ev.createOrReplaceTempView("customer_events")
    sql = (
        "SELECT event_type, window_start, window_end, COUNT(*) AS cnt "
        "FROM TABLE(TUMBLE(TABLE customer_events, DESCRIPTOR(ts), "
        "INTERVAL '1' HOUR)) "
        "GROUP BY event_type, window_start, window_end"
    )
    rows = spark.sql(ddl.rewrite_tumble(sql)).collect()
    assert rows and all(r.window_end > r.window_start for r in rows)


@pytest.fixture
def csv_project(tmp_path):
    proj = tmp_path / "proj"
    (proj / "sql").mkdir(parents=True)
    csv = tmp_path / "tx.csv"
    csv.write_text("name,amount\nalice,10\nbob,20\nalice,5\n")
    (proj / "sql" / "01_source.sql").write_text(
        f"""CREATE TABLE transactions (
            name STRING,
            amount INT
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{csv}',
            'format' = 'csv',
            'csv.include-header' = 'true'
        );"""
    )
    (proj / "sql" / "02_output.sql").write_text(
        "CREATE TABLE revenue (name STRING, total BIGINT) "
        "WITH ('connector' = 'memory');"
    )
    (proj / "sql" / "03_process.sql").write_text(
        "INSERT INTO revenue SELECT name, SUM(amount) AS total "
        "FROM transactions GROUP BY name;"
    )
    return str(proj)


def test_executor_csv_pipeline(spark, csv_project):
    stmts = st.load_statements(csv_project)
    ex = SQLPipelineExecutor(spark)
    results = ex.execute(stmts)
    assert [r.kind for r in results] == ["CREATE_TABLE", "CREATE_TABLE", "INSERT"]
    out = {
        r.name: r.total for r in spark.sql("SELECT * FROM revenue").collect()
    }
    assert out == {"alice": 15, "bob": 20}


def test_runner_end_to_end(spark, csv_project, tmp_path):
    from pipegen_spark.plans.runner import PipelineRunner, RunnerConfig

    cfg = RunnerConfig(
        project_dir=csv_project, report_dir=str(tmp_path / "reports")
    )
    result = PipelineRunner(spark, cfg).run()
    assert all(r["status"] == "OK" for r in result.statement_results)
    assert result.report_path and os.path.exists(result.report_path)
    html = open(result.report_path).read()
    assert "Pipeline execution report" in html


def test_datagen_pipeline(spark, tmp_path):
    proj = tmp_path / "dg"
    (proj / "sql").mkdir(parents=True)
    (proj / "sql" / "01_source.sql").write_text(
        "CREATE TABLE transactions (name STRING, amount INT) "
        "WITH ('connector'='datagen', 'number-of-rows'='50');"
    )
    (proj / "sql" / "02_process.sql").write_text(
        "INSERT INTO results SELECT name, amount AS total FROM transactions;"
    )
    stmts = st.load_statements(str(proj))
    SQLPipelineExecutor(spark).execute(stmts)
    rows = spark.sql("SELECT * FROM results").collect()
    assert len(rows) == 50
    assert all(r.total is not None and 0 <= r.total < 10000 for r in rows)
    assert all(r.name.startswith("user-") for r in rows)


def test_resources_naming():
    res = generate_resources(["a", "b", "c"], "/tmp/w", local_mode=True)
    assert res.prefix == "pipegen-local"
    assert res.input_topic == "a" and res.output_topic == "c"
    res2 = generate_resources([], "/tmp/w", local_mode=False)
    assert res2.prefix.startswith("pipegen-") and res2.prefix != "pipegen-local"
    assert res2.input_topic.endswith("-input")
