"""Full-lifecycle `pipegen run` over the in-process wire broker
(round-12, r11 VERDICT stretch task 8).

One un-gated, non-docker test that exercises runner steps 1-14 against
`kafka_wire`'s threaded TCP broker — the lifecycle proof the
docker-gated e2e would otherwise own:

 1-2  the SCAFFOLDED project (cli `init` output, source re-pointed at
      the kafka template) + its AVRO schemas;
 3-4  resource naming + topics created/deleted OVER THE SOCKET
      (CreateTopics/DeleteTopics v0);
 5    SQL deploy through the executor (kafka source/sink in wire mode);
 6    schemas registered against a live (mock) Schema Registry, the
      RETURNED id stamped into the Confluent wire header;
 7-8  rate-paced synthetic production of Confluent-wire Avro payloads
      as magic-2 RecordBatches;
 9-11 metrics listener + batch processing over everything produced;
 12   consume the output topic over the socket, decode, and run the
      B12 rule validation;
 13   smart-stop semantics on the consume loop (expected count);
 14   HTML report + cleanup.
"""

from __future__ import annotations

import json
import os
import threading
import types
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from pipegen_spark.sources.kafka_wire import FakeKafkaBroker, KafkaWireClient


@pytest.fixture
def mock_registry():
    """Minimal Schema Registry REST mock (ids start at 7 so a constant
    id 1 anywhere in the producer path would be caught)."""
    state = {"subjects": {}, "by_id": {}, "next_id": 7}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _json(self, payload, code=200):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/subjects":
                self._json(list(state["subjects"]))
            elif self.path.startswith("/schemas/ids/"):
                sid = int(self.path.rsplit("/", 1)[1])
                if sid in state["by_id"]:
                    self._json({"schema": state["by_id"][sid]})
                else:
                    self._json({"error_code": 40403}, 404)
            else:
                self._json({"error_code": 404}, 404)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(n))
            if self.path.endswith("/versions"):
                subject = self.path.split("/")[2]
                sid = state["next_id"]
                state["next_id"] += 1
                state["subjects"][subject] = sid
                state["by_id"][sid] = payload["schema"]
                self._json({"id": sid})
            else:
                subject = self.path.split("/")[2]
                if subject in state["subjects"]:
                    self._json({"id": state["subjects"][subject]})
                else:
                    self._json({"error_code": 40401}, 404)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", state
    srv.shutdown()
    srv.server_close()


@pytest.fixture
def scaffolded_kafka_project(tmp_path):
    """Steps 1-2: the real `pipegen init` scaffold (01/02/03 SQL +
    input/output AVRO schemas), with 01 re-pointed at the kafka-source
    template and 02 at a kafka-connector output (the same edit a user
    makes to go from the datagen default to a broker pipeline)."""
    from pipegen_spark import templates as tpl
    from pipegen_spark.cli import cmd_init

    proj = str(tmp_path / "wiredemo")
    args = types.SimpleNamespace(
        project_dir=proj,
        project_name="wiredemo",
        input_csv=None,
        avro_schema=None,
        describe=None,
    )
    assert cmd_init(args) == 0
    with open(os.path.join(proj, "sql", "01_create_source_table.sql"), "w") as fh:
        fh.write(tpl.SQL_SOURCE_KAFKA)
    with open(os.path.join(proj, "sql", "02_create_output_table.sql"), "w") as fh:
        fh.write(
            "CREATE TABLE revenue (\n"
            "    name STRING,\n"
            "    total INT\n"
            ") WITH (\n"
            "    'connector' = 'kafka',\n"
            "    'topic' = '${OUTPUT_TOPIC}',\n"
            "    'properties.bootstrap.servers' = '${BOOTSTRAP_SERVERS}',\n"
            "    'format' = 'avro-confluent'\n"
            ");\n"
        )
    return proj


def test_runner_steps_1_to_14_over_the_socket(
    spark, scaffolded_kafka_project, mock_registry, tmp_path
):
    from pipegen_spark.plans.runner import PipelineRunner, RunnerConfig
    from pipegen_spark.sources.kafka_admin import KafkaWireAdmin

    reg_url, reg_state = mock_registry
    with FakeKafkaBroker() as (host, port):
        cfg = RunnerConfig(
            project_dir=scaffolded_kafka_project,
            wire_broker=f"{host}:{port}",
            message_rate=200,
            duration_seconds=1.5,
            report_dir=str(tmp_path / "reports"),
            variables={"SCHEMA_REGISTRY_URL": reg_url},
        )
        result = PipelineRunner(spark, cfg).run()

        # 5: all three scaffolded statements deployed OK
        assert [r["status"] for r in result.statement_results] == ["OK"] * 3
        kinds = [r["kind"] for r in result.statement_results]
        assert kinds == ["CREATE_TABLE", "CREATE_TABLE", "INSERT"]

        # 8: rate-paced wire production of the full expected volume
        ps = result.producer_stats
        assert ps["mode"] == "wire"
        expected_rows = int(200 * 1.5)
        assert ps["produced"] == expected_rows
        # pacing actually paced: 1.5 s of ticks can't finish instantly
        assert ps["elapsed_seconds"] >= 1.0

        # 6: the registry REALLY assigned the ids (mock starts at 7)
        assert reg_state["subjects"], "no subjects registered"
        assert ps["schema_id"] == reg_state["subjects"][
            f"{result.run_id}-input-value"
        ]
        assert ps["schema_id"] >= 7

        # 11: the batch INSERT processed every produced record 1:1
        insert_row = result.statement_results[2]
        assert insert_row["rows"] == expected_rows

        # 12-13: consumer drained the output topic and smart-stopped on
        # the expected count; B12 validation ran clean
        cons = ps["consumer"]
        assert cons["stop_reason"] == "expected_count"
        assert cons["consumed"] == expected_rows
        v = cons["validation"]
        assert v["total_rows"] == expected_rows
        assert v["missing_name"] == 0 and v["missing_total"] == 0

        # 4 + the broker state: both topics exist over the socket, and
        # the output topic's bytes are genuine Confluent wire frames
        # carrying the REGISTERED id
        admin = KafkaWireAdmin(host, port)
        try:
            topics = admin.list_topics()
        finally:
            admin.close()
        in_topic = f"{result.run_id}-input"
        out_topic = f"{result.run_id}-output"
        assert in_topic in topics and out_topic in topics
        client = KafkaWireClient(host, port)
        try:
            _, _, recs = client.fetch_v2(in_topic, 0, 0)
        finally:
            client.close()
        assert recs
        first = bytes(recs[0][3])
        assert first[0] == 0  # Confluent magic byte
        assert int.from_bytes(first[1:5], "big") == ps["schema_id"]

        # 12 (r13): the consumer ran as a real consumer GROUP — joined,
        # took its assignment, committed offsets as it drained — so the
        # B19 lag monitor, pointed at the same broker AFTER the run,
        # detects completion through approach 1 (lag == 0), exactly the
        # reference decision tree (alternative_monitor.go:77-107).
        from pipegen_spark.monitor.metrics import (
            check_processing_activity,
        )

        group = cons["consumer_group"]
        assert group
        act = check_processing_activity(host, port, [group], out_topic)
        assert act["processing_detected"]
        assert act["monitoring_method"] == "Consumer Group Lag"
        assert act["consumer_group_lag"] == 0

        # 14: HTML report written with the wire lifecycle in it
        assert result.report_path and os.path.exists(result.report_path)
        html = open(result.report_path).read()
        assert "Pipeline execution report" in html
        assert result.elapsed_seconds > 0


def test_wire_mode_requires_input_schema(spark, tmp_path):
    """Step 2 is load-bearing in wire mode: without schemas/input.avsc
    the producer has nothing to encode — loud, not a hang."""
    from pipegen_spark import templates as tpl
    from pipegen_spark.plans.runner import PipelineRunner, RunnerConfig

    proj = tmp_path / "noschema"
    (proj / "sql").mkdir(parents=True)
    (proj / "sql" / "01_source.sql").write_text(tpl.SQL_SOURCE_KAFKA)
    (proj / "sql" / "02_out.sql").write_text(tpl.SQL_OUTPUT)
    (proj / "sql" / "03_proc.sql").write_text(tpl.SQL_PROCESSING)
    with FakeKafkaBroker() as (host, port):
        cfg = RunnerConfig(
            project_dir=str(proj), wire_broker=f"{host}:{port}",
            message_rate=10, duration_seconds=0.5,
        )
        with pytest.raises(ValueError, match="input.avsc"):
            PipelineRunner(spark, cfg).run()
