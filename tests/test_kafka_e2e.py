"""Environment-gated REAL-broker e2e (round-9, VERDICT r8 task 7).

Everything Kafka-shaped in this repo is unit-tested behind injectable
seams (mock runners, mock HTTP registry, jar-free Avro codec); this
module closes the one untested seam by running the SAME code against a
real KRaft Kafka + Schema Registry stack when (and only when) the
environment can host one. Layered skips keep it honest everywhere
else — each skip names exactly what was missing:

1. no `docker` binary            -> skip
2. daemon not reachable          -> skip
3. `compose up` fails (no image/
   network in the sandbox)       -> skip, with the compose error head
4. services never get healthy    -> skip (after compose down)

What runs against the live stack:
- B15 `KafkaTopicAdmin` create/list/exists/delete through a real
  `kafka-topics.sh` in the broker container (same docker-exec
  mechanism as the reference's internal/pipeline/kafka.go).
- B16 `SchemaRegistryClient` register / get_or_register idempotence /
  get_schema_by_id over real HTTP against a real Confluent SR.
- B9 the Confluent wire format with a REAL schema id: AvroCodec
  encode -> 0x00 + id header -> decode through the schema fetched
  back from the registry (the exact bytes the Spark operators move).
- A1/A2 data path: JSON-wire rows produced through the broker's
  console producer and consumed back with the console consumer —
  produce -> broker -> consume roundtrip equality.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import uuid

import pytest

pytestmark = pytest.mark.filterwarnings("ignore::ResourceWarning")

BOOTSTRAP_IN_CONTAINER = "kafka:29092"
SR_URL = "http://localhost:8082"


def _run(cmd: list[str], timeout: float = 300.0) -> tuple[int, str]:
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout,
            check=False,
        )
    except (FileNotFoundError, subprocess.TimeoutExpired) as err:
        return 127, str(err)
    return proc.returncode, (proc.stdout or "") + (proc.stderr or "")


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    from pipegen_spark.sources.deploy import wait_for_port, write_compose

    if shutil.which("docker") is None:
        pytest.skip("docker binary not available")
    code, out = _run(["docker", "info"], timeout=20)
    if code != 0:
        reason = next(
            (ln for ln in out.splitlines() if "Cannot connect" in ln),
            out.strip().splitlines()[-1] if out.strip() else "no output",
        )
        pytest.skip(f"docker daemon not reachable: {reason}")

    project = tmp_path_factory.mktemp("kafka_e2e")
    compose = write_compose(str(project))
    compose_cmd = ["docker", "compose", "-f", compose]

    code, out = _run([*compose_cmd, "up", "-d"], timeout=420)
    if code != 0:
        _run([*compose_cmd, "down", "-v"], timeout=120)
        pytest.skip(
            "compose up failed (no image/network in this environment): "
            + out.strip()[:400]
        )
    healthy = wait_for_port("localhost", 9092, timeout=120) and (
        wait_for_port("localhost", 8082, timeout=180)
    )
    if not healthy:
        _run([*compose_cmd, "logs", "--tail", "20"], timeout=60)
        _run([*compose_cmd, "down", "-v"], timeout=120)
        pytest.skip("stack did not become healthy within the timeout")

    code, cid = _run([*compose_cmd, "ps", "-q", "kafka"], timeout=30)
    cid = cid.strip().splitlines()[0] if cid.strip() else ""
    if code != 0 or not cid:
        _run([*compose_cmd, "down", "-v"], timeout=120)
        pytest.skip("could not resolve the kafka container id")

    try:
        yield {"compose": compose_cmd, "kafka_cid": cid}
    finally:
        _run([*compose_cmd, "down", "-v"], timeout=180)


def test_topic_admin_against_real_broker(stack):
    from pipegen_spark.sources.kafka_admin import KafkaTopicAdmin

    admin = KafkaTopicAdmin(
        container=stack["kafka_cid"], bootstrap=BOOTSTRAP_IN_CONTAINER
    )
    topic = f"e2e-admin-{uuid.uuid4().hex[:8]}"
    admin.create_topic(topic, partitions=3)
    admin.create_topic(topic, partitions=3)  # --if-not-exists idempotence
    assert admin.topic_exists(topic)
    assert admin.delete_topic(topic) is True
    assert admin.delete_topic(topic) is False  # tolerant re-delete


def test_schema_registry_and_wire_format(stack):
    from pipegen_spark.schema.avro_codec import AvroCodec
    from pipegen_spark.sources.registry import SchemaRegistryClient
    from pipegen_spark.streaming.wire import wire_header

    client = SchemaRegistryClient(SR_URL)
    assert client.is_healthy()
    subject = f"e2e-{uuid.uuid4().hex[:8]}-value"
    schema = json.dumps(
        {
            "type": "record",
            "name": "E2ERecord",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "name", "type": "string"},
            ],
        }
    )
    sid = client.register(subject, schema)
    assert sid > 0
    assert client.get_or_register(subject, schema) == sid  # idempotent
    assert subject in client.list_subjects()

    # Confluent wire roundtrip with the REAL id: header + avro body,
    # decoded through the schema as fetched back from the registry.
    codec_out = AvroCodec(json.loads(schema))
    fetched = client.get_schema_by_id(sid)
    codec_in = AvroCodec(json.loads(fetched))
    record = {"id": 42, "name": "pipegen"}
    frame = wire_header(sid) + codec_out.encode(record)
    assert frame[0] == 0x00
    assert int.from_bytes(frame[1:5], "big") == sid
    assert codec_in.decode(frame[5:]) == record


def test_produce_consume_roundtrip(stack):
    """JSON-wire rows through the real broker: console-produce N rows,
    console-consume them back, compare as parsed sets (the consumer
    preserves per-partition order only, so compare content)."""
    from pipegen_spark.sources.kafka_admin import KafkaTopicAdmin

    cid = stack["kafka_cid"]
    topic = f"e2e-data-{uuid.uuid4().hex[:8]}"
    admin = KafkaTopicAdmin(
        container=cid, bootstrap=BOOTSTRAP_IN_CONTAINER
    )
    admin.create_topic(topic, partitions=3)

    rows = [
        {"id": i, "name": f"user_{i}", "amount_cents": 1000 + 7 * i}
        for i in range(50)
    ]
    payload = "\n".join(json.dumps(r, sort_keys=True) for r in rows)
    code, out = _produce(cid, topic, payload)
    assert code == 0, f"produce failed: {out[:400]}"

    code, out = _run(
        [
            "docker", "exec", cid,
            "/opt/kafka/bin/kafka-console-consumer.sh",
            "--bootstrap-server", BOOTSTRAP_IN_CONTAINER,
            "--topic", topic,
            "--from-beginning",
            "--max-messages", str(len(rows)),
            "--timeout-ms", "60000",
        ],
        timeout=120,
    )
    assert code == 0, f"consume failed: {out[:400]}"
    got = [
        json.loads(ln)
        for ln in out.splitlines()
        if ln.strip().startswith("{")
    ]
    assert len(got) == len(rows)
    key = lambda r: r["id"]  # noqa: E731
    assert sorted(got, key=key) == sorted(rows, key=key)
    admin.delete_topic(topic)


def _produce(cid: str, topic: str, payload: str) -> tuple[int, str]:
    """Feed JSON lines to the in-container console producer via stdin."""
    try:
        proc = subprocess.run(
            [
                "docker", "exec", "-i", cid,
                "/opt/kafka/bin/kafka-console-producer.sh",
                "--bootstrap-server", BOOTSTRAP_IN_CONTAINER,
                "--topic", topic,
            ],
            input=payload,
            capture_output=True,
            text=True,
            timeout=120,
            check=False,
        )
    except (FileNotFoundError, subprocess.TimeoutExpired) as err:
        return 127, str(err)
    return proc.returncode, (proc.stdout or "") + (proc.stderr or "")
