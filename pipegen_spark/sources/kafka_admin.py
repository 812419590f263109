"""Kafka topic administration (reference B15 kafka mode,
internal/pipeline/kafka.go:24-75 + resources.go:266-277).

The reference does NOT speak the Kafka admin wire protocol — it shells out
to `kafka-topics.sh` inside the broker container via docker exec. This
mirrors that mechanism behind the same injectable command-runner seam as
StackDeployer, so the create/delete sequencing, idempotence flags, and
tolerant-delete parsing are all testable without a broker:

- create: `--create --if-not-exists` with partitions/replication and the
  reference's default topic configs (retention.ms, cleanup.policy=delete,
  compression.type=snappy);
- delete: "does not exist" / UnknownTopicOrPartitionException in the
  output is success (already deleted), matching kafka.go:60-66.
"""

from __future__ import annotations

from pipegen_spark.sources.deploy import _subprocess_runner

DEFAULT_TOPIC_CONFIG = {
    "retention.ms": "604800000",  # 7 days, the reference's default
    "cleanup.policy": "delete",
    "compression.type": "snappy",
}


class TopicAdminError(RuntimeError):
    pass


class KafkaTopicAdmin:
    """Topic create/delete through `kafka-topics.sh` in the broker
    container (docker exec), like the reference. `runner` is injectable
    for tests; `container`/`bootstrap` default to the compose stack the
    deployer generates."""

    def __init__(
        self,
        container: str = "broker",
        bootstrap: str = "broker:29092",
        runner=None,
    ) -> None:
        self.container = container
        self.bootstrap = bootstrap
        self.runner = runner or _subprocess_runner

    def _topics_sh(self, *args: str) -> tuple[int, str]:
        return self.runner(
            [
                "docker", "exec", self.container,
                "/opt/kafka/bin/kafka-topics.sh",
                "--bootstrap-server", self.bootstrap,
                *args,
            ]
        )

    def create_topic(
        self,
        topic: str,
        partitions: int = 3,
        replication_factor: int = 1,
        config: dict[str, str] | None = None,
    ) -> None:
        cfg = {**DEFAULT_TOPIC_CONFIG, **(config or {})}
        args = [
            "--create",
            "--topic", topic,
            "--partitions", str(partitions),
            "--replication-factor", str(replication_factor),
            "--if-not-exists",
        ]
        for k, v in sorted(cfg.items()):
            args += ["--config", f"{k}={v}"]
        code, out = self._topics_sh(*args)
        if code != 0:
            raise TopicAdminError(
                f"failed to create topic {topic}: {out.strip()}"
            )

    def delete_topic(self, topic: str) -> bool:
        """True if deleted, False if it did not exist (not an error —
        kafka.go:60-66 semantics)."""
        code, out = self._topics_sh("--delete", "--topic", topic)
        if code != 0:
            if (
                "does not exist" in out
                or "UnknownTopicOrPartitionException" in out
            ):
                return False
            raise TopicAdminError(
                f"failed to delete topic {topic}: {out.strip()}"
            )
        return True

    def list_topics(self) -> list[str]:
        code, out = self._topics_sh("--list")
        if code != 0:
            raise TopicAdminError(f"failed to list topics: {out.strip()}")
        return [ln.strip() for ln in out.splitlines() if ln.strip()]

    def topic_exists(self, topic: str) -> bool:
        return topic in self.list_topics()

    def create_all(
        self, topics: list[str], partitions: int = 3, replication: int = 1
    ) -> list[str]:
        """Create every pipeline topic (resources.go CreateTopics loop);
        returns the created/ensured names in order."""
        for t in topics:
            self.create_topic(t, partitions, replication)
        return list(topics)


class KafkaWireAdmin:
    """Topic admin over the WIRE protocol (round-12): CreateTopics v0 /
    DeleteTopics v0 / Metadata v0 straight over a socket — the protocol
    real admin clients use (KIP-4), no shell, no docker. Same surface
    as KafkaTopicAdmin so the runner can use either; this one drives
    the in-process broker in the jar-free e2e
    (tests/test_runner_wire_e2e.py) and any real broker listening on
    the same port."""

    def __init__(self, host: str, port: int) -> None:
        from pipegen_spark.sources.kafka_wire import KafkaWireClient

        self._client = KafkaWireClient(host, port, client_id="pipegen-admin")

    def close(self) -> None:
        self._client.close()

    def create_topic(
        self, topic: str, partitions: int = 3, replication_factor: int = 1
    ) -> None:
        from pipegen_spark.sources import kafka_wire as kw

        errs = self._client.create_topics([topic], partitions=partitions)
        err = errs.get(topic, -1)
        if err not in (kw.ERR_NONE, kw.ERR_TOPIC_ALREADY_EXISTS):
            raise TopicAdminError(
                f"failed to create topic {topic}: error code {err}"
            )

    def delete_topic(self, topic: str) -> bool:
        """True if deleted, False if it did not exist (kafka.go:60-66
        semantics, same as the shell path)."""
        from pipegen_spark.sources import kafka_wire as kw

        errs = self._client.delete_topics([topic])
        err = errs.get(topic, -1)
        if err == kw.ERR_UNKNOWN_TOPIC_OR_PARTITION:
            return False
        if err != kw.ERR_NONE:
            raise TopicAdminError(
                f"failed to delete topic {topic}: error code {err}"
            )
        return True

    def list_topics(self) -> list[str]:
        md = self._client.metadata([])
        return sorted(md["topics"])

    def topic_exists(self, topic: str) -> bool:
        return topic in self.list_topics()

    def create_all(
        self, topics: list[str], partitions: int = 3, replication: int = 1
    ) -> list[str]:
        for t in topics:
            self.create_topic(t, partitions, replication)
        return list(topics)
