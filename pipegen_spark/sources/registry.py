"""Confluent Schema Registry REST client (reference B16,
internal/docker/deployer.go:238-342 + internal/pipeline/producer.go:49-82).

stdlib urllib only — no confluent-kafka dependency. Implements the subset
the pipeline lifecycle needs:
- get-or-register a schema under `<topic>-value` (and `-key` for upserts),
- fetch a schema by id (for wire-format decode),
- list subjects / health check.

All calls honor a short timeout and raise RegistryError with the REST
error body, mirroring the reference's error propagation.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request


class RegistryError(RuntimeError):
    pass


class SchemaRegistryClient:
    def __init__(self, url: str, timeout: float = 10.0):
        self.url = url.rstrip("/")
        self.timeout = timeout

    def _request(self, method: str, path: str, payload: dict | None = None):
        req = urllib.request.Request(
            self.url + path,
            method=method,
            headers={
                "Content-Type": "application/vnd.schemaregistry.v1+json"
            },
            data=json.dumps(payload).encode() if payload is not None else None,
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read() or b"null")
        except urllib.error.HTTPError as e:
            body = e.read().decode(errors="replace")
            raise RegistryError(
                f"{method} {path} failed: HTTP {e.code}: {body}"
            ) from e
        except urllib.error.URLError as e:
            raise RegistryError(f"{method} {path} failed: {e.reason}") from e

    # --- API -----------------------------------------------------------------

    def is_healthy(self) -> bool:
        try:
            self._request("GET", "/subjects")
            return True
        except RegistryError:
            return False

    def list_subjects(self) -> list[str]:
        return self._request("GET", "/subjects")

    def register(self, subject: str, avro_schema_json: str) -> int:
        """Register (idempotent) and return the schema id."""
        out = self._request(
            "POST",
            f"/subjects/{subject}/versions",
            {"schema": avro_schema_json},
        )
        return int(out["id"])

    def get_or_register(self, subject: str, avro_schema_json: str) -> int:
        try:
            out = self._request(
                "POST", f"/subjects/{subject}", {"schema": avro_schema_json}
            )
            return int(out["id"])
        except RegistryError:
            return self.register(subject, avro_schema_json)

    def get_schema_by_id(self, schema_id: int) -> str:
        out = self._request("GET", f"/schemas/ids/{schema_id}")
        return out["schema"]

    # --- pipeline helpers ----------------------------------------------------

    def register_pipeline_schemas(
        self, schemas: dict[str, str], topic_prefix: str
    ) -> dict[str, int]:
        """Register input/output (+extras) under the Confluent
        `<topic>-value` convention (schema.go:219-234)."""
        ids = {}
        for key, schema_json in schemas.items():
            subject = f"{topic_prefix}-{key}-value"
            ids[key] = self.register(subject, schema_json)
        return ids
