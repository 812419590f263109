"""Confluent Schema Registry REST client (reference B16,
internal/docker/deployer.go:238-342 + internal/pipeline/producer.go:49-82).

stdlib urllib only — no confluent-kafka dependency. Implements the subset
the pipeline lifecycle needs:
- get-or-register a schema under `<topic>-value`, plus `<topic>-key`
  synthesis+registration for upsert outputs (`synthesize_key_schema`,
  deployer.go:253-315 — the reference hardcodes a one-field toy key
  record; here the key record is derived from the value schema's actual
  fields),
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


def synthesize_key_schema(
    value_schema_json: str, key_fields: list[str] | None = None
) -> str:
    """Derive an Avro key-record schema from a value schema.

    Reference parity: for upsert outputs the reference registers a
    `<topic>-key` subject whose schema is a hardcoded one-field record
    (deployer.go:294-315, `createKeySchema` — its own comment says a
    production version "would parse the original schema and extract only
    the key fields"). This does exactly that: parse the value record,
    keep `key_fields` (default: the first field, matching the
    reference's single-`name`-field behavior), and emit a
    `<Name>Key` record in the same namespace.

    Raises RegistryError if the value schema is not a record or a
    requested key field is absent — a silent empty key record would
    corrupt upsert partitioning downstream.
    """
    try:
        schema = json.loads(value_schema_json)
    except json.JSONDecodeError as e:
        raise RegistryError(f"value schema is not valid JSON: {e}") from e
    if not isinstance(schema, dict) or schema.get("type") != "record":
        raise RegistryError(
            "key synthesis needs a record value schema, got "
            f"{schema.get('type') if isinstance(schema, dict) else schema!r}"
        )
    fields = schema.get("fields") or []
    by_name = {f["name"]: f for f in fields if isinstance(f, dict)}
    if not by_name:
        raise RegistryError("value schema has no fields to derive a key from")
    wanted = key_fields if key_fields else [next(iter(by_name))]
    missing = [n for n in wanted if n not in by_name]
    if missing:
        raise RegistryError(
            f"key fields {missing} not present in value schema "
            f"(has {sorted(by_name)})"
        )
    key_schema = {
        "type": "record",
        "name": f"{schema.get('name', 'Output')}Key",
        "fields": [
            {"name": n, "type": by_name[n]["type"]} for n in wanted
        ],
    }
    if "namespace" in schema:
        key_schema["namespace"] = schema["namespace"]
    return json.dumps(key_schema)


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
        self,
        schemas: dict[str, str],
        topic_prefix: str,
        upsert_outputs: tuple[str, ...] = ("output",),
        key_fields: dict[str, list[str]] | None = None,
    ) -> dict[str, int]:
        """Register input/output (+extras) under the Confluent
        `<topic>-value` convention (schema.go:219-234). For upsert
        outputs (by default the `output` schema, deployer.go:253-263)
        a `<topic>-key` subject is also registered with a key record
        synthesized from the value schema; its id is returned under
        `<name>-key`. Pass `key_fields={"output": [...]}` to pick the
        key columns explicitly (default: first value field)."""
        ids = {}
        for key, schema_json in schemas.items():
            subject = f"{topic_prefix}-{key}-value"
            ids[key] = self.register(subject, schema_json)
            if key in upsert_outputs:
                key_json = synthesize_key_schema(
                    schema_json, (key_fields or {}).get(key)
                )
                ids[f"{key}-key"] = self.register(
                    f"{topic_prefix}-{key}-key", key_json
                )
        return ids
