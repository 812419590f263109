"""LLM provider HTTP clients for pipeline generation.

Re-implements the reference's provider layer
(internal/llm/service.go:33-77 provider detection,
service.go:301-351 Ollama call, service.go:353-420 OpenAI call,
service.go:124-129 mock gate) with the Python stdlib only:

- Provider detection from environment, in the reference's priority order:
  PIPEGEN_OLLAMA_URL (explicit Ollama endpoint) > PIPEGEN_OLLAMA_MODEL
  (localhost Ollama) > PIPEGEN_OPENAI_API_KEY (OpenAI) > disabled.
- ``PIPEGEN_MOCK_OPENAI=true`` short-circuits the OpenAI HTTP call with a
  deterministic mock payload (service.go:124-129) so `init --describe` is
  testable with no network at all.
- ``PIPEGEN_OPENAI_URL`` additionally overrides the OpenAI-compatible base
  URL (the reference hardcodes api.openai.com; an override is required to
  exercise the real HTTP path against a local mock server, and also covers
  every OpenAI-compatible gateway).

Responses flow into the repair ladder (`llm.repair`) exactly as the
reference pipes them into parseResponse (service.go:139).
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

from pipegen_spark.llm.repair import parse_generated_pipeline

PROVIDER_OPENAI = "openai"
PROVIDER_OLLAMA = "ollama"

DEFAULT_OLLAMA_MODEL = "llama3.1"
DEFAULT_OPENAI_MODEL = "gpt-4o-mini"
DEFAULT_OLLAMA_URL = "http://localhost:11434"
DEFAULT_OPENAI_URL = "https://api.openai.com/v1"

# The reference uses a 5-minute client timeout for generation calls
# (service.go:322, :377) — generation can legitimately take minutes.
DEFAULT_TIMEOUT = 300.0


class LLMServiceError(RuntimeError):
    """Raised for disabled service, HTTP failures, or bad responses."""


class LLMService:
    """Provider-agnostic pipeline-generation client (Ollama / OpenAI)."""

    def __init__(
        self,
        provider: str | None = None,
        model: str | None = None,
        base_url: str | None = None,
        api_key: str | None = None,
        timeout: float = DEFAULT_TIMEOUT,
        env: dict[str, str] | None = None,
    ) -> None:
        e = os.environ if env is None else env
        self.timeout = timeout
        if provider is not None:
            self.provider = provider
            self.model = model or (
                DEFAULT_OLLAMA_MODEL
                if provider == PROVIDER_OLLAMA
                else DEFAULT_OPENAI_MODEL
            )
            self.base_url = base_url or (
                DEFAULT_OLLAMA_URL
                if provider == PROVIDER_OLLAMA
                else DEFAULT_OPENAI_URL
            )
            self.api_key = api_key or ""
            self.enabled = True
            self._env = e
            return
        self._env = e
        if e.get("PIPEGEN_OLLAMA_URL"):
            self.provider = PROVIDER_OLLAMA
            self.model = e.get("PIPEGEN_OLLAMA_MODEL") or DEFAULT_OLLAMA_MODEL
            self.base_url = e["PIPEGEN_OLLAMA_URL"].rstrip("/")
            self.api_key = ""
            self.enabled = True
        elif "PIPEGEN_OLLAMA_MODEL" in e:
            self.provider = PROVIDER_OLLAMA
            self.model = e.get("PIPEGEN_OLLAMA_MODEL") or DEFAULT_OLLAMA_MODEL
            self.base_url = DEFAULT_OLLAMA_URL
            self.api_key = ""
            self.enabled = True
        elif e.get("PIPEGEN_OPENAI_API_KEY"):
            self.provider = PROVIDER_OPENAI
            self.model = e.get("PIPEGEN_LLM_MODEL") or DEFAULT_OPENAI_MODEL
            self.base_url = (
                e.get("PIPEGEN_OPENAI_URL") or DEFAULT_OPENAI_URL
            ).rstrip("/")
            self.api_key = e["PIPEGEN_OPENAI_API_KEY"]
            self.enabled = True
        else:
            self.provider = ""
            self.model = ""
            self.base_url = ""
            self.api_key = ""
            self.enabled = False

    # --- public API (service.go:109-199) -------------------------------------

    def generate_pipeline(self, description: str, domain: str = "") -> dict:
        """Natural-language description → normalized pipeline fields."""
        return self._generate(build_prompt(description, domain), description)

    def generate_pipeline_with_schema(
        self, schema_json: str, description: str, domain: str = ""
    ) -> dict:
        """Generation grounded on a caller-provided AVRO input schema."""
        return self._generate(
            build_prompt_with_schema(schema_json, description, domain),
            description,
        )

    def generate_pipeline_with_csv(
        self,
        description: str,
        domain: str,
        analysis_summary: str,
        inferred_schema: str,
    ) -> dict:
        """Generation grounded on CSV analysis + its inferred schema."""
        return self._generate(
            build_prompt_with_csv(
                description, domain, analysis_summary, inferred_schema
            ),
            description,
        )

    # --- internals ------------------------------------------------------------

    def _generate(self, prompt: str, description: str) -> dict:
        if not self.enabled:
            raise LLMServiceError(
                "LLM service not enabled. Set PIPEGEN_OPENAI_API_KEY or "
                "PIPEGEN_OLLAMA_MODEL environment variable"
            )
        if self.provider == PROVIDER_OLLAMA:
            response = self._call_ollama(prompt)
        elif self.provider == PROVIDER_OPENAI:
            if self._env.get("PIPEGEN_MOCK_OPENAI") == "true":
                response = mock_response(description)
            else:
                response = self._call_openai(prompt)
        else:
            raise LLMServiceError(f"unsupported LLM provider: {self.provider}")
        return parse_generated_pipeline(response)

    def provider_info(self) -> str:
        """Human-readable provider summary (reference utils.go:67-82)."""
        if not self.enabled:
            return "No AI provider configured"
        if self.provider == PROVIDER_OLLAMA:
            return (
                f"Ollama (local) - Model: {self.model}, URL: {self.base_url}"
            )
        if self.provider == PROVIDER_OPENAI:
            return f"OpenAI (cloud) - Model: {self.model}"
        return "Unknown provider"

    def check_connection(self) -> None:
        """Verify the provider is reachable and the model installed
        (reference utils.go:22-65). Ollama only — the reference treats
        OpenAI as reachable-by-assumption. Raises LLMServiceError with the
        same remediation hints on failure."""
        if self.provider != PROVIDER_OLLAMA:
            return
        req = urllib.request.Request(f"{self.base_url}/api/tags")
        try:
            with urllib.request.urlopen(req, timeout=5.0) as resp:
                if resp.status != 200:
                    raise LLMServiceError(
                        f"ollama server returned status {resp.status}"
                    )
                data = json.loads(resp.read().decode("utf-8"))
        except urllib.error.URLError as err:
            raise LLMServiceError(
                f"ollama is not running at {self.base_url}. "
                "Start it with: ollama serve"
            ) from err
        models = [m.get("name") for m in data.get("models", [])]
        if self.model not in models and f"{self.model}:latest" not in models:
            raise LLMServiceError(
                f"model '{self.model}' is not installed. "
                f"Install it with: ollama pull {self.model}"
            )

    def _post_json(self, url: str, body: dict, headers: dict) -> tuple[int, bytes]:
        req = urllib.request.Request(
            url,
            data=json.dumps(body).encode("utf-8"),
            headers={"Content-Type": "application/json", **headers},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as err:
            return err.code, err.read()
        except urllib.error.URLError as err:
            raise LLMServiceError(
                f"failed to call {self.provider} API at {url}: {err.reason}"
            ) from err

    def _call_ollama(self, prompt: str) -> str:
        status, body = self._post_json(
            f"{self.base_url}/api/generate",
            {"model": self.model, "prompt": prompt, "stream": False},
            {},
        )
        if status != 200:
            raise LLMServiceError(
                f"ollama API returned status {status}. Is the model "
                f"'{self.model}' installed? Run: ollama pull {self.model}"
            )
        try:
            doc = json.loads(body)
        except json.JSONDecodeError as err:
            raise LLMServiceError(
                f"failed to decode Ollama response: {err}"
            ) from err
        return doc.get("response", "")

    def _call_openai(self, prompt: str) -> str:
        status, body = self._post_json(
            f"{self.base_url}/chat/completions",
            {
                "model": self.model,
                "messages": [{"role": "user", "content": prompt}],
                "max_tokens": 4096,
                "temperature": 0.1,
                "response_format": {"type": "json_object"},
            },
            {"Authorization": f"Bearer {self.api_key}"},
        )
        if status == 401:
            raise LLMServiceError(
                "OpenAI API authentication failed. Please check your "
                "PIPEGEN_OPENAI_API_KEY environment variable"
            )
        if status == 429:
            raise LLMServiceError(
                "OpenAI API rate limit exceeded. Please try again in a few "
                "minutes"
            )
        if status != 200:
            raise LLMServiceError(
                f"OpenAI API returned status {status}: {body.decode('utf-8', 'replace')}"
            )
        try:
            doc = json.loads(body)
        except json.JSONDecodeError as err:
            raise LLMServiceError(
                f"failed to decode OpenAI response: {err}"
            ) from err
        if doc.get("error"):
            msg = doc["error"].get("message", "")
            typ = doc["error"].get("type", "")
            raise LLMServiceError(f"OpenAI API error: {msg} ({typ})")
        choices = doc.get("choices") or []
        if not choices:
            raise LLMServiceError("OpenAI API returned no choices")
        return choices[0].get("message", {}).get("content", "")


# --- prompt builders (service.go:209-288) ------------------------------------


_FIELD_SPEC = """Generate a JSON response with exactly these fields:
1. input_schema: AVRO schema as a JSON string (not an object)
2. output_schema: AVRO schema as a JSON string (not an object)
3. sql_statements: Object with filename keys and streaming SQL statement values
4. description: Technical summary of the pipeline as a string
5. optimizations: Array of performance optimization suggestions as strings"""


def build_prompt(description: str, domain: str) -> str:
    return f"""You are an expert in Apache Kafka and streaming SQL. Generate a complete streaming pipeline based on this description:

Description: {description}
Domain: {domain}

{_FIELD_SPEC}

Requirements:
- Both schemas must be valid AVRO JSON strings
- SQL statements should use realistic field names for the {domain} domain
- Include proper windowing (TUMBLE) and aggregations
- Use modern Kafka connector syntax (CREATE TABLE ... WITH ('connector' = 'kafka', ...))
- Optimize for performance and maintainability

Return ONLY valid JSON with no markdown formatting or code blocks."""


def build_prompt_with_schema(
    schema_json: str, description: str, domain: str
) -> str:
    return f"""You are an expert in Apache Kafka and streaming SQL. Generate a complete streaming pipeline based on this description and the provided AVRO input schema.

Description: {description}
Domain: {domain}

Input schema (AVRO JSON):
{schema_json}

{_FIELD_SPEC}

Requirements:
- Both schemas must be valid AVRO JSON strings
- Use the provided input schema as canonical; do not change field names or types unless well-justified in the description
- SQL statements should use realistic field names for the {domain} domain
- Include proper windowing and aggregations when applicable
- Use modern Kafka connector syntax
- Optimize for performance and maintainability

Return ONLY valid JSON with no markdown formatting or code blocks."""


def build_prompt_with_csv(
    description: str, domain: str, analysis_summary: str, inferred_schema: str
) -> str:
    return f"""You are an expert in Apache Kafka and streaming SQL. A user provided a CSV dataset.

Description: {description}
Domain: {domain}

CSV Column Analysis (compact):
{analysis_summary}

Inferred Input AVRO Schema (from CSV):
{inferred_schema}

{_FIELD_SPEC}

Requirements:
- Preserve column names from input schema unless strong reason
- Suggest at least one aggregation or windowed query if time / timestamp column detected
- Prefer deterministic naming for tables (source, aggregates, sink)
- Return ONLY valid JSON.
"""


def mock_response(description: str) -> str:
    """Deterministic mock generation payload (service.go:1040-1075) — used
    when PIPEGEN_MOCK_OPENAI=true so the full init --describe path runs
    offline."""
    return json.dumps(
        {
            "input_schema": {
                "type": "record",
                "name": "InputEvent",
                "namespace": "com.example.pipeline",
                "fields": [
                    {"name": "order_id", "type": "string"},
                    {"name": "customer_id", "type": "string"},
                    {"name": "product_id", "type": "string"},
                    {"name": "quantity", "type": "int"},
                    {"name": "price", "type": "double"},
                    {"name": "timestamp", "type": "long"},
                ],
            },
            "output_schema": {
                "type": "record",
                "name": "OutputEvent",
                "namespace": "com.example.pipeline",
                "fields": [
                    {"name": "order_id", "type": "string"},
                    {"name": "customer_id", "type": "string"},
                    {"name": "total_amount", "type": "double"},
                    {"name": "is_duplicate", "type": "boolean"},
                    {"name": "processed_timestamp", "type": "long"},
                ],
            },
            "sql_statements": {
                "01_create_source_table": (
                    "CREATE TABLE source_table (order_id STRING, customer_id "
                    "STRING, product_id STRING, quantity INT, price DOUBLE, "
                    "`timestamp` BIGINT) WITH ('connector' = 'kafka', 'topic' "
                    "= 'input-events', 'properties.bootstrap.servers' = "
                    "'localhost:9092', 'format' = 'avro');"
                ),
                "02_create_output_table": (
                    "CREATE TABLE output_table (order_id STRING, customer_id "
                    "STRING, total_amount DOUBLE, is_duplicate BOOLEAN, "
                    "processed_timestamp BIGINT) WITH ('connector' = 'kafka', "
                    "'topic' = 'output-events', 'properties.bootstrap.servers'"
                    " = 'localhost:9092', 'format' = 'avro');"
                ),
                "03_create_processing": (
                    "INSERT INTO output_table SELECT order_id, customer_id, "
                    "quantity * price as total_amount, false as is_duplicate, "
                    "`timestamp` as processed_timestamp FROM source_table;"
                ),
            },
            "description": (
                "E-commerce pipeline for order deduplication "
                "(mock data for testing)"
            ),
            "optimizations": [
                "Use watermarks for late data handling",
                "Consider windowing for deduplication",
                "Add proper error handling",
            ],
        }
    )
