"""LLM provider HTTP client tests against local mock servers (no network),
mirroring the registry-client mock-server pattern. Covers provider
detection, the Ollama and OpenAI HTTP paths (including the repair ladder on
a markdown-fenced response), error statuses, the PIPEGEN_MOCK_OPENAI gate,
and the full `init --describe` → `validate` loop."""

from __future__ import annotations

import json
import os
import threading

import pytest
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pipegen_spark.cli import main
from pipegen_spark.llm.service import (
    LLMService,
    LLMServiceError,
    mock_response,
)

GEN_PAYLOAD = {
    "input_schema": {"type": "record", "name": "In", "fields": []},
    "output_schema": {"type": "record", "name": "Out", "fields": []},
    "sql_statements": {
        "01_create_source_table": "CREATE TABLE s (a INT) WITH ('connector' = 'datagen');",
        "02_create_processing": "INSERT INTO s SELECT 1;",
    },
    "description": "demo pipeline",
    "optimizations": ["filter early"],
}


@pytest.fixture()
def llm_server():
    """One server that speaks both the Ollama and the OpenAI wire shapes.

    state['mode'] selects behavior: 'ok' answers normally (the OpenAI
    answer wraps the JSON in a markdown fence to exercise the repair
    ladder); 'http_<code>' returns that status; 'no_choices' returns an
    empty choices list."""
    state = {"mode": "ok", "last": None}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n))
            state["last"] = {
                "path": self.path,
                "body": req,
                "auth": self.headers.get("Authorization"),
            }
            mode = state["mode"]
            if mode.startswith("http_"):
                self._json({"error": "boom"}, int(mode.split("_")[1]))
                return
            if self.path == "/api/generate":
                self._json(
                    {"response": json.dumps(GEN_PAYLOAD), "done": True}
                )
            elif self.path.endswith("/chat/completions"):
                if mode == "no_choices":
                    self._json({"choices": []})
                    return
                content = "```json\n" + json.dumps(GEN_PAYLOAD) + "\n```"
                self._json(
                    {"choices": [{"message": {"content": content}}]}
                )
            else:
                self._json({"error": "not found"}, 404)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", state
    srv.shutdown()
    srv.server_close()


def test_provider_detection_priority():
    svc = LLMService(env={"PIPEGEN_OLLAMA_URL": "http://h:1/",
                          "PIPEGEN_OPENAI_API_KEY": "k"})
    assert svc.provider == "ollama" and svc.base_url == "http://h:1"
    svc = LLMService(env={"PIPEGEN_OLLAMA_MODEL": "m7"})
    assert svc.provider == "ollama" and svc.model == "m7"
    assert svc.base_url == "http://localhost:11434"
    svc = LLMService(env={"PIPEGEN_OPENAI_API_KEY": "k",
                          "PIPEGEN_LLM_MODEL": "gpt-x"})
    assert svc.provider == "openai" and svc.model == "gpt-x"
    svc = LLMService(env={})
    assert not svc.enabled
    with pytest.raises(LLMServiceError, match="not enabled"):
        svc.generate_pipeline("x")


def test_ollama_roundtrip(llm_server):
    url, state = llm_server
    svc = LLMService(env={"PIPEGEN_OLLAMA_URL": url,
                          "PIPEGEN_OLLAMA_MODEL": "llama-test"})
    gen = svc.generate_pipeline("dedup orders", "ecommerce")
    assert state["last"]["path"] == "/api/generate"
    assert state["last"]["body"]["model"] == "llama-test"
    assert state["last"]["body"]["stream"] is False
    assert "dedup orders" in state["last"]["body"]["prompt"]
    assert len(gen["sql_statements"]) == 2
    assert sorted(gen["sql_files"]) == [
        "01_create_source_table", "02_create_processing",
    ]


def test_ollama_error_status(llm_server):
    url, state = llm_server
    state["mode"] = "http_500"
    svc = LLMService(env={"PIPEGEN_OLLAMA_URL": url})
    with pytest.raises(LLMServiceError, match="status 500"):
        svc.generate_pipeline("x")


def test_openai_roundtrip_with_markdown_fence(llm_server):
    url, state = llm_server
    svc = LLMService(env={"PIPEGEN_OPENAI_API_KEY": "sk-test",
                          "PIPEGEN_OPENAI_URL": url})
    gen = svc.generate_pipeline_with_schema('{"type":"record"}', "agg", "iot")
    assert state["last"]["auth"] == "Bearer sk-test"
    body = state["last"]["body"]
    assert body["response_format"] == {"type": "json_object"}
    assert body["temperature"] == 0.1
    assert '{"type":"record"}' in body["messages"][0]["content"]
    # markdown fence was stripped by the repair ladder
    assert gen["description"] == "demo pipeline"


@pytest.mark.parametrize(
    "mode,match",
    [
        ("http_401", "authentication failed"),
        ("http_429", "rate limit"),
        ("http_500", "status 500"),
        ("no_choices", "no choices"),
    ],
)
def test_openai_errors(llm_server, mode, match):
    url, state = llm_server
    state["mode"] = mode
    svc = LLMService(env={"PIPEGEN_OPENAI_API_KEY": "k",
                          "PIPEGEN_OPENAI_URL": url})
    with pytest.raises(LLMServiceError, match=match):
        svc.generate_pipeline("x")


def test_mock_gate_skips_http():
    svc = LLMService(env={"PIPEGEN_OPENAI_API_KEY": "k",
                          "PIPEGEN_OPENAI_URL": "http://127.0.0.1:1",
                          "PIPEGEN_MOCK_OPENAI": "true"})
    gen = svc.generate_pipeline("orders")
    assert "order_id" in gen["input_schema"]
    assert len(gen["sql_statements"]) == 3


def test_mock_response_parses():
    doc = json.loads(mock_response("x"))
    assert set(doc["sql_statements"]) == {
        "01_create_source_table", "02_create_output_table",
        "03_create_processing",
    }


def test_init_describe_requires_provider(tmp_path, monkeypatch, capsys):
    for var in ("PIPEGEN_OLLAMA_URL", "PIPEGEN_OLLAMA_MODEL",
                "PIPEGEN_OPENAI_API_KEY"):
        monkeypatch.delenv(var, raising=False)
    assert main(["init", str(tmp_path / "p"), "--describe", "x"]) == 2
    assert "not enabled" in capsys.readouterr().out


def test_init_describe_end_to_end(tmp_path, monkeypatch, llm_server):
    url, _state = llm_server
    monkeypatch.setenv("PIPEGEN_OLLAMA_URL", url)
    proj = str(tmp_path / "genproj")
    assert main(["init", proj, "--describe", "count clicks per minute",
                 "--domain", "web"]) == 0
    for rel in (
        "sql/01_create_source_table.sql",
        "sql/02_create_processing.sql",
        "schemas/input.avsc",
        "schemas/output.avsc",
        "pipeline.yaml",
        "README.md",
    ):
        assert os.path.exists(os.path.join(proj, rel)), rel
    assert "demo pipeline" in open(os.path.join(proj, "README.md")).read()
    # generated project passes structural validation
    assert main(["validate", proj]) == 0


def test_init_describe_mock_gate_end_to_end(tmp_path, monkeypatch):
    monkeypatch.setenv("PIPEGEN_OPENAI_API_KEY", "k")
    monkeypatch.setenv("PIPEGEN_MOCK_OPENAI", "true")
    monkeypatch.delenv("PIPEGEN_OLLAMA_URL", raising=False)
    monkeypatch.delenv("PIPEGEN_OLLAMA_MODEL", raising=False)
    proj = str(tmp_path / "mockproj")
    assert main(["init", proj, "--describe", "dedup ecommerce orders"]) == 0
    sql = open(
        os.path.join(proj, "sql", "03_create_processing.sql")
    ).read()
    assert "INSERT INTO output_table" in sql
    assert main(["validate", proj]) == 0
