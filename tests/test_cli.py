"""CLI tests: init scaffolding (template / CSV-grounded / schema-grounded),
validate, and the full init → validate → run loop against Spark."""

from __future__ import annotations

import os

import pytest

from pipegen_spark.cli import main


def test_init_default_template(tmp_path, capsys):
    proj = str(tmp_path / "proj")
    assert main(["init", proj, "--project-name", "demo"]) == 0
    for rel in (
        "sql/01_create_source_table.sql",
        "sql/02_create_output_table.sql",
        "sql/03_create_processing.sql",
        "schemas/input.avsc",
        "schemas/output.avsc",
        "pipeline.yaml",
        "README.md",
    ):
        assert os.path.exists(os.path.join(proj, rel)), rel
    sql = open(os.path.join(proj, "sql/03_create_processing.sql")).read()
    assert "INSERT INTO revenue" in sql
    assert "amount AS total" in sql


def test_init_csv_grounded(tmp_path):
    csv = tmp_path / "data.csv"
    csv.write_text("id,name,score\n1,a,1.5\n2,b,\n")
    proj = str(tmp_path / "proj")
    assert main(["init", proj, "--input-csv", str(csv)]) == 0
    ddl = open(os.path.join(proj, "sql/01_create_source_table.sql")).read()
    assert "'connector' = 'filesystem'" in ddl
    assert "id int" in ddl and "score double" in ddl
    avsc = open(os.path.join(proj, "schemas/input.avsc")).read()
    assert '"null"' in avsc  # nullable score


def test_init_schema_grounded(tmp_path):
    schema = tmp_path / "in.avsc"
    schema.write_text(
        '{"type":"record","name":"tx","fields":'
        '[{"name":"name","type":"string"},{"name":"amount","type":"int"}]}'
    )
    proj = str(tmp_path / "proj")
    assert main(["init", proj, "--avro-schema", str(schema)]) == 0
    ddl = open(os.path.join(proj, "sql/01_create_source_table.sql")).read()
    assert "name STRING" in ddl and "amount INT" in ddl
    assert "'connector' = 'datagen'" in ddl


def test_validate_good_and_bad(tmp_path, capsys):
    proj = str(tmp_path / "proj")
    main(["init", proj])
    assert main(["validate", proj]) == 0
    # inject a dangerous statement
    with open(os.path.join(proj, "sql", "04_bad.sql"), "w") as fh:
        fh.write("DELETE FROM revenue")
    assert main(["validate", proj]) == 1


@pytest.mark.usefixtures("spark")
def test_init_validate_run_loop(tmp_path, spark, monkeypatch):
    """Full loop using the shared test session (cmd_run would build its own
    session; patch get_spark to reuse ours)."""
    import pipegen_spark.cli as cli
    import pipegen_spark.session as session_mod

    monkeypatch.setattr(session_mod, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(
        spark.__class__, "stop", lambda self: None
    )  # keep shared session alive
    try:
        proj = str(tmp_path / "proj")
        assert cli.main(["init", proj]) == 0
        assert cli.main(["validate", proj, "--explain"]) == 0
        assert cli.main(["run", proj]) == 0
        reports = os.listdir(os.path.join(proj, "reports"))
        assert any(r.endswith(".html") for r in reports)
    finally:
        monkeypatch.undo()


def test_deploy_generate_only(tmp_path, capsys):
    proj = str(tmp_path / "dp")
    os.makedirs(proj)
    assert main(["deploy", proj, "--generate-only"]) == 0
    assert os.path.exists(os.path.join(proj, "docker-compose.yml"))


def test_version_command(capsys):
    assert main(["version"]) == 0
    out = capsys.readouterr().out
    assert "pipegen-spark" in out


def test_check_no_provider(monkeypatch, capsys):
    for var in ("PIPEGEN_OLLAMA_URL", "PIPEGEN_OLLAMA_MODEL",
                "PIPEGEN_OPENAI_API_KEY"):
        monkeypatch.delenv(var, raising=False)
    assert main(["check"]) == 0
    out = capsys.readouterr().out
    assert "no AI provider configured" in out


def test_check_ollama_mock_server(monkeypatch, capsys):
    """check against a local /api/tags mock: model present -> ready;
    model absent -> remediation hint + exit 1 (reference utils.go:22-65)."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Tags(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = json.dumps(
                {"models": [{"name": "llama3.1:latest", "size": 1}]}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

    srv = HTTPServer(("127.0.0.1", 0), Tags)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        monkeypatch.setenv("PIPEGEN_OLLAMA_URL", url)
        monkeypatch.setenv("PIPEGEN_OLLAMA_MODEL", "llama3.1")
        assert main(["check"]) == 0
        assert "AI provider is ready" in capsys.readouterr().out

        monkeypatch.setenv("PIPEGEN_OLLAMA_MODEL", "notinstalled")
        assert main(["check"]) == 1
        assert "ollama pull notinstalled" in capsys.readouterr().out
    finally:
        srv.shutdown()


def test_clean_requires_compose_file(tmp_path, capsys):
    assert main(["clean", str(tmp_path)]) == 2
    assert "docker-compose.yml not found" in capsys.readouterr().out


def test_stack_deployer_clean_sequences_commands(tmp_path):
    from pipegen_spark.sources.deploy import StackDeployer, write_compose

    write_compose(str(tmp_path))
    calls = []

    def fake_runner(cmd):
        calls.append(cmd)
        return 0, ""

    StackDeployer(str(tmp_path), runner=fake_runner).clean(volumes=True)
    assert calls[-1][-2:] == ["down", "--volumes"]
    StackDeployer(str(tmp_path), runner=fake_runner).clean()
    assert calls[-1][-1] == "down"


def test_dashboard_once(capsys):
    assert main(["dashboard", "--port", "0", "--once"]) == 0
    assert "dashboard running at http://127.0.0.1:" in capsys.readouterr().out


def test_update_reports_newer_version(capsys):
    from pipegen_spark.cli import cmd_update

    assert cmd_update(None, fetcher=lambda pkg: "99.0.0") == 0
    out = capsys.readouterr().out
    assert "Latest version: 99.0.0" in out
    assert "pip install --upgrade pipegen-spark" in out


def test_update_already_current(capsys):
    from pipegen_spark import __version__
    from pipegen_spark.cli import cmd_update

    assert cmd_update(None, fetcher=lambda pkg: __version__) == 0
    assert "Already up to date" in capsys.readouterr().out


def test_update_degrades_gracefully_offline(capsys):
    from pipegen_spark.cli import cmd_update

    def down(pkg):
        raise OSError("network unreachable")

    assert cmd_update(None, fetcher=down) == 1
    err = capsys.readouterr().err
    assert "Failed to fetch latest version" in err
    assert "pip install --upgrade" in err
