"""pipegen-spark CLI: the reference's command surface (cmd/root.go:16-26)
re-expressed for an in-process Spark engine:

- init      scaffold a project (templates, CSV-grounded, schema-grounded,
            or LLM-generated with --describe)
- validate  project structure + statement-level SQL validation (+ EXPLAIN
            against a live session with --explain)
- run       execute the pipeline (batch-synchronous for file sources)
- deploy    generate compose + bring up the local Kafka stack
- clean     stop/remove the deployed stack (cmd/clean.go)
- check     AI provider configuration + connectivity (cmd/check.go)
- dashboard standalone live metrics dashboard (cmd/dashboard.go)
- version   version report (cmd/version.go)
- bench     run the declared query corpus and print one JSON line

- update    check the package index for a newer release and print the
            upgrade command (cmd/update.go — the reference self-replaces
            its binary from the latest GitHub release; a pip-installed
            package must not overwrite itself at runtime, so the Spark
            port reports and instructs instead)
"""

from __future__ import annotations

import argparse
import os
import sys


def cmd_init(args) -> int:
    from pipegen_spark import templates as tpl
    from pipegen_spark.schema.inference import (
        CSVAnalyzer,
        analysis_to_avro,
        analysis_to_ddl,
    )

    project_dir = args.project_dir
    name = args.project_name or os.path.basename(os.path.abspath(project_dir))
    os.makedirs(os.path.join(project_dir, "sql"), exist_ok=True)
    os.makedirs(os.path.join(project_dir, "schemas"), exist_ok=True)

    def write(rel: str, content: str) -> None:
        path = os.path.join(project_dir, rel)
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(content)
        print(f"  wrote {path}")

    if getattr(args, "describe", None):
        return _init_from_description(args, name, write)

    if args.input_csv:
        res = CSVAnalyzer(args.input_csv).analyze()
        cols = ",\n    ".join(analysis_to_ddl(res).split(", "))
        write(
            "sql/01_create_source_table.sql",
            tpl.SQL_SOURCE_CSV_TEMPLATE.format(
                csv_name=os.path.basename(args.input_csv),
                csv_path=os.path.abspath(args.input_csv),
                columns=cols,
            ),
        )
        write("schemas/input.avsc", analysis_to_avro(name, res))
    elif args.avro_schema:
        with open(args.avro_schema, encoding="utf-8") as fh:
            schema_json = fh.read()
        from pipegen_spark.schema.avsc import parse_schema

        schema = parse_schema(schema_json)
        cols = ",\n    ".join(
            f"{f['name']} {_avro_to_ddl(f['type'])}" for f in schema.fields
        )
        write(
            "sql/01_create_source_table.sql",
            "CREATE TABLE transactions (\n    "
            + cols
            + "\n) WITH (\n    'connector' = 'datagen',\n"
            "    'number-of-rows' = '1000'\n);\n",
        )
        write("schemas/input.avsc", schema_json)
    else:
        write("sql/01_create_source_table.sql", tpl.SQL_SOURCE_DATAGEN)
        write("schemas/input.avsc", tpl.DEFAULT_INPUT_AVSC)

    write("sql/02_create_output_table.sql", tpl.SQL_OUTPUT)
    write("sql/03_create_processing.sql", tpl.SQL_PROCESSING)
    write("schemas/output.avsc", tpl.DEFAULT_OUTPUT_AVSC)
    write("pipeline.yaml", tpl.PIPELINE_YAML.format(project_name=name))
    write(
        "README.md",
        tpl.README.format(project_name=name, project_dir=project_dir),
    )
    print(f"project '{name}' initialized at {project_dir}")
    return 0


def _init_from_description(args, name: str, write) -> int:
    """LLM-generated project scaffold (reference cmd/init.go describe mode →
    internal/llm/service.go). Provider comes from the environment; with
    PIPEGEN_MOCK_OPENAI=true the whole path runs offline."""
    from pipegen_spark import templates as tpl
    from pipegen_spark.llm.service import LLMService, LLMServiceError

    svc = LLMService()
    if not svc.enabled:
        print(
            "error: LLM service not enabled. Set PIPEGEN_OPENAI_API_KEY or "
            "PIPEGEN_OLLAMA_MODEL environment variable"
        )
        return 2
    domain = getattr(args, "domain", None) or "general"
    try:
        if args.avro_schema:
            with open(args.avro_schema, encoding="utf-8") as fh:
                schema_json = fh.read()
            gen = svc.generate_pipeline_with_schema(
                schema_json, args.describe, domain
            )
        elif args.input_csv:
            from pipegen_spark.schema.inference import (
                CSVAnalyzer,
                analysis_to_avro,
            )

            res = CSVAnalyzer(args.input_csv).analyze()
            summary = "\n".join(
                f"- {c.name}: {c.type}" for c in res.columns
            )
            gen = svc.generate_pipeline_with_csv(
                args.describe, domain, summary, analysis_to_avro(name, res)
            )
        else:
            gen = svc.generate_pipeline(args.describe, domain)
    except LLMServiceError as err:
        print(f"error: LLM generation failed: {err}")
        return 1

    sql_files = gen["sql_files"] or {
        f"{i + 1:02d}_statement": s
        for i, s in enumerate(gen["sql_statements"])
    }
    for fname in sorted(sql_files):
        rel = fname if fname.endswith(".sql") else f"{fname}.sql"
        write(os.path.join("sql", rel), sql_files[fname].rstrip() + "\n")
    if gen["input_schema"]:
        write("schemas/input.avsc", gen["input_schema"])
    if gen["output_schema"]:
        write("schemas/output.avsc", gen["output_schema"])
    write("pipeline.yaml", tpl.PIPELINE_YAML.format(project_name=name))
    readme = [f"# {name}", "", gen["description"] or args.describe, ""]
    if gen["optimizations"]:
        readme += ["## Suggested optimizations", ""]
        readme += [f"- {o}" for o in gen["optimizations"]]
        readme.append("")
    write("README.md", "\n".join(readme))
    print(f"project '{name}' generated from description at {args.project_dir}")
    return 0


def _avro_to_ddl(t) -> str:
    mapping = {
        "string": "STRING",
        "int": "INT",
        "long": "BIGINT",
        "float": "FLOAT",
        "double": "DOUBLE",
        "boolean": "BOOLEAN",
        "bytes": "BYTES",
    }
    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        return _avro_to_ddl(branches[0]) if branches else "STRING"
    if isinstance(t, str):
        return mapping.get(t, "STRING")
    return "STRING"


def cmd_validate(args) -> int:
    """Structure + statement validation (reference cmd/validate.go:29-135),
    plus optional EXPLAIN-based SQL checking via a live session."""
    from pipegen_spark.plans import statements as st
    from pipegen_spark.schema import avsc

    project_dir = args.project_dir
    ok = True

    def check(cond: bool, msg: str) -> None:
        nonlocal ok
        print(("  ✓ " if cond else "  ✗ ") + msg)
        ok = ok and cond

    check(os.path.isdir(project_dir), f"project directory {project_dir}")
    try:
        stmts = st.load_statements(project_dir)
        check(True, f"sql/ contains {len(stmts)} statement file(s)")
    except FileNotFoundError as e:
        check(False, str(e))
        stmts = []
    for s in stmts:
        try:
            st.validate_statement(s)
            kind = st.classify_statement(s.content)
            check(True, f"{s.name}: {kind}")
        except st.StatementValidationError as e:
            check(False, f"{s.name}: {e}")
    try:
        schemas = avsc.load_schemas(project_dir)
        check(True, f"schemas/ contains {len(schemas)} schema(s)")
    except (FileNotFoundError, avsc.SchemaValidationError) as e:
        print(f"  ! schemas: {e} (optional when topics declared in SQL)")
    check(
        os.path.exists(os.path.join(project_dir, "pipeline.yaml")),
        "pipeline.yaml present",
    )
    if args.explain and stmts:
        from pipegen_spark.plans.executor import SQLPipelineExecutor
        from pipegen_spark.session import get_spark

        spark = get_spark("pipegen-validate", cpus=2)
        try:
            SQLPipelineExecutor(spark).execute(stmts)
            check(True, "EXPLAIN/execution check passed")
        except Exception as e:
            check(False, f"execution check failed: {e}")
        finally:
            spark.stop()
    print("valid" if ok else "INVALID")
    return 0 if ok else 1


def cmd_run(args) -> int:
    from pipegen_spark.plans.runner import PipelineRunner, RunnerConfig
    from pipegen_spark.session import get_spark

    if not os.path.isdir(os.path.join(args.project_dir, "sql")):
        print(
            f"error: {args.project_dir!r} is not a pipeline project "
            "(no sql/ directory) — run `init` first"
        )
        return 2
    spark = get_spark("pipegen-run")
    config = RunnerConfig(
        project_dir=args.project_dir,
        report_dir=args.report_dir
        or os.path.join(args.project_dir, "reports"),
        wire_broker=getattr(args, "wire_broker", None) or "",
        message_rate=getattr(args, "message_rate", None) or 100,
        duration_seconds=getattr(args, "duration", None) or 30.0,
    )
    result = PipelineRunner(spark, config).run()
    print(f"run {result.run_id} finished in {result.elapsed_seconds:.1f}s")
    for row in result.statement_results:
        print(f"  [{row['order']}] {row['name']}: {row['status']}"
              + (f" ({row['rows']} rows)" if "rows" in row else ""))
    if result.report_path:
        print(f"report: {result.report_path}")
    spark.stop()
    return 0


def cmd_deploy(args) -> int:
    """Local stack deploy (reference cmd/deploy.go): generate compose,
    docker compose up, TCP health-wait. --generate-only writes the compose
    file and stops (the only mode exercised where docker is absent)."""
    from pipegen_spark.sources.deploy import (
        DeployError,
        StackDeployer,
        write_compose,
    )

    if args.generate_only:
        path = write_compose(args.project_dir)
        print(f"wrote {path}")
        return 0
    try:
        out = StackDeployer(args.project_dir).deploy(
            clean=args.clean, startup_timeout=args.startup_timeout
        )
    except DeployError as err:
        print(f"error: {err}")
        return 1
    for w in out["warnings"]:
        print(f"warning: {w}")
    print("stack deployed: " + ", ".join(out["services"]))
    return 0


def cmd_bench(_args) -> int:
    import bench

    bench.main()
    return 0


def cmd_check(_args) -> int:
    """AI provider configuration + connectivity check (reference
    cmd/check.go:29-65)."""
    from pipegen_spark.llm.service import LLMService, LLMServiceError

    print("checking AI provider configuration...")
    svc = LLMService()
    if not svc.enabled:
        print("no AI provider configured")
        print("to enable AI features, set one of:")
        print("  PIPEGEN_OLLAMA_MODEL=<model>   local Ollama "
              "(optional PIPEGEN_OLLAMA_URL)")
        print("  PIPEGEN_OPENAI_API_KEY=<key>   OpenAI-compatible "
              "(optional PIPEGEN_OPENAI_URL)")
        return 0
    print(f"provider detected: {svc.provider_info()}")
    print("testing connectivity...")
    try:
        svc.check_connection()
    except LLMServiceError as err:
        print(f"connection failed: {err}")
        return 1
    print("AI provider is ready")
    print('try: pipegen-spark init my-pipeline --describe "your pipeline"')
    return 0


def cmd_clean(args) -> int:
    """Stop and remove the deployed stack (reference cmd/clean.go)."""
    from pipegen_spark.sources.deploy import DeployError, StackDeployer

    compose = os.path.join(args.project_dir, "docker-compose.yml")
    if not os.path.exists(compose):
        print(
            "error: docker-compose.yml not found in "
            f"{args.project_dir!r} — run from a pipegen project "
            "(or `deploy --generate-only` first)"
        )
        return 2
    try:
        StackDeployer(args.project_dir).clean(volumes=args.volumes)
    except DeployError as err:
        print(f"error: {err}")
        return 1
    print("stack cleaned" + (" (volumes removed)" if args.volumes else ""))
    return 0


def cmd_dashboard(args) -> int:
    """Standalone live dashboard (reference cmd/dashboard.go --standalone):
    HTTP + WebSocket server over the listener-driven metrics collector. In
    standalone mode no pipeline is running, so panels populate as soon as
    streaming queries start in the same process (or stay empty)."""
    from pipegen_spark.monitor.dashboard import DashboardServer
    from pipegen_spark.monitor.metrics import MetricsCollector

    server = DashboardServer(
        MetricsCollector(), host=args.host, port=args.port
    )
    url = server.start()
    print(f"dashboard running at {url} (ctrl-c to stop)")
    if args.once:  # test hook: start, report, stop
        server.stop()
        return 0
    import time as _time

    try:
        while True:
            _time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()
    return 0


def cmd_version(_args) -> int:
    """Version report (reference cmd/version.go)."""
    from pipegen_spark import __version__

    print(f"pipegen-spark {__version__}")
    try:
        import pyspark

        print(f"pyspark {pyspark.__version__}")
    except Exception:
        pass
    return 0


def _fetch_latest_version(package: str, timeout: float = 10.0) -> str:
    """Latest released version string from the PyPI JSON API.

    Mirrors the reference's getLatestVersion (cmd/update.go:37-61, GitHub
    releases API) against the Python package index. stdlib-HTTP only;
    raises on any network/shape problem — the caller degrades gracefully.
    """
    import json as _json
    import urllib.request

    url = f"https://pypi.org/pypi/{package}/json"
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        data = _json.loads(resp.read().decode("utf-8"))
    version = data.get("info", {}).get("version", "")
    if not version:
        raise ValueError("no version found in index response")
    return version


def _version_tuple(v: str) -> tuple:
    parts = []
    for p in v.strip().lstrip("v").split("."):
        digits = "".join(ch for ch in p if ch.isdigit())
        parts.append(int(digits) if digits else 0)
    return tuple(parts)


def cmd_update(args, fetcher=_fetch_latest_version) -> int:
    """Check for a newer release (reference cmd/update.go).

    The reference downloads and swaps its own binary; for a pip-installed
    package the correct move is to surface the upgrade command, not mutate
    site-packages from inside a running process. `fetcher` is injectable
    for tests/offline."""
    from pipegen_spark import __version__

    package = "pipegen-spark"
    print(f"[INFO] Current version: {__version__}")
    try:
        latest = fetcher(package)
    except Exception as e:
        print(f"[ERROR] Failed to fetch latest version: {e}", file=sys.stderr)
        print(
            "[INFO] Offline or unpublished package — upgrade manually with:\n"
            f"  pip install --upgrade {package}",
            file=sys.stderr,
        )
        return 1
    print(f"[INFO] Latest version: {latest}")
    if _version_tuple(latest) > _version_tuple(__version__):
        print(
            f"[INFO] Update available — run:\n  pip install --upgrade {package}"
        )
    else:
        print("[SUCCESS] Already up to date!")
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="pipegen-spark")
    sub = parser.add_subparsers(dest="command", required=True)

    p_init = sub.add_parser("init", help="scaffold a pipeline project")
    p_init.add_argument("project_dir")
    p_init.add_argument("--project-name")
    p_init.add_argument("--input-csv", help="ground the schema on a CSV file")
    p_init.add_argument("--avro-schema", help="use an existing .avsc schema")
    p_init.add_argument(
        "--describe",
        help="generate the pipeline from a natural-language description "
        "(uses the configured LLM provider; see PIPEGEN_OLLAMA_URL / "
        "PIPEGEN_OPENAI_API_KEY / PIPEGEN_MOCK_OPENAI)",
    )
    p_init.add_argument(
        "--domain", help="business domain hint for --describe generation"
    )
    p_init.set_defaults(fn=cmd_init)

    p_val = sub.add_parser("validate", help="validate project structure + SQL")
    p_val.add_argument("project_dir")
    p_val.add_argument(
        "--explain", action="store_true", help="also run the statements"
    )
    p_val.set_defaults(fn=cmd_validate)

    p_run = sub.add_parser("run", help="execute the pipeline")
    p_run.add_argument("project_dir")
    p_run.add_argument("--report-dir")
    p_run.add_argument(
        "--wire-broker",
        metavar="HOST:PORT",
        help="run the whole lifecycle over a wire-protocol Kafka "
        "broker (socket topic admin, Confluent-Avro produce/consume, "
        "smart-stop validation) — r12; cf. reference cmd/run.go",
    )
    p_run.add_argument("--message-rate", type=int, metavar="N",
                       help="messages per second (default 100)")
    p_run.add_argument("--duration", type=float, metavar="SEC",
                       help="producer duration in seconds (default 30)")
    p_run.set_defaults(fn=cmd_run)

    p_dep = sub.add_parser("deploy", help="deploy the local Kafka stack")
    p_dep.add_argument("project_dir")
    p_dep.add_argument("--generate-only", action="store_true",
                       help="write docker-compose.yml and exit")
    p_dep.add_argument("--clean", action="store_true",
                       help="docker compose down before deploying")
    p_dep.add_argument("--startup-timeout", type=float, default=120.0)
    p_dep.set_defaults(fn=cmd_deploy)

    p_bench = sub.add_parser("bench", help="run the benchmark corpus")
    p_bench.set_defaults(fn=cmd_bench)

    p_chk = sub.add_parser(
        "check", help="check AI provider configuration and connectivity"
    )
    p_chk.set_defaults(fn=cmd_check)

    p_cln = sub.add_parser(
        "clean", help="stop and remove the deployed local stack"
    )
    p_cln.add_argument("project_dir", nargs="?", default=".")
    p_cln.add_argument("--volumes", action="store_true",
                       help="remove volumes as well")
    p_cln.set_defaults(fn=cmd_clean)

    p_dash = sub.add_parser(
        "dashboard", help="start the live metrics dashboard"
    )
    p_dash.add_argument("--host", default="127.0.0.1")
    p_dash.add_argument("--port", type=int, default=3000)
    p_dash.add_argument("--once", action="store_true",
                        help="start, print the URL, and exit (for tests)")
    p_dash.set_defaults(fn=cmd_dashboard)

    p_ver = sub.add_parser("version", help="show version information")
    p_ver.set_defaults(fn=cmd_version)

    p_upd = sub.add_parser(
        "update", help="check the package index for a newer release"
    )
    p_upd.set_defaults(fn=cmd_update)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
