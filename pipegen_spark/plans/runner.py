"""Pipeline runner: the reference's 14-step orchestration state machine
(internal/pipeline/runner.go:169-448) collapsed into one process.

Step mapping (SURVEY.md §3.1):
 1. load SQL statements           → plans.statements.load_statements
 2. load schemas (optional)       → schema.avsc.load_schemas
 3. generate resources            → plans.resources.generate_resources
 4. delete/create topics          → workdir prep (file mode)
 5. deploy SQL via gateway        → plans.executor.SQLPipelineExecutor
 6. register schemas              → no-op locally (kept for registry mode)
 7. warm-up sleep                 → unnecessary (in-process), skipped
 8. produce synthetic data        → generator/streaming producer
 9. monitor Flink metrics         → monitor.metrics.MetricsCollector
10. wait producer done            → query await / batch is synchronous
11. wait for processing           → implicit (same session)
12. consume + validate            → monitor.validator.validate
13. timeout grace                 → streaming.stop.SmartStop
14. report + cleanup              → monitor.report + stop queries/rm dirs

Batch pipelines (CSV/parquet sources — reference "CSV mode", B28) run the
statements synchronously; streaming pipelines attach the producer and
smart-stop monitor.
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from pipegen_spark.monitor import report as report_mod
from pipegen_spark.monitor.metrics import MetricsCollector
from pipegen_spark.plans import statements as st
from pipegen_spark.plans.executor import SQLPipelineExecutor
from pipegen_spark.plans.resources import generate_resources
from pipegen_spark.schema import avsc


@dataclass
class RunnerConfig:
    project_dir: str
    workdir: str = ""
    variables: dict[str, str] = field(default_factory=dict)
    local_mode: bool = True
    message_rate: int = 100  # cmd/run.go:46 default
    duration_seconds: float = 30.0  # cmd/run.go:47 default
    pipeline_timeout: float = 300.0  # cmd/run.go:48 default
    report_dir: str = ""
    cleanup: bool = True


@dataclass
class RunResult:
    run_id: str
    statement_results: list[dict]
    producer_stats: dict
    metrics: list[dict]
    report_path: str | None = None
    elapsed_seconds: float = 0.0


class PipelineRunner:
    def __init__(self, spark: SparkSession, config: RunnerConfig):
        self.spark = spark
        self.config = config

    def run(self) -> RunResult:
        cfg = self.config
        t0 = time.monotonic()
        workdir = cfg.workdir or os.path.join(cfg.project_dir, ".pipegen-run")

        # 1. statements
        stmts = st.load_statements(cfg.project_dir)
        for s in stmts:
            st.validate_statement(s)

        # 2. schemas (optional when topics declared in SQL, runner.go:217-248)
        try:
            schemas = avsc.load_schemas(cfg.project_dir)
        except FileNotFoundError:
            schemas = {}

        # 3-4. resources + topic dirs
        topics = st.extract_topics(stmts)
        res = generate_resources(topics, workdir, cfg.local_mode)
        os.makedirs(res.workdir, exist_ok=True)
        for t in res.topics:
            os.makedirs(res.output_dir(t), exist_ok=True)

        variables = {
            "INPUT_TOPIC": res.input_topic,
            "OUTPUT_TOPIC": res.output_topic,
            "BOOTSTRAP_SERVERS": "localhost:9092",
            "SCHEMA_REGISTRY_URL": "http://localhost:8082",
            **cfg.variables,
        }

        # 9. metrics listener (before any streaming starts)
        collector = MetricsCollector()
        self.spark.streams.addListener(collector)

        # 5. execute statements in order
        executor = SQLPipelineExecutor(
            self.spark,
            variables=variables,
            checkpoint_root=os.path.join(res.workdir, "checkpoints"),
        )
        stmt_rows: list[dict] = []
        producer_stats: dict = {"mode": "batch"}
        try:
            results = executor.execute(stmts)

            # 8-13. unbounded INSERTs: run for the configured duration with
            # smart-stop semantics (expected-count/idle/hard timeout —
            # reference consumer.go:45-136 + runner.go:399-432)
            if executor.streaming_queries:
                from pipegen_spark.streaming.stop import SmartStop

                producer_stats["mode"] = "streaming"
                reasons = []
                for q in executor.streaming_queries:
                    stop = SmartStop(
                        q,
                        no_message_timeout=min(
                            30.0, cfg.duration_seconds
                        ),
                        hard_timeout=cfg.duration_seconds,
                    )
                    reasons.append(stop.await_done())
                producer_stats["stop_reasons"] = reasons

            for r in results:
                row = {
                    "order": r.statement.order,
                    "name": r.statement.name,
                    "kind": r.kind,
                    "status": "ERROR" if r.error else "OK",
                }
                if r.rows_written is not None:
                    row["rows"] = r.rows_written
                elif r.dataframe is not None and r.kind == "QUERY":
                    row["rows"] = r.dataframe.count()
                elif r.streaming_query is not None:
                    # memory-sink streaming INSERT: count the sink view
                    target = r.statement.content.split()[2].strip("`\"")
                    try:
                        row["rows"] = self.spark.table(target).count()
                    except Exception:
                        pass
                stmt_rows.append(row)
            producer_stats["statements"] = len(results)
        finally:
            # 13-14. stop stray streaming queries + report + cleanup
            for q in self.spark.streams.active:
                q.stop()
            self.spark.streams.removeListener(collector)

        elapsed = time.monotonic() - t0
        report_path = None
        if cfg.report_dir:
            report_path = report_mod.write_report(
                cfg.report_dir,
                res.prefix,
                params={
                    "project_dir": cfg.project_dir,
                    "message_rate": cfg.message_rate,
                    "duration_seconds": cfg.duration_seconds,
                    "schemas": ", ".join(schemas) or "(from SQL)",
                    "topics": ", ".join(res.topics),
                },
                statement_results=stmt_rows,
                producer_stats=producer_stats,
                metrics=collector.summaries(),
            )
        if cfg.cleanup and not cfg.workdir:
            shutil.rmtree(workdir, ignore_errors=True)
        return RunResult(
            run_id=res.prefix,
            statement_results=stmt_rows,
            producer_stats=producer_stats,
            metrics=collector.summaries(),
            report_path=report_path,
            elapsed_seconds=elapsed,
        )
