"""HTML execution report (reference B26: runner.go:466-536 + embedded Go
template internal/templates/files/execution_report.html). Rendered with
stdlib string.Template — no web stack needed; the report is a single
self-contained file per run.
"""

from __future__ import annotations

import html
import json
import os
from datetime import datetime, timezone
from string import Template

_PAGE = Template(
    """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>pipegen-spark run $run_id</title>
<style>
 body{font-family:system-ui,sans-serif;margin:2rem;color:#222}
 h1{font-size:1.4rem} h2{font-size:1.1rem;margin-top:1.5rem}
 table{border-collapse:collapse;margin:0.5rem 0}
 td,th{border:1px solid #ccc;padding:4px 10px;text-align:left;font-size:0.9rem}
 th{background:#f4f4f4}
 .ok{color:#0a7d32}.bad{color:#b00020}
</style></head><body>
<h1>Pipeline execution report — $run_id</h1>
<p>Generated $generated_at</p>
<h2>Parameters</h2>$params_table
<h2>Statements</h2>$statements_table
<h2>Producer / consumer</h2>$stats_table
<h2>Query metrics</h2>$metrics_table
</body></html>
"""
)


def _table(rows: list[dict]) -> str:
    if not rows:
        return "<p>(none)</p>"
    cols = list(rows[0].keys())
    head = "".join(f"<th>{html.escape(str(c))}</th>" for c in cols)
    body = "".join(
        "<tr>"
        + "".join(f"<td>{html.escape(str(r.get(c, '')))}</td>" for c in cols)
        + "</tr>"
        for r in rows
    )
    return f"<table><tr>{head}</tr>{body}</table>"


def _kv_table(d: dict) -> str:
    return _table([{"key": k, "value": v} for k, v in d.items()])


def render_report(
    run_id: str,
    params: dict,
    statement_results: list[dict],
    producer_stats: dict,
    metrics: list[dict],
) -> str:
    return _PAGE.substitute(
        run_id=html.escape(run_id),
        generated_at=datetime.now(timezone.utc).isoformat(timespec="seconds"),
        params_table=_kv_table(params),
        statements_table=_table(statement_results),
        stats_table=_kv_table(producer_stats),
        metrics_table=_table(metrics),
    )


def write_report(out_dir: str, run_id: str, **kwargs) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(
        out_dir,
        f"execution-report-{datetime.now(timezone.utc):%Y%m%d-%H%M%S}.html",
    )
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(render_report(run_id=run_id, **kwargs))
    json_path = path.replace(".html", ".json")
    with open(json_path, "w", encoding="utf-8") as fh:
        json.dump({"run_id": run_id, **kwargs}, fh, indent=2, default=str)
    return path
