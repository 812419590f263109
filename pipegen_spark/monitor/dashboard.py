"""Live dashboard server (reference B24,
internal/dashboard/server.go:244-305): HTTP endpoints over the in-process
metrics collector. stdlib-only (http.server on a daemon thread) — the
engine needs no web framework; Spark's own UI remains available separately.

Routes (reference parity):
  /api/status   — run status + query list
  /api/metrics  — per-query metrics summaries
  /api/errors   — collected per-query errors
  /api/export   — full JSON dump (status + metrics + params)
  /             — minimal HTML view that polls /api/metrics
"""

from __future__ import annotations

import json
import threading
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pipegen_spark.monitor.metrics import MetricsCollector

_INDEX = """<!DOCTYPE html>
<html><head><title>pipegen-spark dashboard</title>
<style>body{font-family:system-ui;margin:2rem} table{border-collapse:collapse}
td,th{border:1px solid #ccc;padding:4px 10px;font-size:0.9rem}</style></head>
<body><h1>pipegen-spark</h1><div id="m">loading…</div>
<script>
async function tick(){
  const r = await fetch('/api/metrics'); const d = await r.json();
  if (!d.length) { document.getElementById('m').textContent = 'no queries yet'; return; }
  const cols = Object.keys(d[0]);
  let h = '<table><tr>' + cols.map(c=>'<th>'+c+'</th>').join('') + '</tr>';
  for (const row of d) h += '<tr>' + cols.map(c=>'<td>'+row[c]+'</td>').join('') + '</tr>';
  document.getElementById('m').innerHTML = h + '</table>';
}
tick(); setInterval(tick, 2000);
</script></body></html>"""


class DashboardServer:
    def __init__(
        self,
        collector: MetricsCollector,
        host: str = "127.0.0.1",
        port: int = 0,
        run_params: dict | None = None,
    ):
        self.collector = collector
        self.run_params = run_params or {}
        self.started_at = datetime.now(timezone.utc).isoformat(
            timespec="seconds"
        )
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # silence request logging
                pass

            def _json(self, payload, code: int = 200) -> None:
                body = json.dumps(payload, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/api/status":
                    summaries = outer.collector.summaries()
                    self._json(
                        {
                            "status": "running",
                            "started_at": outer.started_at,
                            "queries": [s["query"] for s in summaries],
                            "total_input_rows": sum(
                                s["input_rows"] for s in summaries
                            ),
                        }
                    )
                elif self.path == "/api/metrics":
                    self._json(outer.collector.summaries())
                elif self.path == "/api/errors":
                    self._json(
                        {
                            s["query"]: s["errors"]
                            for s in outer.collector.summaries()
                            if s["errors"]
                        }
                    )
                elif self.path == "/api/export":
                    self._json(
                        {
                            "started_at": outer.started_at,
                            "params": outer.run_params,
                            "metrics": outer.collector.summaries(),
                        }
                    )
                elif self.path == "/":
                    body = _INDEX.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self._json({"error": "not found"}, 404)

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> str:
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return f"http://{self._server.server_address[0]}:{self.port}"

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
