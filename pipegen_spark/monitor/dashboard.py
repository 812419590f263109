"""Live dashboard server (reference B24,
internal/dashboard/server.go:244-305): HTTP + WebSocket endpoints over the
in-process metrics collector. stdlib-only (http.server on a daemon thread,
hand-rolled RFC 6455 upgrade) — the engine needs no web framework; Spark's
own UI remains available separately.

Routes (reference parity):
  /api/status   — run status + query list
  /api/metrics  — per-query metrics summaries
  /api/errors   — collected per-query errors
  /api/export   — full JSON dump (status + metrics + params)
  /ws           — WebSocket push: initial metrics frame, then one frame
                  per interval (server.go:508-547 handleWebSocket +
                  :549-614 broadcastLoop)
  /diagram      — pipeline topology as a Mermaid flowchart
                  (server.go:handleDiagram)
  /             — minimal HTML view that polls /api/metrics

The index page builds table cells with textContent (never innerHTML on
data-derived strings), and /diagram HTML-escapes statement names — query
names and error strings can embed attacker-controlled text when the
server is bound beyond loopback.
"""

from __future__ import annotations

import base64
import hashlib
import html
import json
import select
import struct
import threading
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pipegen_spark.monitor.metrics import MetricsCollector

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

_INDEX = """<!DOCTYPE html>
<html><head><title>pipegen-spark dashboard</title>
<style>body{font-family:system-ui;margin:2rem} table{border-collapse:collapse}
td,th{border:1px solid #ccc;padding:4px 10px;font-size:0.9rem}</style></head>
<body><h1>pipegen-spark</h1><div id="m">loading…</div>
<script>
function render(d){
  const m = document.getElementById('m');
  if (!d.length) { m.textContent = 'no queries yet'; return; }
  const cols = Object.keys(d[0]);
  const table = document.createElement('table');
  const head = table.insertRow();
  for (const c of cols) {
    const th = document.createElement('th'); th.textContent = c;
    head.appendChild(th);
  }
  for (const row of d) {
    const tr = table.insertRow();
    for (const c of cols) tr.insertCell().textContent = String(row[c]);
  }
  m.replaceChildren(table);
}
async function tick(){
  const r = await fetch('/api/metrics'); render(await r.json());
}
try {
  const ws = new WebSocket('ws://' + location.host + '/ws');
  ws.onmessage = (ev) => render(JSON.parse(ev.data));
  ws.onerror = () => { tick(); setInterval(tick, 2000); };
} catch (e) { tick(); setInterval(tick, 2000); }
</script></body></html>"""

_DIAGRAM = """<!DOCTYPE html>
<html><head><title>pipeline diagram</title></head>
<body><h1>pipeline topology</h1><pre class="mermaid">
{mermaid}
</pre></body></html>"""


def diagram_mermaid(statements: list[dict] | None) -> str:
    """Mermaid flowchart of the pipeline statement chain. `statements` is
    a list of {"name": ..., "kind": ...} in execution order (the runner's
    statement_results shape); falls back to the canonical
    source → processing → output chain."""
    if not statements:
        statements = [
            {"name": "source", "kind": "create_source"},
            {"name": "processing", "kind": "insert"},
            {"name": "output", "kind": "create_sink"},
        ]
    lines = ["flowchart LR"]
    ids = []
    for i, s in enumerate(statements):
        label = html.escape(
            f"{s.get('name', f'stmt{i}')} [{s.get('kind', '?')}]"
        )
        lines.append(f'  n{i}["{label}"]')
        ids.append(f"n{i}")
    for a, b in zip(ids, ids[1:]):
        lines.append(f"  {a} --> {b}")
    return "\n".join(lines)


def _ws_accept(key: str) -> str:
    digest = hashlib.sha1((key + _WS_GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def ws_text_frame(payload: str) -> bytes:
    """One unmasked server→client text frame (FIN set)."""
    data = payload.encode("utf-8")
    n = len(data)
    if n < 126:
        header = bytes((0x81, n))
    elif n < 1 << 16:
        header = bytes((0x81, 126)) + struct.pack(">H", n)
    else:
        header = bytes((0x81, 127)) + struct.pack(">Q", n)
    return header + data


def _read_client_frame(sock) -> int | None:
    """Opcode of one (masked) client frame, or None on EOF/short read."""
    hdr = sock.recv(2)
    if len(hdr) < 2:
        return None
    opcode = hdr[0] & 0x0F
    length = hdr[1] & 0x7F
    if length == 126:
        length = struct.unpack(">H", sock.recv(2))[0]
    elif length == 127:
        length = struct.unpack(">Q", sock.recv(8))[0]
    if hdr[1] & 0x80:  # client frames must be masked
        sock.recv(4)
    remaining = length
    while remaining > 0:
        chunk = sock.recv(min(remaining, 65536))
        if not chunk:
            return None
        remaining -= len(chunk)
    return opcode


class DashboardServer:
    def __init__(
        self,
        collector: MetricsCollector,
        host: str = "127.0.0.1",
        port: int = 0,
        run_params: dict | None = None,
        statements: list[dict] | None = None,
        ws_interval: float = 1.0,
    ):
        self.collector = collector
        self.run_params = run_params or {}
        self.statements = statements
        self.ws_interval = ws_interval
        self.started_at = datetime.now(timezone.utc).isoformat(
            timespec="seconds"
        )
        self._stopping = threading.Event()
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

            def _html(self, page: str) -> None:
                body = page.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
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
                elif self.path == "/ws":
                    self._websocket()
                elif self.path == "/diagram":
                    self._html(
                        _DIAGRAM.format(
                            mermaid=diagram_mermaid(outer.statements)
                        )
                    )
                elif self.path == "/":
                    self._html(_INDEX)
                else:
                    self._json({"error": "not found"}, 404)

            def _websocket(self) -> None:
                key = self.headers.get("Sec-WebSocket-Key")
                if (
                    not key
                    or "websocket"
                    not in self.headers.get("Upgrade", "").lower()
                ):
                    self._json({"error": "not a websocket upgrade"}, 400)
                    return
                self.send_response(101, "Switching Protocols")
                self.send_header("Upgrade", "websocket")
                self.send_header("Connection", "Upgrade")
                self.send_header("Sec-WebSocket-Accept", _ws_accept(key))
                self.end_headers()
                self.close_connection = True
                sock = self.connection
                # initial frame immediately, then one per interval
                # (reference broadcastLoop cadence)
                sock.sendall(
                    ws_text_frame(
                        json.dumps(
                            outer.collector.summaries(), default=str
                        )
                    )
                )
                while not outer._stopping.is_set():
                    readable, _, _ = select.select(
                        [sock], [], [], outer.ws_interval
                    )
                    if readable:
                        opcode = _read_client_frame(sock)
                        if opcode is None or opcode == 0x8:  # EOF / close
                            try:
                                sock.sendall(b"\x88\x00")  # close reply
                            except OSError:
                                pass
                            return
                        continue  # ping/text ignored; keep pushing
                    try:
                        sock.sendall(
                            ws_text_frame(
                                json.dumps(
                                    outer.collector.summaries(),
                                    default=str,
                                )
                            )
                        )
                    except OSError:
                        return

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._server.daemon_threads = True
        self.port = self._server.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> str:
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return f"http://{self._server.server_address[0]}:{self.port}"

    def stop(self) -> None:
        self._stopping.set()
        self._server.shutdown()
        self._server.server_close()
