"""Dashboard WebSocket (/ws) and /diagram route tests — a stdlib socket
client performs the RFC 6455 handshake and reads pushed metric frames."""

from __future__ import annotations

import base64
import hashlib
import json
import socket
import struct
import urllib.request

from pipegen_spark.monitor.dashboard import (
    DashboardServer,
    diagram_mermaid,
    ws_text_frame,
)
from pipegen_spark.monitor.metrics import MetricsCollector, QueryMetrics


def _collector():
    c = MetricsCollector()
    m = QueryMetrics(query_id="q1", name="demo")
    m.batches, m.input_rows = 2, 200
    m.input_rps, m.processed_rps = [50.0], [60.0]
    c.queries["q1"] = m
    return c


def _read_frame(sock) -> tuple[int, bytes]:
    hdr = sock.recv(2)
    assert len(hdr) == 2
    opcode = hdr[0] & 0x0F
    n = hdr[1] & 0x7F
    if n == 126:
        n = struct.unpack(">H", sock.recv(2))[0]
    elif n == 127:
        n = struct.unpack(">Q", sock.recv(8))[0]
    data = b""
    while len(data) < n:
        chunk = sock.recv(n - len(data))
        if not chunk:
            break
        data += chunk
    return opcode, data


def test_ws_text_frame_lengths():
    small = ws_text_frame("x")
    assert small == b"\x81\x01x"
    medium = ws_text_frame("a" * 200)
    assert medium[:2] == b"\x81\x7e" and medium[2:4] == struct.pack(">H", 200)


def test_websocket_push_and_close():
    srv = DashboardServer(_collector(), ws_interval=0.05)
    srv.start()
    try:
        sock = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        key = base64.b64encode(b"0123456789abcdef").decode()
        sock.sendall(
            (
                f"GET /ws HTTP/1.1\r\nHost: 127.0.0.1:{srv.port}\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\n"
                "Sec-WebSocket-Version: 13\r\n\r\n"
            ).encode()
        )
        # handshake response with the RFC 6455 accept hash
        resp = b""
        while b"\r\n\r\n" not in resp:
            resp += sock.recv(4096)
        head = resp.split(b"\r\n\r\n", 1)[0].decode()
        assert "101" in head.splitlines()[0]
        want = base64.b64encode(
            hashlib.sha1(
                (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode()
            ).digest()
        ).decode()
        assert f"Sec-WebSocket-Accept: {want}" in head
        # at least two pushed metric frames (initial + periodic)
        for _ in range(2):
            opcode, data = _read_frame(sock)
            assert opcode == 0x1
            frame = json.loads(data)
            assert frame[0]["query"] == "demo"
            assert frame[0]["input_rows"] == 200
        # masked client close → server replies with close frame
        sock.sendall(b"\x88\x80" + b"\x00\x00\x00\x00")
        while True:
            opcode, _ = _read_frame(sock)
            if opcode == 0x8:
                break
        sock.close()
    finally:
        srv.stop()


def test_ws_rejects_plain_get():
    srv = DashboardServer(_collector())
    url = srv.start()
    try:
        try:
            urllib.request.urlopen(url + "/ws", timeout=5)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as err:
            assert err.code == 400
    finally:
        srv.stop()


def test_diagram_route_and_escaping():
    stmts = [
        {"name": "src<script>", "kind": "create_source"},
        {"name": "agg", "kind": "insert"},
    ]
    srv = DashboardServer(_collector(), statements=stmts)
    url = srv.start()
    try:
        body = urllib.request.urlopen(url + "/diagram", timeout=5).read()
        text = body.decode()
        assert "flowchart LR" in text
        assert "n0 --> n1" in text
        assert "<script>" not in text.split("<pre", 1)[1]
        assert "&lt;script&gt;" in text
    finally:
        srv.stop()


def test_diagram_default_chain():
    m = diagram_mermaid(None)
    assert "source" in m and "processing" in m and "output" in m
    assert m.count("-->") == 2


def test_index_has_no_innerhtml():
    srv = DashboardServer(_collector())
    url = srv.start()
    try:
        text = urllib.request.urlopen(url + "/", timeout=5).read().decode()
        assert "innerHTML" not in text
        assert "textContent" in text
        assert "WebSocket" in text
    finally:
        srv.stop()


def test_index_chart_panel_markup():
    """r13 (r12 VERDICT stretch #8): the index page carries the
    reference dashboard's panel set — metric tiles, pipeline-flow
    strip, and the two live SVG charts — self-contained (no CDN
    script tags; the reference pulls Chart.js from jsdelivr, which an
    egress-less deployment cannot)."""
    srv = DashboardServer(_collector())
    base = srv.start()
    try:
        with urllib.request.urlopen(base + "/", timeout=5) as r:
            page = r.read().decode()
        for marker in (
            'id="chart_rps"', 'id="chart_ms"',  # live SVG charts
            'id="t_rows"', 'id="t_rps"', 'id="t_p95"', 'id="t_bp"',
            'id="flow"', 'id="f_state"',  # pipeline-flow strip
            "drawChart", "polyline",  # the inline renderer
        ):
            assert marker in page, marker
        assert "<script src=" not in page  # self-contained, no CDN
        assert "textContent" in page and ".innerHTML" not in page
    finally:
        srv.stop()
