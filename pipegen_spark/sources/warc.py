"""From-scratch WARC (Web ARChive, ISO 28500 / WARC/1.0-1.1) — pure stdlib.

Round-12: WARC is the container crawl corpora actually arrive in
(Common Crawl ships WARC/WET/WAT), i.e. the INPUT format of a real
LLM training-data pipeline; until now the repo's ingestion story
started at parquet/CSV/Kafka. Implemented per the public spec:

- records: the `WARC/1.0` version line, named headers until an empty
  line (folded continuation lines per RFC 5322 supported on read),
  a body of exactly `Content-Length` bytes, then the mandatory
  CRLF CRLF record separator;
- mandatory headers enforced on write (WARC-Record-ID, WARC-Date,
  WARC-Type, Content-Length) and validated on read;
- the Common Crawl layout: each record its OWN gzip member,
  concatenated (readers must handle multi-member streams — stdlib
  zlib with explicit member iteration, since gzip.decompress stops
  semantics differ across versions); plain uncompressed files too;
- `response` records carry an HTTP/1.1 message as payload
  (Content-Type: application/http;msgtype=response) — `parse_http`
  splits status line / headers / body.

Loud-boundary policy as everywhere: truncation, a bad version line,
missing mandatory headers, short bodies, or a missing separator raise
ValueError (tests/test_warc.py pins the contract with spec-assembled
golden bytes and hostile-bytes properties).

Reference parity: the reference has no archive ingestion at all — this
extends the beyond-reference training-data surface (SURVEY.md §2B-B29),
feeding the text pipeline from the format the crawl actually uses.
"""

from __future__ import annotations

import io
import zlib

CRLF = b"\r\n"

#: Bomb guard for one decompressed record body.
MAX_BODY_DEFAULT = 1 << 30

MANDATORY = ("WARC-Record-ID", "Content-Length", "WARC-Date", "WARC-Type")


def write_record(
    warc_type: str,
    record_id: str,
    date: str,
    body: bytes,
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """One uncompressed WARC/1.0 record with the mandatory headers and
    the trailing CRLF CRLF separator."""
    headers = {
        "WARC-Type": warc_type,
        "WARC-Record-ID": record_id,
        "WARC-Date": date,
        "Content-Length": str(len(body)),
        **(extra_headers or {}),
    }
    out = bytearray(b"WARC/1.0" + CRLF)
    for k, v in headers.items():
        if CRLF in v.encode() or "\n" in v:
            raise ValueError(f"header {k} contains a line break")
        out += f"{k}: {v}".encode() + CRLF
    out += CRLF
    out += body
    out += CRLF + CRLF
    return bytes(out)


def write_http_response(
    status: int,
    reason: str,
    body: bytes,
    content_type: str = "text/html",
) -> bytes:
    """The HTTP/1.1 response message a `response` record carries."""
    head = (
        f"HTTP/1.1 {status} {reason}" + "\r\n"
        f"Content-Type: {content_type}" + "\r\n"
        f"Content-Length: {len(body)}" + "\r\n\r\n"
    ).encode()
    return head + body


def gzip_member(data: bytes) -> bytes:
    """One RFC-1952 gzip member (the Common Crawl per-record layout)."""
    gz = zlib.compressobj(wbits=31)
    return gz.compress(data) + gz.flush()


def _iter_gzip_members(data: bytes):
    """Yield decompressed members of a concatenated gzip stream."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=47)
        try:
            chunk = d.decompress(data[pos:])
        except zlib.error as e:
            raise ValueError(f"bad gzip member at {pos}: {e}") from e
        if not d.eof:
            raise ValueError("truncated gzip member")
        yield chunk
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member made no progress")
        pos += consumed


def parse_records(
    data: bytes, max_body: int = MAX_BODY_DEFAULT
) -> list[dict]:
    """Parse a WARC file (plain or per-record-gzip) ->
    [{"version", "headers": {k: v}, "body": bytes}]. Validates the
    version line, mandatory headers, Content-Length framing, and the
    record separator — loudly."""
    if data[:2] == b"\x1f\x8b":
        plain = b"".join(_iter_gzip_members(data))
    else:
        plain = data
    out: list[dict] = []
    pos = 0
    n = len(plain)
    while pos < n:
        # tolerate extra blank space between records (some writers pad)
        while pos < n and plain[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        eol = plain.find(CRLF, pos)
        if eol < 0:
            raise ValueError("truncated WARC version line")
        version = plain[pos:eol].decode("ascii", "replace")
        if not version.startswith("WARC/"):
            raise ValueError(f"bad WARC version line {version!r}")
        if version not in ("WARC/1.0", "WARC/1.1"):
            raise ValueError(f"unsupported WARC version {version!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        last_key: str | None = None
        while True:
            eol = plain.find(CRLF, pos)
            if eol < 0:
                raise ValueError("truncated WARC header block")
            line = plain[pos:eol]
            pos = eol + 2
            if not line:
                break
            if line[:1] in (b" ", b"\t"):  # RFC 5322 folded continuation
                if last_key is None:
                    raise ValueError("continuation line before any header")
                headers[last_key] += " " + line.strip().decode(
                    "utf-8", "replace"
                )
                continue
            k, sep, v = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header line {line!r}")
            last_key = k.decode("ascii", "replace").strip()
            headers[last_key] = v.strip().decode("utf-8", "replace")
        for m in MANDATORY:
            if m not in headers:
                raise ValueError(f"missing mandatory header {m}")
        try:
            clen = int(headers["Content-Length"])
        except ValueError as e:
            raise ValueError("non-integer Content-Length") from e
        if clen < 0 or clen > max_body:
            raise ValueError(f"Content-Length {clen} out of bounds")
        if pos + clen > n:
            raise ValueError("record body past end of file")
        body = plain[pos : pos + clen]
        pos += clen
        if plain[pos : pos + 4] != CRLF + CRLF:
            raise ValueError("missing CRLFCRLF record separator")
        pos += 4
        out.append({"version": version, "headers": headers, "body": body})
    if not out:
        raise ValueError("no WARC records present")
    return out


def parse_http(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """Split an HTTP/1.1 message payload -> (status, headers, body)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("HTTP payload has no header/body separator")
    head_lines = payload[:sep].split(CRLF)
    status_line = head_lines[0].decode("ascii", "replace")
    parts = status_line.split(" ", 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"bad HTTP status line {status_line!r}")
    try:
        status = int(parts[1])
    except ValueError as e:
        raise ValueError(f"bad HTTP status {parts[1]!r}") from e
    headers: dict[str, str] = {}
    for line in head_lines[1:]:
        k, sep2, v = line.partition(b":")
        if not sep2:
            raise ValueError(f"malformed HTTP header {line!r}")
        # RFC 7230 §3.2: field names are case-insensitive; real crawl
        # data carries lowercase names, so normalize to lowercase.
        key = k.decode("ascii", "replace").strip().lower()
        headers[key] = v.strip().decode("utf-8", "replace")
    body = payload[sep + 4 :]
    if "content-length" in headers:
        clen = int(headers["content-length"])
        if clen > len(body):
            raise ValueError("HTTP body shorter than Content-Length")
        body = body[:clen]
    return status, headers, body


def write_warc_gz(records: list[bytes]) -> bytes:
    """Common Crawl layout: each record its own gzip member."""
    return b"".join(gzip_member(r) for r in records)


def extract_responses(
    data: bytes, max_body: int = MAX_BODY_DEFAULT
) -> list[dict]:
    """The crawl-ingestion surface: every `response` record's
    (target_uri, http_status, content_type, body bytes)."""
    out = []
    for rec in parse_records(data, max_body=max_body):
        if rec["headers"].get("WARC-Type") != "response":
            continue
        status, hh, body = parse_http(rec["body"])
        out.append(
            {
                "target_uri": rec["headers"].get("WARC-Target-URI", ""),
                "status": status,
                "content_type": hh.get("content-type", ""),
                "body": body,
            }
        )
    return out
