"""WARC container contract (pipegen_spark/sources/warc.py).

Spec-assembled golden bytes (ISO 28500 record grammar hand-written,
never through the writer under test), writer/parser roundtrips over
both layouts (plain concatenation and Common Crawl per-record gzip
members), HTTP payload splitting, and the hostile-bytes contract.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as hst

from pipegen_spark.sources.warc import (
    extract_responses,
    gzip_member,
    parse_http,
    parse_records,
    write_http_response,
    write_record,
    write_warc_gz,
)


def _golden_record() -> bytes:
    """Hand-assembled from the spec: version line, headers (one folded
    continuation), empty line, exactly Content-Length body bytes,
    CRLFCRLF separator."""
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Record-ID: <urn:uuid:golden-1>\r\n"
        b"WARC-Date: 2026-08-16T12:00:00Z\r\n"
        b"WARC-Target-URI: http://example.com/a\r\n"
        b" and-a-folded-continuation\r\n"
        b"Content-Length: 11\r\n"
        b"\r\n"
        b"hello warc!"
        b"\r\n\r\n"
    )


def test_golden_record_parses():
    recs = parse_records(_golden_record())
    assert len(recs) == 1
    r = recs[0]
    assert r["version"] == "WARC/1.0"
    assert r["headers"]["WARC-Type"] == "resource"
    assert r["headers"]["WARC-Target-URI"] == (
        "http://example.com/a and-a-folded-continuation"
    )
    assert r["body"] == b"hello warc!"


def test_golden_gzip_members_and_warc11():
    rec2 = _golden_record().replace(b"WARC/1.0", b"WARC/1.1")
    data = gzip_member(_golden_record()) + gzip_member(rec2)
    recs = parse_records(data)
    assert [r["version"] for r in recs] == ["WARC/1.0", "WARC/1.1"]


def test_mandatory_headers_and_framing_are_loud():
    good = _golden_record()
    with pytest.raises(ValueError, match="version"):
        parse_records(b"WARX/1.0\r\n" + good[10:])
    with pytest.raises(ValueError, match="unsupported WARC version"):
        parse_records(good.replace(b"WARC/1.0", b"WARC/9.9"))
    with pytest.raises(ValueError, match="WARC-Date"):
        parse_records(good.replace(b"WARC-Date", b"X-Date"))
    with pytest.raises(ValueError, match="separator"):
        parse_records(good[:-2])  # drop half the CRLFCRLF
    with pytest.raises(ValueError, match="past end"):
        parse_records(good.replace(b"Content-Length: 11",
                                   b"Content-Length: 9999"))
    with pytest.raises(ValueError, match="no WARC records"):
        parse_records(b"")
    # Content-Length FRAMES the body: binary bodies with embedded
    # CRLFCRLF must survive
    body = b"a\r\n\r\nb" * 3
    rec = write_record("resource", "<u:1>", "2026-08-16T00:00:00Z", body)
    assert parse_records(rec)[0]["body"] == body


def test_http_payload_split():
    payload = write_http_response(301, "Moved", b"see elsewhere",
                                  content_type="text/plain")
    status, headers, body = parse_http(payload)
    assert status == 301
    assert headers["content-type"] == "text/plain"
    assert body == b"see elsewhere"


def test_http_headers_case_insensitive():
    # RFC 7230 §3.2: real crawl data commonly carries lowercase header
    # names — lookups must still find content-type and apply the
    # Content-Length truncation.
    payload = (
        b"HTTP/1.1 200 OK\r\n"
        b"content-type: text/html\r\n"
        b"CONTENT-LENGTH: 5\r\n"
        b"\r\n"
        b"hello-trailing-garbage"
    )
    status, headers, body = parse_http(payload)
    assert status == 200
    assert headers["content-type"] == "text/html"
    assert body == b"hello"
    rec = write_record(
        "response",
        "<u:ci>",
        "2026-08-16T00:00:00Z",
        payload,
        extra_headers={"WARC-Target-URI": "http://x/ci"},
    )
    (resp,) = extract_responses(rec)
    assert resp["content_type"] == "text/html"
    assert resp["body"] == b"hello"
    with pytest.raises(ValueError, match="separator"):
        parse_http(b"HTTP/1.1 200 OK\r\nX: 1")
    with pytest.raises(ValueError, match="status"):
        parse_http(b"FTP 200 OK\r\n\r\n")


def test_extract_responses_skips_non_responses():
    date = "2026-08-16T00:00:00Z"
    recs = [
        write_record("warcinfo", "<u:0>", date, b"software: t\r\n"),
        write_record("request", "<u:1>", date,
                     b"GET / HTTP/1.1\r\nHost: x\r\n\r\n"),
        write_record(
            "response", "<u:2>", date,
            write_http_response(200, "OK", b"<html>x</html>"),
            {"WARC-Target-URI": "http://e.com/"},
        ),
    ]
    out = extract_responses(write_warc_gz(recs))
    assert len(out) == 1
    assert out[0]["target_uri"] == "http://e.com/"
    assert out[0]["status"] == 200 and out[0]["body"] == b"<html>x</html>"


_rec_strategy = hst.tuples(
    hst.sampled_from(["response", "request", "resource", "metadata"]),
    hst.binary(max_size=300),
)


@given(hst.lists(_rec_strategy, min_size=1, max_size=6), hst.booleans())
@settings(max_examples=100)
def test_roundtrip_property(specs, use_gzip):
    date = "2026-08-16T00:00:00Z"
    recs = [
        write_record(t, f"<u:{i}>", date, body)
        for i, (t, body) in enumerate(specs)
    ]
    data = write_warc_gz(recs) if use_gzip else b"".join(recs)
    out = parse_records(data)
    assert len(out) == len(specs)
    for (t, body), r in zip(specs, out):
        assert r["headers"]["WARC-Type"] == t
        assert r["body"] == body


@given(hst.lists(_rec_strategy, min_size=1, max_size=3), hst.data())
@settings(max_examples=150)
def test_prefix_truncation_is_loud_or_prefix(specs, draw):
    """Every cut of a plain WARC stream either raises ValueError or
    (at an exact record boundary) yields a record prefix."""
    date = "2026-08-16T00:00:00Z"
    recs = [
        write_record(t, f"<u:{i}>", date, body)
        for i, (t, body) in enumerate(specs)
    ]
    data = b"".join(recs)
    cut = draw.draw(hst.integers(1, len(data) - 1))
    try:
        out = parse_records(data[:cut])
    except ValueError:
        return
    assert len(out) < len(specs)
    for (t, body), r in zip(specs, out):
        assert r["body"] == body


@given(hst.binary(max_size=200), hst.data())
@settings(max_examples=150)
def test_gzip_corruption_is_loud_or_wellformed(body, draw):
    rec = write_record("resource", "<u:c>", "2026-08-16T00:00:00Z", body)
    data = bytearray(gzip_member(rec))
    pos = draw.draw(hst.integers(0, len(data) - 1))
    data[pos] = draw.draw(hst.integers(0, 255))
    try:
        out = parse_records(bytes(data))
    except ValueError:
        return
    assert out[0]["body"] == body  # gzip CRC caught everything else
