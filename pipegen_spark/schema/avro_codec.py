"""Pure-Python Avro binary codec (encode + decode, stdlib only).

Implements the Avro 1.x binary encoding — zigzag-varint ints/longs,
little-endian IEEE floats/doubles, length-prefixed bytes/strings, records
as field concatenation, unions as branch-index + value, arrays/maps as
blocked sequences — so the Confluent wire path
(internal/pipeline/producer.go:424-447 BinaryFromNative + header) works
without the spark-avro jar. The reference uses goavro's codec for exactly
this role; this is the spec-conformant Python equivalent.

Logical types are passed through as their underlying primitive (caller
converts), matching goavro's default behavior for the subset the reference
generates.
"""

from __future__ import annotations

import io
import json
import struct

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


class AvroCodecError(ValueError):
    pass


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_varint(buf: io.BytesIO, n: int) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _write_long(buf: io.BytesIO, n: int) -> None:
    _write_varint(buf, _zigzag_encode(n))


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


class _Reader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise AvroCodecError("truncated Avro payload")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            (b,) = self.read(1)
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                return _zigzag_decode(acc)
            shift += 7
            if shift > 70:
                raise AvroCodecError("varint too long")


class AvroCodec:
    """Binary encoder/decoder for one Avro schema (dict or JSON string)."""

    def __init__(self, schema) -> None:
        if isinstance(schema, (str, bytes)):
            schema = json.loads(schema)
        self.schema = schema
        self._named: dict[str, dict] = {}
        self._collect_named(schema)

    # named-type references ("type": "MyRecord") resolve via this registry
    def _collect_named(self, s) -> None:
        if isinstance(s, list):
            for b in s:
                self._collect_named(b)
        elif isinstance(s, dict):
            t = s.get("type")
            if t in ("record", "enum", "fixed") and s.get("name"):
                ns = s.get("namespace", "")
                self._named[s["name"]] = s
                if ns:
                    self._named[f"{ns}.{s['name']}"] = s
            if t == "record":
                for f in s.get("fields", []):
                    self._collect_named(f.get("type"))
            elif t == "array":
                self._collect_named(s.get("items"))
            elif t == "map":
                self._collect_named(s.get("values"))
            elif isinstance(t, (dict, list)):
                self._collect_named(t)

    def _resolve(self, s):
        if isinstance(s, str) and s not in _PRIMITIVES:
            if s in self._named:
                return self._named[s]
            raise AvroCodecError(f"unknown Avro type: {s}")
        if isinstance(s, dict):
            t = s.get("type")
            # {"type": "int", "logicalType": ...} → underlying primitive;
            # {"type": {...}} wrapper → unwrap
            if isinstance(t, str) and t in _PRIMITIVES:
                return t
            if isinstance(t, (dict, list)):
                return self._resolve(t)
            if t in ("record", "enum", "fixed", "array", "map"):
                return s
            if isinstance(t, str):
                return self._resolve(t)
        return s

    # --- encode ---------------------------------------------------------------

    def encode(self, value) -> bytes:
        buf = io.BytesIO()
        self._write(self.schema, value, buf)
        return buf.getvalue()

    def _write(self, schema, value, buf: io.BytesIO) -> None:
        s = self._resolve(schema)
        if isinstance(s, list):
            idx = self._pick_branch(s, value)
            _write_long(buf, idx)
            self._write(s[idx], value, buf)
            return
        if isinstance(s, str):
            self._write_primitive(s, value, buf)
            return
        t = s["type"]
        if t == "record":
            if not isinstance(value, dict):
                raise AvroCodecError(
                    f"record {s.get('name')} needs a dict, got {type(value).__name__}"
                )
            for f in s.get("fields", []):
                if f["name"] not in value and "default" in f:
                    self._write(f["type"], f["default"], buf)
                else:
                    self._write(f["type"], value.get(f["name"]), buf)
        elif t == "enum":
            symbols = s.get("symbols", [])
            try:
                _write_long(buf, symbols.index(value))
            except ValueError:
                raise AvroCodecError(
                    f"{value!r} not in enum {s.get('name')} symbols"
                ) from None
        elif t == "fixed":
            size = int(s.get("size", 0))
            if not isinstance(value, (bytes, bytearray)) or len(value) != size:
                raise AvroCodecError(f"fixed {s.get('name')} needs {size} bytes")
            buf.write(bytes(value))
        elif t == "array":
            items = list(value or [])
            if items:
                _write_long(buf, len(items))
                for it in items:
                    self._write(s.get("items", "string"), it, buf)
            _write_long(buf, 0)
        elif t == "map":
            entries = dict(value or {})
            if entries:
                _write_long(buf, len(entries))
                for k, v in entries.items():
                    _write_bytes(buf, str(k).encode("utf-8"))
                    self._write(s.get("values", "string"), v, buf)
            _write_long(buf, 0)
        else:
            raise AvroCodecError(f"unsupported Avro type: {t!r}")

    def _write_primitive(self, t: str, value, buf: io.BytesIO) -> None:
        if t == "null":
            if value is not None:
                raise AvroCodecError(f"null type got {value!r}")
        elif t == "boolean":
            buf.write(b"\x01" if value else b"\x00")
        elif t in ("int", "long"):
            _write_long(buf, int(value))
        elif t == "float":
            buf.write(struct.pack("<f", float(value)))
        elif t == "double":
            buf.write(struct.pack("<d", float(value)))
        elif t == "bytes":
            _write_bytes(buf, bytes(value))
        elif t == "string":
            _write_bytes(buf, str(value).encode("utf-8"))
        else:
            raise AvroCodecError(f"unknown primitive: {t}")

    def _pick_branch(self, branches: list, value) -> int:
        for i, b in enumerate(branches):
            if self._matches(b, value):
                return i
        raise AvroCodecError(
            f"no union branch in {branches!r} matches {value!r}"
        )

    def _matches(self, schema, value) -> bool:
        s = self._resolve(schema)
        if isinstance(s, str):
            if s == "null":
                return value is None
            if s == "boolean":
                return isinstance(value, bool)
            if s in ("int", "long"):
                return isinstance(value, int) and not isinstance(value, bool)
            if s in ("float", "double"):
                return isinstance(value, (int, float)) and not isinstance(
                    value, bool
                )
            if s == "string":
                return isinstance(value, str)
            if s == "bytes":
                return isinstance(value, (bytes, bytearray))
            return False
        if isinstance(s, list):
            return any(self._matches(b, value) for b in s)
        t = s.get("type")
        if t in ("record", "map"):
            return isinstance(value, dict)
        if t == "array":
            return isinstance(value, (list, tuple))
        if t == "enum":
            return isinstance(value, str) and value in s.get("symbols", [])
        if t == "fixed":
            return isinstance(value, (bytes, bytearray))
        return False

    # --- decode ---------------------------------------------------------------

    def decode(self, data: bytes, pos: int = 0):
        r = _Reader(data, pos)
        out = self._read(self.schema, r)
        return out

    def _read(self, schema, r: _Reader):
        s = self._resolve(schema)
        if isinstance(s, list):
            idx = r.read_long()
            if not 0 <= idx < len(s):
                raise AvroCodecError(f"union branch {idx} out of range")
            return self._read(s[idx], r)
        if isinstance(s, str):
            return self._read_primitive(s, r)
        t = s["type"]
        if t == "record":
            return {
                f["name"]: self._read(f["type"], r)
                for f in s.get("fields", [])
            }
        if t == "enum":
            symbols = s.get("symbols", [])
            idx = r.read_long()
            if not 0 <= idx < len(symbols):
                raise AvroCodecError(f"enum index {idx} out of range")
            return symbols[idx]
        if t == "fixed":
            return r.read(int(s.get("size", 0)))
        if t == "array":
            out = []
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:  # blocked form: negative count + byte size
                    n = -n
                    r.read_long()
                for _ in range(n):
                    out.append(self._read(s.get("items", "string"), r))
        if t == "map":
            out = {}
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.read_long()
                for _ in range(n):
                    k = r.read(r.read_long()).decode("utf-8")
                    out[k] = self._read(s.get("values", "string"), r)
        raise AvroCodecError(f"unsupported Avro type: {t!r}")

    def _read_primitive(self, t: str, r: _Reader):
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1) == b"\x01"
        if t in ("int", "long"):
            return r.read_long()
        if t == "float":
            return struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return r.read(r.read_long())
        if t == "string":
            return r.read(r.read_long()).decode("utf-8")
        raise AvroCodecError(f"unknown primitive: {t}")
