"""From-scratch Snappy (raw block + xerial stream framing) — pure stdlib.

Round-12: Kafka RecordBatch attribute bits 2. Implemented per the
public format description (google/snappy format_description.txt):

- preamble: uncompressed length as a little-endian base-128 varint;
- elements: tag byte low 2 bits — 00 literal (length-1 in the high 6
  bits, values 60-63 escape to 1-4 little-endian extra length bytes),
  01 copy with 11-bit offset (len 4-11 in bits 2-4, offset high bits
  5-7 + one byte), 10 copy with 2-byte little-endian offset (len
  1 + tag>>2), 11 copy with 4-byte little-endian offset;
- overlapping copies replicate forward, byte-at-a-time semantics.

The Java Kafka client wraps raw snappy in the xerial stream framing
(`\\x82SNAPPY\\x00` + two version ints + length-prefixed chunks) —
`xerial_compress`/`xerial_decompress` implement that envelope, and the
Kafka codec path sniffs the magic so both raw and framed payloads
decode. Cross-validated both directions against pyarrow's independent
snappy (the real C++ library) in tests/test_snappy.py.

Reference parity: the reference's own topic config defaults to
`compression.type=snappy` (internal/pipeline/kafka.go topic configs) —
until now the one codec this repo configured but could not speak.
"""

from __future__ import annotations

import struct

XERIAL_MAGIC = b"\x82SNAPPY\x00"

#: Decompression-bomb guard (same policy as sources/lz4.py).
MAX_OUTPUT_DEFAULT = 1 << 30


def _uvarint(data: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated snappy varint")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy varint too long")


def snappy_decompress(
    src: bytes, max_output: int = MAX_OUTPUT_DEFAULT
) -> bytes:
    """Decode one raw Snappy block. Loud ValueError on truncation, bad
    offsets, length mismatch, or exceeding `max_output`."""
    expected, pos = _uvarint(src, 0)
    if expected > max_output:
        raise ValueError("snappy output exceeds max_output")
    out = bytearray()
    n = len(src)
    while pos < n:
        tag = src[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            length = (tag >> 2) + 1
            if length > 60:
                nbytes = length - 60
                if pos + nbytes > n:
                    raise ValueError("truncated literal length")
                length = (
                    int.from_bytes(src[pos : pos + nbytes], "little") + 1
                )
                pos += nbytes
            if pos + length > n:
                raise ValueError("literal run past end of block")
            out += src[pos : pos + length]
            pos += length
        else:
            if kind == 1:  # 1-byte offset copy
                length = 4 + ((tag >> 2) & 0x07)
                if pos >= n:
                    raise ValueError("truncated copy offset")
                offset = ((tag >> 5) << 8) | src[pos]
                pos += 1
            elif kind == 2:  # 2-byte offset copy
                length = (tag >> 2) + 1
                if pos + 2 > n:
                    raise ValueError("truncated copy offset")
                offset = src[pos] | (src[pos + 1] << 8)
                pos += 2
            else:  # 4-byte offset copy
                length = (tag >> 2) + 1
                if pos + 4 > n:
                    raise ValueError("truncated copy offset")
                (offset,) = struct.unpack_from("<I", src, pos)
                pos += 4
            if offset == 0:
                raise ValueError("zero copy offset is invalid")
            if offset > len(out):
                raise ValueError("copy offset beyond output start")
            if len(out) + length > max_output:
                raise ValueError("snappy output exceeds max_output")
            start = len(out) - offset
            if offset >= length:
                out += out[start : start + length]
            else:  # overlapping: replicate the window
                seg = out[start:]
                reps, rem = divmod(length, offset)
                out += seg * reps + seg[:rem]
        if len(out) > expected:
            raise ValueError(
                f"snappy output {len(out)} exceeds declared {expected}"
            )
    if len(out) != expected:
        raise ValueError(
            f"snappy output {len(out)} != declared {expected}"
        )
    return bytes(out)


def _emit_uvarint(out: bytearray, v: int) -> None:
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def snappy_compress(src: bytes) -> bytes:
    """Greedy hash-table Snappy encoder: 4-byte matches, copy lengths
    up to 64 via 2-byte-offset tags, offsets within 64 KiB (tag 10);
    literals escape per the 60-63 length-byte rule."""
    out = bytearray()
    _emit_uvarint(out, len(src))
    n = len(src)

    def emit_literal(a: int, b: int) -> None:
        nonlocal out
        length = b - a
        while length > 0:
            take = min(length, 1 << 24)
            lm1 = take - 1
            if lm1 < 60:
                out.append(lm1 << 2)
            elif lm1 < (1 << 8):
                out.append(60 << 2)
                out.append(lm1)
            elif lm1 < (1 << 16):
                out.append(61 << 2)
                out += struct.pack("<H", lm1)
            else:
                out.append(62 << 2)
                out += lm1.to_bytes(3, "little")
            out += src[a : a + take]
            a += take
            length -= take

    table: dict[bytes, int] = {}
    anchor = 0
    pos = 0
    while pos + 4 <= n:
        key = src[pos : pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is None or pos - cand > 0xFFFF:
            pos += 1
            continue
        mlen = 4
        maxm = n - pos
        while mlen < maxm and src[cand + mlen] == src[pos + mlen]:
            mlen += 1
        emit_literal(anchor, pos)
        offset = pos - cand
        rem = mlen
        while rem >= 4:
            take = min(rem, 64)
            if rem - take in (1, 2, 3) and take == 64:
                take = rem - 4  # leave a >= 4-byte tail copy
            out.append(((take - 1) << 2) | 2)
            out += struct.pack("<H", offset)
            rem -= take
        if rem:
            emit_literal(pos + mlen - rem, pos + mlen)
        pos += mlen
        anchor = pos
    emit_literal(anchor, n)
    return bytes(out)


def xerial_compress(data: bytes, block_size: int = 32 * 1024) -> bytes:
    """The Java client's SnappyOutputStream framing: magic + version
    pair + [4-byte BE length][raw snappy block] chunks."""
    out = bytearray(XERIAL_MAGIC + struct.pack(">ii", 1, 1))
    for i in range(0, len(data), block_size):
        chunk = snappy_compress(data[i : i + block_size])
        out += struct.pack(">i", len(chunk)) + chunk
    if not data:
        chunk = snappy_compress(b"")
        out += struct.pack(">i", len(chunk)) + chunk
    return bytes(out)


def xerial_decompress(
    data: bytes, max_output: int = MAX_OUTPUT_DEFAULT
) -> bytes:
    if data[: len(XERIAL_MAGIC)] != XERIAL_MAGIC:
        raise ValueError("bad xerial snappy magic")
    pos = len(XERIAL_MAGIC) + 8  # skip version + compat version
    if pos > len(data):
        raise ValueError("truncated xerial header")
    out = bytearray()
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("truncated xerial chunk length")
        (clen,) = struct.unpack_from(">i", data, pos)
        pos += 4
        if clen < 0 or pos + clen > len(data):
            raise ValueError("truncated xerial chunk")
        out += snappy_decompress(
            data[pos : pos + clen], max_output=max_output - len(out)
        )
        pos += clen
    return bytes(out)


def kafka_snappy_decompress(
    data: bytes, max_output: int = MAX_OUTPUT_DEFAULT
) -> bytes:
    """Sniff the framing: Java clients write xerial streams, others
    (librdkafka, this module's own batches) raw blocks."""
    if data[: len(XERIAL_MAGIC)] == XERIAL_MAGIC:
        return xerial_decompress(data, max_output=max_output)
    return snappy_decompress(data, max_output=max_output)
