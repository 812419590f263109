"""From-scratch LZ4 (block + frame formats) and xxHash32 — pure stdlib.

Round-12 (r11 VERDICT task 3): Kafka's default producer compression in
the wild is lz4, and the v2 RecordBatch codec (`sources/kafka_wire.py`)
honored the attribute bits but raised on codec 3 — a Fetch from an
in-the-wild topic failed at the first compressed batch. This module
implements the two public specifications end to end:

- LZ4 **block** format (lz4_Block_format.md): token byte with 4-bit
  literal/match-length nibbles, 255-extension bytes, little-endian
  16-bit match offsets into the previous 64 KiB, overlapping matches
  (offset < length replicates the window — the RLE trick), minimum
  match 4, and the encoder end-of-block restrictions (last 5 bytes are
  literals; the last match starts >= 12 bytes before the end).
- LZ4 **frame** format (lz4_Frame_format.md v1.6.x): magic 0x184D2204,
  FLG/BD descriptor + xxHash32 header checksum byte, independent data
  blocks with the high-bit "stored uncompressed" escape, optional
  per-block and whole-content xxHash32 checksums, the 0x00000000 end
  mark, and skippable frames (magic 0x184D2A50..5F).
- **xxHash32** (xxhash_spec.md): the 4-lane stripe loop, convergence
  rotations 1/7/12/18, the 4-byte/1-byte tails, and the avalanche —
  pinned in tests against the published empty-input vector 0x02CC5D05.

Kafka framing note (KIP-57): message format v0 shipped a broken frame
header checksum (it hashed the magic too); magic >= 1 — including every
magic-2 RecordBatch — uses the frame format exactly as specified, which
is what this module speaks. zstd (codec 4) remains a named boundary:
its FSE/huffman entropy stage is out of pure-stdlib scope.

Reference parity: the reference delegates compression entirely to the
broker/client libraries inside its compose stack (docker-compose.yml);
this repo implements the bytes so the jar-free broker smoke can carry
codec-3 batches.
"""

from __future__ import annotations

import struct

_MASK32 = 0xFFFFFFFF
_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393

FRAME_MAGIC = 0x184D2204
_SKIPPABLE_LO = 0x184D2A50
_SKIPPABLE_HI = 0x184D2A5F

#: Hard ceiling for a single decompressed block/frame (decompression-bomb
#: guard): a 4 MiB frame block legally expands ~255x per token chain, so
#: cap at 1 GiB unless the caller raises it explicitly.
MAX_OUTPUT_DEFAULT = 1 << 30


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 exactly per the published spec (xxhash_spec.md)."""
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _MASK32
        v2 = (seed + _P2) & _MASK32
        v3 = seed & _MASK32
        v4 = (seed - _P1) & _MASK32
        end = n - 16
        while pos <= end:
            l1, l2, l3, l4 = struct.unpack_from("<IIII", data, pos)
            v1 = (_rotl32((v1 + l1 * _P2) & _MASK32, 13) * _P1) & _MASK32
            v2 = (_rotl32((v2 + l2 * _P2) & _MASK32, 13) * _P1) & _MASK32
            v3 = (_rotl32((v3 + l3 * _P2) & _MASK32, 13) * _P1) & _MASK32
            v4 = (_rotl32((v4 + l4 * _P2) & _MASK32, 13) * _P1) & _MASK32
            pos += 16
        h = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)
        ) & _MASK32
    else:
        h = (seed + _P5) & _MASK32
    h = (h + n) & _MASK32
    while pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        h = (_rotl32((h + lane * _P3) & _MASK32, 17) * _P4) & _MASK32
        pos += 4
    while pos < n:
        h = (_rotl32((h + data[pos] * _P5) & _MASK32, 11) * _P1) & _MASK32
        pos += 1
    h ^= h >> 15
    h = (h * _P2) & _MASK32
    h ^= h >> 13
    h = (h * _P3) & _MASK32
    h ^= h >> 16
    return h


# --- block format ---------------------------------------------------------------


def lz4_block_decompress(
    src: bytes,
    max_output: int = MAX_OUTPUT_DEFAULT,
    history: bytes = b"",
) -> bytes:
    """Decode one raw LZ4 block. `history` is the up-to-64 KiB window of
    previously decoded frame output that match offsets may reach into
    (linked-blocks mode, frame FLG bit 5 clear); only the NEW bytes are
    returned. Raises ValueError on truncation, zero/out-of-window
    offsets, or new output exceeding `max_output`."""
    out = bytearray(history)
    base = len(history)
    pos = 0
    n = len(src)
    if n == 0:
        raise ValueError("empty lz4 block")
    while pos < n:
        token = src[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated literal length")
                b = src[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            raise ValueError("literal run past end of block")
        if len(out) - base + lit > max_output:
            raise ValueError("lz4 output exceeds max_output")
        out += src[pos : pos + lit]
        pos += lit
        if pos == n:
            break  # last sequence is literals-only per the spec
        if pos + 2 > n:
            raise ValueError("truncated match offset")
        offset = src[pos] | (src[pos + 1] << 8)
        pos += 2
        if offset == 0:
            raise ValueError("zero match offset is invalid")
        if offset > len(out):
            raise ValueError("match offset beyond output start")
        mlen = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated match length")
                b = src[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        if len(out) - base + mlen > max_output:
            raise ValueError("lz4 output exceeds max_output")
        start = len(out) - offset
        if offset >= mlen:
            out += out[start : start + mlen]
        else:
            # Overlapping match: the copied region grows as it is
            # written (the spec's byte-at-a-time semantics) — replicate
            # the `offset`-byte window.
            seg = out[start:]
            reps, rem = divmod(mlen, offset)
            out += seg * reps + seg[:rem]
    return bytes(out[base:])


def _emit_length(out: bytearray, extra: int) -> None:
    while extra >= 255:
        out.append(255)
        extra -= 255
    out.append(extra)


def lz4_block_compress(src: bytes) -> bytes:
    """Greedy hash-table LZ4 block encoder: min match 4, offsets within
    64 KiB, last 5 bytes literal, last match ends >= 12 bytes before the
    block end (both spec end-of-block restrictions)."""
    n = len(src)
    if n == 0:
        return b"\x00"  # token with zero literals, no match
    out = bytearray()
    table: dict[bytes, int] = {}
    anchor = 0
    pos = 0
    # A match must start at least 12 bytes before end AND leave the last
    # 5 bytes as literals.
    match_limit = n - 12
    while pos <= match_limit:
        key = src[pos : pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is None or pos - cand > 0xFFFF:
            pos += 1
            continue
        mlen = 4
        max_mlen = (n - 5) - pos
        while mlen < max_mlen and src[cand + mlen] == src[pos + mlen]:
            mlen += 1
        lit = pos - anchor
        token_lit = min(lit, 15)
        token_mat = min(mlen - 4, 15)
        out.append((token_lit << 4) | token_mat)
        if lit >= 15:
            _emit_length(out, lit - 15)
        out += src[anchor:pos]
        out += struct.pack("<H", pos - cand)
        if mlen - 4 >= 15:
            _emit_length(out, mlen - 4 - 15)
        pos += mlen
        anchor = pos
    # Final literals-only sequence.
    lit = n - anchor
    out.append(min(lit, 15) << 4)
    if lit >= 15:
        _emit_length(out, lit - 15)
    out += src[anchor:]
    return bytes(out)


# --- frame format ---------------------------------------------------------------

#: BD block-max-size codes (bits 6-4) per the frame spec.
_BD_SIZES = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def lz4_frame_compress(
    data: bytes,
    *,
    block_max: int = 4,
    content_checksum: bool = True,
    block_checksum: bool = False,
) -> bytes:
    """One LZ4 frame: descriptor (version 01, independent blocks), data
    blocks (stored uncompressed when compression does not shrink them,
    per the high-bit escape), end mark, optional content checksum."""
    if block_max not in _BD_SIZES:
        raise ValueError(f"BD block-max code must be 4..7, got {block_max}")
    flg = 0x40 | 0x20  # version 01, block independence
    if block_checksum:
        flg |= 0x10
    if content_checksum:
        flg |= 0x04
    bd = block_max << 4
    descriptor = bytes([flg, bd])
    hc = (xxh32(descriptor) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", FRAME_MAGIC) + descriptor + bytes([hc]))
    bsize = _BD_SIZES[block_max]
    for i in range(0, len(data), bsize):
        chunk = data[i : i + bsize]
        comp = lz4_block_compress(chunk)
        if len(comp) < len(chunk):
            stored = comp
            out += struct.pack("<I", len(comp))
        else:
            stored = chunk
            out += struct.pack("<I", len(chunk) | 0x80000000)
        out += stored
        if block_checksum:
            out += struct.pack("<I", xxh32(stored))
    out += struct.pack("<I", 0)  # end mark
    if content_checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)


def lz4_frame_decompress(
    data: bytes, max_output: int = MAX_OUTPUT_DEFAULT
) -> bytes:
    """Decode one or more concatenated LZ4 frames (skippable frames are
    skipped, per spec). Validates the header-checksum byte, every
    enabled block checksum, and the content checksum. Raises ValueError
    on any truncation or mismatch."""
    out = bytearray()
    pos = 0
    n = len(data)
    saw_frame = False
    while pos < n:
        if pos + 4 > n:
            raise ValueError("truncated frame magic")
        (magic,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
            if pos + 4 > n:
                raise ValueError("truncated skippable frame size")
            (skip,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if pos + skip > n:
                raise ValueError("truncated skippable frame body")
            pos += skip
            continue
        if magic != FRAME_MAGIC:
            raise ValueError(f"bad lz4 frame magic 0x{magic:08X}")
        saw_frame = True
        if pos + 3 > n:
            raise ValueError("truncated frame descriptor")
        flg = data[pos]
        bd = data[pos + 1]
        if (flg >> 6) != 0b01:
            raise ValueError(f"unsupported frame version {flg >> 6}")
        independent = bool(flg & 0x20)
        has_bchk = bool(flg & 0x10)
        has_csize = bool(flg & 0x08)
        has_cchk = bool(flg & 0x04)
        has_dict = bool(flg & 0x01)
        if flg & 0x02:
            raise ValueError("reserved FLG bit set")
        bmax_code = (bd >> 4) & 0x07
        if bmax_code not in _BD_SIZES or (bd & 0x8F):
            raise ValueError(f"bad BD byte 0x{bd:02X}")
        desc_end = pos + 2 + (8 if has_csize else 0) + (4 if has_dict else 0)
        if desc_end + 1 > n:
            raise ValueError("truncated frame descriptor")
        descriptor = data[pos:desc_end]
        hc = data[desc_end]
        if ((xxh32(descriptor) >> 8) & 0xFF) != hc:
            raise ValueError("frame descriptor checksum mismatch")
        content_size = None
        if has_csize:
            (content_size,) = struct.unpack_from("<Q", data, pos + 2)
        pos = desc_end + 1
        frame_out_start = len(out)
        bsize = _BD_SIZES[bmax_code]
        while True:
            if pos + 4 > n:
                raise ValueError("truncated block size")
            (bword,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if bword == 0:
                break  # end mark
            stored_len = bword & 0x7FFFFFFF
            is_stored = bool(bword & 0x80000000)
            if pos + stored_len > n:
                raise ValueError("truncated block body")
            block = data[pos : pos + stored_len]
            pos += stored_len
            if has_bchk:
                if pos + 4 > n:
                    raise ValueError("truncated block checksum")
                (bchk,) = struct.unpack_from("<I", data, pos)
                pos += 4
                if xxh32(block) != bchk:
                    raise ValueError("block checksum mismatch")
            if is_stored:
                plain = block
            else:
                # Linked-blocks mode (FLG bit 5 clear, what pyarrow and
                # the lz4 CLI emit by default): match offsets reach up
                # to 64 KiB into the frame's previously decoded output.
                hist = (
                    b""
                    if independent
                    else bytes(out[max(frame_out_start, len(out) - 65536) :])
                )
                plain = lz4_block_decompress(
                    block,
                    max_output=min(bsize, max_output - len(out)),
                    history=hist,
                )
            if len(plain) > bsize:
                raise ValueError("block exceeds declared block-max size")
            if len(out) + len(plain) > max_output:
                raise ValueError("lz4 output exceeds max_output")
            out += plain
        if has_cchk:
            if pos + 4 > n:
                raise ValueError("truncated content checksum")
            (cchk,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if xxh32(bytes(out[frame_out_start:])) != cchk:
                raise ValueError("content checksum mismatch")
        if content_size is not None and (
            len(out) - frame_out_start
        ) != content_size:
            raise ValueError("content size mismatch")
    if not saw_frame:
        raise ValueError("no lz4 frame present")
    return bytes(out)
