"""From-scratch Zstandard DECODER (RFC 8878) + compressing encoder.

Round-12: the last Kafka RecordBatch codec (attribute bits 4). zstd's
entropy stage (FSE + canonical Huffman) was the repo's one remaining
"named boundary" among the wire codecs; this module implements the
full decode path from the public spec:

- frames: magic 0xFD2FB528, frame-header descriptor (single-segment,
  content-size field sizes 0/1/2/4/8, window descriptor, content
  checksum), skippable frames (the 0x184D2A5x family zstd shares with
  lz4), xxHash64 content checksum (low 32 bits);
- blocks: raw / RLE / compressed, last-block flag, 21-bit sizes;
- literals: raw / RLE / Huffman-compressed / treeless (table reuse),
  1-stream and 4-stream forms with the 6-byte jump table;
- Huffman: direct 4-bit weights AND FSE-compressed weights (two
  interleaved states over a backward bitstream), implied last weight,
  canonical table fill in (weight, symbol) order;
- FSE: full table-description parse (variable-bit probability read
  with the low-threshold trick, -1 "less-than-one" probabilities,
  zero-repeat flags), the spec's position-spread, and decode-table
  construction (nbBits = accuracy - highbit(x), baseline wraparound);
- sequences: predefined / RLE / FSE-compressed / repeat table modes
  for literal-length, offset, and match-length codes; the three
  interleaved states over one backward bitstream; the spec's
  LL/ML/OF baseline+extra-bit tables; the three-slot repeat-offset
  cache with the litLength==0 rotation and the rep1-1 special case;
- execution: literal copies + overlapping match copies, bounded by a
  decompression-bomb guard (`max_output`).

Dictionaries (nonzero Dictionary_ID) raise — a named boundary; Kafka
producers don't use them.

The ENCODER side (r13, `zstd_compress` — closing r12's declared
boundary): greedy-LZ77 match finding + RAW literals + the SEQUENCES
section entropy-coded with the predefined FSE distributions, falling
back to raw blocks when a block doesn't shrink; `zstd_compress_store`
remains the raw-block envelope. Huffman-COMPRESSED literals stay a
named encode boundary (a serialized tree for marginal gain — Kafka
batch payloads compress in their match structure), decode-side Huffman
is of course complete. Both directions are cross-validated against
pyarrow's independent zstd (the reference C library): decode across
levels 1..22 and every entropy path, encode by decompressing our
frames in libzstd (tests/test_zstd.py).
"""

from __future__ import annotations

import struct

ZSTD_MAGIC = 0xFD2FB528
_SKIPPABLE_LO = 0x184D2A50
_SKIPPABLE_HI = 0x184D2A5F

MAX_OUTPUT_DEFAULT = 1 << 30

_P64_1 = 11400714785074694791
_P64_2 = 14029467366897019727
_P64_3 = 1609587929392839161
_P64_4 = 9650029242287828579
_P64_5 = 2870177450012600261
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """xxHash64 per the published spec (empty-input vector
    0xEF46DB3751D8E999 pinned in tests). zstd's content checksum is
    the low 32 bits of this with seed 0."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P64_1 + _P64_2) & _M64
        v2 = (seed + _P64_2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P64_1) & _M64
        end = n - 32
        while pos <= end:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, pos)
            v1 = (_rotl64((v1 + l1 * _P64_2) & _M64, 31) * _P64_1) & _M64
            v2 = (_rotl64((v2 + l2 * _P64_2) & _M64, 31) * _P64_1) & _M64
            v3 = (_rotl64((v3 + l3 * _P64_2) & _M64, 31) * _P64_1) & _M64
            v4 = (_rotl64((v4 + l4 * _P64_2) & _M64, 31) * _P64_1) & _M64
            pos += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12)
            + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _P64_2) & _M64, 31) * _P64_1) & _M64
            h = (h * _P64_1 + _P64_4) & _M64
    else:
        h = (seed + _P64_5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, pos)
        k = (_rotl64((lane * _P64_2) & _M64, 31) * _P64_1) & _M64
        h = ((_rotl64(h ^ k, 27) * _P64_1) + _P64_4) & _M64
        pos += 8
    if pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        h = ((_rotl64(h ^ ((lane * _P64_1) & _M64), 23) * _P64_2) + _P64_3) & _M64
        pos += 4
    while pos < n:
        h = (_rotl64(h ^ ((data[pos] * _P64_5) & _M64), 11) * _P64_1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h


# --- bitstreams ------------------------------------------------------------------


class _BackBits:
    """zstd's backward bitstream: bytes are read last-to-first; the
    last byte's highest set bit is a padding sentinel."""

    __slots__ = ("val", "pos")

    def __init__(self, data: bytes) -> None:
        if not data:
            raise ValueError("empty zstd bitstream")
        if data[-1] == 0:
            raise ValueError("zstd bitstream missing sentinel bit")
        self.val = int.from_bytes(data, "little")
        self.pos = (len(data) - 1) * 8 + data[-1].bit_length() - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if n > self.pos:
            raise ValueError("zstd bitstream over-read")
        self.pos -= n
        return (self.val >> self.pos) & ((1 << n) - 1)

    def read_padded(self, n: int) -> int:
        """Read up to n bits; missing low bits are zero (legal at the
        very end of Huffman streams per the spec)."""
        if n <= self.pos:
            return self.read(n)
        have = self.pos
        v = (self.val & ((1 << have) - 1)) << (n - have) if have else 0
        self.pos = 0
        return v

    def peek_padded(self, n: int) -> int:
        if n <= self.pos:
            return (self.val >> (self.pos - n)) & ((1 << n) - 1)
        have = self.pos
        return (self.val & ((1 << have) - 1)) << (n - have) if have else 0

    def consume(self, n: int) -> None:
        self.pos = 0 if n > self.pos else self.pos - n


class _FwdBits:
    """Forward little-endian bit reader (FSE table descriptions)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bitpos = 0

    def read(self, n: int) -> int:
        end = self.bitpos + n
        if end > len(self.data) * 8:
            raise ValueError("FSE table description over-read")
        out = 0
        got = 0
        pos = self.bitpos
        while got < n:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(n - got, avail)
            out |= ((byte >> (pos & 7)) & ((1 << take) - 1)) << got
            got += take
            pos += take
        self.bitpos = end
        return out

    def unread(self, n: int) -> None:
        self.bitpos -= n

    def byte_len(self) -> int:
        return (self.bitpos + 7) >> 3


# --- FSE --------------------------------------------------------------------------


def _fse_read_probs(
    fwd: _FwdBits, max_symbol: int, max_accuracy: int
) -> tuple[int, list[int]]:
    """Parse an FSE table description -> (accuracy_log, probabilities)
    with -1 for 'less than one' symbols (RFC 8878 §4.1.1)."""
    accuracy_log = fwd.read(4) + 5
    if accuracy_log > max_accuracy:
        raise ValueError(
            f"FSE accuracy {accuracy_log} exceeds max {max_accuracy}"
        )
    remaining = (1 << accuracy_log) + 1
    threshold = 1 << accuracy_log
    nb_bits = accuracy_log + 1
    probs: list[int] = []
    while remaining > 1:
        if len(probs) > max_symbol:
            raise ValueError("FSE table has too many symbols")
        maxv = (2 * threshold - 1) - remaining
        v = fwd.read(nb_bits)
        if (v & (threshold - 1)) < maxv:
            fwd.unread(1)
            count = v & (threshold - 1)
        else:
            if v >= threshold:
                v -= maxv
            count = v
        count -= 1  # shift: stored value 0 means probability -1
        remaining -= -count if count < 0 else count
        probs.append(count)
        if count == 0:
            while True:
                rep = fwd.read(2)
                probs.extend([0] * rep)
                if rep != 3:
                    break
        while remaining > 1 and remaining < threshold:
            nb_bits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("FSE probabilities exceed table size")
    return accuracy_log, probs


def _fse_build_table(
    accuracy_log: int, probs: list[int]
) -> list[tuple[int, int, int]]:
    """-> [(symbol, nb_bits, baseline)] of size 1 << accuracy_log."""
    size = 1 << accuracy_log
    cells: list[int] = [-1] * size
    lows = [s for s, p in enumerate(probs) if p == -1]
    hpos = size - 1
    for s in lows:
        cells[hpos] = s
        hpos -= 1
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    for s, p in enumerate(probs):
        if p <= 0:
            continue
        for _ in range(p):
            cells[pos] = s
            pos = (pos + step) & mask
            while pos > hpos:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("corrupt FSE table spread")
    nxt = [1 if p == -1 else p for p in probs]
    out: list[tuple[int, int, int]] = []
    for i in range(size):
        s = cells[i]
        if s < 0:
            raise ValueError("unfilled FSE cell")
        x = nxt[s]
        nxt[s] += 1
        nb = accuracy_log - (x.bit_length() - 1)
        out.append((s, nb, (x << nb) - size))
    return out


def _fse_rle_table(symbol: int) -> list[tuple[int, int, int]]:
    return [(symbol, 0, 0)]


# --- Huffman ----------------------------------------------------------------------


def _huf_table_from_weights(
    weights: list[int],
) -> tuple[list[tuple[int, int]], int]:
    """Explicit weights (last one implied) -> (decode table of
    (symbol, nb_bits) with 2^max_bits entries, max_bits)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("huffman weights sum to zero")
    next_pow2 = 1 << total.bit_length() if total & (total - 1) else total
    if total & (total - 1):
        rest = next_pow2 - total
    else:
        # already a power of two would leave no room for the implied
        # last symbol — the spec guarantees rest > 0
        next_pow2 <<= 1
        rest = next_pow2 - total
    if rest & (rest - 1):
        raise ValueError("huffman weights leave a non-power-of-2 gap")
    last_weight = rest.bit_length()  # 2^(w-1) == rest
    all_weights = weights + [last_weight]
    max_bits = (total + rest).bit_length() - 1
    table: list[tuple[int, int]] = [(-1, 0)] * (1 << max_bits)
    pos = 0
    for w in range(1, max_bits + 1):
        for sym, sw in enumerate(all_weights):
            if sw != w:
                continue
            span = 1 << (w - 1)
            nb = max_bits + 1 - w
            for _ in range(span):
                table[pos] = (sym, nb)
                pos += 1
    if pos != len(table):
        raise ValueError("huffman table not fully populated")
    return table, max_bits


def _read_huffman_tree(
    data: bytes, pos: int
) -> tuple[list[tuple[int, int]], int, int]:
    """Parse a Huffman_Tree_Description -> (table, max_bits, new pos)."""
    if pos >= len(data):
        raise ValueError("truncated huffman tree header")
    h = data[pos]
    pos += 1
    if h >= 128:  # direct representation: 4-bit weights
        n = h - 127
        nbytes = (n + 1) >> 1
        if pos + nbytes > len(data):
            raise ValueError("truncated huffman weights")
        weights = []
        for i in range(n):
            byte = data[pos + (i >> 1)]
            weights.append((byte >> 4) if i % 2 == 0 else (byte & 0x0F))
        pos += nbytes
    else:  # FSE-compressed weights, h = compressed size
        if pos + h > len(data):
            raise ValueError("truncated FSE-compressed huffman weights")
        comp = data[pos : pos + h]
        pos += h
        fwd = _FwdBits(comp)
        alog, probs = _fse_read_probs(fwd, max_symbol=255, max_accuracy=6)
        table = _fse_build_table(alog, probs)
        bits = _BackBits(comp[fwd.byte_len() :])
        s1 = bits.read(alog)
        s2 = bits.read(alog)
        weights = []
        while True:
            sym, nb, base = table[s1]
            weights.append(sym)
            if len(weights) > 256:
                raise ValueError("huffman weight stream runaway")
            if nb > bits.pos:
                # s1 exhausted the stream: flush the other state, done
                weights.append(table[s2][0])
                break
            s1 = base + bits.read(nb)
            s1, s2 = s2, s1
    if any(w > 11 for w in weights):
        raise ValueError("huffman weight exceeds 11")
    htable, max_bits = _huf_table_from_weights(weights)
    return htable, max_bits, pos


def _huf_decode_stream(
    data: bytes, table: list[tuple[int, int]], max_bits: int, n_out: int
) -> bytearray:
    bits = _BackBits(data)
    out = bytearray()
    for _ in range(n_out):
        idx = bits.peek_padded(max_bits)
        sym, nb = table[idx]
        if sym < 0:
            raise ValueError("invalid huffman code")
        bits.consume(nb)
        out.append(sym)
    return out


# --- sequence code tables (RFC 8878 §3.1.1.3.2.1) ----------------------------------

_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [0] * 16 + [
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]
_ML_BASE = list(range(3, 35)) + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [0] * 32 + [
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]

#: Predefined (default) distributions, verbatim from the RFC.
_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
     2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1],
    5,
)

_MAX_ACC = {"ll": 9, "of": 8, "ml": 9}
_MAX_SYM = {"ll": 35, "of": 31, "ml": 52}


class _FrameState:
    """Per-frame table reuse: treeless literals + repeat FSE modes."""

    def __init__(self) -> None:
        self.huf: tuple[list[tuple[int, int]], int] | None = None
        self.fse: dict[str, tuple[list[tuple[int, int, int]], int]] = {}
        self.reps = [1, 4, 8]


def _read_seq_table(
    data: bytes, pos: int, mode: int, kind: str, state: _FrameState
) -> tuple[tuple[list[tuple[int, int, int]], int], int]:
    """One Symbol_Compression_Mode's table -> ((table, accuracy), pos)."""
    if mode == 0:  # predefined
        probs, alog = {
            "ll": _LL_DEFAULT, "of": _OF_DEFAULT, "ml": _ML_DEFAULT
        }[kind]
        tbl = (_fse_build_table(alog, list(probs)), alog)
    elif mode == 1:  # RLE: one byte, zero-bit state machine
        if pos >= len(data):
            raise ValueError("truncated RLE sequence table")
        sym = data[pos]
        pos += 1
        if sym > _MAX_SYM[kind]:
            raise ValueError(f"{kind} RLE symbol {sym} out of range")
        tbl = (_fse_rle_table(sym), 0)
    elif mode == 2:  # FSE-compressed description
        fwd = _FwdBits(data[pos:])
        alog, probs = _fse_read_probs(
            fwd, max_symbol=_MAX_SYM[kind], max_accuracy=_MAX_ACC[kind]
        )
        pos += fwd.byte_len()
        tbl = (_fse_build_table(alog, probs), alog)
    else:  # repeat
        if kind not in state.fse:
            raise ValueError(f"repeat mode with no previous {kind} table")
        tbl = state.fse[kind]
    state.fse[kind] = tbl
    return tbl, pos


def _decode_literals(
    block: bytes, pos: int, state: _FrameState
) -> tuple[bytes, int]:
    if pos >= len(block):
        raise ValueError("truncated literals section")
    b0 = block[pos]
    ltype = b0 & 0x03
    size_format = (b0 >> 2) & 0x03
    if ltype in (0, 1):  # raw / RLE
        if size_format in (0, 2):
            regen = b0 >> 3
            pos += 1
        elif size_format == 1:
            if pos + 2 > len(block):
                raise ValueError("truncated literals header")
            regen = (b0 >> 4) | (block[pos + 1] << 4)
            pos += 2
        else:
            if pos + 3 > len(block):
                raise ValueError("truncated literals header")
            regen = (b0 >> 4) | (block[pos + 1] << 4) | (
                block[pos + 2] << 12
            )
            pos += 3
        if ltype == 0:
            if pos + regen > len(block):
                raise ValueError("raw literals past block end")
            return block[pos : pos + regen], pos + regen
        if pos >= len(block):
            raise ValueError("truncated RLE literal byte")
        return bytes([block[pos]]) * regen, pos + 1
    # compressed (2) / treeless (3)
    if size_format == 0:
        streams = 1
        if pos + 3 > len(block):
            raise ValueError("truncated literals header")
        v = b0 | (block[pos + 1] << 8) | (block[pos + 2] << 16)
        regen = (v >> 4) & 0x3FF
        comp = (v >> 14) & 0x3FF
        pos += 3
    elif size_format == 1:
        streams = 4
        if pos + 3 > len(block):
            raise ValueError("truncated literals header")
        v = b0 | (block[pos + 1] << 8) | (block[pos + 2] << 16)
        regen = (v >> 4) & 0x3FF
        comp = (v >> 14) & 0x3FF
        pos += 3
    elif size_format == 2:
        streams = 4
        if pos + 4 > len(block):
            raise ValueError("truncated literals header")
        v = (
            b0 | (block[pos + 1] << 8) | (block[pos + 2] << 16)
            | (block[pos + 3] << 24)
        )
        regen = (v >> 4) & 0x3FFF
        comp = (v >> 18) & 0x3FFF
        pos += 4
    else:
        streams = 4
        if pos + 5 > len(block):
            raise ValueError("truncated literals header")
        v = int.from_bytes(block[pos : pos + 5], "little")
        regen = (v >> 4) & 0x3FFFF
        comp = (v >> 22) & 0x3FFFF
        pos += 5
    end = pos + comp
    if end > len(block):
        raise ValueError("compressed literals past block end")
    body = block[pos:end]
    bpos = 0
    if ltype == 2:
        table, max_bits, bpos = _read_huffman_tree(body, 0)
        state.huf = (table, max_bits)
    else:
        if state.huf is None:
            raise ValueError("treeless literals with no previous table")
        table, max_bits = state.huf
    body = body[bpos:]
    if streams == 1:
        out = _huf_decode_stream(body, table, max_bits, regen)
    else:
        if len(body) < 6:
            raise ValueError("missing 4-stream jump table")
        s1, s2, s3 = struct.unpack_from("<HHH", body, 0)
        rest = body[6:]
        if s1 + s2 + s3 > len(rest):
            raise ValueError("jump table exceeds literal payload")
        parts = [
            rest[:s1],
            rest[s1 : s1 + s2],
            rest[s1 + s2 : s1 + s2 + s3],
            rest[s1 + s2 + s3 :],
        ]
        per = (regen + 3) >> 2
        sizes = [per, per, per, regen - 3 * per]
        if sizes[3] < 0:
            raise ValueError("regenerated size too small for 4 streams")
        out = bytearray()
        for part, sz in zip(parts, sizes):
            out += _huf_decode_stream(part, table, max_bits, sz)
    return bytes(out), end


def _decode_sequences(
    block: bytes, pos: int, literals: bytes, out: bytearray,
    state: _FrameState, max_output: int, frame_start: int = 0,
) -> None:
    """Parse + execute the sequences section, appending to `out`."""
    if pos >= len(block):
        raise ValueError("truncated sequences section")
    b0 = block[pos]
    pos += 1
    if b0 == 0:
        if len(out) + len(literals) > max_output:
            raise ValueError("zstd output exceeds max_output")
        out += literals
        return
    if b0 < 128:
        nseq = b0
    elif b0 < 255:
        if pos >= len(block):
            raise ValueError("truncated sequence count")
        nseq = ((b0 - 128) << 8) + block[pos]
        pos += 1
    else:
        if pos + 2 > len(block):
            raise ValueError("truncated sequence count")
        nseq = block[pos] + (block[pos + 1] << 8) + 0x7F00
        pos += 2
    if pos >= len(block):
        raise ValueError("truncated compression modes byte")
    modes = block[pos]
    pos += 1
    if modes & 0x03:
        raise ValueError("reserved sequence mode bits set")
    (ll_tbl, ll_log), pos = _read_seq_table(
        block, pos, (modes >> 6) & 3, "ll", state
    )
    (of_tbl, of_log), pos = _read_seq_table(
        block, pos, (modes >> 4) & 3, "of", state
    )
    (ml_tbl, ml_log), pos = _read_seq_table(
        block, pos, (modes >> 2) & 3, "ml", state
    )
    bits = _BackBits(block[pos:])
    ll_state = bits.read(ll_log)
    of_state = bits.read(of_log)
    ml_state = bits.read(ml_log)
    lit_pos = 0
    for i in range(nseq):
        ll_code = ll_tbl[ll_state][0]
        of_code = of_tbl[of_state][0]
        ml_code = ml_tbl[ml_state][0]
        if ll_code > 35 or ml_code > 52 or of_code > 31:
            raise ValueError("sequence code out of range")
        offset_value = (1 << of_code) + bits.read(of_code)
        mlen = _ML_BASE[ml_code] + bits.read(_ML_BITS[ml_code])
        llen = _LL_BASE[ll_code] + bits.read(_LL_BITS[ll_code])
        # repeat-offset cache (RFC 8878 §3.1.1.5)
        reps = state.reps
        if offset_value > 3:
            offset = offset_value - 3
            state.reps = [offset, reps[0], reps[1]]
        else:
            idx = offset_value - 1 if llen != 0 else offset_value
            if idx == 0:
                offset = reps[0]
            elif idx == 1:
                offset = reps[1]
                state.reps = [reps[1], reps[0], reps[2]]
            elif idx == 2:
                offset = reps[2]
                state.reps = [reps[2], reps[0], reps[1]]
            else:  # llen == 0 and offset_value == 3
                offset = reps[0] - 1
                if offset == 0:
                    raise ValueError("repeat offset underflow")
                state.reps = [offset, reps[0], reps[1]]
        if lit_pos + llen > len(literals):
            raise ValueError("sequence literal run past literals")
        if len(out) + llen + mlen > max_output:
            raise ValueError("zstd output exceeds max_output")
        out += literals[lit_pos : lit_pos + llen]
        lit_pos += llen
        if offset > len(out) - frame_start:
            raise ValueError("match offset beyond frame start")
        start = len(out) - offset
        if offset >= mlen:
            out += out[start : start + mlen]
        else:
            seg = out[start:]
            q, r = divmod(mlen, offset)
            out += seg * q + seg[:r]
        if i < nseq - 1:  # final states are not updated (spec)
            ll_state = ll_tbl[ll_state][2] + bits.read(ll_tbl[ll_state][1])
            ml_state = ml_tbl[ml_state][2] + bits.read(ml_tbl[ml_state][1])
            of_state = of_tbl[of_state][2] + bits.read(of_tbl[of_state][1])
    if bits.pos != 0:
        raise ValueError(f"{bits.pos} unconsumed sequence bits")
    rest = literals[lit_pos:]
    if len(out) + len(rest) > max_output:
        raise ValueError("zstd output exceeds max_output")
    out += rest


def zstd_decompress(
    data: bytes, max_output: int = MAX_OUTPUT_DEFAULT
) -> bytes:
    """Decode one or more concatenated zstd frames (+ skippable)."""
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
        if magic != ZSTD_MAGIC:
            raise ValueError(f"bad zstd magic 0x{magic:08X}")
        saw_frame = True
        if pos >= n:
            raise ValueError("truncated frame header descriptor")
        fhd = data[pos]
        pos += 1
        if fhd & 0x08:
            raise ValueError("reserved frame header bit set")
        dict_flag = fhd & 0x03
        has_checksum = bool(fhd & 0x04)
        single_segment = bool(fhd & 0x20)
        fcs_flag = fhd >> 6
        if not single_segment:
            if pos >= n:
                raise ValueError("truncated window descriptor")
            pos += 1  # window size: informational here (bomb guard caps)
        dict_len = (0, 1, 2, 4)[dict_flag]
        if dict_len:
            if pos + dict_len > n:
                raise ValueError("truncated dictionary id")
            did = int.from_bytes(data[pos : pos + dict_len], "little")
            pos += dict_len
            if did:
                raise ValueError(
                    f"dictionary {did} required — dictionaries are out "
                    "of scope (named boundary)"
                )
        fcs_len = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
        content_size = None
        if fcs_len:
            if pos + fcs_len > n:
                raise ValueError("truncated frame content size")
            content_size = int.from_bytes(
                data[pos : pos + fcs_len], "little"
            )
            if fcs_len == 2:
                content_size += 256
            pos += fcs_len
        frame_start = len(out)
        state = _FrameState()
        while True:
            if pos + 3 > n:
                raise ValueError("truncated block header")
            bh = int.from_bytes(data[pos : pos + 3], "little")
            pos += 3
            last = bh & 1
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            if btype == 0:  # raw
                if pos + bsize > n:
                    raise ValueError("truncated raw block")
                if len(out) + bsize > max_output:
                    raise ValueError("zstd output exceeds max_output")
                out += data[pos : pos + bsize]
                pos += bsize
            elif btype == 1:  # RLE
                if pos >= n:
                    raise ValueError("truncated RLE block")
                if len(out) + bsize > max_output:
                    raise ValueError("zstd output exceeds max_output")
                out += bytes([data[pos]]) * bsize
                pos += 1
            elif btype == 2:  # compressed
                if pos + bsize > n:
                    raise ValueError("truncated compressed block")
                block = data[pos : pos + bsize]
                pos += bsize
                literals, lpos = _decode_literals(block, 0, state)
                _decode_sequences(
                    block, lpos, literals, out, state, max_output,
                    frame_start,
                )
            else:
                raise ValueError("reserved block type 3")
            if last:
                break
        if content_size is not None and (
            len(out) - frame_start
        ) != content_size:
            raise ValueError(
                f"frame content size mismatch: "
                f"{len(out) - frame_start} != {content_size}"
            )
        if has_checksum:
            if pos + 4 > n:
                raise ValueError("truncated content checksum")
            (want,) = struct.unpack_from("<I", data, pos)
            pos += 4
            got = xxh64(bytes(out[frame_start:])) & 0xFFFFFFFF
            if got != want:
                raise ValueError("zstd content checksum mismatch")
    if not saw_frame:
        raise ValueError("no zstd frame present")
    return bytes(out)


def zstd_compress_store(data: bytes, block_size: int = 1 << 17) -> bytes:
    """Store-mode encoder: a legal single-segment frame of raw blocks
    with frame-content-size and xxHash64 checksum — every conforming
    decoder reads it (compression ratio is the real library's job;
    this exists so the jar-free broker can CARRY codec-4 batches)."""
    size = len(data)
    if size < 256:
        fcs_flag, fcs = 0, size.to_bytes(1, "little")
    elif size < 65536 + 256:
        fcs_flag, fcs = 1, (size - 256).to_bytes(2, "little")
    elif size < 1 << 32:
        fcs_flag, fcs = 2, size.to_bytes(4, "little")
    else:
        fcs_flag, fcs = 3, size.to_bytes(8, "little")
    fhd = (fcs_flag << 6) | 0x20 | 0x04  # single segment + checksum
    out = bytearray(struct.pack("<I", ZSTD_MAGIC))
    out.append(fhd)
    out += fcs
    if not data:
        out += (1).to_bytes(3, "little")  # last, raw, size 0
    else:
        for i in range(0, size, block_size):
            chunk = data[i : i + block_size]
            last = 1 if i + block_size >= size else 0
            out += ((len(chunk) << 3) | last).to_bytes(3, "little")
            out += chunk
    out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)


# --- entropy-coded encoder (r13) --------------------------------------------------
#
# The tractable compressing subset of RFC 8878 §3.1.1.3: greedy-LZ77
# match finding, RAW literals, and the SEQUENCES section entropy-coded
# with the spec's PREDEFINED FSE distributions (the same _LL/_ML/_OF
# tables the decoder above validates byte-for-byte against libzstd's
# compiled arrays). Every conforming decoder reads these frames —
# cross-validated against pyarrow's bundled libzstd in tests — and on
# repetitive payloads they are genuinely smaller than the input, unlike
# zstd_compress_store. Huffman-compressed literals remain out of scope
# (documented boundary: literal entropy needs a serialized tree; the
# match-structure redundancy is where Kafka batch payloads compress).

#: Longest value encodable per code family (top base + its extra bits).
_LL_MAX = _LL_BASE[-1] + (1 << _LL_BITS[-1]) - 1  # 131071
_ML_MAX = _ML_BASE[-1] + (1 << _ML_BITS[-1]) - 1  # 131074


def _fse_cells_by_symbol(
    alog: int, probs: list[int]
) -> dict[int, list[tuple[int, int, int]]]:
    """Encoding view of an FSE decode table: symbol -> sorted
    [(baseline, nb_bits, cell_index)]. A symbol's cells partition the
    state space [0, 1<<alog), so exactly one cell covers any successor
    state — the inverse of the decoder's new_state = baseline + bits."""
    tbl = _fse_build_table(alog, list(probs))
    by_sym: dict[int, list[tuple[int, int, int]]] = {}
    for idx, (s, nb, base) in enumerate(tbl):
        by_sym.setdefault(s, []).append((base, nb, idx))
    for lst in by_sym.values():
        lst.sort()
    return by_sym


def _fse_states(
    codes: list[int], by_sym: dict[int, list[tuple[int, int, int]]]
) -> tuple[int, list[tuple[int, int]]]:
    """tANS state assignment, run backward (the FSE encoding order):
    pick any cell of the last symbol, then for each earlier symbol pick
    the cell whose (baseline, nb) window covers the successor state;
    the window offset is what the decoder reads at that transition.
    Returns (initial_state, chronological transition bits)."""
    n = len(codes)
    state = by_sym[codes[-1]][0][2]
    trans: list[tuple[int, int]] = [(0, 0)] * (n - 1)
    for i in range(n - 2, -1, -1):
        nxt = state
        for base, nb, idx in by_sym[codes[i]]:
            if base <= nxt < base + (1 << nb):
                trans[i] = (nxt - base, nb)
                state = idx
                break
        else:  # pragma: no cover - cells partition the state space
            raise AssertionError("FSE cell coverage hole")
    return state, trans


def _lz77_sequences(
    data: bytes, max_chain: int = 16
) -> tuple[list[tuple[int, int, int]], bytes]:
    """Greedy hash-chain matcher -> ([(lit_len, offset, match_len)],
    literals). Matches stay within the block (offset <= position), are
    >= 4 bytes (all representable: ML codes start at 3), and are capped
    at the longest predefined-code value."""
    n = len(data)
    seqs: list[tuple[int, int, int]] = []
    lits = bytearray()
    heads: dict[bytes, list[int]] = {}
    i = lit_start = 0
    while i + 4 <= n:
        key = data[i : i + 4]
        chain = heads.get(key)
        best_len = best_off = 0
        if chain:
            for j in reversed(chain[-max_chain:]):
                length = 4
                limit = min(n - i, _ML_MAX)
                while length < limit and data[j + length] == data[i + length]:
                    length += 1
                if length > best_len:
                    best_len, best_off = length, i - j
                    if length >= 512:  # long enough; stop chaining
                        break
        heads.setdefault(key, []).append(i)
        if best_len >= 4:
            lits += data[lit_start:i]
            seqs.append((i - lit_start, best_off, best_len))
            # Index sparse positions inside the match so later matches
            # can still anchor there without quadratic insert cost.
            step = 1 if best_len <= 32 else best_len >> 5
            for k in range(i + 1, min(i + best_len, n - 3), step):
                heads.setdefault(data[k : k + 4], []).append(k)
            i += best_len
            lit_start = i
        else:
            i += 1
    lits += data[lit_start:]
    return seqs, bytes(lits)


def _lit_raw_header(regen: int) -> bytes:
    """Raw_Literals_Block header (type 0) for `regen` literal bytes."""
    if regen < 32:
        return bytes([regen << 3])  # size_format 0: 5-bit size
    if regen < 1 << 12:
        return bytes([((regen & 0xF) << 4) | 0x04, regen >> 4])
    return bytes(
        [((regen & 0xF) << 4) | 0x0C, (regen >> 4) & 0xFF, regen >> 12]
    )


def _encode_sequences(seqs: list[tuple[int, int, int]]) -> bytes:
    """Sequences section: count header + modes byte 0 (predefined FSE
    for LL/OF/ML) + the backward-read bitstream, assembled in decoder
    read order then emitted under the sentinel bit."""
    import bisect

    n = len(seqs)
    head = bytearray()
    if n < 128:
        head.append(n)
    elif n < 0x7F00:
        head += bytes([128 + (n >> 8), n & 0xFF])
    else:
        v = n - 0x7F00
        head += bytes([255, v & 0xFF, (v >> 8) & 0xFF])
    head.append(0x00)  # all three tables predefined

    ll_codes, of_codes, ml_codes = [], [], []
    ll_extra, of_extra, ml_extra = [], [], []
    for ll, off, ml in seqs:
        lc = bisect.bisect_right(_LL_BASE, ll) - 1
        ll_codes.append(lc)
        ll_extra.append((ll - _LL_BASE[lc], _LL_BITS[lc]))
        ov = off + 3  # absolute offsets only; repeat codes unused
        oc = ov.bit_length() - 1
        of_codes.append(oc)
        of_extra.append((ov - (1 << oc), oc))
        mc = bisect.bisect_right(_ML_BASE, ml) - 1
        ml_codes.append(mc)
        ml_extra.append((ml - _ML_BASE[mc], _ML_BITS[mc]))

    ll_by = _fse_cells_by_symbol(_LL_DEFAULT[1], list(_LL_DEFAULT[0]))
    of_by = _fse_cells_by_symbol(_OF_DEFAULT[1], list(_OF_DEFAULT[0]))
    ml_by = _fse_cells_by_symbol(_ML_DEFAULT[1], list(_ML_DEFAULT[0]))
    ll_s0, ll_tr = _fse_states(ll_codes, ll_by)
    of_s0, of_tr = _fse_states(of_codes, of_by)
    ml_s0, ml_tr = _fse_states(ml_codes, ml_by)

    events: list[tuple[int, int]] = [
        (ll_s0, _LL_DEFAULT[1]),
        (of_s0, _OF_DEFAULT[1]),
        (ml_s0, _ML_DEFAULT[1]),
    ]
    for i in range(n):
        events.append(of_extra[i])
        events.append(ml_extra[i])
        events.append(ll_extra[i])
        if i < n - 1:
            events.append(ll_tr[i])
            events.append(ml_tr[i])
            events.append(of_tr[i])

    bit = 1  # sentinel
    total = 0
    for v, nb in events:
        if nb:
            bit = (bit << nb) | v
            total += nb
    return bytes(head) + bit.to_bytes((total + 8) >> 3, "little")


def _compress_block(chunk: bytes) -> bytes | None:
    """One Compressed_Block body, or None when entropy coding does not
    beat the raw block (sparse matches)."""
    seqs, lits = _lz77_sequences(chunk)
    if not seqs:
        return None
    body = _lit_raw_header(len(lits)) + lits + _encode_sequences(seqs)
    return body if len(body) < len(chunk) else None


def zstd_compress(data: bytes, block_size: int = 1 << 17) -> bytes:
    """Entropy-coded encoder: same frame envelope as
    zstd_compress_store (single-segment, frame-content-size, xxHash64
    checksum), but each block is LZ77 + predefined-FSE compressed when
    that is smaller than raw. Interoperable with any conforming
    decoder (pyarrow/libzstd cross-validation in tests)."""
    size = len(data)
    if size < 256:
        fcs_flag, fcs = 0, size.to_bytes(1, "little")
    elif size < 65536 + 256:
        fcs_flag, fcs = 1, (size - 256).to_bytes(2, "little")
    elif size < 1 << 32:
        fcs_flag, fcs = 2, size.to_bytes(4, "little")
    else:
        fcs_flag, fcs = 3, size.to_bytes(8, "little")
    fhd = (fcs_flag << 6) | 0x20 | 0x04  # single segment + checksum
    out = bytearray(struct.pack("<I", ZSTD_MAGIC))
    out.append(fhd)
    out += fcs
    if not data:
        out += (1).to_bytes(3, "little")  # last, raw, size 0
    else:
        for i in range(0, size, block_size):
            chunk = data[i : i + block_size]
            last = 1 if i + block_size >= size else 0
            body = _compress_block(chunk)
            if body is None:
                out += ((len(chunk) << 3) | last).to_bytes(3, "little")
                out += chunk
            else:
                out += ((len(body) << 3) | 4 | last).to_bytes(3, "little")
                out += body
    out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)
