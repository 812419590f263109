"""From-scratch FLAC codec (decode subset + a real encoder) — pure stdlib.

Round-12 (r11 VERDICT task 4): FLAC is the last high-volume scraped-audio
format feasible from scratch. Implemented per the PUBLIC format spec
(https://xiph.org/flac/format.html / RFC 9639):

decode — the full frame surface real files use:
- "fLaC" magic, metadata block walk (STREAMINFO mandatory-first: block
  sizes, sample rate, channels, bits-per-sample, total samples, MD5 of
  the raw audio), other block types skipped (seektables, vorbis
  comments, padding);
- frame headers: 14-bit sync, blocking strategy, coded block-size /
  sample-rate / channel-assignment / sample-size fields including the
  end-of-header 8/16-bit forms, the UTF-8-style coded frame/sample
  number, and the CRC-8 (poly 0x07) header check;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (qlp precision/shift + warmup), wasted-bits unary prefix;
- residuals: Rice method 0 (4-bit params) and 1 (5-bit params),
  partition orders 0-15, the 0b1111(1) escape to raw n-bit residuals;
- stereo decorrelation: left/side, right/side, mid/side (side channel
  carries the +1 bit depth per spec);
- frame footer CRC-16 (poly 0x8005) over the whole frame, and the
  STREAMINFO MD5 verified over the decoded stream when present —
  corruption anywhere is LOUD (ValueError), never silent samples.

encode — a real (small) encoder used by the gated query to build
payloads: fixed 256-sample blocks, per-subframe choice of
CONSTANT / FIXED order 0-4 with Rice residuals / VERBATIM by exact
bit-cost, correct CRC-8/CRC-16, and the STREAMINFO MD5. Every encoded
stream round-trips through the decoder bit-exactly; the decoder is
additionally validated against an INDEPENDENT encoder written in the
tests (different subframe/partition choices) and spec-assembled golden
bits, the same circularity break the GIF LZW codec carries
(tests/test_flac.py).

Boundary (documented, loud): sample sizes other than 8/12/16/20/24/32
bits raise; reserved block-size/sample-rate codes raise; variable
blocksize streams decode (blocking strategy honored). No real
OS-packaged .flac fixture exists in this container (no flac/ffmpeg/sox
binary and no packaged sample — verified by filesystem sweep), so the
fixture leg of the usual codec evidence is replaced by the independent
test-side encoder + golden bits; FIXTURES.md records this.

Reference parity: the reference has no media codecs at all — this is
part of the beyond-reference training-data surface (SURVEY.md §2B29).
"""

from __future__ import annotations

import hashlib
import struct

FLAC_MAGIC = b"fLaC"

#: Fixed-predictor coefficients, orders 0-4 (spec §frame / RFC 9639):
#: residual[i] = s[i] - sum(coef[j] * s[i-1-j]).
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_RATE_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8_table() -> list[int]:
    out = []
    for b in range(256):
        crc = b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
        out.append(crc)
    return out


def _crc16_table() -> list[int]:
    out = []
    for b in range(256):
        crc = b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
        out.append(crc)
    return out


_CRC8_TAB = _crc8_table()
_CRC16_TAB = _crc16_table()


def crc8(data: bytes) -> int:
    """CRC-8, polynomial 0x07, init 0 (the FLAC frame-header CRC)."""
    crc = 0
    tab = _CRC8_TAB
    for b in data:
        crc = tab[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    """CRC-16, polynomial 0x8005, init 0 (the FLAC frame-footer CRC)."""
    crc = 0
    tab = _CRC16_TAB
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ tab[(crc >> 8) ^ b]
    return crc


class _BitReader:
    """MSB-first bit reader with byte-position tracking (frames are
    byte-aligned; the footer CRC covers whole bytes)."""

    __slots__ = ("data", "byte", "bit")

    def __init__(self, data: bytes, byte: int = 0) -> None:
        self.data = data
        self.byte = byte
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        while n > 0:
            if self.byte >= len(self.data):
                raise ValueError("truncated flac bitstream")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            out = (out << take) | (
                (cur >> (avail - take)) & ((1 << take) - 1)
            )
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self, limit: int = 1 << 20) -> int:
        """Count 0 bits until the terminating 1 (libFLAC's
        read_unary_unsigned)."""
        q = 0
        while True:
            if self.read(1):
                return q
            q += 1
            if q > limit:
                raise ValueError("unary run exceeds sanity limit")

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitWriter:
    """MSB-first bit writer (no JPEG byte stuffing)."""

    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _utf8_coded(value: int) -> bytes:
    """FLAC's UTF-8-style extended coding for frame/sample numbers (up
    to 36 bits, 7-byte form allowed)."""
    if value < 0x80:
        return bytes([value])
    for n_cont, lead, cap in (
        (1, 0xC0, 1 << 11), (2, 0xE0, 1 << 16), (3, 0xF0, 1 << 21),
        (4, 0xF8, 1 << 26), (5, 0xFC, 1 << 31), (6, 0xFE, 1 << 36),
    ):
        if value < cap:
            out = [lead | (value >> (6 * n_cont))]
            for i in range(n_cont - 1, -1, -1):
                out.append(0x80 | ((value >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("coded number exceeds 36 bits")


def _read_utf8_coded(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n_cont = 0
    mask = 0x40
    while b0 & mask:
        n_cont += 1
        mask >>= 1
    if n_cont < 1 or n_cont > 6:
        raise ValueError(f"bad coded-number lead byte 0x{b0:02X}")
    value = b0 & (mask - 1)
    for _ in range(n_cont):
        b = r.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("bad coded-number continuation byte")
        value = (value << 6) | (b & 0x3F)
    return value


# --- decode -----------------------------------------------------------------------


def _decode_residual(
    r: _BitReader, blocksize: int, order: int
) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    param_bits = 4 + method
    escape = (1 << param_bits) - 1
    part_order = r.read(4)
    n_parts = 1 << part_order
    if blocksize % n_parts:
        raise ValueError("block size not divisible by partition count")
    part_len = blocksize >> part_order
    if part_len <= order and part_order > 0 or part_len < order:
        # first partition holds part_len - order samples; must be >= 0
        if part_len - order < 0:
            raise ValueError("partition shorter than predictor order")
    out: list[int] = []
    for p in range(n_parts):
        n = part_len - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("partition shorter than predictor order")
        param = r.read(param_bits)
        if param == escape:
            bits = r.read(5)
            for _ in range(n):
                out.append(r.read_signed(bits) if bits else 0)
        else:
            for _ in range(n):
                q = r.unary()
                uval = (q << param) | (r.read(param) if param else 0)
                out.append((uval >> 1) ^ -(uval & 1))
    return out


def _decode_subframe(
    r: _BitReader, blocksize: int, bps: int
) -> list[int]:
    if r.read(1):
        raise ValueError("subframe padding bit set")
    sf_type = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.unary() + 1
    bps -= wasted
    if bps <= 0:
        raise ValueError("wasted bits exceed sample size")
    if sf_type == 0:  # CONSTANT
        samples = [r.read_signed(bps)] * blocksize
    elif sf_type == 1:  # VERBATIM
        samples = [r.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= sf_type <= 12:  # FIXED order 0-4
        order = sf_type & 0x07
        if order > blocksize:
            raise ValueError("predictor order exceeds block size")
        samples = [r.read_signed(bps) for _ in range(order)]
        resid = _decode_residual(r, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for i, e in enumerate(resid):
            pos = order + i
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * samples[pos - 1 - j]
            samples.append(e + pred)
    elif sf_type >= 32:  # LPC order 1-32
        order = sf_type - 31
        if order > blocksize:
            raise ValueError("predictor order exceeds block size")
        samples = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid qlp precision code 1111")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative qlp shift")
        coefs = [r.read_signed(precision) for _ in range(order)]
        resid = _decode_residual(r, blocksize, order)
        for i, e in enumerate(resid):
            pos = order + i
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * samples[pos - 1 - j]
            samples.append(e + (acc >> shift))
    else:
        raise ValueError(f"reserved subframe type {sf_type}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def flac_decode(
    payload: bytes, max_samples: int = 1 << 26
) -> tuple[int, int, int, list[list[int]]]:
    """-> (sample_rate, channels, bits_per_sample, per-channel sample
    lists at native depth). Validates magic, STREAMINFO-first, frame
    sync, header CRC-8, footer CRC-16, and the STREAMINFO MD5 when
    present. `max_samples` bounds total decoded samples (bomb guard)."""
    if payload is None or payload[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC stream (bad magic)")
    pos = 4
    # --- metadata blocks ---
    streaminfo = None
    last = False
    while not last:
        if pos + 4 > len(payload):
            raise ValueError("truncated metadata block header")
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        pos += 4
        if pos + blen > len(payload):
            raise ValueError("truncated metadata block body")
        if streaminfo is None:
            if btype != 0:
                raise ValueError("first metadata block is not STREAMINFO")
            if blen != 34:
                raise ValueError(f"bad STREAMINFO length {blen}")
            streaminfo = payload[pos : pos + 34]
        elif btype == 0:
            raise ValueError("duplicate STREAMINFO block")
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        pos += blen
    if streaminfo is None:
        raise ValueError("missing STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)  # min block size
    si.read(16)  # max block size
    si.read(24), si.read(24)  # min/max frame size
    rate = si.read(20)
    channels = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    md5_expect = streaminfo[18:34]
    if rate == 0:
        raise ValueError("STREAMINFO sample rate 0")
    if total > max_samples:
        raise ValueError("stream exceeds max_samples guard")

    chans: list[list[int]] = [[] for _ in range(channels)]
    # --- frames ---
    while pos < len(payload) and (total == 0 or len(chans[0]) < total):
        frame_start = pos
        r = _BitReader(payload, byte=pos)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad frame sync 0x{sync:04X}")
        if r.read(1):
            raise ValueError("frame header reserved bit set")
        r.read(1)  # blocking strategy (number semantics only)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("frame header reserved bit 2 set")
        _read_utf8_coded(r)  # frame/sample number
        if bs_code == 0:
            raise ValueError("reserved block size code 0")
        elif bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 0:
            frame_rate = rate
        elif sr_code in _RATE_TABLE:
            frame_rate = _RATE_TABLE[sr_code]
        elif sr_code == 12:
            frame_rate = r.read(8) * 1000
        elif sr_code == 13:
            frame_rate = r.read(16)
        elif sr_code == 14:
            frame_rate = r.read(16) * 10
        else:
            raise ValueError("invalid sample rate code 15")
        if frame_rate != rate:
            raise ValueError(
                f"frame sample rate {frame_rate} contradicts "
                f"STREAMINFO rate {rate}"
            )
        if ss_code == 0:
            frame_bps = bps
        elif ss_code in _SAMPLE_SIZE_TABLE:
            frame_bps = _SAMPLE_SIZE_TABLE[ss_code]
        else:
            raise ValueError(f"reserved sample size code {ss_code}")
        if frame_bps != bps:
            raise ValueError("frame sample size contradicts STREAMINFO")
        r.align()
        header_bytes = payload[frame_start : r.byte]
        crc_read = r.read(8)
        if crc8(header_bytes) != crc_read:
            raise ValueError("frame header CRC-8 mismatch")
        if ch_code <= 7:
            n_ch = ch_code + 1
            side = None
        elif ch_code in (8, 9, 10):
            n_ch = 2
            side = ch_code
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        if n_ch != channels:
            raise ValueError("frame channel count contradicts STREAMINFO")
        if len(chans[0]) + blocksize > max_samples:
            raise ValueError("stream exceeds max_samples guard")
        sub: list[list[int]] = []
        for ci in range(n_ch):
            ch_bps = frame_bps
            # the side channel carries one extra bit (spec)
            if (side == 8 and ci == 1) or (side == 9 and ci == 0) or (
                side == 10 and ci == 1
            ):
                ch_bps += 1
            sub.append(_decode_subframe(r, blocksize, ch_bps))
        r.align()
        frame_body = payload[frame_start : r.byte]
        crc16_read = r.read(16)
        if crc16(frame_body) != crc16_read:
            raise ValueError("frame footer CRC-16 mismatch")
        pos = r.byte
        # stereo decorrelation
        if side == 8:  # left/side: right = left - side
            left, s = sub
            sub = [left, [l - d for l, d in zip(left, s)]]
        elif side == 9:  # right/side: left = right + side
            s, right = sub
            sub = [[rr + d for rr, d in zip(right, s)], right]
        elif side == 10:  # mid/side
            mid, s = sub
            left = []
            right = []
            for m, d in zip(mid, s):
                m = (m << 1) | (d & 1)
                left.append((m + d) >> 1)
                right.append((m - d) >> 1)
            sub = [left, right]
        for ci in range(channels):
            chans[ci].extend(sub[ci])
    if total and len(chans[0]) < total:
        raise ValueError(
            f"stream ends early: {len(chans[0])}/{total} samples"
        )
    if total:
        chans = [c[:total] for c in chans]
    if md5_expect != b"\x00" * 16:
        width = (bps + 7) // 8
        m = hashlib.md5()
        buf = bytearray()
        for i in range(len(chans[0])):
            for c in chans:
                buf += int(c[i]).to_bytes(width, "little", signed=True)
        m.update(bytes(buf))
        if m.digest() != md5_expect:
            raise ValueError("decoded audio MD5 mismatch vs STREAMINFO")
    return rate, channels, bps, chans


def flac_samples(payload: bytes) -> list[int]:
    """Decoded samples as signed 16-bit ints, channels interleaved —
    the same raw-sample surface as `wav_samples`/`aiff_samples` (width
    reduction keeps the top 16 bits; sub-16-bit shifts up)."""
    if payload is None:
        payload = b""
    _, channels, bps, chans = flac_decode(payload)
    if bps >= 16:
        shift = bps - 16
        conv = lambda s: s >> shift  # noqa: E731
    else:
        shift = 16 - bps
        conv = lambda s: s << shift  # noqa: E731
    out: list[int] = []
    for i in range(len(chans[0])):
        for c in chans:
            out.append(conv(c[i]))
    return out


def flac_features(payload: bytes) -> dict:
    """`wav_features` for the FLAC container (round-12)."""
    from pipegen_spark.operators.codecs import _sample_features

    if payload is None:
        payload = b""
    return _sample_features(payload, flac_samples(payload))


# --- encode -----------------------------------------------------------------------


def _best_rice_param(resid: list[int], max_param: int = 14) -> tuple[int, int]:
    """-> (param, total_bits) for one partition under Rice method 0.
    Rice cost is unimodal in the parameter, so search a +-2 window
    around the mean-magnitude estimate (the standard encoder trick)
    instead of all 15 — any parameter is VALID, this only affects
    size."""
    uvals = [(-v * 2 - 1) if v < 0 else v * 2 for v in resid]
    if not uvals:
        return 0, 0
    mean = sum(uvals) // len(uvals)
    p0 = min(max(mean.bit_length() - 1, 0), max_param)
    best_p, best_bits = 0, None
    for p in range(max(0, p0 - 2), min(max_param, p0 + 2) + 1):
        bits = len(uvals) * (1 + p) + sum(u >> p for u in uvals)
        if best_bits is None or bits < best_bits:
            best_p, best_bits = p, bits
    return best_p, best_bits


def _write_residual(w: _BitWriter, resid: list[int], param: int) -> None:
    w.write(0, 2)  # method 0: 4-bit params
    w.write(0, 4)  # partition order 0
    w.write(param, 4)
    for v in resid:
        u = (-v * 2 - 1) if v < 0 else v * 2
        q = u >> param
        if q:
            w.write(0, q)
        w.write(1, 1)
        if param:
            w.write(u & ((1 << param) - 1), param)


def flac_encode(
    samples: list[int],
    sample_rate: int = 8_000,
    channels: int = 1,
    bps: int = 16,
    block_size: int = 256,
) -> bytes:
    """Encode interleaved signed samples as a real FLAC stream: fixed
    `block_size` frames, per-subframe best of CONSTANT / FIXED order
    0-4 (Rice, partition order 0) / VERBATIM by exact bit cost, proper
    CRC-8/CRC-16, STREAMINFO MD5. Decodes bit-exactly via flac_decode
    (and via any conforming decoder)."""
    if bps != 16:
        raise ValueError("encoder subset: 16-bit only")
    if channels < 1 or channels > 8:
        raise ValueError("channels must be 1..8")
    if len(samples) % channels:
        raise ValueError("sample count not divisible by channel count")
    if not (16 <= block_size <= 65535):
        raise ValueError("block size must be 16..65535")
    # Frame-header rate field: sr_code 13 is a 16-bit Hz value; rates
    # >= 65536 (e.g. 96000) would silently truncate, so switch to
    # sr_code 14 (16-bit value in tens of Hz) when it fits exactly.
    if 0 < sample_rate < (1 << 16):
        sr_code, sr_field = 13, sample_rate
    elif sample_rate % 10 == 0 and sample_rate // 10 < (1 << 16):
        sr_code, sr_field = 14, sample_rate // 10
    else:
        raise ValueError(
            f"sample rate {sample_rate} not representable in a frame "
            "header (needs 16-bit Hz or 16-bit tens-of-Hz)"
        )
    n_frames_total = len(samples) // channels
    lim = 1 << (bps - 1)
    for s in samples:
        if not (-lim <= s < lim):
            raise ValueError(f"sample {s} exceeds {bps}-bit range")
    md5 = hashlib.md5(
        b"".join(
            int(s).to_bytes(2, "little", signed=True) for s in samples
        )
    ).digest()
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_frames_total, 36)
    si_bytes = si.bytes() + md5
    out = bytearray(FLAC_MAGIC)
    out += bytes([0x80]) + len(si_bytes).to_bytes(3, "big") + si_bytes

    def encode_subframe(w: _BitWriter, ch: list[int]) -> None:
        n = len(ch)
        if all(s == ch[0] for s in ch):
            w.write(0, 1)
            w.write(0, 6)  # CONSTANT
            w.write(0, 1)
            w.write(ch[0] & 0xFFFF, 16)
            return
        best = ("verbatim", None, None, n * bps)
        for order in range(0, 5):
            if order >= n:
                break
            coefs = _FIXED_COEFS[order]
            resid = []
            for i in range(order, n):
                pred = sum(c * ch[i - 1 - j] for j, c in enumerate(coefs))
                resid.append(ch[i] - pred)
            param, bits = _best_rice_param(resid)
            cost = order * bps + 2 + 4 + 4 + bits
            if cost < best[3]:
                best = ("fixed", order, (resid, param), cost)
        w.write(0, 1)
        if best[0] == "verbatim":
            w.write(1, 6)
            w.write(0, 1)
            for s in ch:
                w.write(s & 0xFFFF, 16)
        else:
            order = best[1]
            resid, param = best[2]
            w.write(8 | order, 6)
            w.write(0, 1)
            for s in ch[:order]:
                w.write(s & 0xFFFF, 16)
            _write_residual(w, resid, param)

    frame_idx = 0
    for start in range(0, n_frames_total, block_size):
        bs = min(block_size, n_frames_total - start)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking strategy
        w.write(7, 4)  # block size: 16-bit value at end of header
        w.write(sr_code, 4)  # sample rate at end of header (13 or 14)
        w.write(channels - 1, 4)  # independent channels
        w.write(4, 3)  # 16-bit samples
        w.write(0, 1)
        for b in _utf8_coded(frame_idx):
            w.write(b, 8)
        w.write(bs - 1, 16)
        w.write(sr_field, 16)
        hdr = w.bytes()
        w2 = _BitWriter()
        for b in hdr:
            w2.write(b, 8)
        w2.write(crc8(hdr), 8)
        for ci in range(channels):
            ch = [
                samples[(start + i) * channels + ci] for i in range(bs)
            ]
            encode_subframe(w2, ch)
        w2.align()
        body = w2.bytes()
        out += body + struct.pack(">H", crc16(body))
        frame_idx += 1
    return bytes(out)
