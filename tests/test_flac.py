"""FLAC codec contract (pipegen_spark/operators/flac.py).

Evidence layers (the GIF-LZW circularity-break pattern — no real
OS-packaged .flac exists in this container, see FIXTURES.md):
- the published CRC check values for both frame CRCs;
- spec-assembled golden bits (a frame built field-by-field in this
  file, never through the encoder under test);
- an INDEPENDENT test-side encoder making systematically DIFFERENT
  choices from the product encoder — LPC subframes, Rice partition
  orders > 0, the raw-bits escape, Rice method 1 (5-bit params),
  table-coded header fields, left/side + mid/side stereo — so decoder
  bugs can't cancel encoder bugs;
- hypothesis roundtrips over both encoders, prefix-truncation and
  single-byte-corruption hostile-bytes properties (the STREAMINFO MD5
  makes silent sample corruption structurally loud);
- the auto_decode magic dispatch used by the gated query.
"""

from __future__ import annotations

import hashlib
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as hst

from pipegen_spark.operators.flac import (
    FLAC_MAGIC,
    _BitWriter,
    _utf8_coded,
    crc8,
    crc16,
    flac_decode,
    flac_encode,
    flac_samples,
)


# --- published CRC vectors ---------------------------------------------------------


def test_crc_published_check_values():
    """CRC-8 poly 0x07 init 0 ("123456789" -> 0xF4) and CRC-16 poly
    0x8005 init 0 (CRC-16/BUYPASS check 0xFEE8) — the two FLAC frame
    CRCs, pinned independently of any FLAC bytes."""
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


# --- independent encoder -------------------------------------------------------------


class _W:
    """Independent MSB-first bit writer (deliberately not the module's)."""

    def __init__(self):
        self.bits = []

    def w(self, value, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _indep_residual(w, resid, method, part_order, blocksize, order):
    """Partitioned Rice with per-partition best-of(rice, raw escape)."""
    w.w(method, 2)
    w.w(part_order, 4)
    pbits = 4 + method
    escape = (1 << pbits) - 1
    plen = blocksize >> part_order
    pos = 0
    for p in range(1 << part_order):
        n = plen - (order if p == 0 else 0)
        part = resid[pos : pos + n]
        pos += n
        uvals = [(-v * 2 - 1) if v < 0 else v * 2 for v in part]
        best_p, best_bits = 0, None
        for prm in range(escape):
            bits = sum((u >> prm) + 1 + prm for u in uvals)
            if best_bits is None or bits < best_bits:
                best_p, best_bits = prm, bits
        rawbits = max((abs(v).bit_length() + 1 for v in part), default=1)
        if part and 5 + rawbits * n < best_bits:
            w.w(escape, pbits)
            w.w(rawbits, 5)
            for v in part:
                w.w(v & ((1 << rawbits) - 1), rawbits)
        else:
            w.w(best_p, pbits)
            for u in uvals:
                q = u >> best_p
                w.w(0, q) if q else None
                w.w(1, 1)
                if best_p:
                    w.w(u & ((1 << best_p) - 1), best_p)


def _indep_lpc_subframe(w, ch, bps, method, part_order, blocksize):
    """LPC order 2, coefficients [2, -1], precision 3, shift 0 (the
    fixed-order-2 polynomial expressed through the LPC path, so the
    expected samples are trivially checkable)."""
    order = 2
    w.w(0, 1)
    w.w(32 + order - 1, 6)  # LPC, order 2 (type = 31 + order)
    w.w(0, 1)  # no wasted bits
    for s in ch[:order]:
        w.w(s & ((1 << bps) - 1), bps)
    w.w(3 - 1, 4)  # qlp precision 3
    w.w(0, 5)  # shift 0
    w.w(2 & 0x7, 3)  # coef 2
    w.w(-1 & 0x7, 3)  # coef -1
    resid = [
        ch[i] - 2 * ch[i - 1] + ch[i - 2] for i in range(order, len(ch))
    ]
    _indep_residual(w, resid, method, part_order, blocksize, order)


def indep_encode(
    chans: list[list[int]],
    rate: int = 8_000,
    stereo_mode: int | None = None,
    method: int = 1,
    part_order: int = 2,
    block_code: int = 8,  # table code: 256 samples
) -> bytes:
    """Independent FLAC encoder: table-coded block size and sample
    rate, LPC subframes, partitioned Rice (method 1 by default), raw
    escapes, optional left/side (8) or mid/side (10) stereo."""
    channels = len(chans)
    n = len(chans[0])
    blocksize = {1: 192, 8: 256, 9: 512}[block_code]
    assert n % blocksize == 0, "test encoder: whole blocks only"
    bps = 16
    md5 = hashlib.md5(
        b"".join(
            int(chans[c][i]).to_bytes(2, "little", signed=True)
            for i in range(n)
            for c in range(channels)
        )
    ).digest()
    si = _W()
    si.w(blocksize, 16)
    si.w(blocksize, 16)
    si.w(0, 24)
    si.w(0, 24)
    si.w(rate, 20)
    si.w(channels - 1, 3)
    si.w(bps - 1, 5)
    si.w(n, 36)
    si_bytes = si.bytes() + md5
    out = bytearray(FLAC_MAGIC)
    # a non-STREAMINFO block the decoder must skip (PADDING, 4 bytes)
    out += bytes([0x00]) + (34).to_bytes(3, "big") + si_bytes
    out += bytes([0x81]) + (4).to_bytes(3, "big") + b"\x00" * 4
    rate_code = {8000: 4, 16000: 5, 44100: 9}[rate]
    for f, start in enumerate(range(0, n, blocksize)):
        w = _W()
        w.w(0x3FFE, 14)
        w.w(0, 1)
        w.w(0, 1)
        w.w(block_code, 4)
        w.w(rate_code, 4)
        ch_code = stereo_mode if stereo_mode else channels - 1
        w.w(ch_code, 4)
        w.w(0, 3)  # sample size: from STREAMINFO
        w.w(0, 1)
        for b in _utf8_coded(f):
            w.w(b, 8)
        hdr = w.bytes()
        assert len(w.bits) % 8 == 0
        w.w(crc8(hdr), 8)
        block = [c[start : start + blocksize] for c in chans]
        if stereo_mode == 8:  # left/side
            subs = [
                (block[0], 16),
                ([l - r for l, r in zip(block[0], block[1])], 17),
            ]
        elif stereo_mode == 10:  # mid/side
            side = [l - r for l, r in zip(block[0], block[1])]
            mid = [(l + r) >> 1 for l, r in zip(block[0], block[1])]
            subs = [(mid, 16), (side, 17)]
        else:
            subs = [(b, 16) for b in block]
        for ch, ch_bps in subs:
            _indep_lpc_subframe(w, ch, ch_bps, method, part_order, blocksize)
        w.align()
        body = w.bytes()
        out += body + struct.pack(">H", crc16(body))
    return bytes(out)


def _interleave(chans):
    return [
        chans[c][i]
        for i in range(len(chans[0]))
        for c in range(len(chans))
    ]


def test_independent_encoder_lpc_partitions_method1():
    """LPC subframes + partition order 2 + Rice method 1 + a skipped
    PADDING metadata block — none of which the product encoder emits."""
    import random

    rng = random.Random(7)
    v = 0
    mono = []
    for _ in range(512):
        v = max(-30000, min(30000, v + rng.randrange(-400, 401)))
        mono.append(v)
    payload = indep_encode([mono], block_code=8, method=1, part_order=2)
    rate, ch, bps, chans = flac_decode(payload)
    assert (rate, ch, bps) == (8000, 1, 16)
    assert chans[0] == mono


def test_independent_encoder_raw_escape_partitions():
    """Alternating smooth / full-range-noise partitions force the raw
    escape in some partitions and Rice in others."""
    import random

    rng = random.Random(11)
    mono = []
    for blk in range(8):
        if blk % 2:
            mono += [rng.randrange(-32768, 32768) for _ in range(64)]
        else:
            mono += [blk * 100 + i for i in range(64)]
    payload = indep_encode([mono], block_code=8, method=0, part_order=2)
    assert flac_decode(payload)[3][0] == mono


@pytest.mark.parametrize("mode", [8, 10])
def test_independent_encoder_stereo_decorrelation(mode):
    """left/side and mid/side reconstruction, side channel at 17 bits."""
    import random

    rng = random.Random(mode)
    left, right = [], []
    l = r = 0
    for _ in range(256):
        l = max(-30000, min(30000, l + rng.randrange(-300, 301)))
        r = max(-30000, min(30000, r + rng.randrange(-300, 301)))
        left.append(l)
        right.append(r)
    payload = indep_encode([left, right], stereo_mode=mode)
    rate, ch, bps, chans = flac_decode(payload)
    assert ch == 2
    assert chans[0] == left
    assert chans[1] == right


# --- spec-assembled golden bits -----------------------------------------------------


def _golden_constant_stream():
    """One 192-sample mono frame, CONSTANT subframe value -7, assembled
    field by field from the spec (block size from the table, sample
    rate 8 kHz from the table, frame number 0)."""
    w = _W()
    w.w(192, 16)
    w.w(192, 16)
    w.w(0, 24)
    w.w(0, 24)
    w.w(8000, 20)
    w.w(0, 3)  # 1 channel
    w.w(15, 5)  # 16 bps
    w.w(192, 36)
    si = w.bytes() + b"\x00" * 16  # MD5 unset -> decoder skips check
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + (34).to_bytes(3, "big") + si
    f = _W()
    f.w(0b11111111111110, 14)  # sync
    f.w(0, 1)  # reserved
    f.w(0, 1)  # fixed blocking
    f.w(0b0001, 4)  # block size code 1 = 192
    f.w(0b0100, 4)  # sample rate code 4 = 8000
    f.w(0b0000, 4)  # 1 channel, independent
    f.w(0b100, 3)  # 16-bit samples
    f.w(0, 1)  # reserved
    f.w(0, 8)  # coded frame number 0
    hdr = f.bytes()
    f.w(crc8(hdr), 8)
    f.w(0, 1)  # subframe padding bit
    f.w(0, 6)  # CONSTANT
    f.w(0, 1)  # no wasted bits
    f.w(-7 & 0xFFFF, 16)  # the constant
    f.align()
    body = f.bytes()
    return bytes(out) + body + struct.pack(">H", crc16(body))


def test_golden_constant_frame():
    rate, ch, bps, chans = flac_decode(_golden_constant_stream())
    assert (rate, ch, bps) == (8000, 1, 16)
    assert chans[0] == [-7] * 192


def test_golden_wasted_bits_verbatim():
    """VERBATIM subframe with 2 wasted bits: stored at 14 bits, decoded
    samples shifted left by 2 — the wasted-bits unary prefix path."""
    samples = [4 * (i - 8) for i in range(16)]
    w = _W()
    w.w(16, 16)
    w.w(16, 16)
    w.w(0, 24)
    w.w(0, 24)
    w.w(8000, 20)
    w.w(0, 3)
    w.w(15, 5)
    w.w(16, 36)
    si = w.bytes() + b"\x00" * 16
    out = bytearray(b"fLaC") + bytes([0x80]) + (34).to_bytes(3, "big") + si
    f = _W()
    f.w(0x3FFE, 14)
    f.w(0, 2)
    f.w(0b0110, 4)  # block size: 8-bit value at end of header
    f.w(0, 4)  # rate from STREAMINFO
    f.w(0, 4)
    f.w(0b100, 3)
    f.w(0, 1)
    f.w(0, 8)  # frame 0
    f.w(15, 8)  # blocksize-1 = 15
    hdr = f.bytes()
    f.w(crc8(hdr), 8)
    f.w(0, 1)
    f.w(1, 6)  # VERBATIM
    f.w(1, 1)  # wasted-bits flag
    f.w(0b01, 2)  # unary 1 -> wasted = 2
    for s in samples:
        f.w((s >> 2) & 0x3FFF, 14)
    f.align()
    body = f.bytes()
    stream = bytes(out) + body + struct.pack(">H", crc16(body))
    assert flac_decode(stream)[3][0] == samples


# --- product encoder roundtrips -----------------------------------------------------


_samples16 = hst.lists(
    hst.integers(-32768, 32767), min_size=0, max_size=600
)


@given(_samples16, hst.sampled_from([1, 2]))
@settings(max_examples=60, deadline=None)
def test_encode_decode_roundtrip_property(samples, channels):
    samples = samples[: len(samples) - len(samples) % channels]
    payload = flac_encode(samples, channels=channels)
    assert flac_samples(payload) == samples


def test_encoder_subframe_choices_cover_paths():
    """Constant, fixed-with-rice, and verbatim must all be reachable."""
    # constant
    p = flac_encode([5] * 300)
    assert flac_samples(p) == [5] * 300
    # smooth ramp -> fixed predictor with tiny residuals
    ramp = [i * 3 for i in range(300)]
    p2 = flac_encode(ramp)
    assert flac_samples(p2) == ramp
    assert len(p2) < 300  # fixed+rice actually compressed
    # full-range noise -> verbatim-ish (never larger than raw + headers)
    import random

    rng = random.Random(3)
    noise = [rng.randrange(-32768, 32768) for _ in range(300)]
    p3 = flac_encode(noise)
    assert flac_samples(p3) == noise


def test_high_sample_rates_use_tens_of_hz_code():
    """96 kHz doesn't fit the 16-bit-Hz frame-header field (sr_code
    13); the encoder must switch to sr_code 14 (tens of Hz) instead of
    silently truncating to sample_rate & 0xFFFF."""
    samples = [i % 7 - 3 for i in range(300)]
    for rate in (96_000, 192_000, 44_100, 8_000):
        payload = flac_encode(samples, sample_rate=rate)
        assert flac_samples(payload) == samples
        assert flac_decode(payload)[0] == rate
    # 655351 Hz: not 16-bit and not a whole number of tens -> loud
    with pytest.raises(ValueError, match="not representable"):
        flac_encode(samples, sample_rate=655_351)


def test_frame_rate_must_match_streaminfo():
    """The decoder verifies the per-frame rate against STREAMINFO (a
    16-bit Hz field lives in the last 2 header bytes before CRC-8)."""
    payload = bytearray(flac_encode([1, 2, 3, 4] * 64, sample_rate=8_000))
    # frame starts right after fLaC + block header (4) + STREAMINFO 34
    fstart = 4 + 4 + 34
    # header: sync(2) + bs/sr codes(1) + ch/bps(1) + frame number utf8
    # (1 for frame 0) + blocksize(2) + rate(2) -> rate at fstart+7
    payload[fstart + 7 : fstart + 9] = (44_100).to_bytes(2, "big")
    # re-stamp the header CRC-8 so the rate contradiction is what trips
    from pipegen_spark.operators.flac import crc8

    payload[fstart + 9] = crc8(bytes(payload[fstart : fstart + 9]))
    with pytest.raises(ValueError, match="contradicts"):
        flac_decode(bytes(payload))


def test_md5_streaminfo_verified():
    payload = bytearray(flac_encode(list(range(-100, 100))))
    assert hashlib.md5  # the encoder stamps it; flip one digest byte:
    payload[4 + 4 + 18] ^= 0xFF  # STREAMINFO md5[0]
    with pytest.raises(ValueError, match="MD5 mismatch"):
        flac_decode(bytes(payload))


# --- hostile bytes -------------------------------------------------------------------


def test_rejects_non_flac_and_structural_garbage():
    for bad in (b"", b"fLa", b"RIFFxxxxWAVE", b"fLaC", b"fLaC\x80\x00"):
        with pytest.raises(ValueError):
            flac_decode(bad)
    # first metadata block not STREAMINFO
    with pytest.raises(ValueError, match="STREAMINFO"):
        flac_decode(b"fLaC" + bytes([0x81]) + (0).to_bytes(3, "big"))


@given(hst.data())
@settings(max_examples=120, deadline=None)
def test_prefix_truncation_is_loud(data):
    """Every strict prefix of a valid stream raises ValueError — the
    STREAMINFO total-sample count makes early EOF detectable."""
    samples = data.draw(
        hst.lists(hst.integers(-2000, 2000), min_size=1, max_size=300)
    )
    payload = flac_encode(samples)
    cut = data.draw(hst.integers(0, len(payload) - 1))
    with pytest.raises(ValueError):
        flac_decode(payload[:cut])


@given(hst.data())
@settings(max_examples=200, deadline=None)
def test_corruption_is_loud_or_exact(data):
    """Single-byte corruption anywhere either raises ValueError or
    returns the exact original samples (don't-care fields: min/max
    frame size, padding bits) — never silently different audio. The
    frame CRCs plus the STREAMINFO MD5 enforce this structurally."""
    samples = data.draw(
        hst.lists(hst.integers(-32768, 32767), min_size=1, max_size=250)
    )
    payload = bytearray(flac_encode(samples))
    pos = data.draw(hst.integers(0, len(payload) - 1))
    payload[pos] = data.draw(hst.integers(0, 255))
    try:
        _, _, _, chans = flac_decode(bytes(payload))
    except ValueError:
        return
    assert chans[0] == samples


# --- dispatch + feature surface -------------------------------------------------------


def test_auto_decode_dispatches_flac():
    from pipegen_spark.operators.codecs import auto_decode
    from pipegen_spark.operators.flac import flac_features

    payload = flac_encode([0, 1, -1, 100, -100, 3000, -3000, 32000] * 8)
    assert auto_decode(payload) == flac_features(payload)
    feats = auto_decode(payload)
    assert feats["feat_dim"] == 8 and feats["n_bytes"] == len(payload)


def test_feature_parity_with_wav_on_same_samples():
    """The gated query's construction: identical samples through WAV
    and FLAC containers must produce identical feature norms (the
    amplitude-octave histogram sees the samples, not the container)."""
    from pipegen_spark.operators.codecs import wav_encode, wav_features
    from pipegen_spark.operators.flac import flac_features

    seed = hashlib.md5(b"doc text").digest()
    raw = (seed * 9)[:128]
    samples = [s for (s,) in struct.iter_unpack("<h", raw)]
    wf = wav_features(wav_encode(samples, sample_rate=8_000))
    ff = flac_features(flac_encode(samples, sample_rate=8_000))
    assert wf["feat_norm"] == ff["feat_norm"]
    assert wf["feat_dim"] == ff["feat_dim"] == 8
