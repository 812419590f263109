"""LZ4 block/frame + xxHash32 contract (pipegen_spark/sources/lz4.py).

Evidence layers, mirroring the codec-suite pattern:
- golden bytes hand-assembled from the PUBLIC specs (lz4_Block_format,
  lz4_Frame_format, xxhash_spec) — not produced by the code under test;
- the published xxHash32 empty-input vector 0x02CC5D05;
- INDEPENDENT interop: pyarrow ships its own lz4-frame codec (the real
  reference C library) — our decoder must read its frames (which use
  linked blocks) and its decoder must read ours, so client and spec
  cannot be circular;
- hypothesis roundtrip / prefix-truncation / single-byte-corruption
  properties (the same hostile-bytes contract the media codecs carry);
- Kafka v2 RecordBatch integration under codec bits 3 over the real
  socket broker, plus the KIP-74 whole-record max_bytes shrink.
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as hst

from pipegen_spark.sources.lz4 import (
    FRAME_MAGIC,
    lz4_block_compress,
    lz4_block_decompress,
    lz4_frame_compress,
    lz4_frame_decompress,
    xxh32,
)

try:  # independent reference codec (Arrow wraps the real lz4 C library)
    import pyarrow as _pa

    _HAVE_PA_LZ4 = True
    try:
        _pa.compress(b"x", codec="lz4", asbytes=True)
    except Exception:  # pragma: no cover - lz4-less arrow build
        _HAVE_PA_LZ4 = False
except ImportError:  # pragma: no cover
    _HAVE_PA_LZ4 = False


# --- xxHash32 --------------------------------------------------------------------


def test_xxh32_published_empty_vector():
    """The xxHash spec's canonical empty-input digest."""
    assert xxh32(b"") == 0x02CC5D05


def test_xxh32_seed_and_length_sensitivity():
    assert xxh32(b"abc") != xxh32(b"abc", seed=1)
    assert xxh32(b"a") != xxh32(b"aa")
    # exercise all three loops: >=16 stripe, 4-byte tail, byte tail
    assert isinstance(xxh32(bytes(range(37))), int)


# --- block format: spec-derived goldens ------------------------------------------


def test_block_golden_literal_match_literal():
    """Hand-assembled from lz4_Block_format.md: token 0x54 = 5 literals
    + match length 4+4=8 at offset 5, then a literals-only tail."""
    block = b"\x54abcde\x05\x00\x50fghij"
    assert lz4_block_decompress(block) == b"abcdeabcdeabcfghij"


def test_block_golden_overlapping_rle():
    """Offset 1 with length > offset is the spec's RLE case: the copied
    region grows as it is written."""
    block = b"\x11a\x01\x00\x00"
    assert lz4_block_decompress(block) == b"aaaaaa"


def test_block_golden_extended_lengths():
    """255-extension chains from the spec: literal length 15+255+3=273,
    match length 4+15+255+2=276 at offset 257 (overlapping, so the spec's
    byte-at-a-time copy is the oracle), then a literals-only tail."""
    lits = bytes(i % 251 for i in range(273))
    block = (
        b"\xff" + b"\xff\x03" + lits  # token: lit=15+ext, match=15+ext
        + b"\x01\x01"  # offset 0x0101 = 257 little-endian
        + b"\xff\x02"  # match ext: 255 + 2
        + b"\x50fghij"  # final literals-only sequence
    )
    expected = bytearray(lits)
    for _ in range(4 + 15 + 255 + 2):  # spec: copy grows as written
        expected.append(expected[-257])
    expected += b"fghij"
    assert lz4_block_decompress(block) == bytes(expected)


def test_block_zero_offset_and_overrun_are_loud():
    with pytest.raises(ValueError):
        lz4_block_decompress(b"\x10a\x00\x00")  # zero offset
    with pytest.raises(ValueError):
        lz4_block_decompress(b"\x10a\x09\x00")  # offset beyond start
    with pytest.raises(ValueError):
        lz4_block_decompress(b"\x50abc")  # literal run past end
    with pytest.raises(ValueError):
        lz4_block_decompress(b"")  # empty block


def test_block_bomb_guard():
    # 1 literal then a huge RLE match: new output capped by max_output
    block = b"\x1fa\x01\x00" + b"\xff" * 40 + b"\x00" + b"\x00"
    with pytest.raises(ValueError, match="max_output"):
        lz4_block_decompress(block, max_output=1000)


def test_block_encoder_end_restrictions():
    """Spec: last 5 bytes are literals; last match starts >= 12 bytes
    before the end — verify on adversarial repetitive tails."""
    for data in (b"abcd" * 4, b"a" * 17, b"xyz" + b"ab" * 10):
        comp = lz4_block_compress(data)
        assert lz4_block_decompress(comp) == data
        # final sequence is literals-only: walk the sequences
        pos, n = 0, len(comp)
        last_lit_only = False
        while pos < n:
            token = comp[pos]
            pos += 1
            lit = token >> 4
            if lit == 15:
                while True:
                    b = comp[pos]
                    pos += 1
                    lit += b
                    if b != 255:
                        break
            pos += lit
            if pos == n:
                last_lit_only = True
                break
            pos += 2
            if (token & 0x0F) == 15:
                while True:
                    b = comp[pos]
                    pos += 1
                    if b != 255:
                        break
        assert last_lit_only


# --- frame format ----------------------------------------------------------------


def test_frame_golden_header_bytes():
    """Magic + FLG/BD/HC per lz4_Frame_format.md: version 01, block
    independence, content checksum, 64 KiB block max."""
    frame = lz4_frame_compress(b"")
    magic = struct.unpack("<I", frame[:4])[0]
    assert magic == FRAME_MAGIC == 0x184D2204
    flg, bd = frame[4], frame[5]
    assert flg == 0x64  # 01 version | indep | content-checksum
    assert bd == 0x40  # 64 KiB block max (the encoder default)
    assert frame[6] == (xxh32(bytes([flg, bd])) >> 8) & 0xFF


def test_frame_roundtrip_multiblock_and_checksums():
    data = bytes(i % 251 for i in range(300_000))
    for bc in (False, True):
        frame = lz4_frame_compress(
            data, block_max=4, block_checksum=bc
        )  # 64 KiB blocks -> 5 blocks
        assert lz4_frame_decompress(frame) == data


def test_frame_skippable_and_concatenated():
    a = lz4_frame_compress(b"hello ")
    skip = struct.pack("<II", 0x184D2A50, 3) + b"xyz"
    b = lz4_frame_compress(b"world")
    assert lz4_frame_decompress(a + skip + b) == b"hello world"


def test_frame_rejects_bad_magic_version_and_checksums():
    frame = bytearray(lz4_frame_compress(b"payload payload payload"))
    with pytest.raises(ValueError, match="magic"):
        lz4_frame_decompress(b"\x00\x00\x00\x00" + bytes(frame[4:]))
    bad = bytearray(frame)
    bad[4] = (bad[4] & 0x3F) | 0x80  # version 10
    with pytest.raises(ValueError):
        lz4_frame_decompress(bytes(bad))
    bad = bytearray(frame)
    bad[6] ^= 0xFF  # header checksum byte
    with pytest.raises(ValueError, match="descriptor checksum"):
        lz4_frame_decompress(bytes(bad))
    bad = bytearray(frame)
    bad[-1] ^= 0x01  # content checksum
    with pytest.raises(ValueError, match="content checksum"):
        lz4_frame_decompress(bytes(bad))


# --- hostile-bytes properties ------------------------------------------------------

_payload = hst.one_of(
    hst.binary(max_size=400),
    hst.binary(max_size=40).map(lambda b: b * 97),  # compressible
    hst.text(max_size=300).map(lambda s: s.encode()),
)


@given(_payload)
@settings(max_examples=200)
def test_block_roundtrip_property(data):
    assert lz4_block_decompress(lz4_block_compress(data)) == data


@given(_payload, hst.booleans(), hst.booleans())
@settings(max_examples=150)
def test_frame_roundtrip_property(data, cchk, bchk):
    frame = lz4_frame_compress(
        data, content_checksum=cchk, block_checksum=bchk
    )
    assert lz4_frame_decompress(frame) == data


@given(_payload, hst.data())
@settings(max_examples=150)
def test_frame_prefix_truncation_is_loud(data, draw):
    """Every STRICT prefix of a valid frame raises ValueError — a
    truncated fetch must never silently yield bytes."""
    frame = lz4_frame_compress(data)
    cut = draw.draw(hst.integers(0, len(frame) - 1))
    with pytest.raises(ValueError):
        lz4_frame_decompress(frame[:cut])


@given(_payload, hst.data())
@settings(max_examples=200)
def test_frame_corruption_is_loud_or_exact(data, draw):
    """Single-byte corruption anywhere either raises ValueError or (if
    it hit a don't-care bit) returns the exact original bytes — with
    the content checksum on, silent wrong output is impossible."""
    frame = bytearray(lz4_frame_compress(data))
    pos = draw.draw(hst.integers(0, len(frame) - 1))
    frame[pos] = draw.draw(hst.integers(0, 255))
    try:
        out = lz4_frame_decompress(bytes(frame))
    except ValueError:
        return
    assert out == data


# --- independent interop (pyarrow wraps the reference C lz4) ----------------------


@pytest.mark.skipif(not _HAVE_PA_LZ4, reason="pyarrow lz4 unavailable")
@given(_payload)
@settings(max_examples=60)
def test_interop_decodes_reference_frames(data):
    """pyarrow emits LINKED-block frames (FLG bit 5 clear) — decoding
    them exercises the cross-block match window."""
    comp = _pa.compress(data, codec="lz4", asbytes=True)
    assert lz4_frame_decompress(comp) == data


@pytest.mark.skipif(not _HAVE_PA_LZ4, reason="pyarrow lz4 unavailable")
@given(_payload)
@settings(max_examples=60)
def test_interop_reference_decodes_our_frames(data):
    mine = lz4_frame_compress(data)
    back = _pa.decompress(
        mine, decompressed_size=len(data), codec="lz4", asbytes=True
    )
    assert back == data


@pytest.mark.skipif(not _HAVE_PA_LZ4, reason="pyarrow lz4 unavailable")
def test_interop_linked_blocks_across_64k_boundary():
    """>64 KiB of repetitive data forces the reference encoder to emit
    matches that reach into the PREVIOUS block."""
    data = (b"0123456789abcdef" * 8192) + b"tail"  # 128 KiB + 4
    comp = _pa.compress(data, codec="lz4", asbytes=True)
    assert lz4_frame_decompress(comp) == data


# --- Kafka v2 integration -----------------------------------------------------------


def test_record_batch_lz4_roundtrip():
    from pipegen_spark.sources.kafka_wire import (
        COMPRESSION_LZ4,
        decode_record_batches,
        encode_record_batch,
    )

    recs = [(b"k%d" % i, b"v" * 50, 1000 + i, ()) for i in range(40)]
    batch = encode_record_batch(
        recs, base_offset=7, base_timestamp=1000, compression=COMPRESSION_LZ4
    )
    # attribute bits carry codec 3 (read them out of the raw batch)
    attributes = struct.unpack_from(">h", batch, 8 + 4 + 4 + 1 + 4)[0]
    assert attributes & 0x07 == 3
    out = decode_record_batches(batch)
    assert out == [
        (7 + i, ts, k, v, hs) for i, (k, v, ts, hs) in enumerate(recs)
    ]
    # and it actually compressed
    plain = encode_record_batch(recs, base_offset=7, base_timestamp=1000)
    assert len(batch) < len(plain)


def test_fetch_v4_max_bytes_returns_whole_records():
    """KIP-74 (r11 ADVICE #1): under a small max_bytes the broker must
    return complete records the client can decode and make progress
    on — never a byte-sliced partial batch."""
    from pipegen_spark.sources.kafka_wire import _Log, decode_record_batches

    log = _Log(records=[])
    log.append([(b"k%d" % i, b"v" * 100, 10 + i, ()) for i in range(50)])
    got = 0
    while got < 50:
        batch = log.read_v2(got, max_bytes=400)
        recs = decode_record_batches(batch)
        assert recs, "fetch loop stalled: empty decode under max_bytes"
        assert recs[0][0] == got  # contiguous offsets
        got = recs[-1][0] + 1
    assert got == 50
    # a single oversized record still comes back whole (progress floor)
    log2 = _Log(records=[])
    log2.append([(b"k", b"x" * 5000, 1, ())])
    recs = decode_record_batches(log2.read_v2(0, max_bytes=100))
    assert len(recs) == 1 and recs[0][3] == b"x" * 5000
