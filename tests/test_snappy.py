"""Snappy contract (pipegen_spark/sources/snappy.py).

Same evidence layers as the lz4 suite: spec-derived goldens, two-way
interop with pyarrow's independent snappy (the reference C++ library),
hostile-bytes properties, xerial framing, and Kafka codec-2 batches.
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as hst

from pipegen_spark.sources.snappy import (
    XERIAL_MAGIC,
    kafka_snappy_decompress,
    snappy_compress,
    snappy_decompress,
    xerial_compress,
    xerial_decompress,
)

try:
    import pyarrow as _pa

    _pa.compress(b"x", codec="snappy", asbytes=True)
    _HAVE_PA = True
except Exception:  # pragma: no cover
    _HAVE_PA = False


# --- spec-derived goldens -----------------------------------------------------------


def test_golden_literal_then_copy():
    """Hand-assembled from format_description.txt: varint length 11,
    literal tag (len-1=5)<<2, then a 2-byte-offset copy tag
    ((len-1)<<2)|2 with offset 6."""
    block = b"\x0b" + bytes([5 << 2]) + b"abc de" + bytes([(5 - 1) << 2 | 2]) + b"\x06\x00"
    assert snappy_decompress(block) == b"abc deabc d"


def test_golden_one_byte_offset_copy():
    """Tag 01: len 4-11 in bits 2-4, offset high bits 5-7 + next byte."""
    block = b"\x08" + bytes([3 << 2]) + b"wxyz" + bytes([(4 - 4) << 2 | 1, 4])
    assert snappy_decompress(block) == b"wxyzwxyz"


def test_golden_overlapping_rle():
    block = b"\x07" + bytes([0 << 2]) + b"a" + bytes([(6 - 1) << 2 | 2]) + b"\x01\x00"
    assert snappy_decompress(block) == b"aaaaaaa"


def test_golden_long_literal_escape():
    lits = bytes(i % 251 for i in range(300))
    block = b"\xac\x02" + bytes([61 << 2]) + struct.pack("<H", 299) + lits
    # 300 = varint 0xAC 0x02; literal escape 61 -> 2-byte len-1
    assert snappy_decompress(block) == lits


def test_rejects_garbage():
    with pytest.raises(ValueError):
        snappy_decompress(b"")
    with pytest.raises(ValueError):
        snappy_decompress(b"\x05" + bytes([4 << 2]) + b"ab")  # truncated
    with pytest.raises(ValueError):  # zero offset
        snappy_decompress(b"\x05" + bytes([0]) + b"a" + bytes([1]) + b"\x00")
    with pytest.raises(ValueError):  # declared size mismatch
        snappy_decompress(b"\x09" + bytes([3 << 2]) + b"wxyz")
    with pytest.raises(ValueError, match="max_output"):
        snappy_decompress(snappy_compress(b"a" * 5000), max_output=100)


# --- properties ----------------------------------------------------------------------

_payload = hst.one_of(
    hst.binary(max_size=400),
    hst.binary(max_size=40).map(lambda b: b * 97),
    hst.text(max_size=300).map(lambda s: s.encode()),
)


@given(_payload)
@settings(max_examples=200)
def test_roundtrip_property(data):
    assert snappy_decompress(snappy_compress(data)) == data


@given(_payload)
@settings(max_examples=100)
def test_xerial_roundtrip_and_sniff(data):
    x = xerial_compress(data)
    assert x.startswith(XERIAL_MAGIC)
    assert xerial_decompress(x) == data
    assert kafka_snappy_decompress(x) == data
    assert kafka_snappy_decompress(snappy_compress(data)) == data


@given(_payload, hst.data())
@settings(max_examples=200)
def test_corruption_is_loud_or_wellformed(data, draw):
    """Single-byte corruption either raises ValueError or yields bytes
    of the DECLARED length (snappy has no checksum — the declared-size
    cross-check is the only integrity net, and the Kafka batch CRC32C
    above this layer is the real guard)."""
    block = bytearray(snappy_compress(data))
    pos = draw.draw(hst.integers(0, len(block) - 1))
    block[pos] = draw.draw(hst.integers(0, 255))
    try:
        out = snappy_decompress(bytes(block))
    except ValueError:
        return
    assert isinstance(out, bytes)


# --- interop -------------------------------------------------------------------------


@pytest.mark.skipif(not _HAVE_PA, reason="pyarrow snappy unavailable")
@given(_payload)
@settings(max_examples=60)
def test_interop_decodes_reference_blocks(data):
    comp = _pa.compress(data, codec="snappy", asbytes=True)
    assert snappy_decompress(comp) == data


@pytest.mark.skipif(not _HAVE_PA, reason="pyarrow snappy unavailable")
@given(_payload)
@settings(max_examples=60)
def test_interop_reference_decodes_our_blocks(data):
    mine = snappy_compress(data)
    back = _pa.decompress(
        mine, decompressed_size=len(data), codec="snappy", asbytes=True
    )
    assert back == data


@pytest.mark.skipif(not _HAVE_PA, reason="pyarrow snappy unavailable")
def test_interop_large_repetitive():
    data = (b"0123456789abcdef" * 8192) + b"tail"
    assert snappy_decompress(
        _pa.compress(data, codec="snappy", asbytes=True)
    ) == data
    mine = snappy_compress(data)
    assert len(mine) < len(data) // 10  # actually compressed
    assert _pa.decompress(
        mine, decompressed_size=len(data), codec="snappy", asbytes=True
    ) == data


# --- Kafka integration ---------------------------------------------------------------


def test_record_batch_snappy_roundtrip():
    from pipegen_spark.sources.kafka_wire import (
        COMPRESSION_SNAPPY,
        decode_record_batches,
        encode_record_batch,
    )

    recs = [(b"k%d" % i, b"v" * 60, 500 + i, ()) for i in range(30)]
    batch = encode_record_batch(
        recs, base_offset=2, base_timestamp=500,
        compression=COMPRESSION_SNAPPY,
    )
    attributes = struct.unpack_from(">h", batch, 21)[0]
    assert attributes & 0x07 == 2
    out = decode_record_batches(batch)
    assert out == [
        (2 + i, ts, k, v, hs) for i, (k, v, ts, hs) in enumerate(recs)
    ]
    plain = encode_record_batch(recs, base_offset=2, base_timestamp=500)
    assert len(batch) < len(plain)
