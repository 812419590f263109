"""Zstandard decoder contract (pipegen_spark/sources/zstd.py).

The decoder's evidence is dominated by INTEROP against the reference C
library (pyarrow bundles real libzstd): frames produced at compression
levels 1..22 across payload shapes chosen to force every entropy path —
Huffman-compressed literals (direct AND FSE-compressed weights),
treeless reuse, 1-stream and 4-stream layouts, predefined / RLE /
FSE-compressed / repeat sequence tables — with a spy asserting the
paths actually executed (a decoder that silently falls back to easy
paths would pass a naive roundtrip). Plus: the published xxHash64
vector, hand-assembled golden frames for raw/RLE blocks and RLE
literals, hostile-bytes properties over our own store-mode frames, and
Kafka codec-4 batches.

The predefined FSE distributions were verified against the reference
binary itself (the int16 arrays inside pyarrow's bundled libzstd match
_LL/_ML/_OF_DEFAULT verbatim) — that check lives in this file so a
typo'd table can never come back.
"""

from __future__ import annotations

import glob
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as hst

from pipegen_spark.sources import zstd as Z
from pipegen_spark.sources.zstd import (
    xxh64,
    zstd_compress_store,
    zstd_decompress,
)

try:
    import pyarrow as _pa

    _pa.compress(b"x", codec="zstd", asbytes=True)
    _HAVE_PA = True
except Exception:  # pragma: no cover
    _HAVE_PA = False


def test_xxh64_published_empty_vector():
    assert xxh64(b"") == 0xEF46DB3751D8E999


def test_xxh64_all_loop_paths():
    # >=32 stripe loop, 8-byte, 4-byte and byte tails
    for n in (0, 1, 5, 9, 13, 31, 32, 33, 100):
        assert isinstance(xxh64(bytes(range(256))[:n]), int)
    assert xxh64(b"abc") != xxh64(b"abc", seed=1)


# --- golden frames (hand-assembled from RFC 8878) -----------------------------------


def test_golden_raw_and_rle_blocks():
    """Single-segment frame: FHD 0x20 (single segment, FCS 1 byte), a
    raw block then a last RLE block."""
    frame = (
        struct.pack("<I", Z.ZSTD_MAGIC)
        + bytes([0x20, 9])  # FHD, content size 9
        + (4 << 3 | 0 << 1 | 0).to_bytes(3, "little")  # raw, size 4
        + b"abcd"
        + (5 << 3 | 1 << 1 | 1).to_bytes(3, "little")  # RLE, size 5, last
        + b"z"
    )
    assert zstd_decompress(frame) == b"abcdzzzzz"


def test_golden_rle_literals_block():
    """A compressed block whose literals section is RLE (type 1) and
    whose sequence section is empty (nseq byte 0) — the one literals
    type reference encoders rarely emit."""
    # literals header: type=1 (RLE), size_format=0 -> regen = b0 >> 3
    block = bytes([(6 << 3) | (0 << 2) | 1]) + b"q" + b"\x00"
    frame = (
        struct.pack("<I", Z.ZSTD_MAGIC)
        + bytes([0x20, 6])
        + ((len(block) << 3) | (2 << 1) | 1).to_bytes(3, "little")
        + block
    )
    assert zstd_decompress(frame) == b"qqqqqq"


def test_golden_skippable_and_concatenated():
    a = zstd_compress_store(b"hello ")
    skip = struct.pack("<II", 0x184D2A50, 3) + b"xyz"
    b = zstd_compress_store(b"world")
    assert zstd_decompress(a + skip + b) == b"hello world"


def test_rejects_structural_garbage():
    with pytest.raises(ValueError, match="magic"):
        zstd_decompress(b"\x00\x00\x00\x00rest")
    with pytest.raises(ValueError):
        zstd_decompress(b"")
    good = bytearray(zstd_compress_store(b"payload"))
    bad = bytearray(good)
    bad[4] |= 0x08  # reserved FHD bit
    with pytest.raises(ValueError, match="reserved"):
        zstd_decompress(bytes(bad))
    bad = bytearray(good)
    bad[-1] ^= 1  # checksum
    with pytest.raises(ValueError, match="checksum"):
        zstd_decompress(bytes(bad))
    with pytest.raises(ValueError, match="max_output"):
        zstd_decompress(zstd_compress_store(b"a" * 5000), max_output=10)


def test_match_offset_bounded_by_current_frame():
    """A corrupt second frame whose match offset reaches into the
    PREVIOUS frame's output must raise, not silently copy bytes across
    the frame boundary (offsets are frame-relative per RFC 8878)."""
    # One sequence via RLE table mode (zero-bit states): ll=0 (llen 0),
    # of_code=2 (offset_value = 4 + 2 extra bits '00' = 4 -> offset 1),
    # ml=0 (mlen 3). Raw literals of size 0. Backward bitstream is one
    # sentinel byte carrying the two zero offset bits.
    block = bytes([
        0x00,        # literals: raw, regenerated size 0
        0x01,        # nseq = 1
        0x54,        # modes: ll=RLE, of=RLE, ml=RLE
        0x00,        # ll RLE symbol
        0x02,        # of RLE symbol
        0x00,        # ml RLE symbol
        0x04,        # bitstream: sentinel + '00' offset extra bits
    ])
    evil = (
        struct.pack("<I", Z.ZSTD_MAGIC)
        + bytes([0x20, 3])  # single segment, content size 3
        + ((len(block) << 3) | (2 << 1) | 1).to_bytes(3, "little")
        + block
    )
    # Standalone, the offset points before frame start -> loud.
    with pytest.raises(ValueError, match="beyond frame start"):
        zstd_decompress(evil)
    # Concatenated after a frame that DOES have output, the offset must
    # still be bounded by the current frame, not the shared buffer.
    with pytest.raises(ValueError, match="beyond frame start"):
        zstd_decompress(zstd_compress_store(b"hello ") + evil)


def test_dictionary_is_a_named_boundary():
    frame = struct.pack("<I", Z.ZSTD_MAGIC) + bytes([0x21, 7, 5])
    # FHD 0x21: single-segment + 1-byte dict id (7) + content size 5
    with pytest.raises(ValueError, match="[Dd]ictionar"):
        zstd_decompress(frame)


# --- the predefined tables, pinned against the reference binary ---------------------


@pytest.mark.skipif(not _HAVE_PA, reason="pyarrow unavailable")
def test_predefined_distributions_match_reference_binary():
    """Extract the int16 default-distribution arrays from the real
    libzstd compiled into pyarrow and compare verbatim — the r12 build
    caught a wrong ML table exactly this way."""
    libs = glob.glob(
        "/root/.pyenv/versions/*/lib/python*/site-packages/pyarrow/libarrow.so*"
    )
    if not libs:
        pytest.skip("libarrow not found")
    data = open(libs[0], "rb").read()
    ll = struct.pack("<16h", *Z._LL_DEFAULT[0][:16])
    i = data.find(ll)
    if i < 0:
        pytest.skip("default tables not located in binary")
    assert list(struct.unpack_from("<36h", data, i)) == Z._LL_DEFAULT[0]
    j = data.find(struct.pack("<10h", *Z._ML_DEFAULT[0][:10]))
    assert j >= 0
    assert list(struct.unpack_from("<53h", data, j)) == Z._ML_DEFAULT[0]
    k = data.find(struct.pack("<10h", *Z._OF_DEFAULT[0][:10]))
    assert k >= 0
    assert list(struct.unpack_from("<29h", data, k)) == Z._OF_DEFAULT[0]


# --- store-mode encoder ---------------------------------------------------------------


_payload = hst.one_of(
    hst.binary(max_size=500),
    hst.binary(max_size=50).map(lambda b: b * 61),
    hst.text(max_size=300).map(lambda s: s.encode()),
)


@given(_payload)
@settings(max_examples=100)
def test_store_mode_roundtrip(data):
    assert zstd_decompress(zstd_compress_store(data)) == data


@pytest.mark.skipif(not _HAVE_PA, reason="pyarrow zstd unavailable")
@given(_payload)
@settings(max_examples=60)
def test_store_mode_reads_in_reference_decoder(data):
    frame = zstd_compress_store(data)
    back = _pa.decompress(
        frame, decompressed_size=len(data), codec="zstd", asbytes=True
    )
    assert back == data


def test_store_mode_multiblock_and_fcs_sizes():
    for n in (0, 255, 256, 300, 70000, 300000):
        data = bytes(i & 0xFF for i in range(n))
        assert zstd_decompress(zstd_compress_store(data)) == data


@given(_payload, hst.data())
@settings(max_examples=200)
def test_corruption_is_loud_or_exact(data, draw):
    """With the xxHash64 content checksum on every frame, single-byte
    corruption either raises ValueError or returns the exact input."""
    frame = bytearray(zstd_compress_store(data))
    pos = draw.draw(hst.integers(0, len(frame) - 1))
    frame[pos] = draw.draw(hst.integers(0, 255))
    try:
        out = zstd_decompress(bytes(frame))
    except ValueError:
        return
    assert out == data


@given(_payload, hst.data())
@settings(max_examples=120)
def test_prefix_truncation_is_loud(data, draw):
    frame = zstd_compress_store(data)
    cut = draw.draw(hst.integers(0, len(frame) - 1))
    with pytest.raises(ValueError):
        zstd_decompress(frame[:cut])


# --- interop: the real library's frames, every entropy path ---------------------------


@pytest.mark.skipif(not _HAVE_PA, reason="pyarrow zstd unavailable")
def test_interop_reference_frames_all_paths():
    """Decode frames from libzstd at levels 1..22 over payload shapes
    that force every literals/sequence path, and ASSERT the paths ran."""
    import collections
    import random

    counts = collections.Counter()
    orig_lit = Z._decode_literals
    orig_seq = Z._read_seq_table
    orig_huf = Z._read_huffman_tree

    def lit_spy(block, pos, state):
        counts[f"lit{block[pos] & 3}"] += 1
        return orig_lit(block, pos, state)

    def seq_spy(data, pos, mode, kind, state):
        counts[f"mode{mode}"] += 1
        return orig_seq(data, pos, mode, kind, state)

    def huf_spy(data, pos):
        counts["huf_fse" if data[pos] < 128 else "huf_direct"] += 1
        return orig_huf(data, pos)

    Z._decode_literals = lit_spy
    Z._read_seq_table = seq_spy
    Z._read_huffman_tree = huf_spy
    try:
        rng = random.Random(42)
        words = [b"alpha", b"beta", b"gamma", b"request", b"response"]
        for level in (1, 3, 9, 19, 22):
            codec = _pa.Codec("zstd", compression_level=level)
            for shape in range(4):
                n = rng.randrange(2000, 200000)
                if shape == 0:
                    data = b" ".join(
                        rng.choice(words) for _ in range(n // 6)
                    )[:n]
                elif shape == 1:
                    data = (b"A" * 100 + b"B" * 3) * (n // 103 + 1)
                    data = data[:n]
                elif shape == 2:
                    data = bytes(rng.randrange(16) for _ in range(n))
                else:
                    data = bytes(rng.randrange(256) for _ in range(n))
                comp = codec.compress(data, asbytes=True)
                assert zstd_decompress(comp) == data, (level, shape, n)
    finally:
        Z._decode_literals = orig_lit
        Z._read_seq_table = orig_seq
        Z._read_huffman_tree = orig_huf
    # every hard path must have executed
    for key in ("lit0", "lit2", "lit3", "huf_fse", "huf_direct",
                "mode0", "mode1", "mode2", "mode3"):
        assert counts[key] > 0, (key, dict(counts))


@pytest.mark.skipif(not _HAVE_PA, reason="pyarrow zstd unavailable")
@given(hst.binary(max_size=2000), hst.sampled_from([1, 6, 15]))
@settings(max_examples=60, deadline=None)
def test_interop_reference_frames_property(data, level):
    codec = _pa.Codec("zstd", compression_level=level)
    assert zstd_decompress(codec.compress(data, asbytes=True)) == data


# --- Kafka integration -----------------------------------------------------------------


def test_record_batch_zstd_roundtrip():
    from pipegen_spark.sources.kafka_wire import (
        COMPRESSION_ZSTD,
        decode_record_batches,
        encode_record_batch,
    )

    recs = [(b"k%d" % i, b"v" * 60, 900 + i, ()) for i in range(30)]
    batch = encode_record_batch(
        recs, base_offset=1, base_timestamp=900,
        compression=COMPRESSION_ZSTD,
    )
    attributes = struct.unpack_from(">h", batch, 21)[0]
    assert attributes & 0x07 == 4
    out = decode_record_batches(batch)
    assert out == [
        (1 + i, ts, k, v, hs) for i, (k, v, ts, hs) in enumerate(recs)
    ]


@pytest.mark.skipif(not _HAVE_PA, reason="pyarrow zstd unavailable")
def test_record_batch_real_zstd_frames_decode():
    """A batch whose records section was compressed by the REAL
    library (what an in-the-wild producer ships) must decode through
    our from-scratch path — swap the store-mode body for a libzstd
    frame and fix up the CRC."""
    from pipegen_spark.sources.kafka_wire import (
        COMPRESSION_ZSTD,
        crc32c,
        decode_record_batches,
        encode_record_batch,
    )

    recs = [(b"k%d" % i, b"payload %d " % i * 5, 70 + i, ())
            for i in range(20)]
    plain = encode_record_batch(recs, base_offset=5, base_timestamp=70)
    # plain records section starts after the 61-byte batch prelude
    records_section = plain[61:]
    real = _pa.compress(records_section, codec="zstd", asbytes=True)
    # rebuild: attributes(2)+lastOffsetDelta(4) fresh with codec 4,
    # then baseTimestamp..recordCount verbatim from the plain batch
    # (bytes 27..61 of the 61-byte prelude), then the libzstd body
    after_crc = (
        struct.pack(">hi", COMPRESSION_ZSTD, len(recs) - 1)
        + plain[27:61]
        + real
    )
    inner = struct.pack(">ibI", -1, 2, crc32c(after_crc)) + after_crc
    batch = struct.pack(">qi", 5, len(inner)) + inner
    out = decode_record_batches(batch)
    assert out == [
        (5 + i, ts, k, v, hs) for i, (k, v, ts, hs) in enumerate(recs)
    ]


# --- entropy-coded encoder (r13) ----------------------------------------------


def _structured(draw):
    """Payloads with real match structure (the case the encoder exists
    for), assembled from a small token pool with random repetition."""
    pool = draw(hst.lists(hst.binary(min_size=1, max_size=24),
                          min_size=1, max_size=8))
    picks = draw(hst.lists(hst.integers(0, len(pool) - 1),
                           min_size=0, max_size=200))
    return b"".join(pool[i] for i in picks)


@settings(max_examples=60, deadline=None)
@given(hst.one_of(hst.binary(max_size=4096),
                  hst.builds(lambda: None).flatmap(
                      lambda _: hst.data())))
def test_entropy_encode_roundtrip_any_bytes(data):
    if not isinstance(data, bytes):
        data = _structured(data.draw)
    frame = Z.zstd_compress(data)
    assert zstd_decompress(frame) == data


@pytest.mark.skipif(not _HAVE_PA, reason="pyarrow zstd unavailable")
@settings(max_examples=60, deadline=None)
@given(hst.data())
def test_entropy_encode_reads_in_reference_decoder(data):
    """Own entropy-coded frames must decode in REAL libzstd — the same
    interop standard the decoder is held to, now in both directions."""
    payload = _structured(data.draw)
    frame = Z.zstd_compress(payload)
    codec = _pa.Codec("zstd")
    assert codec.decompress(frame, len(payload)).to_pybytes() == payload


def test_entropy_encode_actually_compresses():
    """The point over zstd_compress_store: repetitive payloads shrink
    (store mode adds 14 bytes of envelope, always)."""
    for payload, bound in (
        (b"hello world " * 500, 100),
        (b"abcabcabc" * 2000, 60),
        (bytes(range(256)) * 64, 600),
    ):
        frame = Z.zstd_compress(payload)
        assert len(frame) < bound < len(payload)
        assert zstd_decompress(frame) == payload
        assert len(Z.zstd_compress_store(payload)) > len(payload)


def test_entropy_encode_multiblock_and_incompressible():
    """>128 KiB payloads span blocks; the random tail block falls back
    to raw (entropy coding must never inflate a block)."""
    import hashlib

    rnd = b"".join(
        hashlib.sha256(bytes([i])).digest() for i in range(256)
    )  # 8 KiB incompressible
    payload = (b"structured " * 12000) + rnd * 20  # ~132K + 160K
    frame = Z.zstd_compress(payload)
    assert zstd_decompress(frame) == payload
    if _HAVE_PA:
        codec = _pa.Codec("zstd")
        assert codec.decompress(frame, len(payload)).to_pybytes() == payload
    # incompressible-only payload: legal frame, raw blocks, tiny overhead
    f2 = Z.zstd_compress(rnd)
    assert zstd_decompress(f2) == rnd
    assert len(f2) <= len(rnd) + 14 + 3 * (len(rnd) // (1 << 17) + 1)


def test_entropy_encode_long_sequence_count_header():
    """Force the 2- and 3-byte Number_of_Sequences headers (128..32511
    and >=32512) through a hand-built sequence list, framed manually and
    decoded by BOTH decoders — the greedy matcher alone cannot reach
    the 0x7F00 path on a 128 KiB block."""
    for nseq in (300, 0x7F00 + 40):
        seqs = [(1, 1, 3)] * nseq  # 1 literal, offset 1, match 3
        lits = b"ab" * ((nseq + 1) // 2)  # 1 literal per seq, round up
        lits = lits[:nseq]
        body = Z._lit_raw_header(len(lits)) + lits + Z._encode_sequences(
            seqs
        )
        regen = nseq * 4
        fhd = (2 << 6) | 0x20  # single segment, 4-byte FCS, no checksum
        frame = (
            struct.pack("<I", Z.ZSTD_MAGIC)
            + bytes([fhd])
            + struct.pack("<I", regen)
            + ((len(body) << 3) | 4 | 1).to_bytes(3, "little")
            + body
        )
        out = zstd_decompress(frame)
        assert len(out) == regen
        # reconstruct expected: each seq copies prev byte 3x after 1 lit
        exp = bytearray()
        for i in range(nseq):
            exp += lits[i : i + 1]
            exp += exp[-1:] * 3
        assert out == bytes(exp)
        if _HAVE_PA:
            got = _pa.Codec("zstd").decompress(frame, regen).to_pybytes()
            assert got == bytes(exp)


def test_entropy_frames_carry_checksum_and_fcs():
    """Frame envelope parity with store mode: FCS honest, checksum
    verified (a flipped payload bit must fail loudly)."""
    payload = b"compressible compressible compressible" * 50
    frame = bytearray(Z.zstd_compress(payload))
    with pytest.raises(ValueError):
        bad = bytearray(frame)
        bad[-1] ^= 0x01  # checksum byte
        zstd_decompress(bytes(bad))


def test_entropy_encode_kafka_batch_path():
    """The broker/consumer contract: codec-4 v2 batches now ship
    entropy-coded frames (encode_record_batch switched from store mode
    to zstd_compress in r13) and must decode through the wire path —
    smaller than the store-mode batch on repetitive values."""
    from pipegen_spark.sources.kafka_wire import (
        decode_record_batches,
        encode_record_batch,
    )

    records = [(None, b"payload-%d" % (i % 3), i, ()) for i in range(40)]
    batch = encode_record_batch(records, base_offset=7, compression=4)
    got = decode_record_batches(batch)
    assert [(off, val) for off, _ts, _k, val, _h in got] == [
        (7 + i, b"payload-%d" % (i % 3)) for i in range(40)
    ]
    store = encode_record_batch(records, base_offset=7, compression=0)
    assert len(batch) < len(store)  # the codec earns its ratio
