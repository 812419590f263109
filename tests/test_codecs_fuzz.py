"""Hostile-bytes fuzz pass over the media codecs (round-9, VERDICT r8
task 6): 100 TB of scraped data is full of truncated and corrupted
media, so the decode boundary's contract is LOUD FAILURE — for any
mutation of a valid stream, a decoder must either return a
well-formed result (many mutations are benign: entropy-bit flips just
change pixels) or raise ValueError. Never an IndexError, struct.error,
KeyError, zlib.error, infinite loop, or silently-wrong shape.

The corpus is deterministic (seeded PRNG + exhaustive structural
sweeps), so a failure here is reproducible by seed.
"""

from __future__ import annotations

import hashlib
import random
import struct

import pytest

from pipegen_spark.operators.codecs import (
    avi_mjpeg_decode,
    avi_mjpeg_encode,
    jpeg_decode,
    jpeg_encode,
    jpeg_encode_progressive,
    png_decode,
    png_encode,
    wav_encode,
    wav_samples,
)

SEED = 0xC0DEC


def _seed_pixels(tag: str, n: int) -> bytes:
    return (hashlib.md5(tag.encode()).digest() * ((n // 16) + 1))[:n]


def _valid_streams() -> dict[str, tuple[bytes, object]]:
    """(name -> (valid bytes, decoder)) seed corpus covering every
    codec and its main layout variants."""
    px8 = _seed_pixels("rgb8", 8 * 8 * 3)
    px16 = _seed_pixels("rgb16", 16 * 16 * 3)
    gray = _seed_pixels("gray", 8 * 8)
    samples = [
        int.from_bytes(_seed_pixels(f"s{i}", 2), "little", signed=True)
        for i in range(64)
    ]
    jf = [jpeg_encode(8, 8, _seed_pixels(f"fr{i}", 192), 3) for i in range(3)]
    from tests.test_codecs import _hand_adam7, _hand_png16

    px16g = [
        int.from_bytes(_seed_pixels(f"g16-{i}", 2), "big")
        for i in range(6 * 5)
    ]
    return {
        "png_rgb": (png_encode(8, 8, px8, 3), png_decode),
        "png_gray": (png_encode(8, 8, gray, 1), png_decode),
        # r10 decode paths: Adam7 scatter and 16-bit high-byte
        # down-conversion — ragged 11x9 geometry so pass sub-images
        # have uneven widths (the hostile case for the pass walker).
        "png_adam7": (
            _hand_adam7(11, 9, 3, _seed_pixels("adam7", 11 * 9 * 3)),
            png_decode,
        ),
        "png_16bit": (_hand_png16(6, 5, 1, px16g, 0), png_decode),
        "png_2bit_pal_adam7": (
            __import__("tests.test_codecs", fromlist=["x"])
            ._hand_png_subbyte(
                9, 7, 2, 3,
                [(i * 5) % 4 for i in range(63)],
                interlace=1,
                palette=bytes(range(12)),
            ),
            png_decode,
        ),
        "jpeg_baseline": (jpeg_encode(16, 16, px16, 3), jpeg_decode),
        "jpeg_progressive": (
            jpeg_encode_progressive(16, 16, px16, 3),
            jpeg_decode,
        ),
        "jpeg_420": (
            jpeg_encode(16, 16, px16, 3, subsampling="420"),
            jpeg_decode,
        ),
        "jpeg_gray": (jpeg_encode(8, 8, gray, 1), jpeg_decode),
        "wav": (wav_encode(samples, sample_rate=8000), wav_samples),
        # r10 widened WAV subset: hand-framed float32 stream
        "wav_f32": (
            b"RRP".replace(b"RRP", b"RIFF")
            + __import__("struct").pack("<I", 4 + 24 + 8 + 64)
            + b"WAVE"
            + b"fmt "
            + __import__("struct").pack(
                "<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32
            )
            + b"data"
            + __import__("struct").pack("<I", 64)
            + __import__("struct").pack(
                "<16f", *[(i - 8) / 9.0 for i in range(16)]
            ),
            wav_samples,
        ),
        "avi_mjpeg": (avi_mjpeg_encode(jf, 8, 8, fps=4), avi_mjpeg_decode),
        # r11 audio containers/codecs, seeded from the REAL fixture
        # files (tests/fixtures/real_media — produced by other
        # encoders): G.711 mu-law WAV, AIFF PCM, AIFF-C mu-law, .au.
        "wav_g711": (_real_media("cpython_ulaw8.wav"), wav_samples),
        "aiff_pcm16": (
            _real_media("cpython_pcm16.aiff"),
            __import__(
                "pipegen_spark.operators.codecs", fromlist=["x"]
            ).aiff_samples,
        ),
        "aifc_ulaw": (
            _real_media("cpython_ulaw.aifc"),
            __import__(
                "pipegen_spark.operators.codecs", fromlist=["x"]
            ).aiff_samples,
        ),
        "au_ulaw": (
            _real_media("cpython_ulaw.au"),
            __import__(
                "pipegen_spark.operators.codecs", fromlist=["x"]
            ).au_samples,
        ),
        # r11 GIF: a real GIF89a icon seeds the LZW/sub-block walker
        "gif_89a": (
            _real_media("idle_32.gif"),
            __import__(
                "pipegen_spark.operators.codecs", fromlist=["x"]
            ).gif_decode,
        ),
    }


def _real_media(name: str) -> bytes:
    import os

    p = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "fixtures",
        "real_media",
        name,
    )
    with open(p, "rb") as fh:
        return fh.read()


def _must_fail_loudly(decoder, data: bytes, ctx: str) -> None:
    """The contract: decode returns or raises ValueError. Anything else
    (IndexError, struct.error, KeyError, zlib.error, TypeError, ...)
    is a latent crash on scraped data."""
    try:
        decoder(data)
    except ValueError:
        pass
    except Exception as exc:  # noqa: BLE001 — the assertion target
        pytest.fail(f"{ctx}: {type(exc).__name__}: {exc!r}")


@pytest.mark.parametrize("name", sorted(_valid_streams()))
def test_fuzz_truncations(name):
    """Every prefix of a valid stream decodes or raises ValueError
    (exhaustive for short streams, strided for long ones)."""
    data, decoder = _valid_streams()[name]
    step = 1 if len(data) < 600 else 7
    for cut in range(0, len(data), step):
        _must_fail_loudly(decoder, data[:cut], f"{name} truncated@{cut}")


@pytest.mark.parametrize("name", sorted(_valid_streams()))
def test_fuzz_byte_flips(name):
    """Seeded single-byte corruption across the whole stream (headers,
    length fields, entropy data alike)."""
    data, decoder = _valid_streams()[name]
    rng = random.Random(SEED)
    positions = sorted(
        rng.sample(range(len(data)), min(len(data), 250))
    )
    for pos in positions:
        for val in (0x00, 0xFF, data[pos] ^ 0x01, data[pos] ^ 0x80):
            mutated = data[:pos] + bytes([val]) + data[pos + 1 :]
            _must_fail_loudly(decoder, mutated, f"{name} flip@{pos}={val}")


@pytest.mark.parametrize("name", sorted(_valid_streams()))
def test_fuzz_length_field_tampering(name):
    """Write adversarial 32-bit values at seeded aligned offsets —
    the classic crafted-length attack on chunked formats."""
    data, decoder = _valid_streams()[name]
    rng = random.Random(SEED + 1)
    offsets = sorted(
        rng.sample(range(max(1, len(data) - 4)), min(len(data) - 4, 60))
    )
    for off in offsets:
        for evil in (0, 1, 0x7FFFFFFF, 0xFFFFFFFF, len(data) * 2):
            mutated = bytearray(data)
            struct.pack_into("<I", mutated, off, evil & 0xFFFFFFFF)
            _must_fail_loudly(
                decoder, bytes(mutated), f"{name} len@{off}={evil}"
            )


@pytest.mark.parametrize("name", sorted(_valid_streams()))
def test_fuzz_slice_deletions_and_duplications(name):
    """Seeded structural mutations: delete or double interior slices
    (simulates torn downloads and repeated network chunks)."""
    data, decoder = _valid_streams()[name]
    rng = random.Random(SEED + 2)
    for _ in range(80):
        lo = rng.randrange(0, len(data))
        hi = min(len(data), lo + rng.randrange(1, 48))
        deleted = data[:lo] + data[hi:]
        doubled = data[:hi] + data[lo:hi] + data[hi:]
        _must_fail_loudly(decoder, deleted, f"{name} del[{lo}:{hi}]")
        _must_fail_loudly(decoder, doubled, f"{name} dup[{lo}:{hi}]")


def test_fuzz_random_garbage():
    """Pure noise (plus noise wearing each format's magic) must raise
    ValueError from every decoder."""
    rng = random.Random(SEED + 3)
    magics = [
        b"",
        b"\x89PNG\r\n\x1a\n",
        b"\xff\xd8\xff",
        b"RIFF\x20\x00\x00\x00WAVE",
        b"RIFF\x20\x00\x00\x00AVI ",
    ]
    decoders = [png_decode, jpeg_decode, wav_samples, avi_mjpeg_decode]
    for _ in range(60):
        noise = bytes(rng.randrange(256) for _ in range(rng.randrange(600)))
        for magic in magics:
            for dec in decoders:
                blob = magic + noise
                try:
                    dec(blob)
                except ValueError:
                    continue
                except Exception as exc:  # noqa: BLE001
                    pytest.fail(
                        f"{dec.__name__} on {magic!r}+noise: "
                        f"{type(exc).__name__}: {exc!r}"
                    )
