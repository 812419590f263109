"""Real in-the-wild media through the gated codec paths (round-11,
r10 VERDICT task 8 stretch).

The codec fuzz corpus is synthetic/self-built; these fixtures are
GENUINE files produced by other encoders, shipped with common OS
packages, copied into `tests/fixtures/real_media/`:

- camera_baseline_420.jpg — a real photographic JPEG (Spark's bundled
  mllib sample images): baseline SOF0, 4:2:0 chroma subsampling,
  199x313 — the shape a camera pipeline emits.
- web_progressive.jpg — a real progressive (SOF2) web-asset JPEG
  (nodejs docs), 493x58 4:4:4.
- doc_16bit_rgba.png — a REAL 16-bit-per-channel RGBA PNG (gnupg
  docs, 1052x744): the deep-color path.
- libpng_adam7_rgba.png — libpng's own pngtest.png: 8-bit RGBA,
  Adam7 INTERLACED — the canonical independent-encoder PNG.
- favicon_2bit_palette.png / icon_4bit_palette.png — real sub-byte
  bit-depth palette PNGs (gitweb favicon, gvim icon).
- cpython_pcm24.wav — CPython's test-suite 24-bit stereo PCM WAV.
- ipython_pcm16.wav — IPython's test-suite 16-bit mono PCM WAV.

Each decodes through the SAME functions the gated multimodal queries
run (`png_decode` / `jpeg_decode` / `wav_samples` and the
`auto_decode` dispatcher); dimensions and a sha256 of the decoded
pixel/sample bytes are pinned, so a codec regression on real-world
bytes (not just self-encoded ones) fails loudly here.
"""

from __future__ import annotations

import hashlib
import os
import struct

import pytest

from pipegen_spark.operators.codecs import (
    auto_decode,
    jpeg_decode,
    png_decode,
    wav_samples,
)

FIXTURES = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "real_media"
)


def _load(name: str) -> bytes:
    with open(os.path.join(FIXTURES, name), "rb") as fh:
        return fh.read()


# (file, width, height, channels, sha256(decoded pixels)[:16])
PNG_CASES = [
    ("doc_16bit_rgba.png", 1052, 744, 4, "8afbc817ef8d237e"),
    ("libpng_adam7_rgba.png", 91, 69, 4, "a8adc4b0c6c6b43e"),
    ("favicon_2bit_palette.png", 16, 16, 3, "6b0e168df0505c6e"),
    ("icon_4bit_palette.png", 16, 16, 3, "78f67379a0b47a7e"),
]

JPEG_CASES = [
    ("camera_baseline_420.jpg", 199, 313, 3, "dadf1a36338c7113"),
    ("web_progressive.jpg", 493, 58, 3, "bea0896636899794"),
]

# Real GIFs from OS packages: a GIF89a icon (IDLE), a large GIF87a
# diagram (libxslt docs — exercises deferred-clear dictionary-full
# streams), and a small GIF87a web logo.
GIF_CASES = [
    ("idle_32.gif", 32, 32, "b4c71eaa7ec9e9de"),
    ("doc_diagram_87a.gif", 648, 521, "27b32f0d89acf643"),
    ("web_logo_87a.gif", 90, 34, "e4397f1bc496056b"),
]

# (file, n_samples, sha256(int64-LE packed samples)[:16])
WAV_CASES = [
    ("cpython_pcm24.wav", 6614, "04adcb0a533760e9"),
    ("ipython_pcm16.wav", 22050, "479ec9a7380dae1e"),
    # Real G.711 mu-law telephony samples (CPython's pluck-ulaw.au
    # payload, re-containered as a fmt-7 RIFF/WAVE — the .au and WAV
    # byte streams for mu-law are identical, only the header differs).
    ("cpython_ulaw8.wav", 6614, "df98f623fe43a9ee"),
]

# auto_decode's gated feature surface per fixture (feat_norm is the
# value the multimodal queries aggregate — pinned so the dispatcher
# path stays bit-stable too).
AUTO_FEAT_NORM = {
    "doc_16bit_rgba.png": 8628931358086,
    "libpng_adam7_rgba.png": 218247250,
    "favicon_2bit_palette.png": 362016,
    "icon_4bit_palette.png": 163652,
    "camera_baseline_420.jpg": 10167131783,
    "web_progressive.jpg": 5556808840,
    "cpython_pcm24.wav": 12891268,
    "ipython_pcm16.wav": 349970988,
    "cpython_ulaw8.wav": 12865212,
    # AIFF / AIFF-C / .au route through their own real decoders
    "cpython_pcm16.aiff": 12893842,
    "cpython_ulaw.aifc": 12865050,
    "cpython_alaw.aifc": 12892254,
    "cpython_ulaw.au": 12865212,
    "cpython_pcm16.au": 12886870,
    "idle_32.gif": 2818142,
    "web_logo_87a.gif": 22344876,
}


@pytest.mark.parametrize("name,w,h,ch,digest", PNG_CASES)
def test_real_png_decodes(name, w, h, ch, digest):
    got_w, got_h, got_ch, pixels = png_decode(_load(name))
    assert (got_w, got_h, got_ch) == (w, h, ch)
    assert len(pixels) == w * h * ch
    assert hashlib.sha256(pixels).hexdigest()[:16] == digest


@pytest.mark.parametrize("name,w,h,digest", GIF_CASES)
def test_real_gif_decodes(name, w, h, digest):
    from pipegen_spark.operators.codecs import gif_decode

    got_w, got_h, ch, pixels = gif_decode(_load(name))
    assert (got_w, got_h, ch) == (w, h, 3)
    assert len(pixels) == w * h * 3
    assert hashlib.sha256(pixels).hexdigest()[:16] == digest


@pytest.mark.parametrize("name,w,h,ch,digest", JPEG_CASES)
def test_real_jpeg_decodes(name, w, h, ch, digest):
    got_w, got_h, got_ch, pixels = jpeg_decode(_load(name))
    assert (got_w, got_h, got_ch) == (w, h, ch)
    assert len(pixels) == w * h * ch
    assert hashlib.sha256(pixels).hexdigest()[:16] == digest


@pytest.mark.parametrize("name,n,digest", WAV_CASES)
def test_real_wav_decodes(name, n, digest):
    samples = wav_samples(_load(name))
    assert len(samples) == n
    packed = b"".join(struct.pack("<q", s) for s in samples)
    assert hashlib.sha256(packed).hexdigest()[:16] == digest


# (file, decoder, n_samples, sha256(int64-LE packed samples)[:16])
AIFF_AU_CASES = [
    ("cpython_pcm16.aiff", "aiff", 6614, "46497966e1a3f2a1"),
    ("cpython_pcm24.aiff", "aiff", 6614, "04adcb0a533760e9"),
    ("cpython_pcm8.aiff", "aiff", 6614, "af1935fdf23c627a"),
    ("cpython_ulaw.aifc", "aiff", 6614, "91625fd82a7ff629"),
    ("cpython_alaw.aifc", "aiff", 6614, "4c67d50497105d60"),
    ("cpython_ulaw.au", "au", 6614, "df98f623fe43a9ee"),
    ("cpython_pcm16.au", "au", 6614, "3bc57eae33822a29"),
]


@pytest.mark.parametrize("name,kind,n,digest", AIFF_AU_CASES)
def test_real_aiff_au_decodes(name, kind, n, digest):
    from pipegen_spark.operators.codecs import aiff_samples, au_samples

    fn = aiff_samples if kind == "aiff" else au_samples
    samples = fn(_load(name))
    assert len(samples) == n
    packed = b"".join(struct.pack("<q", s) for s in samples)
    assert hashlib.sha256(packed).hexdigest()[:16] == digest


def test_cross_container_sample_equality():
    """The strongest independent check three containers can give each
    other: where CPython's fixtures hold the SAME encoded audio, the
    three decoders must agree bit-for-bit; where the fixtures were
    generated through independent lossy chains (the pcm16/pcm8 twins
    differ at source by a few quantization steps), the decoded streams
    must still agree within that source tolerance — a sign, endian, or
    companding bug would diverge by thousands, not ≤16."""
    from pipegen_spark.operators.codecs import (
        aiff_samples,
        au_samples,
        wav_samples,
    )

    # Bit-exact pairs (same source samples, different container):
    assert wav_samples(_load("cpython_pcm24.wav")) == aiff_samples(
        _load("cpython_pcm24.aiff")
    )
    assert wav_samples(_load("cpython_ulaw8.wav")) == au_samples(
        _load("cpython_ulaw.au")
    )
    # Independently-generated twins: tight tolerance.
    for a, b in [
        (
            wav_samples(_load("cpython_pcm16.wav")),
            aiff_samples(_load("cpython_pcm16.aiff")),
        ),
        (
            wav_samples(_load("cpython_pcm16.wav")),
            au_samples(_load("cpython_pcm16.au")),
        ),
        (
            wav_samples(_load("cpython_pcm8.wav")),
            aiff_samples(_load("cpython_pcm8.aiff")),
        ),
        (
            au_samples(_load("cpython_ulaw.au")),
            aiff_samples(_load("cpython_ulaw.aifc")),
        ),
    ]:
        assert len(a) == len(b)
        assert max(abs(x - y) for x, y in zip(a, b)) <= 512  # ≤2 lsb @8bit


def test_auto_decode_dispatches_real_files():
    """The gated queries' entry point: magic-byte dispatch must route
    every real fixture to its REAL decoder (feat_norm derives from
    decoded pixels/samples, not the payload digest) and stay
    bit-stable."""
    for name, expect in AUTO_FEAT_NORM.items():
        out = auto_decode(_load(name))
        assert out["feat_dim"] == 8
        assert out["feat_norm"] == expect, name
