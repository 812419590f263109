"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sampling run
as Arrow-batched `mapInPandas` operators so bytes never round-trip through
row-at-a-time Python.

Each operator takes a `decoder` callable. A REAL dependency-free PNG
codec ships in `operators/codecs.py` (`png_features` / `png_resize` /
`auto_decode` — stdlib zlib + the five spec filters; tested end-to-end
through these operators on genuine PNG bytes in tests/test_codecs.py).
The DETERMINISTIC FAKE (`fake_decode`) remains the default because the
synthetic gate payloads are text blobs, not media; `auto_decode`
dispatches on magic bytes when a corpus mixes both. Passing
`decoder=None` raises NotImplementedError at first batch, keeping the
no-codec boundary explicit (formats beyond the PNG subset — JPEG,
video, 16-bit/interlaced PNG — still need an injected PIL/ffmpeg-backed
callable in production).

Scale notes: payload columns dominate I/O — project them late, filter on
metadata first (predicate pushdown applies to the scalar columns). Batches
arrive sized by spark.sql.execution.arrow.maxRecordsPerBatch; decoding is
map-only and scales linearly with executors.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("meta_format", StringType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_sample_rate", IntegerType(), True),
        StructField("meta_duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_sha", StringType(), True),
        StructField("feat_dim", IntegerType(), True),
        StructField("feat_norm", LongType(), True),
    ]
)


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real codec: derives pseudo-features
    from the payload digest. Replace with a real decoder in production."""
    if payload is None:
        payload = b""
    sha = hashlib.sha256(payload).hexdigest()
    # 8 pseudo-feature ints from the digest
    feats = [int(sha[i * 4 : i * 4 + 4], 16) for i in range(8)]
    return {
        "n_bytes": len(payload),
        "content_sha": sha,
        "feat_dim": len(feats),
        "feat_norm": sum(f * f for f in feats),
    }


def extract_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    decoder: Callable[[bytes], dict] | None = fake_decode,
) -> DataFrame:
    """Arrow-batched decode/feature pass over a binary column.

    Only (id, content) are shipped to Python; everything else stays JVM-side
    and can be re-joined on id afterwards (cheaper than moving payloads
    twice).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder is None:
            raise NotImplementedError(
                "no media decoder available in this environment — supply "
                "`decoder=` (e.g. PIL/ffmpeg-backed) or use fake_decode"
            )
        for pdf in batches:
            rows = [decoder(p) for p in pdf[content_col]]
            out = pd.DataFrame(rows)
            out.insert(0, "media_id", pdf[id_col].values)
            yield out[[f.name for f in FEATURE_SCHEMA.fields]]

    return df.select(
        F.col(id_col).alias(id_col), F.col(content_col)
    ).mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
    ]
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real image resampler: tags the payload
    digest with the target geometry. Replace with a PIL/libvips-backed
    callable in production."""
    if payload is None:
        payload = b""
    digest = hashlib.sha256(payload).digest()
    return b"RSZ1|%dx%d|" % (width, height) + digest


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    id_col: str = "media_id",
    resizer: Callable[[bytes, int, int], bytes] | None = fake_resize,
) -> DataFrame:
    """Arrow-batched resize/transcode pass: (id, content) → (id, new
    content, new dims). Same stub boundary as `extract_features` —
    `resizer=None` raises at first batch so a missing codec is an explicit
    error, never silent passthrough. Map-only; payloads cross the Arrow
    boundary once each way, metadata columns re-join on id JVM-side."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if resizer is None:
            raise NotImplementedError(
                "no media resizer available in this environment — supply "
                "`resizer=` (e.g. PIL-backed) or use fake_resize"
            )
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "content": [
                        resizer(p, width, height) for p in pdf[content_col]
                    ],
                    "meta_width": width,
                    "meta_height": height,
                }
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(content_col)
    ).mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    duration_col: str = "meta_duration_ms",
) -> DataFrame:
    """Explode a video row into frame timestamps (plumbing only: the frame
    *extraction* belongs in the decoder). Pure JVM-side sequence explode."""
    return df.select(
        id_col,
        F.explode(
            F.expr(f"sequence(CAST(0 AS BIGINT), {duration_col}, {every_ms})")
        ).alias("frame_ts_ms"),
    )


def phash_expr(sha_col: str, d: str) -> str:
    """7-bit dHash over the 8 decoded pseudo-features (adjacent-field
    comparisons of the payload digest): bit_i = [feat_i > feat_i+1].
    The BLOCKING key for media near-dup — candidates sharing a bucket
    verify downstream on the full content hash, exactly like LSH
    banding for text. Dual-dialect (hex-field arithmetic mirrors
    fake_decode on both engines)."""
    def feat(i: int) -> str:
        if d == "spark":
            return (
                f"CAST(conv(substr({sha_col}, {i * 4 + 1}, 4), 16, 10)"
                " AS BIGINT)"
            )
        return f"CAST(('0x' || substr({sha_col}, {i * 4 + 1}, 4)) AS BIGINT)"

    bits = [
        f"(CASE WHEN {feat(i)} > {feat(i + 1)} THEN {1 << i} ELSE 0 END)"
        for i in range(7)
    ]
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"
