"""Event-time windowing + watermark helpers.

The reference only ever emits tumbling windows (SURVEY.md §2C —
no HOP/SESSION anywhere in its repo) and mentions watermarks as advice
(internal/llm/service.go:1074). Here all three window kinds and watermarks
are first-class; watermarks are REQUIRED for streaming aggregations so
state stays bounded (100 TB discipline: unbounded keyed state is the
failure mode, not throughput).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """`withWatermark` passthrough — named here so pipelines read
    declaratively (delay e.g. '10 minutes')."""
    return df.withWatermark(ts_col, delay)


def tumbling(ts_col: str, size: str) -> Column:
    """TUMBLE(ts, INTERVAL size) ≡ window(ts, size)."""
    return F.window(ts_col, size)


def sliding(ts_col: str, size: str, slide: str) -> Column:
    """HOP ≡ window(ts, size, slide) — superset of the reference."""
    return F.window(ts_col, size, slide)


def session(ts_col: str, gap: str) -> Column:
    """SESSION ≡ session_window(ts, gap) — superset of the reference."""
    return F.session_window(ts_col, gap)


def windowed_counts(
    df: DataFrame,
    ts_col: str,
    size: str,
    keys: list[str],
    watermark: str | None = None,
) -> DataFrame:
    """The reference's canonical generated aggregation
    (docs-site/ai-generation.md:259-275): tumbling count per key with
    window_start/window_end columns."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(tumbling(ts_col, size), *keys)
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            "cnt",
        )
    )


def grouped_with_watermark(
    df: DataFrame, ts_col: str, size: str, watermark: str, keys: list[str]
):
    """Watermarked window grouping, ready for .agg(...)."""
    return df.withWatermark(ts_col, watermark).groupBy(
        tumbling(ts_col, size), *keys
    )
