"""Stateful streaming deduplication.

The reference only *flags* duplicates via a generated `is_duplicate`
column (internal/llm/service.go:1064) and leaves windowed dedup as advice.
Here dedup is an operator:

- `dedup_stream(df, keys)` — exact dedup over the whole stream (state grows
  with distinct keys; use only for bounded key spaces);
- `dedup_stream(df, keys, ts_col, watermark)` — watermark-bounded state via
  dropDuplicatesWithinWatermark: the 100 TB-safe default, state is purged
  once the event-time watermark passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    df: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    if ts_col and watermark:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return df.dropDuplicates(keys)
