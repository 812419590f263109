"""Rate-controlled synthetic producer with traffic-pattern spikes.

Reference parity (internal/pipeline/producer.go:113-235): the Go producer
re-computes its ticker every 100 ms from the traffic pattern. In Spark the
`rate` source fixes rowsPerSecond at query start, so spikes are realized by
running the source at the schedule's MAX rate and down-sampling each
micro-batch to the current target rate inside foreachBatch — same effective
schedule, but generation stays distributed.

The sink callable receives (DataFrame, batch_id, target_rate) per batch;
`collecting_sink` accumulates counts for tests/monitoring.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from pipegen_spark.generator.synthetic import synthetic_stream
from pipegen_spark.generator.traffic import TrafficPatterns


@dataclass
class ProducerStats:
    batches: int = 0
    rows: int = 0
    per_batch: list[tuple[int, int, int, int]] = field(default_factory=list)
    # (batch_id, target_rate, rows_after_downsample, input_rows)


class RateControlledProducer:
    """Produce schema-driven synthetic rows at a (possibly spiking) rate."""

    def __init__(
        self,
        spark: SparkSession,
        fields: list[dict],
        patterns: TrafficPatterns,
        sink=None,
        trigger_seconds: float = 1.0,
    ):
        self.spark = spark
        self.fields = fields
        self.patterns = patterns
        self.sink = sink
        self.trigger_seconds = trigger_seconds
        self.stats = ProducerStats()
        self.query = None
        self._t0: float | None = None

    def _foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        elapsed = time.monotonic() - (self._t0 or time.monotonic())
        target = self.patterns.get_rate_at(elapsed)
        max_rate = self.patterns.max_rate()
        frac = min(1.0, target / max_rate) if max_rate else 0.0
        # One count on the INPUT frame too: input_rows/max_rate is the
        # source-time span this batch covers, which makes the achieved
        # rate measurable independent of batch-duration jitter
        # (measure_rate_tracking below). The frame is tiny (rate-source
        # rows), so the extra count job is probe-scale noise.
        n_in = batch_df.count()
        out = batch_df.sample(fraction=frac, seed=batch_id) if frac < 1.0 else batch_df
        n = out.count()
        self.stats.batches += 1
        self.stats.rows += n
        self.stats.per_batch.append((batch_id, target, n, n_in))
        if self.sink is not None:
            self.sink(out, batch_id, target)

    def start(self, checkpoint_dir: str):
        self._t0 = time.monotonic()
        stream = synthetic_stream(
            self.spark, self.fields, self.patterns.max_rate()
        )
        self.query = (
            stream.writeStream.foreachBatch(self._foreach_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(processingTime=f"{self.trigger_seconds} seconds")
            .start()
        )
        return self.query

    def stop(self) -> None:
        if self.query is not None:
            self.query.stop()


def measure_rate_tracking(
    spark: SparkSession,
    base_rps: int,
    pattern: str,
    seconds: float,
    checkpoint_dir: str,
    trigger_seconds: float = 0.5,
) -> dict:
    """Drive a spiking traffic pattern end-to-end through the
    rate-controlled producer and measure how the ACHIEVED per-batch rate
    tracks the schedule — the reference's core demo
    (traffic_pattern.go:120-130: ticker re-derived from the pattern
    every 100 ms; here the rate source runs at max rate and each
    micro-batch down-samples to the current target).

    Per batch the achieved rate is rows / (input_rows / max_rate): the
    denominator is the source-time span the batch covers, so the
    measurement is independent of batch-duration jitter. Boundary
    batches (where the target differs from either neighbor's) are
    excluded from the error — the batch that STRADDLES a spike edge
    legitimately mixes two rates. Returns per-target-level medians and
    the overall worst level error; `ok` = every level tracked within
    `tol_pct`."""
    import statistics as _stats

    from pipegen_spark.generator.traffic import parse_traffic_pattern

    patterns = parse_traffic_pattern(pattern, base_rps)
    fields = [
        {"name": "name", "type": "string"},
        {"name": "amount", "type": "double"},
    ]
    producer = RateControlledProducer(
        spark, fields, patterns, trigger_seconds=trigger_seconds
    )
    producer.start(checkpoint_dir)
    try:
        time.sleep(seconds)
    finally:
        producer.stop()
    max_rate = patterns.max_rate()
    if max_rate <= 0:
        # r11 ADVICE #4: a pattern whose every level is 0 would divide
        # by zero below (the n_in == 0 guard covers the INPUT frame,
        # not the rate). Nothing to track — report not-ok explicitly.
        return {
            "base_rps": base_rps,
            "pattern": pattern,
            "batches": len(producer.stats.per_batch),
            "levels": {},
            "worst_level_err_pct": 0.0,
            "tol_pct": 15.0,
            "ok": False,
            "error": "pattern max_rate is 0 — nothing to track",
        }
    pb = producer.stats.per_batch
    # Interior batches only: target equal to both neighbors (and skip
    # the bootstrap batch 0, which pays stream-start cost).
    levels: dict[int, list[float]] = {}
    for i in range(1, len(pb) - 1):
        _, target, rows, n_in = pb[i]
        if pb[i - 1][1] != target or pb[i + 1][1] != target or n_in == 0:
            continue
        dt = n_in / max_rate
        levels.setdefault(target, []).append(rows / dt)
    tol_pct = 15.0
    per_level = {}
    worst_err = 0.0
    for target, rates in sorted(levels.items()):
        med = _stats.median(rates)
        err = abs(med - target) / target * 100.0
        worst_err = max(worst_err, err)
        per_level[str(target)] = {
            "batches": len(rates),
            "median_rps": round(med, 1),
            "err_pct": round(err, 2),
        }
    return {
        "base_rps": base_rps,
        "pattern": pattern,
        "batches": len(pb),
        "levels": per_level,
        "worst_level_err_pct": round(worst_err, 2),
        "tol_pct": tol_pct,
        "ok": bool(per_level) and worst_err <= tol_pct,
    }
