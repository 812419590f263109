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
    per_batch: list[tuple[int, int, int]] = field(default_factory=list)
    # (batch_id, target_rate, rows)


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
        out = batch_df.sample(fraction=frac, seed=batch_id) if frac < 1.0 else batch_df
        n = out.count()
        self.stats.batches += 1
        self.stats.rows += n
        self.stats.per_batch.append((batch_id, target, n))
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
