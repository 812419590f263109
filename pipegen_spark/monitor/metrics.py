"""Listener-driven metrics collection.

Reference parity: consolidated status every poll (runner.go:925-1108), rich
metric structs incl. throughput and latency percentiles
(internal/dashboard/server.go:46-242). Here metrics come from
StreamingQueryListener progress events: numInputRows,
inputRowsPerSecond, processedRowsPerSecond, batch durations, state rows.

Backpressure status (dashboard/metrics.go:320 hardcodes "OK" in the
reference) is computed honestly: input rate persistently above processing
rate → "BACKPRESSURED".
"""

from __future__ import annotations

import statistics
import threading
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class QueryMetrics:
    query_id: str = ""
    name: str = ""
    batches: int = 0
    input_rows: int = 0
    input_rps: list[float] = field(default_factory=list)
    processed_rps: list[float] = field(default_factory=list)
    batch_duration_ms: list[float] = field(default_factory=list)
    state_rows: int = 0
    errors: list[str] = field(default_factory=list)

    @property
    def backpressure(self) -> str:
        if len(self.input_rps) < 3:
            return "OK"
        recent_in = statistics.fmean(self.input_rps[-3:])
        recent_proc = statistics.fmean(self.processed_rps[-3:])
        return "BACKPRESSURED" if recent_in > recent_proc * 1.2 else "OK"

    def percentile_duration(self, q: float) -> float:
        if not self.batch_duration_ms:
            return 0.0
        xs = sorted(self.batch_duration_ms)
        idx = min(len(xs) - 1, int(q * len(xs)))
        return xs[idx]

    def summary(self) -> dict:
        return {
            "query": self.name or self.query_id,
            "batches": self.batches,
            "input_rows": self.input_rows,
            "avg_input_rps": round(statistics.fmean(self.input_rps), 2)
            if self.input_rps
            else 0.0,
            "avg_processed_rps": round(
                statistics.fmean(self.processed_rps), 2
            )
            if self.processed_rps
            else 0.0,
            "p50_batch_ms": self.percentile_duration(0.50),
            "p95_batch_ms": self.percentile_duration(0.95),
            "p99_batch_ms": self.percentile_duration(0.99),
            "state_rows": self.state_rows,
            "backpressure": self.backpressure,
            "errors": self.errors,
        }


class MetricsCollector(StreamingQueryListener):
    """Attach with spark.streams.addListener(collector)."""

    def __init__(self):
        self._lock = threading.Lock()
        self.queries: dict[str, QueryMetrics] = {}

    def _get(self, qid: str) -> QueryMetrics:
        with self._lock:
            return self.queries.setdefault(qid, QueryMetrics(query_id=qid))

    # --- listener callbacks ---------------------------------------------------

    def onQueryStarted(self, event) -> None:
        m = self._get(str(event.id))
        m.name = event.name or ""

    def onQueryProgress(self, event) -> None:
        p = event.progress
        m = self._get(str(p.id))
        m.batches += 1
        m.input_rows += int(p.numInputRows or 0)
        if p.inputRowsPerSecond is not None:
            m.input_rps.append(float(p.inputRowsPerSecond))
        if p.processedRowsPerSecond is not None:
            m.processed_rps.append(float(p.processedRowsPerSecond))
        dur = p.durationMs or {}
        total = dur.get("triggerExecution")
        if total is not None:
            m.batch_duration_ms.append(float(total))
        state_rows = 0
        for so in p.stateOperators or []:
            try:
                state_rows += int(so.numRowsTotal)
            except (TypeError, AttributeError):
                pass
        m.state_rows = state_rows

    def onQueryTerminated(self, event) -> None:
        m = self._get(str(event.id))
        if event.exception:
            m.errors.append(str(event.exception))

    def onQueryIdle(self, event) -> None:  # pragma: no cover
        pass

    def summaries(self) -> list[dict]:
        with self._lock:
            return [m.summary() for m in self.queries.values()]
