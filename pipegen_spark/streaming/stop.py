"""Smart-stop: terminate a streaming query once the expected row count is
reached, or after a no-progress timeout.

Reference parity (internal/pipeline/consumer.go:45-136): stop when
messageCount >= expectedMessages; 30 s timeout with no new messages;
expected count auto-derived from rate × duration when not given
(runner.go:366-386). HTTP polling is replaced by `query.lastProgress`.
"""

from __future__ import annotations

import time

from pyspark.sql.streaming import StreamingQuery

DEFAULT_NO_MESSAGE_TIMEOUT = 30.0  # consumer.go:62


class SmartStop:
    def __init__(
        self,
        query: StreamingQuery,
        expected_rows: int | None = None,
        no_message_timeout: float = DEFAULT_NO_MESSAGE_TIMEOUT,
        poll_interval: float = 0.5,
        hard_timeout: float | None = None,
    ):
        self.query = query
        self.expected_rows = expected_rows
        self.no_message_timeout = no_message_timeout
        self.poll_interval = poll_interval
        self.hard_timeout = hard_timeout
        self.total_rows = 0
        self.stop_reason: str | None = None

    def await_done(self) -> str:
        """Block until expected count / idle timeout / hard timeout; stops
        the query and returns the reason."""
        start = time.monotonic()
        last_progress_rows = time.monotonic()
        seen_batches: set[int] = set()
        while self.query.isActive:
            p = self.query.lastProgress  # dict in PySpark
            if p:
                batch_id = int(p.get("batchId", -1))
                rows = int(p.get("numInputRows", 0) or 0)
                if batch_id not in seen_batches:
                    seen_batches.add(batch_id)
                    if rows:
                        self.total_rows += rows
                        last_progress_rows = time.monotonic()
            if (
                self.expected_rows is not None
                and self.total_rows >= self.expected_rows
            ):
                self.stop_reason = "expected_count"
                break
            if time.monotonic() - last_progress_rows > self.no_message_timeout:
                self.stop_reason = "idle_timeout"
                break
            if (
                self.hard_timeout is not None
                and time.monotonic() - start > self.hard_timeout
            ):
                self.stop_reason = "hard_timeout"
                break
            time.sleep(self.poll_interval)
        if self.query.isActive:
            self.query.stop()
        if self.stop_reason is None:
            self.stop_reason = "query_ended"
        return self.stop_reason


def expected_message_count(
    produced: int | None, rate: int, duration_seconds: float
) -> int:
    """Auto-derivation (runner.go:366-386): producer count if known, else
    rate × duration."""
    if produced is not None and produced > 0:
        return produced
    return int(rate * duration_seconds)
