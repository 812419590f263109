"""Custom stateful streaming operator: per-key sessionization with
`applyInPandasWithState` (Arrow-batched, grouped state).

The reference has no custom stateful operators at all (state lives inside
Flink); this is the [EXT] demonstration of Spark's arbitrary-stateful API:
state is a (session_start, last_ts, n_events) triple per user, sessions
close when an event arrives more than `gap` after the previous one, closed
sessions are emitted downstream. State per key is O(1) — the 100 TB rule
for stateful streaming (never buffer events, fold them).

Note: a session left open when the stream idles stays in state until a
later event or timeout closes it — the test asserts exactly that contract.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
STATE_SCHEMA = "start long, last long, n long"

_US = 1_000_000  # timestamps tracked as epoch micros in state


def _sessionize_fn(gap_seconds: float, idle_timeout: bool, emit_open: bool):
    gap_us = int(gap_seconds * _US)

    def fn(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start = last = n = None
        closed: list[tuple[int, int, int]] = []
        for pdf in batches:
            for ts in sorted(pdf["ts"]):
                t = int(ts.value // 1000)  # pandas ns → us
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_us:
                    closed.append((start, last, n))
                    start, last, n = t, t, 1
                else:
                    last = max(last, t)
                    n += 1
        if idle_timeout and state.hasTimedOut:
            if start is not None:
                closed.append((start, last, n))
            state.remove()
        else:
            state.update((start, last, n))
            if idle_timeout:
                state.setTimeoutDuration(int(gap_seconds * 1000))
        out = closed
        if emit_open and start is not None:
            # Update-mode emission: also surface the still-open session's
            # CURRENT extent. Re-emitted (grown) each batch that touches
            # it; a downstream compaction keeps the newest overlapping row
            # per key (sink.compact_session_updates).
            out = closed + [(start, last, n)]
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out),
                "session_start": [
                    pd.Timestamp(s, unit="us") for s, _, _ in out
                ],
                "session_end": [
                    pd.Timestamp(e, unit="us") for _, e, _ in out
                ],
                "n_events": [n for _, _, n in out],
            }
        )

    return fn


def sessionize_stream(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    idle_timeout: bool = False,
    emit_open: bool = False,
) -> DataFrame:
    """Emit closed sessions (user_id, session_start, session_end, n_events).

    With `idle_timeout`, processing-time timeouts flush sessions for keys
    that stop receiving events — for production queries on a real trigger.
    Leave it off for finite/batch-tested streams: armed timeouts make the
    engine schedule micro-batches indefinitely, so `processAllAvailable`
    never settles. Input needs (user_col, ts_col) columns.

    With `emit_open` (update-mode semantics), every batch ALSO emits the
    current extent of each touched key's open session; pair with a
    batch-stamped sink + `sink.compact_session_updates` so the newest
    emission of each session chain wins. This is how a finite stream
    reaches exact batch parity — the final batch's open-session row IS the
    batch result's last session — without complete-mode state dumps.
    `session_end` is the LAST EVENT time; add the gap downstream if
    session_window-style [start, last+gap) bounds are wanted.
    """
    n, unit = gap.split()
    seconds = float(n) * {
        "second": 1,
        "seconds": 1,
        "minute": 60,
        "minutes": 60,
        "hour": 3600,
        "hours": 3600,
    }[unit]
    renamed = df.selectExpr(
        f"{user_col} AS user_id", f"{ts_col} AS ts"
    )
    return renamed.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(seconds, idle_timeout, emit_open),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update" if emit_open else "append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
