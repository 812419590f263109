"""Traffic-pattern DSL: `"30s-60s:300%,90s-120s:200%"` → rate schedule.

Semantics ported from internal/pipeline/traffic_pattern.go:26-130 verbatim:
- each segment is `start-end:rate%` (rate is a percentage of the base rate);
- end must be strictly after start; rate must be positive;
- segments must be non-overlapping and chronological;
- `get_rate_at(elapsed)` returns base*multiplier inside [start, end),
  base outside every segment.

Durations accept Go-style strings (`90s`, `1m30s`, `100ms`, `2h`).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_DUR_TOKEN = re.compile(r"(\d+(?:\.\d+)?)(h|ms|m|s)")

_UNIT_SECONDS = {"h": 3600.0, "m": 60.0, "s": 1.0, "ms": 0.001}


class TrafficPatternError(ValueError):
    pass


def parse_duration(s: str) -> float:
    """Go-style duration → seconds."""
    s = s.strip()
    if not s:
        raise TrafficPatternError("empty duration")
    pos, total = 0, 0.0
    for m in _DUR_TOKEN.finditer(s):
        if m.start() != pos:
            raise TrafficPatternError(f"invalid duration: {s!r}")
        total += float(m.group(1)) * _UNIT_SECONDS[m.group(2)]
        pos = m.end()
    if pos != len(s):
        raise TrafficPatternError(f"invalid duration: {s!r}")
    return total


@dataclass
class TrafficPattern:
    start: float  # seconds
    end: float
    multiplier: float  # 300% → 3.0


@dataclass
class TrafficPatterns:
    base_rate: int
    patterns: list[TrafficPattern] = field(default_factory=list)

    def get_rate_at(self, elapsed: float) -> int:
        for p in self.patterns:
            if p.start <= elapsed < p.end:
                return int(self.base_rate * p.multiplier)
        return self.base_rate

    def max_rate(self) -> int:
        return max(
            [self.base_rate]
            + [int(self.base_rate * p.multiplier) for p in self.patterns]
        )

    def summary(self) -> str:
        if not self.patterns:
            return f"Constant rate: {self.base_rate} msg/sec"
        parts = [
            f"{p.start:g}s-{p.end:g}s @ {int(p.multiplier * 100)}%"
            for p in self.patterns
        ]
        return f"Base {self.base_rate} msg/sec with spikes: " + ", ".join(parts)


def parse_traffic_pattern(pattern_str: str, base_rate: int) -> TrafficPatterns:
    if not pattern_str:
        return TrafficPatterns(base_rate=base_rate)
    patterns = []
    for part in pattern_str.split(","):
        part = part.strip()
        if not part:
            continue
        colon = part.split(":")
        if len(colon) != 2:
            raise TrafficPatternError(
                f"invalid pattern format '{part}': expected 'start-end:rate%'"
            )
        time_range, rate_str = colon[0].strip(), colon[1].strip()
        dash = time_range.split("-")
        if len(dash) != 2:
            raise TrafficPatternError(
                f"invalid time range '{time_range}': expected 'start-end'"
            )
        start = parse_duration(dash[0])
        end = parse_duration(dash[1])
        if end <= start:
            raise TrafficPatternError(
                f"end time '{dash[1]}' must be after start time '{dash[0]}'"
            )
        if not rate_str.endswith("%"):
            raise TrafficPatternError(
                f"invalid rate format '{rate_str}': expected percentage (e.g., '300%')"
            )
        try:
            rate_value = float(rate_str[:-1])
        except ValueError as e:
            raise TrafficPatternError(
                f"invalid rate value '{rate_str}'"
            ) from e
        if rate_value <= 0:
            raise TrafficPatternError(
                f"rate value must be positive, got '{rate_str}'"
            )
        patterns.append(
            TrafficPattern(start=start, end=end, multiplier=rate_value / 100.0)
        )
    for cur, nxt in zip(patterns, patterns[1:]):
        if cur.end > nxt.start:
            raise TrafficPatternError(
                f"traffic patterns overlap: pattern ending at {cur.end}s "
                f"conflicts with pattern starting at {nxt.start}s"
            )
    return TrafficPatterns(base_rate=base_rate, patterns=patterns)
