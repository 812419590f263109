"""Traffic-pattern DSL tests — ports the reference's table-driven cases
(internal/pipeline/traffic_pattern_test.go:8-173)."""

from __future__ import annotations

import pytest

from pipegen_spark.generator.traffic import (
    TrafficPatternError,
    parse_duration,
    parse_traffic_pattern,
)


def test_parse_basic():
    tp = parse_traffic_pattern("30s-60s:300%,90s-120s:200%", 100)
    assert tp.base_rate == 100
    assert len(tp.patterns) == 2
    assert tp.patterns[0].start == 30 and tp.patterns[0].end == 60
    assert tp.patterns[0].multiplier == 3.0
    assert tp.patterns[1].multiplier == 2.0


def test_empty_pattern_is_constant():
    tp = parse_traffic_pattern("", 50)
    assert tp.patterns == []
    assert tp.get_rate_at(0) == 50
    assert tp.summary() == "Constant rate: 50 msg/sec"


def test_get_rate_at_boundaries():
    tp = parse_traffic_pattern("30s-60s:300%", 100)
    assert tp.get_rate_at(29.9) == 100
    assert tp.get_rate_at(30) == 300  # inclusive start
    assert tp.get_rate_at(59.9) == 300
    assert tp.get_rate_at(60) == 100  # exclusive end
    assert tp.max_rate() == 300


@pytest.mark.parametrize(
    "bad",
    [
        "30s-60s",  # missing rate
        "30s:300%",  # missing range
        "60s-30s:300%",  # end before start
        "30s-60s:300",  # missing %
        "30s-60s:-50%",  # non-positive rate
        "30s-60s:0%",
        "abc-60s:300%",  # bad duration
    ],
)
def test_parse_errors(bad):
    with pytest.raises(TrafficPatternError):
        parse_traffic_pattern(bad, 100)


def test_overlap_rejected():
    with pytest.raises(TrafficPatternError, match="overlap"):
        parse_traffic_pattern("30s-60s:300%,50s-90s:200%", 100)


@pytest.mark.parametrize(
    "s,seconds",
    [("30s", 30), ("1m30s", 90), ("100ms", 0.1), ("2h", 7200), ("1.5s", 1.5)],
)
def test_parse_duration(s, seconds):
    assert parse_duration(s) == pytest.approx(seconds)


def test_fractional_multiplier():
    tp = parse_traffic_pattern("10s-20s:50%", 200)
    assert tp.get_rate_at(15) == 100
