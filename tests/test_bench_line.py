"""The bench stdout line must keep per-query times under the driver's
2000-char tail budget (r13 VERDICT #1: the old trim popped "queries"
first and blinded the driver's PERF comparison every round)."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import _fit_stdout_line


def _fat_out(n_queries: int = 20) -> dict:
    return {
        "metric": "corpus_total_wall",
        "value": 305.7,
        "unit": "sec",
        "queries": {
            f"q{i:02d}_some_longish_query_name": round(20.0 - i * 0.7, 2)
            for i in range(n_queries)
        },
        "queries_omitted": 218 - n_queries,
        "warm_total": 72.7,
        "warm_total_floor_adj": 70.6,
        "warm_total_sequential": 269.4,
        "pooled_runs": [75.1, 72.7],
        "loadavg_1min": {t: 1.23 for t in (
            "cold_before", "warm_before", "pooled1_before",
            "pooled2_before", "duckdb1_before", "duckdb2_before", "after",
        )},
        "idle_gate": {"enabled": True, "threshold": 3.0,
                      "settled_sec": 0.0, "waited_sec": 0.0,
                      "loadavg_at_start": 0.5, "satisfied": True},
        "pass_gates": {t: {"ok": True, "wait": 75.0} for t in (
            "warm_before", "pooled1_before", "pooled2_before",
            "duckdb1_before", "duckdb2_before",
        )},
        "spark_floor_sec": 0.0711,
        "sf": 0.1,
        "n_queries": 218,
        "cpus": "32",
        "detail": ".benchmarks/bench_detail.json",
        "drift": {"vs": "r13", "cold_total_prev": 300.8,
                  "warm_total_prev": 75.6,
                  "top_cold_regressions": {"a": [1.0, 2.0],
                                           "b": [1.0, 2.0],
                                           "c": [1.0, 2.0]}},
        "duckdb_baseline": {"sec": 100.4, "runs": [100.4, 104.2],
                            "completed": 218, "n_timed_out": 0},
        "spark_duckdb_warm_ratio": 1.381,
        "streaming": {"target_rps": 50000, "achieved_rps": 134048.3,
                      "aggregate_rps": 132532.2, "best_rps": 141242.9,
                      "worst_rps": 116822.4, "batches": 16,
                      "sustained_target": True,
                      "loadavg_1min_before": 0.5,
                      "settle_gate": {"enabled": True, "threshold": 3.0,
                                      "settled_sec": 0.0,
                                      "waited_sec": 0.0,
                                      "loadavg_at_start": 0.5,
                                      "satisfied": True}},
        "traffic_tracking": {"ok": True, "worst_level_err_pct": 0.46,
                             "levels": {"20000": 19907.0,
                                        "60000": 60000.0}},
    }


def test_queries_survive_trimming():
    out = _fat_out()
    line = _fit_stdout_line(out, 218)
    assert len(line) <= 1900
    parsed = json.loads(line)
    # the whole point of the r14 fix: per-query times reach the driver
    assert len(parsed["queries"]) == 20
    # the drift-proof headline ratio survives too
    assert parsed["spark_duckdb_warm_ratio"] == 1.381
    assert parsed["duckdb_baseline"]["sec"] == 100.4


def test_telemetry_dropped_before_queries():
    out = _fat_out()
    line = _fit_stdout_line(out, 218)
    parsed = json.loads(line)
    # at this realistic size, fitting requires dropping some telemetry
    assert "drift" not in parsed or "pass_gates" not in parsed
    assert "queries" in parsed


def test_under_budget_is_untouched():
    out = {"metric": "corpus_total_wall", "value": 1.0,
           "queries": {"a": 1.0}, "drift": {"vs": "r13"}}
    line = _fit_stdout_line(out, 1)
    parsed = json.loads(line)
    assert parsed["drift"] == {"vs": "r13"}


def test_queries_shrink_one_at_a_time_before_vanishing():
    out = _fat_out()
    # tiny budget forces query-map shrinkage after telemetry is gone
    line = _fit_stdout_line(out, 218, budget=700)
    parsed = json.loads(line)
    assert len(line) <= 700
    qs = parsed.get("queries", {})
    if qs:
        # retained entries must be the SLOWEST ones (head of the map)
        assert "q00_some_longish_query_name" in qs
        assert parsed["queries_omitted"] == 218 - len(qs)
