"""Idle re-measure of bench-flagged queries (round-11 tool, round-12
protocol fix — r11 VERDICT #2).

The r11 run of this tool had the same OWN-LOAD blind spot as bench.py's
per-pass gate: right after one re-measured query finishes, the 1-min
loadavg mostly reflects the tool's own trailing work, so 4 of the 5
r11 re-measures were recorded at loadavg 5.4-7.9 — exactly the
contamination the tool exists to remove. Protocol now:

1. settle >= 60 s after the unmeasured cold prime AND between queries,
   so the tool's own load decays out of the 1-min window;
2. then gate STRICTLY (loadavg < 1.0, bounded wait) before the two
   timed runs — per-query pre-run loadavg is recorded so the artifact
   is self-labeling;
3. report the min of 2 warm runs (BASELINE.md noise rule).

Archives to bench_history/idle_remeasure_r12.json.

Usage: python tools/idle_remeasure.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
#: r11 VERDICT #2's four big warm deltas + the two BASELINE.md
#: go-forward figures to confirm (#7).
FLAGGED = (
    "dedup_threshold_sweep",
    "dedup_simhash",
    "dedup_semantic_ivf_trained",
    "q41_stream_join",
    "curate_quality_percentile",
    "curate_ensemble",
)
SETTLE_SEC = 65.0
STRICT_LOADAVG = 1.0
GATE_MAX_WAIT = 300.0


def _settle_and_gate() -> dict:
    """Sleep the settle, then wait (bounded) for strict idleness."""
    time.sleep(SETTLE_SEC)
    t0 = time.perf_counter()
    load = os.getloadavg()[0]
    while load >= STRICT_LOADAVG and time.perf_counter() - t0 < GATE_MAX_WAIT:
        time.sleep(10)
        load = os.getloadavg()[0]
    return {
        "settled_sec": SETTLE_SEC,
        "waited_sec": round(time.perf_counter() - t0, 1),
        "loadavg_pre_run": round(load, 2),
        "strict_ok": bool(load < STRICT_LOADAVG),
    }


def main() -> None:
    os.environ.setdefault("PYTHONWARNINGS", "ignore")
    from pipegen_spark.queries.registry import all_queries
    from pipegen_spark.session import get_spark

    names = sys.argv[1:] or list(FLAGGED)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        "pipegen-idle-remeasure",
        cpus=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = all_queries()
    qs["text_tokens"](spark, SF_DIR).collect()  # session warm-up

    results: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        fn(spark, SF_DIR).collect()  # cold run primes codegen, unmeasured
        gate = _settle_and_gate()
        runs = []
        for _ in range(2):
            la = round(os.getloadavg()[0], 2)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            runs.append(
                {"sec": round(time.perf_counter() - t0, 4), "loadavg": la}
            )
        results[name] = {
            "warm_min_sec": min(r["sec"] for r in runs),
            "gate": gate,
            "runs": runs,
        }
        print(
            f"{name:28s} warm_min {results[name]['warm_min_sec']:.3f}s "
            f"({[r['sec'] for r in runs]}) "
            f"pre-run loadavg {gate['loadavg_pre_run']}",
            flush=True,
        )

    path = os.path.join(REPO, "bench_history", "idle_remeasure_r12.json")
    out = {
        "sf_dir": SF_DIR,
        "cpus": cpus,
        "protocol": "settle>=65s + strict loadavg<1 gate per query, min of 2",
        "queries": results,
    }
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({"wrote": os.path.relpath(path, REPO)}))
    spark.sparkContext.setLogLevel("FATAL")
    spark.stop()


if __name__ == "__main__":
    main()
