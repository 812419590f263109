"""Idle re-measure of bench-flagged queries (round-11, r10 VERDICT #2).

The r10 bench artifact's warm pass ran at loadavg 5.72 (pooled2 at
15.05) and recorded ~1.9x uniformly-inflated warm numbers for
dedup_semantic / dedup_semantic_ivf / text_bm25 /
curate_quality_percentile. Protocol per BASELINE.md's noise rule: 2
warm runs on an idle box (loadavg < IDLE_LOADAVG at measurement
start), report the min, record loadavg around every run. Archives to
bench_history/idle_remeasure_r11.json so the r11 judge can separate
contention from code.

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
FLAGGED = (
    "dedup_semantic",
    "dedup_semantic_ivf",
    "text_bm25",
    "curate_quality_percentile",
    "curate_ensemble",
)
IDLE_LOADAVG = 3.0


def main() -> None:
    os.environ.setdefault("PYTHONWARNINGS", "ignore")
    from pipegen_spark.queries.registry import all_queries
    from pipegen_spark.session import get_spark

    names = sys.argv[1:] or list(FLAGGED)
    load0 = os.getloadavg()[0]
    while load0 >= IDLE_LOADAVG:
        time.sleep(15)
        load0 = os.getloadavg()[0]

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
            "runs": runs,
        }
        print(f"{name:28s} warm_min {results[name]['warm_min_sec']:.3f}s "
              f"({[r['sec'] for r in runs]})", flush=True)

    path = os.path.join(REPO, "bench_history", "idle_remeasure_r11.json")
    out = {
        "sf_dir": SF_DIR,
        "cpus": cpus,
        "loadavg_at_start": round(load0, 2),
        "queries": results,
    }
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({"wrote": os.path.relpath(path, REPO)}))
    spark.sparkContext.setLogLevel("FATAL")
    spark.stop()


if __name__ == "__main__":
    main()
