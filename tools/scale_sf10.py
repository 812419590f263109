"""Second decade of the scale ladder: the top training operators at a
100x corpus (~sf10), with per-op scaling exponents across all rungs.

Round-11 (r10 VERDICT task 5): the 100 TB story rested on one 10x
extrapolation (`bench_history/scale_sf1.json`); this adds the
sf0.1 -> sf1 -> sf10 ladder for the most expensive ops — the decade
where bucket-size growth and broadcast limits would plausibly break
log-linear scaling if they were going to.

The 100-copy corpus uses `build_sf1.build_scaled` (seeded substitution
cipher / sign-flip decorrelation — the 10-copy rotation scheme would
alias past 26 text copies and 64 embedding copies, silently measuring
a 4x-more-duplicated corpus). Measurement input only, never a
correctness input.

Per query: one run at sf0.1, one at the x10 dir, one at the x100 dir
(cold, same session). Exponent e solves time_ratio = data_ratio**e per
decade; e <= 1 is linear-or-better. A wall budget stops the run early
rather than burning the box (remaining queries recorded as skipped).

Usage: python tools/scale_sf10.py [query ...]   (default: TOP10 set)
Archives to bench_history/scale_sf10.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_COPIES = 100
SRC_DIR = "/root/testdata/sf0.1"
SF1_DIR = os.path.join(REPO, ".benchmarks", "sf1_full")
SF10_DIR = os.path.join(REPO, ".benchmarks", "sf10_full")
WALL_BUDGET = float(os.environ.get("SCALE_SF10_BUDGET", "2400"))

#: r10 VERDICT task 5's named set: the semantic family, knn_graph,
#: setjoin, bpe_encode, jpeg_420, lpa, pagerank, near_dup_rate — the
#: ops whose quadratic term is bounded by a bucket knob and so carry
#: the real 100 TB risk.
TOP10 = (
    "dedup_semantic",
    "dedup_semantic_ivf",
    "dedup_semantic_ivf_trained",
    "simsearch_knn_graph",
    "dedup_setjoin",
    "text_bpe_encode",
    "multimodal_jpeg_420",
    "dedup_lpa",
    "q61_pagerank",
    "curate_near_dup_rate",
)


def _fresh_session(cpus: str):
    from pipegen_spark.session import get_spark

    return get_spark(
        "pipegen-scale-sf10",
        cpus=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def main() -> None:
    os.environ.setdefault("PYTHONWARNINGS", "ignore")
    # A 100x corpus on one box needs a real heap: the default 8g OOMed
    # on the r11 first attempt at the pagerank edge materialization
    # (~110 M symmetric edges as deserialized localCheckpoint rows —
    # since re-planned to spillable columnar persist, graph.py). The
    # box has 125 GiB; 48g leaves room for the page cache the parquet
    # scans lean on.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from pipegen_spark.queries.registry import all_queries
    from tools.build_sf1 import build, build_scaled

    names = sys.argv[1:] or list(TOP10)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = _fresh_session(cpus)
    qs = all_queries()
    build(spark)  # x10 rung (idempotent)
    t_build = time.perf_counter()
    build_scaled(spark, N_COPIES, SF10_DIR)  # x100 rung (idempotent)
    print(f"x100 corpus ready in {time.perf_counter() - t_build:.1f}s",
          flush=True)
    # Stopword-keyed pipelines measure against the stopword-preserving
    # derivation at BOTH rungs (see scale_bench.STOPKEYED).
    from tools.scale_bench import STOPKEYED

    stopfix_dirs: dict[str, str] = {}
    if any(n in STOPKEYED for n in names):
        from tools.build_sf1 import build_stopfix

        stopfix_dirs = {
            "x10": build_stopfix(10),
            "x100": build_stopfix(100),
        }

    qs["text_tokens"](spark, SRC_DIR).collect()  # warm-up, not measured

    t_start = time.perf_counter()
    results: dict[str, dict] = {}
    skipped: list[str] = []
    for name in names:
        if time.perf_counter() - t_start > WALL_BUDGET:
            skipped.append(name)
            continue
        fn = qs[name]
        row: dict = {}
        # Fault isolation (r11 first attempt: one OOM killed the whole
        # run and lost the artifact): a failing rung records the error
        # and the run continues; a dead SparkContext is resurrected.
        if name in STOPKEYED:
            row["corpus"] = "stopfix"
        try:
            for tag, d in (
                ("sf0.1", SRC_DIR),
                ("x10", stopfix_dirs.get("x10", SF1_DIR)
                 if name in STOPKEYED else SF1_DIR),
                ("x100", stopfix_dirs.get("x100", SF10_DIR)
                 if name in STOPKEYED else SF10_DIR),
            ):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                n = len(fn(spark, d).collect())
                row[tag] = round(time.perf_counter() - t0, 3)
                row[f"{tag}_rows"] = n
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {e}"[:400]
            results[name] = row
            print(f"{name:28s} FAILED: {row['error'][:120]}", flush=True)
            try:
                alive = not spark.sparkContext._jsc.sc().isStopped()
            except Exception:
                alive = False
            if not alive:
                print("SparkContext died — starting a fresh session",
                      flush=True)
                spark = _fresh_session(cpus)
                qs["text_tokens"](spark, SRC_DIR).collect()
            continue
        row["ratio_x10"] = round(row["x10"] / max(row["sf0.1"], 1e-9), 2)
        row["ratio_x100"] = round(row["x100"] / max(row["sf0.1"], 1e-9), 2)
        # Per-decade exponents: how the SECOND decade bends is the
        # signal (a bucket knob that stops helping shows up as
        # exp_decade2 >> exp_decade1).
        row["exp_decade1"] = round(
            math.log(max(row["ratio_x10"], 1e-9)) / math.log(10), 2
        )
        row["exp_decade2"] = round(
            math.log(max(row["x100"] / max(row["x10"], 1e-9), 1e-9))
            / math.log(10),
            2,
        )
        results[name] = row
        print(
            f"{name:28s} {row['sf0.1']:7.2f}s -> {row['x10']:7.2f}s -> "
            f"{row['x100']:8.2f}s  (e1 {row['exp_decade1']:+.2f}, "
            f"e2 {row['exp_decade2']:+.2f}, rows {row['x100_rows']})",
            flush=True,
        )

    path = os.path.join(REPO, "bench_history", "scale_sf10.json")
    merged: dict[str, dict] = {}
    if os.path.exists(path):
        with open(path) as fh:
            merged = json.load(fh).get("queries", {})
    merged.update(results)
    out = {
        "n_copies": N_COPIES,
        "src": SRC_DIR,
        "loadavg_1min": round(os.getloadavg()[0], 2),
        "cpus": cpus,
        "wall_budget_sec": WALL_BUDGET,
        "skipped": skipped,
        "queries": merged,
    }
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({"wrote": os.path.relpath(path, REPO),
                      "skipped": skipped}))
    spark.sparkContext.setLogLevel("FATAL")
    spark.stop()


if __name__ == "__main__":
    main()
