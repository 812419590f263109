"""Per-query optimization probe (round 13).

Times named queries on a warmed session exactly the way bench.py does
(`.collect()`, FAIR scheduler confs irrelevant here — sequential), plus:

- a second, noop-sink timing (guide §1.4) that isolates computation from
  the driver-side row fetch;
- the Spark job count per query (scheduling floor is ~0.07 s/job at
  sf0.1, so a 20-job query pays ~1.4 s of pure scheduling);
- `.explain("formatted")` dumped to plans/r13/<query>_<tag>.txt.

Usage:
    python tools/profile_query.py [--tag before|after] [--sf DIR] q1 q2 ...
    python tools/profile_query.py --plan-only --tag before q1 ...
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    tag = "probe"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    plan_only = "--plan-only" in args
    args = [a for a in args if a != "--plan-only"]
    names = args

    os.environ.setdefault("PYTHONWARNINGS", "ignore")
    from pipegen_spark.queries.registry import all_queries
    from pipegen_spark.session import get_spark

    spark = get_spark(
        "profile-query",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext
    qs = all_queries()
    plan_dir = os.path.join(
        REPO, "plans", os.environ.get("PLAN_ROUND", "r14")
    )
    os.makedirs(plan_dir, exist_ok=True)

    # Warm-up (bench.py parity: JVM + Arrow worker pool)
    qs["q01_scan_project"](spark, sf_dir).collect()
    spark.range(10_000).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).collect()

    tracker = sc.statusTracker()

    def job_count(group: str) -> int:
        return len(tracker.getJobIdsForGroup(group) or [])

    for name in names:
        if name not in qs:
            print(f"!! unknown query: {name}")
            continue
        df = qs[name](spark, sf_dir)
        with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            ))
        if plan_only:
            print(f"{name}: plan written")
            continue
        # cold-ish (plan already built above; codegen may be cached)
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        t_first = time.perf_counter() - t0
        # warm x2, report the (time, jobs) pair of the BEST run
        best, jobs = float("inf"), 0
        for run in range(2):
            grp = f"profile-{name}-{run}"
            sc.setJobGroup(grp, name)
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            if dt < best:
                best, jobs = dt, job_count(grp)
        sc.setJobGroup(None, None)
        print(
            f"{name:42s} first={t_first:7.3f}  warm_best={best:7.3f}"
            f"  jobs={jobs}"
        )
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()
