"""Benchmark harness: runs the declared query corpus at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed once, end-to-end (plan + execute + collect), after a
small warm-up that spins up the JVM and primes the parquet footers so the
numbers measure query execution rather than session bootstrap.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pipegen_spark.queries.registry import all_queries
    from pipegen_spark.session import get_spark

    spark = get_spark("pipegen-bench", cpus=cpus)

    qs = all_queries()
    # Warm-up: JVM codegen + file listing, not measured.
    qs["q01_scan_project"](spark, sf_dir).collect()

    times: dict[str, float] = {}
    for name in sorted(qs):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        times[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(times.values()), 4)

    # Single-node comparative baseline: the same queries (their oracle SQL)
    # through DuckDB on the same files. Skipped quietly if anything fails —
    # the baseline is context, not the metric.
    duck_total = None
    try:
        duck_total = _duckdb_baseline(sf_dir)
    except Exception:
        pass

    out = {
        "metric": "corpus_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "n_queries": len(times),
        "cpus": cpus,
    }
    if duck_total is not None:
        out["duckdb_baseline_sec"] = duck_total
    print(json.dumps(out))
    spark.stop()


def _duckdb_baseline(sf_dir: str) -> float:
    import duckdb

    from pipegen_spark.queries.registry import oracle_queries

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    t0 = time.perf_counter()
    for sql in oracle_queries().values():
        con.execute(sql).fetchall()
    return round(time.perf_counter() - t0, 4)


if __name__ == "__main__":
    main()
