"""Corpus-wide whole-stage-codegen audit.

Runs every `queries()` entry once and attributes `ERROR CodeGenerator`
stderr lines (janino compile failures — usually "Code grows beyond
64 KB") to the query that triggered them. A failure is not a
correctness bug — Spark falls back to interpreted execution — but it
silently drops the affected stage out of JIT-compiled code, which is
exactly the perf cliff SCALE.md's "Measured scaling" section documents
for simsearch_bitext (round 8). Zero offenders is the expected state.

Usage: python tools/codegen_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = (
        args[0]
        if args and os.path.isdir(args[0])
        else "/root/testdata/sf0.01"
    )
    only = {a for a in args if not os.path.isdir(a)}

    # Capture the JVM's stderr (log4j writes there) via an fd-level
    # redirect — Python-level sys.stderr tricks don't see it. Keep a
    # dup of the real stderr so (a) tracebacks raised after setup are
    # still visible and (b) fd 2 is restored on exit.
    log_path = "/tmp/codegen_audit_err.log"
    log_fd = os.open(log_path, os.O_CREAT | os.O_WRONLY | os.O_TRUNC)
    real_stderr_fd = os.dup(2)
    os.dup2(log_fd, 2)
    sys.stderr = os.fdopen(real_stderr_fd, "w")  # Python-side errors

    try:
        _run(sf_dir, only, log_path)
    finally:
        sys.stderr.flush()
        os.dup2(real_stderr_fd, 2)
        os.close(log_fd)


def _run(sf_dir: str, only: set, log_path: str) -> None:
    import __spark_entry__ as entry_mod
    from pipegen_spark.session import get_spark

    spark = get_spark()
    qs = entry_mod.queries()

    def n_errors() -> int:
        # Executor threads flush log lines asynchronously: wait for
        # the in-flight jobs to fully drain before sampling, so a
        # late-flushed line from the previous query can't be charged
        # to the next one.
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
        with open(log_path, "rb") as f:
            return f.read().count(b"ERROR CodeGenerator")

    offenders = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        before = n_errors()
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001 — report, keep scanning
            print(f"{name}: RUN ERROR {exc!r}", flush=True)
            continue
        delta = n_errors() - before
        if delta:
            offenders[name] = delta
            print(
                f"{name}: {delta} codegen failure(s) "
                f"({time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
    print(
        f"\n{len(offenders)} offender(s) / {len(only) or len(qs)} queries: "
        f"{offenders}",
        flush=True,
    )


if __name__ == "__main__":
    main()
