"""Stage-boundary materialization: spill a DataFrame to temp parquet
and re-read it.

Promoted out of operators/graph.py (r13) so pipeline compositions can
cut lineage at a stage boundary the same way the iterative graph
operators do: truncates the upstream plan (like localCheckpoint)
WITHOUT pinning deserialized rows in JVM memory (localCheckpoint's
blocks OOMed the x100 pagerank rung). This is the durable
checkpoint() shape on local disk — and the local analogue of what a
production 100 TB curation pipeline does anyway: materialize each
expensive stage's output corpus to storage before fanning out into
multiple downstream consumers. On a cluster, point the spill at the
checkpoint/scratch dir via spark.local.dir.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame

#: Spill directories created by spill_to_parquet. Two bounds (r11
#: ADVICE #3 — atexit alone lets a long session re-running a spilling
#: operator, ~GBs per spill, exhaust /tmp, and atexit never runs on
#: SIGKILL): (a) only the newest KEEP_SPILLS dirs are kept — each call
#: site spills ONCE per run and only that run's DataFrames read it, so
#: keeping the live window is safe even if a caller still holds a
#: prior run's result frame; (b) what remains is reaped at interpreter
#: exit. r14: the bound must cover CONCURRENT queries — the bench's
#: pooled pass runs 8 queries at once and the spilling operators
#: (pipeline_e2e x2, dsir, entropy x2, kl_drift x2) can hold up to ~16
#: live dirs across a wave boundary; a cap of 4 could reap a directory
#: another thread's running query is still reading. With the r14 qgate
#: spill (quality_threshold_gate, ridden by percentile/ensemble/e2e) a
#: query can hold up to 3 live dirs (e2e: curate + kept + qgate), so
#: the bound is 32 = 8 threads x up-to-3 spills + a wave of margin;
#: the spilled frames are narrow aggregates, so the disk envelope
#: stays small.
_SPILL_DIRS: list[str] = []
_KEEP_SPILLS = 32


def _reap_spills() -> None:
    for d in _SPILL_DIRS:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_reap_spills)


def _spill_root() -> str | None:
    """Spill placement (r11 ADVICE #3): prefer spark.local.dir (the
    disk an operator is SUPPOSED to scratch on — on a cluster this is
    the executor's shuffle volume), then TMPDIR via tempfile's default
    resolution."""
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is not None:
            local = spark.conf.get("spark.local.dir", "")
            if local:
                first = local.split(",")[0]
                if os.path.isdir(first):
                    return first
    except Exception:
        pass
    return None  # tempfile.mkdtemp honors TMPDIR itself


def spill_to_parquet(df: DataFrame, label: str = "stage") -> DataFrame:
    """Write `df` to a temp parquet file and re-read it."""
    d = tempfile.mkdtemp(
        prefix=f"pipegen-{label}-spill-", dir=_spill_root()
    )
    _SPILL_DIRS.append(d)
    while len(_SPILL_DIRS) > _KEEP_SPILLS:
        shutil.rmtree(_SPILL_DIRS.pop(0), ignore_errors=True)
    path = os.path.join(d, f"{label}-{time.time_ns()}")
    df.write.parquet(path)
    return df.sparkSession.read.parquet(path)
