"""Timezone invariance, pinned forever in CI form.

Round-3 ADVICE found the engine's results could depend on the host TZ:
the testdata's parquet timestamps are TIMESTAMP(MICROS, isAdjustedToUTC=
false) (NTZ), and `pipegen_spark.catalog.table()` pins the session TZ to
UTC before the NTZ->LTZ cast so every engine/oracle comparison is
TZ-independent (session.py / catalog.py). A regression would only show
up on a non-UTC host — so this test re-runs the timestamp-sensitive
queries in a SUBPROCESS with TZ=America/New_York (DST-bearing, negative
offset) and asserts the oracle comparison still passes.

Subprocess, not in-process: the JVM captures the default TZ at startup,
so an env flip after the session fixture exists would test nothing.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Queries whose results read, bucket, or window event-time columns.
TZ_SENSITIVE = (
    "q13_event_window",
    "q37_asof_join",
    "q49_range_frame",
    "q71_funnel",
)


def test_tz_sensitive_queries_under_nonutc_tz():
    env = dict(os.environ)
    env["TZ"] = "America/New_York"
    env.pop("SPARK_GRAFT_CPUS", None)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "compare.py"),
            "--vanilla",
            "/root/testdata/sf0.001",
            *TZ_SENSITIVE,
        ],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-8:])
    assert proc.returncode == 0, (
        f"TZ=America/New_York comparison failed:\n{tail}\n{proc.stderr[-2000:]}"
    )
    assert f"{len(TZ_SENSITIVE)} pass / 0 fail" in proc.stdout, tail
