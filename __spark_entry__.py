"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` smoke-runs the flagship query; `queries()` exposes every
implemented operator from SURVEY.md §2; `oracle_sql()` gives the DuckDB
equivalents for the correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pipegen_spark.queries.registry import all_queries, oracle_queries
from pipegen_spark.queries.relational3 import q36_curation_decision


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the composed curation pass (exact-dup + quality +
    language-ID → keep/reject): it exercises scan, window, map-side text
    analysis and the dual-dialect expression layer in one plan."""
    return q36_curation_decision(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query key (omitted → rows-only check)."""
    return oracle_queries()
