"""Registry of all declared queries + their DuckDB oracle SQL.

The driver contract (`__spark_entry__.py`) re-exports these: every operator
claimed in SURVEY.md §2 has a `queries()` entry here, and (when
SQL-expressible) a matching oracle for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pipegen_spark.queries import relational
from pipegen_spark.queries.oracle import RELATIONAL_ORACLE

QueryFn = Callable[[SparkSession, str], DataFrame]


def _collect(module) -> dict[str, QueryFn]:
    out = {}
    for name in dir(module):
        if name.startswith("q") or name.startswith(
            ("dedup_", "simsearch_", "text_", "multimodal_", "curate_",
             "embed_")
        ):
            fn = getattr(module, name)
            if callable(fn):
                out[name] = fn
    return out


def all_queries() -> dict[str, QueryFn]:
    from pipegen_spark.queries import (
        relational2,
        relational3,
        relational4,
        relational5,
        training_data,
    )

    out: dict[str, QueryFn] = {}
    out.update(_collect(relational))
    out.update(_collect(relational2))
    out.update(_collect(relational3))
    out.update(_collect(relational4))
    out.update(_collect(relational5))
    out.update(_collect(training_data))
    return out


def oracle_queries() -> dict[str, str]:
    from pipegen_spark.queries.oracle2 import RELATIONAL2_ORACLE
    from pipegen_spark.queries.oracle3 import RELATIONAL3_ORACLE
    from pipegen_spark.queries.oracle4 import RELATIONAL4_ORACLE
    from pipegen_spark.queries.oracle5 import RELATIONAL5_ORACLE
    from pipegen_spark.queries.training_oracle import TRAINING_ORACLE

    out = dict(RELATIONAL_ORACLE)
    out.update(RELATIONAL2_ORACLE)
    out.update(RELATIONAL3_ORACLE)
    out.update(RELATIONAL4_ORACLE)
    out.update(RELATIONAL5_ORACLE)
    out.update(TRAINING_ORACLE)
    return out
