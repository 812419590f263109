"""Declared query corpus: the correctness contract of the engine.

Each query exists twice: as a Spark DataFrame builder (the engine path,
`relational.py` / `training_data.py`) and as ANSI SQL for the DuckDB oracle
(`oracle.py`). Column names are aliased identically on both sides; floating
aggregates go through DECIMAL(18,2) so cross-partition summation order can
never change the result (SURVEY.md §7.3).
"""

from pipegen_spark.queries.registry import all_queries, oracle_queries  # noqa: F401
