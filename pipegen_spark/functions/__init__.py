"""Scalar/array function library shared by operators and the oracle.

`dialect.py` renders each primitive for both engines ("spark" for
`F.expr(...)`, "duckdb" for the oracle SQL) from one template, so the
correctness contract can never drift between the two sides.
"""

from pipegen_spark.functions import dialect  # noqa: F401
