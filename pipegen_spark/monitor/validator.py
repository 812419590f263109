"""Rule-based message/row validation (reference B12,
internal/pipeline/consumer.go:263-289, 360-388): required fields, type
checks, size limits — evaluated as DataFrame filters so validation is a
single distributed pass, returning violation counts per rule.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_MESSAGE_BYTES = 1024 * 1024  # consumer.go size limit (1 MB)


@dataclass
class ValidationRules:
    required_fields: list[str] = field(default_factory=list)
    max_bytes_col: str | None = None  # binary column checked against 1 MB
    type_checks: dict[str, str] = field(default_factory=dict)
    # col → castable spark type, e.g. {"amount": "int"}


def validate(df: DataFrame, rules: ValidationRules) -> dict[str, int]:
    """Violation counts per rule — one aggregate job, no collect loops."""
    aggs = []
    for c in rules.required_fields:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"missing_{c}")
        )
    if rules.max_bytes_col:
        aggs.append(
            F.count(
                F.when(
                    F.octet_length(F.col(rules.max_bytes_col))
                    > MAX_MESSAGE_BYTES,
                    1,
                )
            ).alias("oversized")
        )
    for c, t in rules.type_checks.items():
        aggs.append(
            F.count(
                F.when(
                    F.col(c).isNotNull()
                    & F.expr(f"try_cast({c} AS {t})").isNull(),
                    1,
                )
            ).alias(f"badtype_{c}")
        )
    aggs.append(F.count("*").alias("total_rows"))
    row = df.agg(*aggs).collect()[0]
    return row.asDict()
