"""The canonicalization every correctness surface shares must be stable:
order-insensitive over rows and column order, sensitive to values."""

from __future__ import annotations

from datetime import datetime

from pipegen_spark.queries.canon import canon, result_sha256, table_canon


def test_canon_scalars():
    assert canon(None) == "NULL"
    assert canon(float("nan")) == "nan"
    assert canon(1.5) == "1.5"
    assert canon(datetime(2024, 1, 1, 12, 0, 0)) == "2024-01-01 12:00:00.000000"
    assert canon([1, None, "x"]) == "[1,NULL,x]"


def test_hash_is_order_insensitive_and_value_sensitive():
    cols = ["b", "a"]
    rows = [(1, "x"), (2, "y")]
    base = result_sha256(cols, rows)
    # Row order and column order don't matter (values move with their col).
    assert result_sha256(cols, list(reversed(rows))) == base
    assert result_sha256(["a", "b"], [("x", 1), ("y", 2)]) == base
    # Any value change does.
    assert result_sha256(cols, [(1, "x"), (2, "z")]) != base
    # Column NAMES are part of the digest.
    assert result_sha256(["b", "c"], rows) != base


def test_table_canon_sorts_columns_and_rows():
    cols, vals = table_canon(["b", "a"], [(2, "y"), (1, "x")])
    assert cols == ["a", "b"]
    assert vals == [("x", "1"), ("y", "2")]
