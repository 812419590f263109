"""Canonical result representation shared by every correctness surface.

`tools/compare.py` (the local gate mirror), `bench.py` (which publishes a
per-query sha256 so a driver-side hash mismatch can be diffed against the
repo's own canonical hash instead of guessed at) and the pytest corpus
harness all canonicalize identically: columns sorted by name, every value
rendered to a fixed text form, rows sorted lexicographically.
"""

from __future__ import annotations

import hashlib
import math
from datetime import date, datetime


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr keeps full precision — both engines must emit identical doubles
        return repr(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_canon(cols, rows):
    """(sorted column names, canonical sorted row tuples)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def result_sha256(cols, rows) -> str:
    """Order-insensitive digest of a query result: sha256 over the sorted
    column names and the canonical sorted rows."""
    ccols, cvals = table_canon(cols, rows)
    h = hashlib.sha256()
    h.update("\x1f".join(ccols).encode())
    for row in cvals:
        h.update(b"\x1e")
        h.update("\x1f".join(row).encode())
    return h.hexdigest()
