"""The driver's correctness gate hashes the FIRST 50 `queries()` entries in
dict order — these tests pin the gate window so a refactor can't silently
rotate queries out of the hard signal (round-2 regression: a module reorder
ungated all 44 [EXT] queries for two rounds), and pin the gate OUTPUT
SURFACE contract learned from the round-4 reds: the driver canonicalizes
results through pandas, which cannot sort/hash array/map/struct values
(TypeError: unhashable type) and renders Spark DECIMAL as Decimal objects
vs DuckDB float64 (trailing-zero cents hash-diverge) — so every gated
query must emit scalar, non-DECIMAL columns only.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE

from pipegen_spark.queries.registry import (
    GATE_CANARIES,
    GATE_CHANGED,
    GATE_NEVER,
    GATE_ROLLING,
    GATE_WINDOW,
    all_queries,
    oracle_queries,
)

GATE_ROWS = 50


def test_gate_window_composition():
    qs = list(all_queries())
    gate = qs[:GATE_ROWS]
    assert len(GATE_WINDOW) == GATE_ROWS
    assert gate == list(GATE_WINDOW)
    assert len(set(GATE_WINDOW)) == GATE_ROWS  # no duplicate rows wasted
    assert set(GATE_CANARIES) <= set(gate)
    assert set(GATE_CHANGED) <= set(gate)
    assert set(GATE_NEVER) <= set(gate)
    assert set(GATE_ROLLING) <= set(gate)


def test_corpus_size_pinned_and_docs_in_sync():
    """Round-7 verdict #3/#5: SURVEY §7.4 and COVERAGE.md drifted from
    the real corpus (175 vs 181) because queries landed after the docs
    were written. The declared size is now a registry constant, and the
    docs must quote it — add a query, bump CORPUS_SIZE, update both
    docs, or this fails."""
    import os

    from pipegen_spark.queries.registry import CORPUS_SIZE

    assert len(all_queries()) == CORPUS_SIZE
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    needle = f"{CORPUS_SIZE} queries"
    for doc in ("SURVEY.md", "COVERAGE.md"):
        with open(os.path.join(repo, doc)) as fh:
            assert needle in fh.read(), f"{doc} does not state '{needle}'"


def test_registry_complete_and_oracle_keyed():
    qs = all_queries()
    oracles = oracle_queries()
    assert len(qs) >= 94
    # Every oracle key must have a query (the reverse may be weaker:
    # non-SQL-expressible ops get a rows-only check).
    assert set(oracles) <= set(qs)


# Streaming queries execute a micro-batch run inside the query fn; their
# (scalar) output schemas are asserted by their own tests instead of here.
_STREAMING = {
    "q39_stream_session",
    "q40_stream_tumble",
    "q41_stream_late",
    "q42_stream_dedup",
    "q60_stream_enrich",
}


def test_no_nonscalar_gate_surfaces(spark):
    """No query — gated or not — may emit DECIMAL/array/map/struct output
    columns: the driver gate rotates across rounds, so today's deferred
    query is next round's hard signal."""
    from pyspark.sql.types import (
        ArrayType,
        DecimalType,
        MapType,
        StructType,
    )

    bad = []
    for name, fn in all_queries().items():
        if name in _STREAMING:
            continue
        df = fn(spark, SF_SMOKE)
        for f in df.schema.fields:
            if isinstance(
                f.dataType, (DecimalType, ArrayType, MapType, StructType)
            ):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, f"non-scalar / DECIMAL gate surfaces: {bad}"


def test_every_query_has_a_gate_path():
    """The mechanical snapshot rule (r10; r9 VERDICT next #1): every
    corpus query must either carry a historical driver CORRECTNESS row,
    sit in the current 50-row GATE_WINDOW, or be declared in
    GATE_PENDING (landed after the round's final suite run). A query
    satisfying none of these is hard-signal debt nobody wrote down —
    the class of drift that cost r8/r9 their never-gated backlogs."""
    import glob
    import json
    import os

    from pipegen_spark.queries.registry import (
        GATE_PENDING,
        GATE_WINDOW,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        with open(f) as fh:
            seen |= set(json.load(fh))
    qs = set(all_queries())
    assert len(GATE_WINDOW) == 50
    assert len(set(GATE_WINDOW)) == 50, "duplicate key in GATE_WINDOW"
    assert set(GATE_WINDOW) <= qs
    assert set(GATE_PENDING) <= qs
    uncovered = qs - seen - set(GATE_WINDOW) - set(GATE_PENDING)
    assert not uncovered, sorted(uncovered)


def test_gate_status_artifact_fresh():
    """r10 VERDICT next #7: the suite regenerates GATE_STATUS.json so
    gate-coverage auditing is one file read instead of aggregating all
    CORRECTNESS_r*.json by hand — and so the artifact cannot go stale
    relative to the registry or the correctness history."""
    import json
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    from gate_status import build_status

    status = build_status(repo)
    out = os.path.join(repo, "GATE_STATUS.json")
    with open(out, "w") as fh:
        json.dump(status, fh, indent=1)
        fh.write("\n")

    assert status["corpus_size"] == len(all_queries())
    # Every never-gated query must be accounted for: either in the
    # current window (gets its row this round) or declared pending.
    from pipegen_spark.queries.registry import GATE_PENDING

    unaccounted = (
        set(status["never_gated"]) - set(GATE_WINDOW) - set(GATE_PENDING)
    )
    assert not unaccounted, sorted(unaccounted)
    # No query's newest driver row may be red without a re-gate slot.
    red_unslotted = set(status["latest_red"]) - set(GATE_WINDOW)
    assert not red_unslotted, sorted(red_unslotted)
