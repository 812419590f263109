"""Registry of all declared queries + their DuckDB oracle SQL.

The driver contract (`__spark_entry__.py`) re-exports these: every operator
claimed in SURVEY.md §2 has a `queries()` entry here, and (when
SQL-expressible) a matching oracle for the correctness gate.

Enumeration order is part of the contract: the driver's correctness gate
hashes the FIRST 50 entries in dict order, so `all_queries()` front-loads
`GATE_WINDOW` — the 50 queries that most need a hard driver signal this
round — and every other query enumerates behind it (every query in the
corpus remains verifiable locally via tools/compare.py).

Rotation history (the plan: every query accumulates a driver row across
rounds; long-stable canaries stay in every window):

- r1-r3 window: the relational corpus head (q01...)
- r4 window: 34 training ops + q48-q57 + 6 canaries — found the 6
  output-surface reds fixed this round
- r5 window: the 37 training ops deferred in r4, the 6 repaired r4
  reds (re-gated to confirm the fix), the 6 canaries, and q75 — came
  back 50/50 green
- r6 window: the 19 never-gated queries (q58-q74 tranche +
  curate_classifier + curate_rep_ngram), the two real-codec queries
  (then rows-only), seven new oracle-checked ops, the 6 canaries, and
  the first 16 (alphabetically) of the 38 r4-green ops — came back
  48/50 hash-green + 2 rows-only; first-pass driver coverage of the
  whole corpus complete.
- r7 window (current): the remaining 22 r4-green ops (embed_kmeans +
  multimodal_binary_stats + q49-q52/q55/q56 + simsearch_* + text_*
  tail), the two codec queries RE-gated (their surface changed to the
  md5-derived hard-oracle form — now hash rows, not rows-only), the
  brand-new curate_quality_threshold and multimodal_jpeg_roundtrip,
  the 18 lowest-numbered r3-green relational rows (the whole r1-r3
  tranche's newest rows date from r3), and the 6 canaries. After this
  window every query's newest driver row is <= 3 rounds old.
- r8 plan: the remaining 26 r3-green relational rows (q18-q46 minus
  canaries) + the oldest r5 rows, keeping the canaries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pipegen_spark.queries import relational
from pipegen_spark.queries.oracle import RELATIONAL_ORACLE

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Long-stable relational queries kept inside every 50-row gate window as
#: regression sentinels (q38/q43 were multi-round hash-reds before the
#: integer-surface fix; they stay pinned so a regression is caught in one
#: round).
GATE_CANARIES = (
    "q03_agg_having",
    "q13_event_window",
    "q37_asof_join",
    "q38_range_agg",
    "q43_tpch_pricing",
    "q47_pivot",
)

#: Round 7: queries whose gated SURFACE is new or changed this round —
#: the scale-safe per-source threshold gate (brand new), and the two
#: real-codec queries re-gated because their output changed from the
#: rows-only (doc_id, n_bytes, content_sha, ...) form to the
#: md5-derived hard-oracle (doc_id, feat_dim, feat_norm) form.
GATE_CHANGED = (
    "curate_quality_threshold",
    "multimodal_jpeg_roundtrip",
    "multimodal_png_features",
    "multimodal_wav_features",
)

#: Rolling re-gates: the remaining 22 of the 38 r4-green ops (the first
#: 16 alphabetically re-gated in r6) — after this window no driver row
#: anywhere predates r3.
GATE_ROLLING = (
    "embed_kmeans",
    "multimodal_binary_stats",
    "q49_range_frame",
    "q50_approx_percentile",
    "q51_tpch_forecast_revenue",
    "q52_tpch_priority_check",
    "q55_tpch_disjunctive",
    "q56_tpch_supplier_cnt",
    "simsearch_bruteforce",
    "simsearch_ivf",
    "simsearch_lsh",
    "simsearch_recall",
    "text_bm25",
    "text_fingerprint",
    "text_langid",
    "text_normalize",
    "text_quality",
    "text_sentiment",
    "text_tfidf",
    "text_tokens",
    "text_vocab",
    "text_winnow",
)

#: Relational refresh: the 18 lowest-numbered of the 44 relational
#: queries whose newest driver rows date from round 3 (the remaining 26,
#: starting at q18_left_join — bumped to make room for the new JPEG
#: roundtrip gate — rotate in r8).
GATE_RELATIONAL_REFRESH = (
    "q01_scan_project",
    "q02_filter_expr",
    "q04_join_broadcast",
    "q05_multi_join",
    "q06_anti_join",
    "q06_semi_join",
    "q07_case_agg",
    "q08_window_rownum",
    "q09_rank_topk",
    "q10_except",
    "q10_intersect",
    "q10_union_all",
    "q11_string_funcs",
    "q12_date_trunc",
    "q14_distinct_dedup",
    "q15_rollup",
    "q16_count_distinct",
    "q17_scalar_subquery",
)

#: The full round-7 gate window, in enumeration order: 4 changed/new
#: surfaces + 22 rolling re-gates + 18 relational refreshes + 6
#: canaries = 50.
GATE_WINDOW = (
    GATE_CHANGED + GATE_ROLLING + GATE_RELATIONAL_REFRESH + GATE_CANARIES
)


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
        relational6,
        training_data,
    )

    pool: dict[str, QueryFn] = {}
    pool.update(_collect(relational))
    pool.update(_collect(relational2))
    pool.update(_collect(relational3))
    pool.update(_collect(relational4))
    pool.update(_collect(relational5))
    pool.update(_collect(relational6))
    pool.update(_collect(training_data))

    out: dict[str, QueryFn] = {}
    for name in GATE_WINDOW:
        out[name] = pool[name]
    # Everything else, in module-then-alphabetical order as before.
    for name, fn in pool.items():
        out.setdefault(name, fn)
    return out


def oracle_queries() -> dict[str, str]:
    from pipegen_spark.queries.oracle2 import RELATIONAL2_ORACLE
    from pipegen_spark.queries.oracle3 import RELATIONAL3_ORACLE
    from pipegen_spark.queries.oracle4 import RELATIONAL4_ORACLE
    from pipegen_spark.queries.oracle5 import RELATIONAL5_ORACLE
    from pipegen_spark.queries.oracle6 import RELATIONAL6_ORACLE
    from pipegen_spark.queries.training_oracle import TRAINING_ORACLE

    out = dict(RELATIONAL_ORACLE)
    out.update(RELATIONAL2_ORACLE)
    out.update(RELATIONAL3_ORACLE)
    out.update(RELATIONAL4_ORACLE)
    out.update(RELATIONAL5_ORACLE)
    out.update(RELATIONAL6_ORACLE)
    out.update(TRAINING_ORACLE)
    return out
