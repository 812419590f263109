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
- r5 window (current): the 37 training ops deferred in r4, the 6
  repaired r4 reds (re-gated to confirm the fix), the 6 canaries, and
  q75 (the newest query, never gated)
- r6 plan: rotate in the never-gated relational tranche q58-q74 + the
  28 r4-green training ops on a rolling basis, keeping the canaries.
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

#: The 6 round-4 gate reds, re-gated this round to confirm the repairs:
#: embed_* switched from array<...> columns (which crash the driver's
#: pandas canonicalizer) to exploded scalar rows; the q4x/q5x money
#: columns switched from DECIMAL(18,2) (trailing-zero cents hash-diverge
#: vs DuckDB's float64 through pandas) to BIGINT cents.
GATE_REPAIRED = (
    "embed_normalize",
    "embed_quantize",
    "q48_grouping_sets",
    "q53_tpch_promo_ratio",
    "q54_tpch_big_orders",
    "q57_tpch_idle_rich",
)

#: Training-data operators deferred from the round-4 window, rotated IN
#: for round 5 (their first-ever driver rows).
GATE_ROTATED_IN = (
    "dedup_cc_star",
    "dedup_setjoin",
    "dedup_substring",
    "dedup_containment",
    "embed_gram",
    "simsearch_hybrid",
    "curate_budget",
    "text_rarity",
    "curate_gopher",
    "dedup_incremental",
    "dedup_semantic",
    "curate_split",
    "multimodal_features",
    "embed_pq",
    "text_pmi",
    "text_lm_bigram",
    "curate_dsir",
    "text_cms_topk",
    "curate_weighted_sample",
    "simsearch_pq",
    "simsearch_pq_recall",
    "text_readability",
    "dedup_bloom",
    "curate_shuffle",
    "curate_drift",
    "text_diversity",
    "curate_span_mask",
    "curate_fim",
    "text_bpe_pairs",
    "text_typo_pairs",
    "simsearch_mmr",
    "embed_matryoshka",
    "multimodal_phash",
    "text_good_turing",
    "text_kneser_ney",
    "curate_temperature",
    "text_burstiness",
)

#: The full round-5 gate window, in enumeration order: 37 rotated-in
#: training ops + 6 repaired reds + 6 canaries + the newest query = 50.
GATE_WINDOW = (
    GATE_ROTATED_IN + GATE_REPAIRED + GATE_CANARIES + ("q75_asof_forward",)
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
