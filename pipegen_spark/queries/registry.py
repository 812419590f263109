"""Registry of all declared queries + their DuckDB oracle SQL.

The driver contract (`__spark_entry__.py`) re-exports these: every operator
claimed in SURVEY.md §2 has a `queries()` entry here, and (when
SQL-expressible) a matching oracle for the correctness gate.

Enumeration order is part of the contract: the driver's correctness gate
hashes the FIRST 50 entries in dict order, so `all_queries()` front-loads
the queries that most need a hard signal this round:

1. the 34 training-data operators (dedup/ANN/text/curation/embedding —
   the [EXT] north-star family, ungated in rounds 2-3),
2. the 10 extended relational queries q48-q57,
3. six long-stable relational canaries as regression sentinels
   (q03 agg, q13 window TVF, q37 as-of, q38 range-agg, q43 pricing,
   q47 pivot — q38/q43 included while they clear their r02/r03 reds),

= exactly 50, followed by the remaining relational corpus (all of which
stays verifiable locally via tools/compare.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pipegen_spark.queries import relational
from pipegen_spark.queries.oracle import RELATIONAL_ORACLE

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Long-stable relational queries kept inside the 50-row gate window as
#: regression sentinels (plus the two under-repair hash-reds q38/q43).
GATE_CANARIES = (
    "q03_agg_having",
    "q13_event_window",
    "q37_asof_join",
    "q38_range_agg",
    "q43_tpch_pricing",
    "q47_pivot",
)

#: Queries added AFTER the round-4 gate window was pinned: enumerated
#: after position 50 so the hard-signal set stays the planned one
#: (they remain fully verified by the local mirror + corpus tests).
#: Round-5 plan: once CORRECTNESS_r04 records the current window green,
#: rotate this list into the window (keeping the canaries) so every
#: query accumulates a driver row across rounds.
GATE_DEFERRED = (
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

#: Extended relational tranche (TPC-H decision-support + window/sketch
#: shapes) that had no driver row in rounds 2-3.
EXTENDED_RELATIONAL = (
    "q48_grouping_sets",
    "q49_range_frame",
    "q50_approx_percentile",
    "q51_tpch_forecast_revenue",
    "q52_tpch_priority_check",
    "q53_tpch_promo_ratio",
    "q54_tpch_big_orders",
    "q55_tpch_disjunctive",
    "q56_tpch_supplier_cnt",
    "q57_tpch_idle_rich",
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
    # Gate window (first 50): training-data ops, extended relational, canaries.
    for name in sorted(_collect(training_data)):
        if name in GATE_DEFERRED:
            continue
        out[name] = pool[name]
    for name in EXTENDED_RELATIONAL:
        out[name] = pool[name]
    for name in GATE_CANARIES:
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
