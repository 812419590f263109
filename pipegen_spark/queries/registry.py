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
- r6 window (current): the 19 never-gated queries (q58-q74 tranche +
  curate_classifier + curate_rep_ngram), the two brand-new real-codec
  queries multimodal_png_features / multimodal_wav_features (rows-only:
  PNG/WAV decode has no SQL oracle) plus four new oracle-checked ops
  (simsearch_range, embed_outliers, simsearch_knn_graph,
  curate_quality_percentile, curate_ensemble, embed_dim_stats,
  curate_near_dup_rate), the 6 canaries, and the first 16
  (alphabetically) of the 38 r4-green ops as rolling re-gates. This
  completes first-pass driver coverage of the whole corpus: every
  query has now been in a window at least once.
- r7 plan: rolling re-gate of the remaining 22 r4-green ops
  (embed_kmeans + multimodal_binary_stats + q49-q52/q55/q56 +
  simsearch_* + text_* tail) + the oldest r1-r3 rows, keeping the
  canaries.
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

#: Round 6: the last queries that have never had a driver row — the
#: q58-q74 relational tranche plus the two ops added in round 5 — and
#: the nine round-6 additions (real PNG/WAV codec decodes, rows-only;
#: cosine radius search, centroid-outlier gate, bucketed kNN graph,
#: per-source quality-percentile gate, three-filter quality ensemble,
#: dim-stats diagnostic and per-source near-dup rate, all seven
#: oracle-checked).
GATE_NEVER_GATED = (
    "q58_zorder_layout",
    "q59_table_profile",
    "q60_stream_enrich",
    "q61_pagerank",
    "q62_tpch_volume_shipping",
    "q63_tpch_market_share",
    "q64_tpch_profit",
    "q65_tpch_priority_mix",
    "q66_tpch_cust_distribution",
    "q67_tpch_small_qty",
    "q68_tpch_top_supplier",
    "q69_tpch_important_parts",
    "q70_tpch_sole_problem",
    "q71_funnel",
    "q72_retention",
    "q73_kmv_overlap",
    "q74_anomaly",
    "curate_classifier",
    "curate_rep_ngram",
    "multimodal_png_features",
    "multimodal_wav_features",
    "simsearch_range",
    "embed_outliers",
    "simsearch_knn_graph",
    "curate_quality_percentile",
    "curate_ensemble",
    "embed_dim_stats",
    "curate_near_dup_rate",
)

#: Rolling re-gates: the first 16 (alphabetically) of the 38 r4-green
#: training/relational ops whose only driver rows date from round 4; the
#: remaining 22 (embed_kmeans + multimodal_binary_stats +
#: q49-q52/q55/q56 + simsearch_* + text_* tail) rotate in r7.
GATE_ROLLING = (
    "curate_chunk",
    "curate_contamination",
    "curate_mix",
    "curate_pack",
    "curate_redact",
    "curate_repetition",
    "curate_sample",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_keep_best",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_prefix",
    "dedup_simhash",
    "dedup_span_stats",
)

#: The full round-6 gate window, in enumeration order: 28 never-gated
#: (incl. the nine round-6-new queries) + 16 rolling re-gates + 6
#: canaries = 50.
GATE_WINDOW = GATE_NEVER_GATED + GATE_ROLLING + GATE_CANARIES


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
