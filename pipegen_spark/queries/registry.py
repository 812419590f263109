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
- r8 window (current): the remaining 26 r3-green relational rows
  (q18-q46 minus canaries), the three changed/new surfaces
  (curate_ensemble_threshold — brand-new gated 100 TB-shape ensemble;
  curate_unimax, whose budget multiply went overflow-split and whose
  epochs_ppm gained the zero-token guard in BOTH engines; and the
  brand-new multimodal_frame_sample and dedup_semantic_auto), the 14
  alphabetically-first r5-green ops, and the 6 canaries. After this
  window no driver row anywhere predates r4.
- r9 plan: the remaining 31 r5-green ops (dedup_incremental onward) +
  the six round-8 additions that landed after the r8 window was cut
  (multimodal_vad_segments, multimodal_audio_fp,
  embed_hard_negatives, text_bpe_train, simsearch_bitext,
  curate_preference_pairs, multimodal_jpeg_420 — 4:2:0 chroma
  subsampling, baseline + progressive — and text_bpe_encode — the
  trained-merge tokenization pass — all oracle-green on the
  local mirror — plus a re-gate of simsearch_bitext's final plan
  shape and of embed_normalize / embed_quantize, whose gate surface
  changed late in r8 from exploded per-element rows to per-vector
  in-engine md5 folds — same element sensitivity, 64x fewer result
  rows, measured 3.6 -> 0.8 s warm — and the brand-new
  simsearch_ivfpq, IVFADC over product-quantized residuals, and
  text_textrank, PageRank keyword ranking over the co-occurrence
  graph, and curate_doremi, multiplicative-weights domain
  reweighting, and multimodal_resample, engine-exact linear audio
  resampling over the real WAV decode, and curate_blocklist,
  C4-style word-boundary banned-list filtering, and
  embed_top_direction, integer power iteration over the exact Gram
  matrix, and multimodal_patches, ViT-style patch statistics over
  the real PNG codec), keeping the canaries; overflow rolls to r10.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pipegen_spark.queries import relational
from pipegen_spark.queries.oracle import RELATIONAL_ORACLE

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Declared corpus size, pinned so the docs can't drift from the code
#: (round-7 verdict: SURVEY/COVERAGE said 175 while the repo ran 181 —
#: six queries landed in the end-of-round snapshot after the docs were
#: written). tests/test_registry_order.py asserts len(all_queries())
#: equals this AND that SURVEY.md / COVERAGE.md state the same number:
#: adding a query without bumping the docs fails the suite.
CORPUS_SIZE = 200

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

#: Round 8: queries whose gated SURFACE is new or changed this round —
#: the gated 100 TB-shape ensemble composition (brand new: same three
#: signals as curate_ensemble, histogram-cutoff gate instead of the
#: exact-rank sort), and curate_unimax (overflow-split budget multiply
#: via dl.mul_ppm + zero-token epochs_ppm guard, changed in BOTH
#: engines this round).
GATE_CHANGED = (
    "curate_ensemble_threshold",
    "curate_unimax",
    "multimodal_frame_sample",
    "dedup_semantic_auto",
    "multimodal_jpeg_progressive",
)

#: Rolling re-gates: the 13 alphabetically-first of the 44 ops whose
#: newest driver rows date from round 5 (the remaining 31, starting at
#: dedup_incremental, rotate in r9 — dedup_semantic's scale-safe auto-k
#: sibling above carries the identical algorithm through this window's
#: gate; dedup_incremental yielded its slot to the brand-new progressive
#: JPEG query).
GATE_ROLLING = (
    "curate_budget",
    "curate_drift",
    "curate_dsir",
    "curate_fim",
    "curate_gopher",
    "curate_shuffle",
    "curate_span_mask",
    "curate_split",
    "curate_temperature",
    "curate_weighted_sample",
    "dedup_bloom",
    "dedup_cc_star",
    "dedup_containment",
)

#: Relational refresh: the remaining 26 relational queries whose newest
#: driver rows date from round 3 (q18-q46 minus the canaries) — after
#: this window the whole r1-r3 tranche has a fresh row.
GATE_RELATIONAL_REFRESH = (
    "q18_left_join",
    "q19_props_extract",
    "q20_cube",
    "q21_math_funcs",
    "q22_array_funcs",
    "q23_approx_distinct",
    "q24_conditional_funcs",
    "q25_full_outer",
    "q26_cross_join",
    "q27_exists_correlated",
    "q28_union_distinct",
    "q29_like_regex",
    "q30_buckets",
    "q31_sessionize",
    "q32_percentiles",
    "q33_window_family",
    "q34_string_funcs2",
    "q35_date_funcs",
    "q36_curation_decision",
    "q39_stream_session",
    "q40_hopping_window",
    "q41_stream_join",
    "q42_stream_dedup",
    "q44_tpch_shipping",
    "q45_tpch_region_volume",
    "q46_tpch_returns",
)

#: The full round-8 gate window, in enumeration order: 5 changed/new
#: surfaces + 13 rolling re-gates + 26 relational refreshes + 6
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
