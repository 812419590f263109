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
- r8 window: the remaining 26 r3-green relational rows (q18-q46 minus
  canaries), the three changed/new surfaces
  (curate_ensemble_threshold — brand-new gated 100 TB-shape ensemble;
  curate_unimax, whose budget multiply went overflow-split and whose
  epochs_ppm gained the zero-token guard in BOTH engines; and the
  brand-new multimodal_frame_sample and dedup_semantic_auto), the 14
  alphabetically-first r5-green ops, and the 6 canaries. Came back
  50/50 green; after this window no driver row anywhere predated r4.
- r9 window (current): retires the whole never-gated set — the 31
  round-8 late-tranche queries that had no driver row (q76-q80,
  curate_blocklist/boilerplate/calibration/doremi/length_stats/
  preference_pairs/split_leakage, dedup_tfidf_cosine/threshold_sweep/
  triangles, embed_cluster_sample/jl_project/top_direction,
  multimodal_audio_fp/jpeg_420/patches/resample/vad_segments/
  wav_energy, simsearch_ivfpq, text_bpe_encode/bpe_train/chardiv/
  rake/textrank/vocab_growth) — plus the 7 changed/new surfaces
  (dedup_semantic re-pointed at the scale-safe auto-k plan, retiring
  the redundant dedup_semantic_auto key; simsearch_knn_graph /
  embed_hard_negatives / simsearch_bitext with the size-derived LSH
  plane count; embed_normalize / embed_quantize whose gate surface
  went to per-vector md5 folds late in r8; and the brand-new
  multimodal_mjpeg_frames — real MJPEG/AVI container decode over the
  from-scratch JPEG codec), 6 rolling r5 re-gates (dedup_incremental,
  dedup_setjoin, dedup_substring, embed_gram, embed_matryoshka,
  embed_pq), and the 6 canaries. After this window EVERY query in the
  corpus has at least one driver row.
- r10 plan: the remaining 22 r5-green ops (multimodal_features,
  multimodal_phash, q48/q53/q54/q57/q75, simsearch_hybrid/mmr/pq/
  pq_recall, text_bpe_pairs/burstiness/cms_topk/diversity/
  good_turing/kneser_ney/lm_bigram/pmi/rarity/readability/
  typo_pairs) + the round-9 late additions that landed after the r9
  window was cut (dedup_lpa — synchronous label-propagation
  communities over the near-dup graph — text_perplexity — the CCNet
  head/middle/tail perplexity filter on the fixed-point
  shift-and-square log2 — text_entropy — true-bits Shannon
  entropy — curate_kl_drift — per-source KL from the corpus
  distribution in bits, both on the same primitive — and
  dedup_semantic_ivf — the IVF two-level-assignment rung of the
  SemDeDup ladder — and q81_basket_pairs — market-basket
  support/confidence/lift pair mining — all oracle-green on the
  local mirror at sf0.01 AND sf0.1) + the r6 tranche head, keeping the canaries.
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
CORPUS_SIZE = 207

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

#: Round 9: queries whose gated SURFACE is new or changed this round —
#: dedup_semantic re-pointed at the scale-safe size-derived-k SemDeDup
#: plan (the r8-gated dedup_semantic_auto algorithm; that redundant key
#: is retired), the three LSH consumers whose plane count now derives
#: from the corpus size (knn_plane_count, mirrored by the oracle's
#: CASE-ladder CTE), the two embed surfaces whose gate output went to
#: per-vector md5 folds after the r8 window was cut, and the brand-new
#: multimodal_mjpeg_frames (real MJPEG/AVI container decode over the
#: from-scratch JPEG codec).
GATE_CHANGED = (
    "dedup_semantic",
    "simsearch_knn_graph",
    "embed_hard_negatives",
    "simsearch_bitext",
    "embed_normalize",
    "embed_quantize",
    "multimodal_mjpeg_frames",
)

#: Never-gated retirement (round-9 priority, VERDICT r8 top_next): the
#: 31 queries that landed after the r8 window was cut and have no
#: driver CORRECTNESS row anywhere (embed_hard_negatives and
#: simsearch_bitext, also never gated, ride GATE_CHANGED above). After
#: this window every query in the corpus has at least one hard row.
GATE_NEVER = (
    "q76_gap_fill",
    "q77_mad_anomaly",
    "q78_streaks",
    "q79_tpch_min_cost_supp",
    "q80_tpch_dominant_supplier",
    "curate_blocklist",
    "curate_boilerplate",
    "curate_calibration",
    "curate_doremi",
    "curate_length_stats",
    "curate_preference_pairs",
    "curate_split_leakage",
    "dedup_tfidf_cosine",
    "dedup_threshold_sweep",
    "dedup_triangles",
    "embed_cluster_sample",
    "embed_jl_project",
    "embed_top_direction",
    "multimodal_audio_fp",
    "multimodal_jpeg_420",
    "multimodal_patches",
    "multimodal_resample",
    "multimodal_vad_segments",
    "multimodal_wav_energy",
    "simsearch_ivfpq",
    "text_bpe_encode",
    "text_bpe_train",
    "text_chardiv",
    "text_rake",
    "text_textrank",
    "text_vocab_growth",
)

#: Rolling re-gates: the 6 alphabetically-first of the ops whose newest
#: driver rows date from round 5 (the remaining 22 rotate in r10).
GATE_ROLLING = (
    "dedup_incremental",
    "dedup_setjoin",
    "dedup_substring",
    "embed_gram",
    "embed_matryoshka",
    "embed_pq",
)

#: The full round-9 gate window, in enumeration order: 7 changed/new
#: surfaces + 31 never-gated retirements + 6 rolling re-gates + 6
#: canaries = 50.
GATE_WINDOW = GATE_CHANGED + GATE_NEVER + GATE_ROLLING + GATE_CANARIES


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
