"""One-order-of-magnitude scale datapoint: run the most expensive
training-data operators on a 10x corpus and MEASURE the scaling exponent
the plans argue for in SCALE.md.

The driver ships sf{0.001,0.01,0.1} only, so the 10x corpus (~sf1) is
derived from sf0.1 — measurement input only, never a correctness input
(the oracle gates all run on driver-shipped data):

- `documents`: 10 copies, doc_id offset per copy, and each copy's text
  passed through a per-copy letter rotation (Caesar on [a-z][A-Z]).
  This keeps every distributional property the operators key on —
  token counts, word lengths, per-source sizes, WITHIN-copy duplicate
  structure — while making shingles/hashes distinct ACROSS copies, so
  the corpus-wide duplication RATE stays constant. Naive concatenation
  of identical copies would turn every doc into a 10-member near-dup
  group and inflate LSH pair volume ~100x — measuring a harder corpus,
  not a bigger one.
- `embeddings`: 10 copies, vec_id offset, each copy's vector rotated by
  a copy-specific offset (norms and within-copy geometry preserved;
  cross-copy vectors decorrelated).

For each selected query: one cold run at sf0.1 and one at the 10x dir,
reporting the time ratio. A plan that is linear in executors should land
near 10x wall on a fixed-size local box (same parallelism, 10x work);
super-linear ratios flag the operators whose pair volume or state grows
faster than the input — exactly what cannot be seen at a single scale.
Archived to bench_history/scale_sf1.json.

Usage: python tools/scale_bench.py [query ...]   (default: the TOP set)
"""

from __future__ import annotations

import json
import os
import string
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_COPIES = 10
ID_OFFSET = 100_000_000  # far above any sf0.1 id
SRC_DIR = "/root/testdata/sf0.1"
# r10: the measurement corpus is the FULL build_sf1 derivation (all ten
# tables; documents/embeddings use the identical rotation derivation this
# tool originally wrote to sf1x10), so relational-table queries like
# q81_basket_pairs can be measured too — previously the derived dir held
# only documents/embeddings and any TPC-H-table query crashed the run.
OUT_DIR = os.path.join(REPO, ".benchmarks", "sf1_full")

#: Default measurement set: the most expensive training ops from the
#: latest bench detail, covering every family whose scaling argument is
#: non-trivial (LSH pair volume, cluster-blocked cosine, set joins,
#: graph iteration, histogram gates, Arrow codec stages).
TOP = (
    "dedup_semantic",  # r9: now the size-derived-k (scale-safe) plan
    "curate_boilerplate",
    "dedup_keep_best",
    "curate_near_dup_rate",
    "dedup_cc_star",
    "dedup_setjoin",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "simsearch_knn_graph",
    "embed_kmeans",
    "curate_ensemble",
    "curate_quality_percentile",
    "multimodal_jpeg_roundtrip",
    "text_bm25",
)

#: Queries whose stages GATE on stopword evidence (language-ID argmax,
#: Gopher required-stops): the default Caesar derivation rotates
#: stopwords too, so the 9 rotated copies die at the first gate and a
#: "10x" run measures ~1x of downstream work. These measure against
#: build_sf1.build_stopfix() — per-token rotation that skips stopwords
#: (documents-only dir; see that docstring for why duplication rates
#: are unchanged).
STOPKEYED = {"curate_pipeline_e2e"}


def _rot(s: str, k: int) -> str:
    return s[k:] + s[:k]


def build_corpus(spark) -> None:
    """Delegate to tools/build_sf1.build — the full ten-table 10x
    derivation (idempotent; documents/embeddings identical to the old
    two-table derivation this tool carried through r9)."""
    from tools.build_sf1 import build

    build(spark)


def main() -> None:
    os.environ.setdefault("PYTHONWARNINGS", "ignore")
    from pipegen_spark.queries.registry import all_queries
    from pipegen_spark.session import get_spark

    names = sys.argv[1:] or list(TOP)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        "pipegen-scale-bench",
        cpus=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = all_queries()
    build_corpus(spark)
    if any(n in STOPKEYED for n in names):
        from tools.build_sf1 import build_stopfix

        stopfix_dir = build_stopfix()

    # Warm-up (JVM + Arrow worker pool), not measured.
    qs["text_tokens"](spark, SRC_DIR).collect()

    results: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        row = {}
        x10_dir = stopfix_dir if name in STOPKEYED else OUT_DIR
        if name in STOPKEYED:
            row["corpus"] = "stopfix"
        for tag, d in (("sf0.1", SRC_DIR), ("x10", x10_dir)):
            t0 = time.perf_counter()
            n = len(fn(spark, d).collect())
            row[tag] = round(time.perf_counter() - t0, 3)
            row[f"{tag}_rows"] = n
        row["ratio"] = round(row["x10"] / max(row["sf0.1"], 1e-9), 2)
        results[name] = row
        print(
            f"{name:32s} {row['sf0.1']:8.2f}s -> {row['x10']:8.2f}s "
            f"(x{row['ratio']:.2f}, rows {row['sf0.1_rows']} -> "
            f"{row['x10_rows']})",
            flush=True,
        )

    # Merge into the existing archive (a subset re-run must not clobber
    # the full table — only refresh the queries it actually measured).
    path = os.path.join(REPO, "bench_history", "scale_sf1.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    merged: dict[str, dict] = {}
    if os.path.exists(path):
        with open(path) as fh:
            merged = json.load(fh).get("queries", {})
    merged.update(results)
    out = {
        "n_copies": N_COPIES,
        "src": SRC_DIR,
        "loadavg_1min": round(os.getloadavg()[0], 2),
        "cpus": cpus,
        "queries": merged,
    }
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({"wrote": os.path.relpath(path, REPO)}))
    spark.sparkContext.setLogLevel("FATAL")
    spark.stop()


if __name__ == "__main__":
    main()
