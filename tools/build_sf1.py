"""Derive a FULL-corpus sf1 directory (10x sf0.1) for bench.py.

Round-9 (VERDICT r8 task 8): `tools/scale_bench.py` measures the top
training operators at 10x; this builds ALL ten tables so the whole
200-query corpus can run at sf1 (`SPARK_GRAFT_SF_DIR=$(pwd)/.benchmarks/
sf1_full python bench.py`), measuring how the per-query driver floor
amortizes as data grows.

Derivation follows TPC-H scaling semantics:
- region / nation are FIXED dimensions (25 nations at every SF) —
  copied unchanged; per-copy fact rows keep their original nationkeys,
  so dimension joins and group-by-name cardinalities stay realistic.
- customer / supplier / part / orders / lineitem / events replicate
  10x with every PRIMARY and FOREIGN key offset by copy * 1e8, so each
  copy is a self-consistent join subgraph (an order joins its own
  copy's customer, a lineitem its own copy's order/part/supplier).
- events keep their timestamps (same period, 10x traffic — windows
  carry 10x rows, which is the scaling a busier deployment produces).
- documents / embeddings use scale_bench's derivation (per-copy letter
  rotation keeps duplication rates constant; embedding coordinate
  rotation keeps similarity structure without exact clones).

Copy 0 is bit-identical to sf0.1, so fixed-id corpus conventions
(query vectors vec_id<5, plane block 100.., centroid block 200..)
resolve to the same bounded sets at sf1 — query/codebook sizes stay
fixed while the corpus grows, exactly like production.

Usage: python tools/build_sf1.py   (idempotent; ~1 min)
"""

from __future__ import annotations

import os
import string
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_COPIES = 10
ID_OFFSET = 100_000_000
SRC_DIR = "/root/testdata/sf0.1"
OUT_DIR = os.path.join(REPO, ".benchmarks", "sf1_full")

#: table -> columns to offset per copy (PKs + FKs; everything else is
#: carried through unchanged).
OFFSET_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
FIXED_DIMS = ("region", "nation")


def build(spark) -> str:
    from pyspark.sql import functions as F

    done = os.path.join(OUT_DIR, "_BUILT")
    if os.path.exists(done):
        return OUT_DIR
    os.makedirs(OUT_DIR, exist_ok=True)

    for t in FIXED_DIMS:
        df = spark.read.parquet(os.path.join(SRC_DIR, f"{t}.parquet"))
        df.write.mode("overwrite").parquet(
            os.path.join(OUT_DIR, f"{t}.parquet")
        )

    for t, keys in OFFSET_KEYS.items():
        df = spark.read.parquet(os.path.join(SRC_DIR, f"{t}.parquet"))
        copies = []
        for k in range(N_COPIES):
            c = df
            for col in keys:
                c = c.withColumn(
                    col, (F.col(col) + F.lit(k * ID_OFFSET)).cast("long")
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(
            os.path.join(OUT_DIR, f"{t}.parquet")
        )

    # documents / embeddings: scale_bench's exact derivation.
    lower, upper = string.ascii_lowercase, string.ascii_uppercase

    def _rot(s: str, k: int) -> str:
        return s[k:] + s[:k]

    docs = spark.read.parquet(os.path.join(SRC_DIR, "documents.parquet"))
    copies = []
    for k in range(N_COPIES):
        alpha = lower + upper
        rotated = _rot(lower, k % 26) + _rot(upper, k % 26)
        copies.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * ID_OFFSET)).alias("doc_id"),
                F.translate("text", alpha, rotated).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(
        os.path.join(OUT_DIR, "documents.parquet")
    )

    emb = spark.read.parquet(os.path.join(SRC_DIR, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()[0])
    ecopies = []
    for k in range(N_COPIES):
        r = (k * 7) % dim
        rot = (
            F.col("embedding")
            if r == 0
            else F.expr(
                f"concat(slice(embedding, {r + 1}, {dim - r}),"
                f" slice(embedding, 1, {r}))"
            )
        )
        ecopies.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * ID_OFFSET)).alias("vec_id"),
                rot.alias("embedding"),
                "label",
            )
        )
    eout = ecopies[0]
    for c in ecopies[1:]:
        eout = eout.unionByName(c)
    eout.write.mode("overwrite").parquet(
        os.path.join(OUT_DIR, "embeddings.parquet")
    )

    with open(done, "w") as fh:
        fh.write("ok\n")
    return OUT_DIR


def build_scaled(spark, n_copies: int, out_dir: str) -> str:
    """Generalized N-copy derivation for the deeper scale rungs
    (round-11, r10 VERDICT task 5: a ~sf10 datapoint = 100 copies).

    Same key-offset scheme as build(), but the cross-copy decorrelation
    transforms generalize past the rotation scheme's 26-copy limit:

    - documents: per-copy SUBSTITUTION CIPHER (seeded deterministic
      permutation of the lowercase alphabet, mirrored on uppercase so
      case-folding pipelines still see one consistent mapping). A
      Caesar rotation has only 26 distinct values — at 100 copies,
      copies k and k+26 would be exact cross-copy near-dup groups and
      the measured corpus would be ~4x MORE duplicated than real,
      inflating LSH pair volume. A seeded permutation is distinct per
      copy (collision odds ~1e-25) and preserves exactly what the
      rotation preserved: token lengths, word boundaries, within-copy
      duplicate structure, per-source size distributions.
    - embeddings: coordinate rotation composed with a per-copy seeded
      SIGN-FLIP pattern. Rotation alone collides every `dim` copies
      (dim=64 < 100 copies -> copy 64 would clone copy 0's vectors);
      signs x permutation is still an orthogonal transform, so norms
      and within-copy geometry are untouched while cross-copy cosines
      decorrelate for any copy count.

    Copy 0 stays bit-identical to sf0.1 (fixed-id conventions resolve
    to the same bounded sets). Idempotent per out_dir."""
    import random

    from pyspark.sql import functions as F

    done = os.path.join(out_dir, "_BUILT")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    for t in FIXED_DIMS:
        df = spark.read.parquet(os.path.join(SRC_DIR, f"{t}.parquet"))
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )

    for t, keys in OFFSET_KEYS.items():
        df = spark.read.parquet(os.path.join(SRC_DIR, f"{t}.parquet"))
        copies = []
        for k in range(n_copies):
            c = df
            for col in keys:
                c = c.withColumn(
                    col, (F.col(col) + F.lit(k * ID_OFFSET)).cast("long")
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )

    lower, upper = string.ascii_lowercase, string.ascii_uppercase

    def _perm(k: int) -> str:
        if k == 0:
            return lower
        rng = random.Random(0xC0FFEE + k)
        p = list(lower)
        rng.shuffle(p)
        return "".join(p)

    docs = spark.read.parquet(os.path.join(SRC_DIR, "documents.parquet"))
    copies = []
    for k in range(n_copies):
        mapped = _perm(k)
        copies.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * ID_OFFSET)).alias("doc_id"),
                F.translate(
                    "text", lower + upper, mapped + mapped.upper()
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    emb = spark.read.parquet(os.path.join(SRC_DIR, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()[0])
    ecopies = []
    for k in range(n_copies):
        r = (k * 7) % dim
        rot_sql = (
            "embedding"
            if r == 0
            else f"concat(slice(embedding, {r + 1}, {dim - r}),"
            f" slice(embedding, 1, {r}))"
        )
        if k == 0:
            vec = F.col("embedding")
        else:
            rng = random.Random(0xFACADE + k)
            signs = ",".join(
                "1.0F" if rng.random() < 0.5 else "-1.0F"
                for _ in range(dim)
            )
            vec = F.expr(
                f"zip_with({rot_sql}, array({signs}), (x, s) -> x * s)"
            )
        ecopies.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * ID_OFFSET)).alias("vec_id"),
                vec.alias("embedding"),
                "label",
            )
        )
    eout = ecopies[0]
    for c in ecopies[1:]:
        eout = eout.unionByName(c)
    eout.write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )

    with open(done, "w") as fh:
        fh.write("ok\n")
    return out_dir


STOPFIX_DIR = os.path.join(REPO, ".benchmarks", "sf1_stopfix")


def build_stopfix(
    n_copies: int = N_COPIES, out_dir: str | None = None
) -> str:
    """Documents-only Nx derivation for STOPWORD-KEYED pipelines
    (r13; first consumer: curate_pipeline_e2e's scale datapoints).

    The default derivation's per-copy Caesar rotation rotates EVERY
    character, so a rotated copy's stopwords are no longer stopwords —
    a pipeline whose stages gate on stopword evidence (language-ID
    argmax, Gopher required-stops, stopword-ratio quality) drops the
    9 rotated copies at its first gate and the "10x" measurement
    pushes ~1x of data through everything downstream. Here the
    substitution applies PER TOKEN and skips tokens whose lowercase
    form is in the langid wordlists or the Gopher required-stops set:
    stopword-keyed gates behave identically on every copy, while
    content tokens map through a per-copy SEEDED SUBSTITUTION CIPHER
    (a Caesar rotation would alias past 26 copies — the same problem
    build_scaled documents), so shingles/feature hashes stay distinct
    across copies and the corpus-wide duplication RATE stays constant
    (cross-copy docs share only stopword-only shingles, far below the
    LSH thresholds). Within-copy duplicate structure is preserved
    exactly as in the default derivation.

    Pure pyarrow/pandas (a local build tool, not engine code); only
    `documents.parquet` is materialized — the consumers of this dir
    read nothing else.
    """
    import random
    import re

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = out_dir or (
        STOPFIX_DIR if n_copies == N_COPIES
        else f"{STOPFIX_DIR}_x{n_copies}"
    )
    done = os.path.join(out_dir, "_BUILT")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    from pipegen_spark.operators.curation import GOPHER_REQUIRED_WORDS
    from pipegen_spark.operators.text import LANG_WORDLISTS

    keep = set(GOPHER_REQUIRED_WORDS).union(*LANG_WORDLISTS.values())
    lower, upper = string.ascii_lowercase, string.ascii_uppercase
    word_re = re.compile(r"[A-Za-z]+")

    src = pd.read_parquet(os.path.join(SRC_DIR, "documents.parquet"))
    copies = []
    for k in range(n_copies):
        perm = list(lower)
        random.Random(9000 + k).shuffle(perm)
        cipher = "".join(perm)
        table = str.maketrans(
            lower + upper, cipher + cipher.upper()
        )

        def sub_tok(m: "re.Match[str]") -> str:
            t = m.group(0)
            return t if t.lower() in keep else t.translate(table)

        c = src.copy()
        c["doc_id"] = c["doc_id"] + k * ID_OFFSET
        if k:
            c["text"] = c["text"].map(
                lambda s: None if s is None else word_re.sub(sub_tok, s)
            )
        copies.append(c)
    out = pd.concat(copies, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out, preserve_index=False),
        os.path.join(out_dir, "documents.parquet"),
    )
    with open(done, "w") as fh:
        fh.write("ok\n")
    return out_dir


def main() -> None:
    from pipegen_spark.session import get_spark

    spark = get_spark("pipegen-build-sf1")
    path = build(spark)
    for t in [*FIXED_DIMS, *OFFSET_KEYS, "documents", "embeddings"]:
        n = spark.read.parquet(os.path.join(path, f"{t}.parquet")).count()
        print(f"{t}: {n} rows")
    print(f"built: {path}")


if __name__ == "__main__":
    main()
