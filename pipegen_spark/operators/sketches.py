"""Streaming-style sketch operators — fixed-size summaries for
unbounded-cardinality aggregations.

First member: the count-min sketch (Cormode & Muthukrishnan 2005) for
heavy-hitter / frequent-token estimation. Spark already ships HLL
(approx_count_distinct, q23) and KLL-style quantiles
(approx_percentile, q50); CMS covers the remaining classic: frequency
estimation with bounded state.

Scale design (100 TB discipline):
- The sketch is a SUM-mergeable d x w integer grid: the groupBy that
  builds it partial-aggregates map-side, so every task ships at most
  d*w = 256 rows regardless of input size — that bounded-state property
  is the whole point of the sketch.
- The estimate join BROADCASTS the 256-row sketch; candidate tokens
  never meet each other (no pair space).
- Everything is integer arithmetic on the shared 60-bit md5 hash
  (functions/dialect.py), so the DuckDB oracle reproduces the sketch
  bit-for-bit — including the CMS overestimate guarantee
  (est >= true), which the gate output exposes as a column.

Reference parity: the reference (mcolomerc/pipegen) has no sketch
operators; this extends it per the north star (SURVEY.md §2B-B29 [EXT]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipegen_spark.functions import dialect as dl

# d=4 rows x w=64 buckets. Row-hash coefficients are fixed primes; with
# h < 2^31 the products stay below 2^56 — ANSI-safe in int64.
CMS_D = 4
CMS_W = 64
CMS_A = (1_299_721, 15_485_863, 32_452_843, 49_979_687)
CMS_B = (104_729, 224_737, 350_377, 479_909)


def cms_bucket(h: str, j: int, d: str) -> str:
    """Bucket of hash-value expression `h` in sketch row j."""
    return f"((({CMS_A[j]} * ({h}) + {CMS_B[j]}) % {dl.M31}) % {CMS_W})"


def _cells(token_col: str) -> F.Column:
    """Exploded (j, bucket) cell column for a token column — the ONE
    derivation of the d probe cells, shared by sketch build and estimate
    probe so the two sides can never disagree on the bucket scheme."""
    h = dl.hash_m31(token_col, dl.SPARK)
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    F.expr(cms_bucket(h, j, dl.SPARK)).alias("bucket"),
                )
                for j in range(CMS_D)
            ]
        )
    ).alias("cell")


def cms_sketch(tokens: DataFrame, token_col: str = "t") -> DataFrame:
    """Build the d x w count-min sketch over a token stream.

    Returns (j, bucket, cnt) — at most CMS_D * CMS_W rows. The groupBy
    partial-aggregates map-side, so the shuffle carries only sketch
    cells, never tokens.
    """
    return (
        tokens.select(_cells(token_col))
        .select("cell.j", "cell.bucket")
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    topk: int = 50,
) -> DataFrame:
    """Top-k frequent tokens with their CMS estimate next to the truth.

    One token-stream scan feeds BOTH the sketch (bounded shuffle) and the
    exact candidate counts (the verification surface); the estimate is
    min over the d rows of the token's bucket cell. Output
    (token, true_count, est_count, overcount) — `overcount >= 0` always,
    by the CMS guarantee; the oracle reproduces the identical sketch so
    the column is hash-exact.

    At 100 TB the exact-count branch is the one you would drop: the
    sketch + a per-partition local-top-k candidate pass gives the same
    heavy hitters with bounded state end-to-end.
    """
    toks = df.select(
        F.explode(F.expr(dl.words(text_col, dl.SPARK))).alias("t")
    )
    sketch = cms_sketch(toks, "t")
    cand = toks.groupBy("t").agg(F.count("*").alias("true_count"))
    probes = cand.select("t", "true_count", _cells("t")).select(
        "t", "true_count", "cell.j", "cell.bucket"
    )
    est = (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("t", "true_count")
        .agg(F.min("cnt").alias("est_count"))
    )
    return (
        est.select(
            F.col("t").alias("token"),
            "true_count",
            "est_count",
            (F.col("est_count") - F.col("true_count")).alias("overcount"),
        )
        .orderBy(F.col("est_count").desc(), "token")
        .limit(topk)
    )


# --- KMV (k-minimum-values) distinct sketch ----------------------------------

# Estimator space: hashes are uniform in [0, 2^60); with the k smallest
# kept, |S| ~= (k-1) * 2^60 / kth_min (Bar-Yossef et al. 2002). k=64
# gives ~12% relative error — and because the sketch content is a pure
# function of the hash, the ORACLE reproduces the sketch exactly; only
# the estimator formula is an approximation, and it is computed with the
# same integer division on both engines.
KMV_K = 64
KMV_SPACE = 1 << 60


def kmv_overlap(
    df: DataFrame,
    set_col: str,
    member_col: str,
    set_a: str,
    set_b: str,
    k: int = KMV_K,
) -> DataFrame:
    """Distinct-cardinality and overlap estimation for two slices of a
    keyed membership table via KMV sketches — the "how many distinct
    users did both X and Y" question answered from two fixed-k
    summaries instead of an exact distinct over either slice.

    Returns ONE row: per-slice kth-min hash + distinct estimate, the
    exact intersection count within the union's k-min domain, and the
    Jaccard estimate in ppm. Determinism: the k smallest 60-bit hashes
    are an order statistic — no RNG, no merge-order sensitivity — so
    the DuckDB oracle reproduces every surfaced value bit-for-bit.

    Shape (100 TB): member hashes dedup per slice with one hash
    aggregate (map-side partial); each slice then reduces to its k
    smallest hashes via a bounded sort (k rows out of each partition,
    TakeOrdered-style); the final combine touches 3k rows. State is
    O(k) regardless of member cardinality — the sketch property.
    """
    h = F.expr(
        dl.hash60(f"CAST({member_col} AS STRING)", dl.SPARK)
    ).alias("h")
    members = df.select(F.col(set_col).alias("s"), h).distinct()

    def kmin(name: str) -> DataFrame:
        return (
            members.filter(F.col("s") == name)
            .select("h")
            .orderBy("h")
            .limit(k)
        )
    ka, kb = kmin(set_a), kmin(set_b)
    # Union k-min domain: the k smallest of ka ∪ kb; intersection inside
    # that domain estimates Jaccard (Beyer et al., SIGMOD'07).
    union_kmin = ka.unionByName(kb).distinct().orderBy("h").limit(k)
    inter = union_kmin.join(ka, "h", "left_semi").join(
        kb, "h", "left_semi"
    )
    # Estimator evaluated divide-first so it never exceeds BIGINT:
    # (k-1) * (SPACE DIV max(kth, k)) <= (k-1)/k * SPACE. The max(.,k)
    # clamp also caps the estimate when the kth min is implausibly small.
    def _est(kth: str) -> str:
        inner = dl.idiv(
            f"CAST({KMV_SPACE} AS BIGINT)", f"greatest({kth}, {k})", dl.SPARK
        )
        return f"CAST(({k} - 1) AS BIGINT) * ({inner})"

    stats_a = ka.agg(
        F.max("h").alias("kth_a"), F.count("*").alias("na")
    )
    stats_b = kb.agg(
        F.max("h").alias("kth_b"), F.count("*").alias("nb")
    )
    istats = inter.agg(F.count("*").cast("long").alias("kmv_inter"))
    ustats = union_kmin.agg(F.count("*").cast("long").alias("kmv_union"))
    return (
        stats_a.crossJoin(stats_b)
        .crossJoin(istats)
        .crossJoin(ustats)
        .select(
            "kth_a",
            "kth_b",
            # Slices smaller than k are exact (their count), else the
            # order-statistic estimator.
            F.expr(
                f"CASE WHEN na < {k} THEN na ELSE {_est('kth_a')} END"
            ).cast("long").alias("est_distinct_a"),
            F.expr(
                f"CASE WHEN nb < {k} THEN nb ELSE {_est('kth_b')} END"
            ).cast("long").alias("est_distinct_b"),
            "kmv_inter",
            "kmv_union",
            F.expr(
                dl.idiv(
                    "1000000 * kmv_inter",
                    "greatest(kmv_union, 1)",
                    dl.SPARK,
                )
            ).alias("est_jaccard_ppm"),
        )
    )
