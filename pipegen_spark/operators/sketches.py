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


# --- HyperLogLog (r13) --------------------------------------------------------
#
# The third classic sketch beside CMS (frequency) and KMV (overlap):
# bounded-state distinct counting (Flajolet et al. 2007). Spark ships
# HLL++ as approx_count_distinct (q23), but engine estimators are
# value-incomparable across engines — q23's oracle can only assert a
# tolerance. This implementation is DETERMINISTIC-BY-CONSTRUCTION:
# registers come from the shared 60-bit md5 hash, and the estimator is
# pure integer arithmetic whose two float-derived constants (alpha_m*m^2
# and the linear-counting table) are Python-computed ONCE at import and
# embedded as identical literals in both dialects — so the estimate
# itself sits under the hard value gate.
#
# Scale: the register frame is a map-side-combinable MAX aggregate
# bounded by |groups| * m rows regardless of input size (the sketch
# property); the estimator runs on |groups| rows.

import math

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
_HLL_W_BITS = 60 - HLL_P  # low bits that feed the rank
#: alpha_m = 0.7213 / (1 + 1.079/m) (the published constant) in ppm —
#: applied with dl.mul_ppm so no intermediate product can overflow.
HLL_ALPHA_PPM = round(0.7213 / (1.0 + 1.079 / HLL_M) * 1_000_000)
#: Linear-counting estimates round(m * ln(m/V)) for V = 1..m — V has
#: only m possible values, so the ln lives in a shared literal table
#: instead of cross-engine float math.
HLL_LINEAR = tuple(
    round(HLL_M * math.log(HLL_M / v)) for v in range(1, HLL_M + 1)
)
#: Raw-estimate threshold below which linear counting applies (5m/2).
HLL_SMALL = 5 * HLL_M // 2


def hll_rho_case(w_col: str) -> str:
    """rho = leading-zero count of the 52-bit suffix + 1 (position of
    the first 1-bit), i.e. 52 - floor(log2 w); all-zero suffix -> 53.
    Dialect-portable (plain CASE + integer compares, the balanced tree
    from operators/text.py)."""
    from pipegen_spark.operators.text import log2_exp_case

    return (
        f"CASE WHEN {w_col} = 0 THEN {_HLL_W_BITS + 1} "
        f"ELSE {_HLL_W_BITS} - ({log2_exp_case(w_col, _HLL_W_BITS)}) END"
    )


def hll_linear_case(v_col: str) -> str:
    """The linear-counting lookup as a CASE ladder over V (empty
    registers). Evaluated on a |groups|-row frame only."""
    whens = " ".join(
        f"WHEN {v} THEN {est}"
        for v, est in enumerate(HLL_LINEAR, start=1)
    )
    return f"CASE {v_col} {whens} ELSE 0 END"


def _pow2(n_expr: str, d: str) -> str:
    """2^n for a small non-negative integer expression (variable shift)."""
    if d == dl.SPARK:
        return f"shiftleft(CAST(1 AS BIGINT), CAST({n_expr} AS INT))"
    return f"(CAST(1 AS BIGINT) << ({n_expr}))"


def hll_e0_expr(s53_col: str, d: str) -> str:
    """e0 ~= m^2 * 2^53 / S53 = 2^69 / S53 WITHOUT a >63-bit
    intermediate: S53 in [m, m*2^53] = [2^8, 2^61], so split on 2^22 —
    small S53 divides into 2^47 then shifts up exactly; large S53 drops
    its low 22 bits first. Relative error <= max(2^-25, 1/quotient)
    with quotient >= 2^8, i.e. <= ~0.4% — beneath the sketch's own
    1.04/sqrt(m) = 6.5% standard error — and fully deterministic (same
    floors both engines)."""
    small = dl.shl(f"({dl.idiv(str(1 << 47), s53_col, d)})", 22, d)
    big = dl.idiv(str(1 << 47), f"({dl.shr(s53_col, '22', d)})", d)
    return (
        f"CASE WHEN {s53_col} < {1 << 22} THEN {small} ELSE {big} END"
    )


def hll_distinct(
    values: DataFrame, value_col: str = "s", group_col: str = "source"
) -> DataFrame:
    """Per-group HLL distinct estimate + the exact count it chases.

    -> (group_col, n_exact, v_empty, hll_estimate, correction,
    err_ppm): v_empty = registers never hit, correction names which
    estimator branch fired ('linear' below 5m/2 with empty registers,
    else 'raw'), err_ppm = |estimate - exact| relative error. The
    large-range (2^60-scale) correction is out of domain for a 60-bit
    hash space and intentionally omitted."""
    h = F.expr(dl.hash60(value_col, dl.SPARK)).alias("h")
    hv = values.select(F.col(group_col).alias("g"), h)
    exact = hv.groupBy("g").agg(
        F.countDistinct("h").cast("long").alias("n_exact")
    )
    reg = (
        hv.withColumn(
            "j", F.expr(dl.shr("h", str(_HLL_W_BITS), dl.SPARK))
        )
        .withColumn("w", F.expr(f"h % {1 << _HLL_W_BITS}"))
        .withColumn("rho", F.expr(hll_rho_case("w")).cast("long"))
        .groupBy("g", "j")
        .agg(F.max("rho").alias("r"))
    )
    per = reg.groupBy("g").agg(
        F.count("*").cast("long").alias("_nb"),
        F.sum(F.expr(_pow2(f"{_HLL_W_BITS + 1} - r", dl.SPARK)))
        .cast("long")
        .alias("_s53p"),
    )
    est = (
        per.withColumn("v_empty", F.lit(HLL_M) - F.col("_nb"))
        .withColumn(
            "_s53",
            F.col("_s53p")
            + F.col("v_empty") * F.lit(1 << (_HLL_W_BITS + 1)),
        )
        .withColumn(
            "_e0", F.expr(hll_e0_expr("_s53", dl.SPARK)).cast("long")
        )
        .withColumn(
            "_eraw",
            F.expr(
                dl.mul_ppm("_e0", HLL_ALPHA_PPM, dl.SPARK)
            ).cast("long"),
        )
        .withColumn(
            "hll_estimate",
            F.expr(
                f"CASE WHEN _eraw <= {HLL_SMALL} AND v_empty > 0 "
                f"THEN {hll_linear_case('v_empty')} ELSE _eraw END"
            ).cast("long"),
        )
        .withColumn(
            "correction",
            F.expr(
                f"CASE WHEN _eraw <= {HLL_SMALL} AND v_empty > 0 "
                "THEN 'linear' ELSE 'raw' END"
            ),
        )
    )
    return (
        est.join(exact, "g")
        .select(
            F.col("g").alias(group_col),
            "n_exact",
            "v_empty",
            "hll_estimate",
            "correction",
            F.expr(
                dl.idiv(
                    "abs(hll_estimate - n_exact) * 1000000",
                    "greatest(n_exact, 1)",
                    dl.SPARK,
                )
            ).cast("long").alias("err_ppm"),
        )
    )
