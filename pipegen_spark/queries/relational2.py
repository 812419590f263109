"""Extended relational surface (SURVEY.md §2A "not present in the
reference" list): cube/grouping sets, scalar function families, outer/cross
joins, correlated EXISTS, pattern matching, approximate aggregates, and
batch sessionization. Same determinism discipline as relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipegen_spark.catalog import table

DEC = "decimal(18,2)"


# --- Q20: CUBE ---------------------------------------------------------------
def q20_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("st"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("pri"),
            "cnt",
        )
        .orderBy("st", "pri")
    )


# --- Q21: math function family ----------------------------------------------
def q21_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/ceil/floor/sqrt/mod — all IEEE-exact or integer ops, so raw
    doubles compare bit-identically (no libm-dependent fns like exp/ln)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.abs(F.col("l_quantity") - 25).alias("dev"),
            F.ceil("l_extendedprice").alias("ceil_p"),
            F.floor("l_extendedprice").alias("floor_p"),
            F.sqrt("l_quantity").alias("sqrt_q"),
            (F.col("l_orderkey") % 7).alias("mod7"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(200)
    )


# --- Q22: array functions over the embedding column --------------------------
def q22_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array length / element access / sequential-fold sum on array<float>."""
    from pipegen_spark.functions import dialect as dl

    emb = table(spark, sf_dir, "embeddings")
    fold_sum = dl.fold(
        dl.transform("embedding", "x -> CAST(x AS DOUBLE)", dl.SPARK),
        "CAST(0.0 AS DOUBLE)",
        "(acc,x) -> acc + x",
        dl.SPARK,
    )
    return (
        emb.select(
            "vec_id",
            F.expr("CAST(size(embedding) AS BIGINT)").alias("dim"),
            F.expr("CAST(element_at(embedding, 1) AS DOUBLE)").alias("first_v"),
            F.expr(fold_sum).alias("vec_sum"),
        )
        .orderBy("vec_id")
        .limit(200)
    )


# --- Q23: approximate distinct (bounded-error oracle) ------------------------
def q23_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate. ENGINE estimators are
    engine-specific by design, so the hash-comparable output is the exact
    count plus a boolean asserting the estimate landed within ±5% of it
    (rsd=0.02 makes ±5% a ~2.5-sigma bound); the oracle emits the exact
    count and literal TRUE. The from-scratch deterministic HLL
    (text_hll_distinct, r13) carries the hard value gate this engine
    sketch cannot."""
    orders = table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_cust"),
        F.countDistinct("o_custkey").alias("exact_cust"),
    )
    return agg.select(
        F.col("exact_cust").cast("long").alias("exact_cust"),
        (
            F.abs(F.col("approx_cust") - F.col("exact_cust"))
            <= 0.05 * F.col("exact_cust")
        ).alias("within_tol"),
    )


# --- Q24: conditional scalar family ------------------------------------------
def q24_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.expr("nullif(l_returnflag, 'N')").alias("rf_or_null"),
            F.expr("ifnull(nullif(l_linestatus, 'O'), 'open')").alias("st"),
            F.least("l_quantity", F.col("l_discount") * 100).alias("lo"),
            F.greatest("l_quantity", F.col("l_tax") * 100).alias("hi"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(200)
    )


# --- Q25: full outer join ----------------------------------------------------
def q25_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers vs a filtered order aggregate: full outer keeps both
    order-less customers and (synthetic) customer-less orders."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    big = (
        orders.filter(F.col("o_totalprice") > 300000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("big_orders"))
    )
    return (
        cust.select("c_custkey")
        .join(big, cust.c_custkey == big.o_custkey, "full_outer")
        .select(
            F.coalesce("c_custkey", F.col("o_custkey")).alias("key"),
            F.coalesce("big_orders", F.lit(0)).alias("big_orders"),
        )
        .orderBy("key")
        .limit(200)
    )


# --- Q26: cross join (small dims) --------------------------------------------
def q26_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    return (
        region.crossJoin(nation)
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


# --- Q27: correlated EXISTS (semi join with condition) -----------------------
def q27_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    heavy = li.filter(F.col("l_quantity") > 45)
    return (
        orders.join(
            heavy, orders.o_orderkey == heavy.l_orderkey, "left_semi"
        )
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(200)
    )


# --- Q28: UNION DISTINCT -----------------------------------------------------
def q28_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    return (
        cust.select(F.col("c_nationkey").alias("nk"))
        .union(supp.select(F.col("s_nationkey").alias("nk")))
        .distinct()
        .orderBy("nk")
    )


# --- Q29: LIKE / regex matching ----------------------------------------------
def q29_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return part.agg(
        F.count(F.when(F.col("p_name").like("%gold%"), 1)).alias("with_gold"),
        F.count(F.when(F.col("p_type").rlike("^[A-Z]+ [a-z]+"), 1)).alias(
            "typed"
        ),
        F.count(
            F.when(F.col("p_brand").substr(1, 5) == F.lit("Brand"), 1)
        ).alias("branded"),
        F.count("*").alias("total"),
    )


# --- Q30: CASE bucket histogram ----------------------------------------------
def q30_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
        )
        .orderBy("bucket")
    )


# --- Q31: batch sessionization (session_window vs gaps-and-islands) ----------
def q31_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 30-minute inactivity gap. Spark uses the
    built-in session_window; the oracle derives identical sessions with the
    classic gaps-and-islands construction (lag + cumulative sum) — same
    semantics, two very different engines."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
        .limit(500)
    )
