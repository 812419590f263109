"""Relational query corpus Q1-Q18 (SURVEY.md §2A declared query set).

Each function takes (spark, sf_dir) and returns a DataFrame, expressed with
the DataFrame API so Catalyst plans it (pushdown, broadcast, hash agg).
These exercise the FlinkSQL surface the reference emits/validates
(internal/templates/files/sql/*.sql, docs-site/ai-generation.md:259-275,
docs-site/advanced/performance.md:163-198) re-expressed Spark-first.

Determinism discipline (for the DuckDB oracle value-hash):
- money/quantity aggregates: cast to DECIMAL(18,2) before SUM so the result
  is exact regardless of partitioning / summation order;
- final numeric outputs cast to DOUBLE after ROUND so both engines emit the
  identical IEEE value;
- every LIMIT is preceded by a total ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipegen_spark.catalog import table

DEC = "decimal(18,2)"


def _dec(c: str):
    return F.col(c).cast(DEC)


# --- Q1: scan + projection (A3/A1 + A4) ------------------------------------
def q01_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned scan: only 2 of 11 lineitem columns reach the reader."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_partkey")
        .orderBy("l_orderkey", "l_partkey")
        .limit(100)
    )


# --- Q2: filter + expression projection (A6 + A5) ---------------------------
def q02_filter_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pushes to the parquet scan; per-row double math is exact."""
    li = table(spark, sf_dir, "lineitem")
    # price/discount are 2-decimal quantities: do the arithmetic in DECIMAL
    # so rounding is exact HALF_UP in every engine (doubles land on .xx5
    # boundaries and round differently per engine).
    return (
        li.filter(F.col("l_quantity") > 30)
        .select(
            "l_orderkey",
            F.round(_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount")), 2)
            .cast("double")
            .alias("rev"),
        )
        .orderBy("l_orderkey", "rev")
        .limit(1000)
    )


# --- Q3: hash aggregate + HAVING (A9 + A10) ---------------------------------
def q03_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary; partial (map-side) agg then final."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("c"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")) / F.count("*"), 2)
            .cast("double")
            .alias("avg_price"),
        )
        .filter(F.col("c") > 10)
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- Q4: broadcast dimension join (A11) -------------------------------------
def q04_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ nation: 25-row dim side explicitly broadcast — no shuffle
    of the fact table (reference hint BROADCAST(dim), performance.md:176)."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("cnt"))
        .orderBy("n_name")
    )


# --- Q5: multi-way join ------------------------------------------------------
def q05_multi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier ⋈ nation ⋈ region, both dims broadcast: single stage."""
    sup = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("cnt"))
        .orderBy("r_name", "n_name")
    )


# --- Q6: semi / anti join ----------------------------------------------------
def q06_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(100)
    )


def q06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(100)
    )


# --- Q7: CASE + conditional aggregate (A12 + A9) ----------------------------
def q07_case_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.when(F.col("o_totalprice") > 100000, 1)).alias("big"),
            F.count("*").alias("cnt"),
        )
        .orderBy("o_orderpriority")
    )


# --- Q8: window function (row_number first-per-group) -----------------------
def q08_window_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey")
        .orderBy("o_custkey")
        .limit(100)
    )


# --- Q9: ranking / top-k -----------------------------------------------------
def q09_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 parts by revenue. The rank runs over the *aggregated* (small)
    result, not the fact table, so the global sort is cheap at any scale."""
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_partkey").agg(
        F.sum(_dec("l_extendedprice")).alias("rev_dec")
    )
    w = Window.orderBy(F.col("rev_dec").desc(), F.col("l_partkey"))
    return (
        agg.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 10)
        .select(
            "l_partkey",
            F.col("rev_dec").cast("double").alias("rev"),
            "rk",
        )
        .orderBy("rk", "l_partkey")
    )


# --- Q10: set operations -----------------------------------------------------
def q10_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        orders.select(F.col("o_custkey").alias("key"))
        .intersect(cust.select(F.col("c_custkey").alias("key")))
        .orderBy("key")
        .limit(100)
    )


def q10_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.select(F.col("c_custkey").alias("key"))
        .subtract(orders.select(F.col("o_custkey").alias("key")))
        .orderBy("key")
        .limit(100)
    )


def q10_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL keeps duplicates; aggregate after to keep output small."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    u = cust.select(F.col("c_custkey").alias("key")).unionAll(
        orders.select(F.col("o_custkey").alias("key"))
    )
    return (
        u.groupBy("key")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "key")
        .limit(100)
    )


# --- Q11: string functions ---------------------------------------------------
def q11_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = table(spark, sf_dir, "nation")
    return nation.select(
        F.upper("n_name").alias("uname"),
        F.substring("n_name", 1, 3).alias("pre"),
        F.length("n_name").alias("ln"),
    ).orderBy("uname")


# --- Q12: date bucketing (batch analogue of tumbling window, A7/A8) ---------
def q12_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.trunc("o_orderdate", "month").alias("m"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        )
        .orderBy("m")
    )


# --- Q13: event-time tumbling window on the stream table (batch parity) -----
def q13_event_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch equivalent of `GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)` —
    the streaming form is window(ts, '1 hour') in streaming/windows.py."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy("w", "event_type")
    )


# --- Q14: dedup via DISTINCT (A14) ------------------------------------------
def q14_distinct_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct().agg(
        F.count("*").alias("cnt")
    )


# --- Q15: rollup -------------------------------------------------------------
def q15_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "cnt",
        )
        .orderBy("rf", "ls")
    )


# --- Q16: distinct aggregate -------------------------------------------------
def q16_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.agg(F.countDistinct("o_custkey").alias("cnt"))


# --- Q17: scalar-aggregate subquery -----------------------------------------
def q17_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above the average price. The 1-row aggregate is broadcast so
    the comparison is a map-side filter, no shuffle of orders."""
    orders = table(spark, sf_dir, "orders")
    # price > total/cnt is evaluated as price*cnt > total: pure decimal/int
    # math, exact in every engine — no division-rounding boundary effects.
    avg_df = orders.agg(
        F.sum(_dec("o_totalprice")).alias("total_dec"),
        F.count("*").alias("n_orders"),
    )
    return (
        orders.join(F.broadcast(avg_df))
        .filter(_dec("o_totalprice") * F.col("n_orders") > F.col("total_dec"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(100)
    )


# --- Q18: left outer join + null handling ------------------------------------
def q18_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.count("*").alias("order_cnt"))
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce("order_cnt", F.lit(0)).alias("order_cnt"),
        )
        .orderBy("c_custkey")
        .limit(100)
    )


# --- Q19: JSON-ish property extraction from the event stream -----------------
def q19_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-property access (reference A12 `properties.price`,
    ai-generation.md:267) — here via regexp over the serialized props."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            F.regexp_extract("props", r'"k":\s*(\d+)', 1)
            .cast("int")
            .alias("k")
        )
        .groupBy("k")
        .agg(F.count("*").alias("cnt"))
        .orderBy("k")
    )
