"""Fifth query tranche: the remaining classic TPC-H decision-support
shapes adapted to this schema (the testdata lacks partsupp /
l_shipmode / l_commitdate / c_phone, so Q4/Q16/Q22 predicates are
re-targeted to columns that exist — the *plan shapes* are the point):

- q51: Q6  — single-table filter-everything aggregate (pushdown showcase)
- q52: Q4  — EXISTS rewritten to a left-semi join against a filtered fact
- q53: Q14 — conditional-aggregate ratio over a broadcast dimension join
- q54: Q18 — grouped-HAVING IN subquery feeding a 3-way join (big orders)
- q55: Q19 — disjunctive OR-of-ANDs predicate spanning both join sides
- q56: Q16 — COUNT(DISTINCT) with a NOT IN exclusion subquery
- q57: Q22 — scalar-aggregate threshold + anti join, grouped by nation

Money math discipline as in relational4.py (dialect.cents: per-row
half-up quantization to a BIGINT cent count before any cross-partition
sum — integer sums are order-independent, and an integer surface cannot
hash-diverge under the driver's pandas canonicalizer the way
DECIMAL(18,2) did in round 4; ratios/averages divide the exact integer
sums as doubles — one IEEE op on identical inputs is engine-exact).

100 TB shapes: every dimension side (part, supplier, nation, the HAVING
key list, the scalar threshold) broadcasts; the only shuffles are
lineitem⋈orders on orderkey and the final small-group hash aggregates.
Reference parity: the reference executes arbitrary user FlinkSQL
(internal/pipeline/sql.go:27-76), so the de-facto query surface is the
engine's — these queries pin the decision-support corner of it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipegen_spark.catalog import table
from pipegen_spark.functions import dialect as dl

# Filter constants shared with oracle5.py (data spans 1995..2001).
Q51_LO, Q51_HI = "1996-01-01", "1997-01-01"
Q52_LO, Q52_HI = "1996-01-01", "1996-04-01"
Q53_LO, Q53_HI = "1997-01-01", "1997-03-01"
Q54_QTY = 300
Q56_SIZES = (1, 4, 9, 16, 25, 36, 49)


def _cents(expr: str):
    return F.expr(dl.cents(expr, dl.SPARK))


# --- Q51: forecast revenue change (TPC-H Q6 shape) ---------------------------
def q51_tpch_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three predicates (date range, discount band, quantity cap) push
    to the parquet scan; the aggregate reduces map-side to one row per
    partition before a single-row exchange. At 100 TB this is the
    I/O-bound floor query: no join, no wide shuffle."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.expr(
            f"l_shipdate >= TIMESTAMP '{Q51_LO}' "
            f"AND l_shipdate < TIMESTAMP '{Q51_HI}' "
            "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
        )
    )
    return li.select(
        _cents("l_extendedprice * l_discount").alias("rev_c")
    ).agg(
        F.sum("rev_c").cast("bigint").alias("revenue_cents"),
        F.count("*").alias("n_items"),
    )


# --- Q52: priority check (TPC-H Q4 shape: EXISTS → semi join) ----------------
def q52_tpch_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 counts orders per priority where EXISTS a late lineitem;
    without l_commitdate the existence predicate is retargeted to
    returned items (l_returnflag = 'R'). Spark plans the EXISTS as a
    left-semi hash join on orderkey — no row duplication, and the
    returnflag filter prunes the build side at the scan."""
    orders = table(spark, sf_dir, "orders").filter(
        F.expr(
            f"o_orderdate >= TIMESTAMP '{Q52_LO}' "
            f"AND o_orderdate < TIMESTAMP '{Q52_HI}'"
        )
    )
    returned = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(
            returned,
            orders.o_orderkey == returned.l_orderkey,
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- Q53: promotion effect (TPC-H Q14 shape) ---------------------------------
def q53_tpch_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate ratio: promo revenue share over a month of
    shipments. part broadcasts (it is the small side); the ratio divides
    the two exact decimal sums as doubles, so it is engine-exact."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.expr(
            f"l_shipdate >= TIMESTAMP '{Q53_LO}' "
            f"AND l_shipdate < TIMESTAMP '{Q53_HI}'"
        )
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    rev = _cents("l_extendedprice * (1.0 - l_discount)")
    agg = joined.select(
        rev.alias("rev_c"),
        F.when(F.col("p_type") == "PROMO", rev)
        .otherwise(F.lit(0).cast("bigint"))
        .alias("promo_c"),
    ).agg(
        F.sum("promo_c").cast("bigint").alias("promo_revenue_cents"),
        F.sum("rev_c").cast("bigint").alias("total_revenue_cents"),
    )
    return agg.select(
        "promo_revenue_cents",
        "total_revenue_cents",
        (
            F.lit(100.0)
            * F.col("promo_revenue_cents").cast("double")
            / F.col("total_revenue_cents").cast("double")
        ).alias("promo_pct"),
    )


# --- Q54: large-volume customers (TPC-H Q18 shape) ---------------------------
def q54_tpch_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds a threshold, with customer
    detail. The HAVING subquery reduces lineitem to a small key list that
    broadcasts into the semi join; the surviving orders then join
    customer (broadcast) and re-join lineitem for the quantity sum.
    Quantities are integral doubles — their sum is exact in any order —
    and the output contract is BIGINT cent counts."""
    li = table(spark, sf_dir, "lineitem")
    big_keys = (
        li.select("l_orderkey", _cents("l_quantity").alias("qty_c"))
        .groupBy("l_orderkey")
        .agg(F.sum("qty_c").cast("bigint").alias("total_qty_cents"))
        .filter(F.col("total_qty_cents") > Q54_QTY * 100)
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(
            F.broadcast(big_keys),
            orders.o_orderkey == big_keys.l_orderkey,
        )
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            _cents("o_totalprice").alias("totalprice_cents"),
            F.col("total_qty_cents"),
        )
        .orderBy(
            F.col("totalprice_cents").desc(), F.col("o_orderkey")
        )
        .limit(100)
    )


# --- Q55: discounted revenue (TPC-H Q19 shape: OR-of-ANDs) -------------------
def q55_tpch_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive predicate spanning both join sides: three
    (brand, size-range, quantity-range) arms OR'd together. Catalyst
    keeps the partkey equi-join as the join condition and evaluates the
    disjunction as a post-join filter; the common `p_size <= 15` /
    `l_quantity <= 30` envelopes are derivable per-side, and part still
    broadcasts, so no shuffle is added by the complex predicate."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    arm = (
        "(p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 "
        " AND l_quantity BETWEEN 1 AND 11)"
        " OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 "
        " AND l_quantity BETWEEN 10 AND 20)"
        " OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 "
        " AND l_quantity BETWEEN 20 AND 30)"
    )
    return (
        joined.filter(F.expr(arm))
        .select(
            _cents("l_extendedprice * (1.0 - l_discount)").alias("rev_c")
        )
        .agg(
            F.sum("rev_c").cast("bigint").alias("revenue_cents"),
            F.count("*").alias("n_items"),
        )
    )


# --- Q56: parts/supplier relationship (TPC-H Q16 shape) ----------------------
def q56_tpch_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT supplier) per part group, excluding suppliers from
    a NOT IN subquery (retargeted: negative account balance stands in
    for the complaints predicate; the subquery can be empty at small SF
    — NOT IN over an empty, null-free list keeps every row on both
    engines). The exclusion list broadcasts as a left-anti join; the
    distinct aggregate shuffles once on the (brand, type, size) group
    key with partial distinct applied map-side."""
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(*Q56_SIZES)
    )
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    excluded = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(excluded, li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
        .limit(100)
    )


# --- Q57: idle rich customers (TPC-H Q22 shape) ------------------------------
def q57_tpch_idle_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above the positive-balance average with no URGENT order
    (every synthetic customer has orders, so Q22's 'no orders at all'
    is retargeted to priority), grouped by nation. The threshold is a
    broadcast scalar (exact integer cent sum ÷ count, divided as doubles
    — the comparison happens in cent units on both engines);
    the urgent-order exclusion is a left-anti join whose build side is
    pre-filtered at the orders scan."""
    cust = table(spark, sf_dir, "customer")
    thresh = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(_cents("c_acctbal")).cast("double")
                / F.count("*").cast("double")
            ).alias("avg_bal_c")
        )
    )
    urgent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(_cents("c_acctbal") > F.col("avg_bal_c"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_cents("c_acctbal")).cast("bigint").alias(
                "totacctbal_cents"
            ),
        )
        .orderBy("n_name")
    )


# --- q58: z-order (Morton) layout audit --------------------------------------
def q58_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional clustering key: interleave the low 8 bits of the
    user bucket and the day-of-year bucket into a 16-bit Morton key, and
    report per-tile occupancy (tile = key >> 6).

    This is the write-side layout that makes parquet min/max statistics
    prune range predicates on EITHER dimension: rows sorted by zkey are
    simultaneously clustered by user and by time, where a single-column
    sort clusters only one. dialect.zorder16 is pure integer shifts, so
    the oracle reproduces the key bit-for-bit. Map-only until the one
    per-tile aggregation (<= 1024 groups)."""
    ev = table(spark, sf_dir, "events")
    x = "(user_id % 256)"
    y = "(CAST(dayofyear(ts) AS BIGINT) % 256)"
    z = dl.zorder16(x, y, dl.SPARK)
    return (
        ev.select(
            F.expr(z).alias("zkey"),
            F.col("user_id"),
        )
        .groupBy(F.expr("zkey DIV 64").alias("tile"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("zkey").alias("zmin"),
            F.max("zkey").alias("zmax"),
        )
        .orderBy("tile")
    )


# --- q59: table profiling ----------------------------------------------------
def q59_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile report over the widest fact table — the parquet-
    scale analogue of the reference's CSV analyzer (csv_analyzer.go):
    per profiled column, row count, null count, exact distinct count and
    a uniform string min/max surface (dates ISO-cast, money as integer
    cents so no engine formats a double; min/max are over the string
    surface, lexicographic by design).

    Shape: ONE scan, melted map-side to (column_name, value) rows, then
    an explicit two-level aggregation: collapse to distinct (column,
    value) pairs — the partial agg dedups map-side, so the one wide
    shuffle carries at most the distinct-pair count — and reduce those
    to one row per column. The wide multi-DISTINCT form Expands the
    input once per distinct column instead (measured 10.4 s -> 2.6 s
    warm at sf0.1 for 4 columns). At 100 TB swap the exact distinct for
    approx_count_distinct (the q23 sketch path)."""
    li = table(spark, sf_dir, "lineitem")
    cents = dl.cents("l_extendedprice", dl.SPARK)
    prof = li.select(
        F.col("l_orderkey").cast("string").alias("c_key"),
        F.col("l_returnflag").alias("c_flag"),
        F.col("l_shipdate").cast("date").cast("string").alias("c_ship"),
        F.expr(cents).cast("string").alias("c_price"),
    )
    melted = prof.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(c).alias("value"),
                    )
                    for c in ("c_key", "c_flag", "c_ship", "c_price")
                ]
            )
        ).alias("kv")
    ).select("kv.column_name", "kv.value")
    # Explicit two-level aggregation: the first groupBy collapses to
    # DISTINCT (column, value) pairs map-side (the shuffle carries at
    # most the distinct-pair count), the second reduces those to one row
    # per column — strictly one wide shuffle, vs countDistinct's rewrite
    # which re-shuffles the melted rows.
    pairs = melted.groupBy("column_name", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        pairs.groupBy("column_name")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.sum(
                F.when(F.col("value").isNull(), F.col("cnt")).otherwise(
                    F.lit(0)
                )
            ).alias("n_nulls"),
            F.count("value").alias("n_distinct"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            "column_name", "n_rows", "n_nulls", "n_distinct",
            "min_value", "max_value",
        )
        .orderBy("column_name")
    )


# --- q60: stream-static enrichment -------------------------------------------
def q60_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment + windowed aggregation — the
    bread-and-butter production streaming shape the family still lacked:
    the event stream joins the BROADCAST customer dimension statelessly
    (a stream-static join holds no join state at all), then a
    watermarked 1-hour tumbling aggregate per market segment runs in
    UPDATE mode through the idempotent file sink; the compaction read
    keeps the newest emission per (window, segment) key. On a finite
    input that equals the batch aggregate the oracle computes; value
    sums are per-event integer cents so the surface is hash-exact.

    Scale: the dimension broadcasts (no shuffle of the stream side);
    aggregate state is one row per open (window, segment), evicted by
    the watermark; update emissions are proportional to changed windows
    per batch; the sink write is distributed."""
    import tempfile

    from pipegen_spark.streaming.filesource import (
        events_file_stream,
        state_partitions,
    )
    from pipegen_spark.streaming.sink import (
        idempotent_dir_sink,
        read_committed,
    )
    from pyspark.sql.window import Window as W

    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stream = events_file_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    enriched = stream.join(F.broadcast(cust), "user_id")
    agg = (
        enriched.groupBy(
            F.window("ts", "1 hour").alias("win"), "c_mktsegment"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.expr(dl.cents("value", dl.SPARK))).alias("value_cents"),
        )
        .select(
            F.expr("unix_micros(win.start)").alias("win_us"),
            "c_mktsegment",
            "n_events",
            "value_cents",
        )
    )
    work = tempfile.mkdtemp(prefix="pipegen_q60_")
    sink_dir = os.path.join(work, "out")
    with state_partitions(spark, n=4):
        q = (
            agg.writeStream.foreachBatch(
                idempotent_dir_sink(sink_dir, stamp_batch=True)
            )
            .outputMode("update")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    rows = read_committed(spark, sink_dir)
    w = W.partitionBy("win_us", "c_mktsegment").orderBy(
        F.col("_batch_id").desc()
    )
    return (
        rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("win_us", "c_mktsegment", "n_events", "value_cents")
        .orderBy("win_us", "c_mktsegment")
    )


# --- q61: fixed-iteration PageRank -------------------------------------------
PR_ITERS = 3
PR_SUPP_BASE = 100_000  # namespace suppliers above the part-key range


def q61_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 unrolled iterations) on the bipartite part<->supplier
    supply graph from lineitem — the iterative-algorithm showcase beyond
    k-means and label propagation. Integer rank mass (graph.PR_SCALE
    units) with rational damping, so every iteration is engine-exact;
    the oracle unrolls the same three rounds as CTEs.

    Shape: one shuffle per iteration (the contribution aggregate on the
    destination key) plus a source-keyed equi-join; node count arrives
    as a broadcast 1-row aggregate. Symmetric edges guarantee out-degree
    >= 1, so no dangling-mass correction is needed."""
    from pipegen_spark.operators import graph as gr

    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    ).distinct()
    fwd = li.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + PR_SUPP_BASE).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = gr.pagerank_fixed(edges, iters=PR_ITERS)
    return ranks.select(
        F.col("id").alias("node_id"),
        F.when(F.col("id") >= PR_SUPP_BASE, F.lit("supplier"))
        .otherwise(F.lit("part"))
        .alias("node_type"),
        "rank_micro",
    ).orderBy("node_id")
