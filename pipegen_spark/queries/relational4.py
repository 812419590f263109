"""Fourth query tranche: streaming stateful dedup parity (the last §2C
checklist capability without an oracle row) and TPC-H-shaped multi-join
analytics (pricing summary, shipping priority, regional volume, returned
items) — realistic join/agg workloads over the full schema.

Money math discipline (see functions/dialect.cents): every double that is
summed across partitions is half-up-quantized to an integer CENT COUNT per
ROW first, so the sum is order-independent, engine-exact, and — as of
round 5 — leaves the engine as BIGINT (a DECIMAL(18,2) surface is
byte-exact across engines yet still hash-red under the driver's pandas
canonicalizer whenever a value has trailing-zero cents: Spark yields
Decimal('304.00'), DuckDB float64 304.0). Averages divide the exact
integer sums in DOUBLE. 100 TB shapes: dimension sides (region/nation/supplier/filtered
customer segment) broadcast; fact-fact joins (lineitem ⋈ orders) shuffle
on the join key with AQE handling skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipegen_spark.catalog import table
from pipegen_spark.functions import dialect as dl

# Filter constants shared with oracle4.py (synthetic data spans
# 1995-01-01 .. 2001-11-04; see TESTDATA.md).
Q43_CUTOFF = "2001-08-06"  # max(l_shipdate) - 90 days, TPC-H Q1 style
Q44_SEGMENT = "BUILDING"
Q44_DATE = "1998-06-01"
Q45_REGION = "ASIA"
Q45_LO, Q45_HI = "1996-01-01", "1998-01-01"
Q46_LO, Q46_HI = "1997-01-01", "1997-07-01"


def _cents(expr: str):
    return F.expr(dl.cents(expr, dl.SPARK))


# --- Q42: STREAMING stateful dedup (dropDuplicatesWithinWatermark) -----------
def q42_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming stateful dedup — the reference flags duplicates via an
    `is_duplicate` column in LLM-generated SQL only
    (internal/llm/service.go:1064); Spark makes it a first-class stateful
    operator. File-stream events → watermark → dropDuplicatesWithinWatermark
    on (user_id, event_type) → append sink. Only the key columns are
    emitted, so the finite-input result is exactly the distinct key set the
    batch oracle computes (which physical row survives per key is
    arbitrary; its key is not).

    Scale: state is one entry per live key within the watermark horizon,
    hash-partitioned on the dedup key — O(keys) memory across executors,
    no shuffle beyond the state partitioning.
    """
    from pipegen_spark.streaming.filesource import (
        events_file_stream,
        run_to_file_sink,
        state_partitions,
    )

    stream = events_file_stream(spark, sf_dir)
    deduped = (
        stream.select("user_id", "event_type", "ts")
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    with state_partitions(spark, n=4):
        out = run_to_file_sink(spark, deduped, "pipegen_q42_")
    return out.orderBy("user_id", "event_type")


# --- Q43: pricing summary report (TPC-H Q1 shape) ----------------------------
def q43_tpch_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan aggregate over lineitem: per (returnflag, linestatus)
    sums of qty/price/discounted price/charge plus averages.
    Map-side partial aggregation collapses 60k rows/sf0.01 into 6 groups
    before the single shuffle; the shipdate filter pushes to the scan.

    Output surface is ALL-INTEGER (the gate-hardening from rounds 2-3,
    whose DECIMAL/DOUBLE surfaces stayed driver-hash-red while byte-exact
    locally): `sum_*` are BIGINT cent counts (dialect.cents — per-row
    half-up quantization in pure double arithmetic, summed as int64) and
    `avg_*` are BIGINT millionths of a unit (dialect.micro_avg — one
    deterministic IEEE divide on identical integer inputs, then floored).
    """
    li = table(spark, sf_dir, "lineitem").filter(
        F.expr(f"l_shipdate <= TIMESTAMP '{Q43_CUTOFF}'")
    )
    rows = li.select(
        "l_returnflag",
        "l_linestatus",
        _cents("l_quantity").alias("qty_c"),
        _cents("l_extendedprice").alias("price_c"),
        _cents("l_extendedprice * (1.0 - l_discount)").alias("disc_c"),
        _cents(
            "l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)"
        ).alias("charge_c"),
        _cents("l_discount").alias("discv_c"),
    )
    g = rows.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty_c").cast("bigint").alias("sum_qty"),
        F.sum("price_c").cast("bigint").alias("sum_base_price"),
        F.sum("disc_c").cast("bigint").alias("sum_disc_price"),
        F.sum("charge_c").cast("bigint").alias("sum_charge"),
        F.sum("discv_c").cast("bigint").alias("_sum_discv"),
        F.count("*").cast("bigint").alias("count_order"),
    )
    micro = lambda s: F.expr(dl.micro_avg(s, "count_order", dl.SPARK))  # noqa: E731
    return (
        g.select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            micro("sum_qty").alias("avg_qty"),
            micro("sum_base_price").alias("avg_price"),
            micro("_sum_discv").alias("avg_disc"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- Q44: shipping priority (TPC-H Q3 shape) ---------------------------------
def q44_tpch_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 undelivered orders by revenue for one market segment.
    The filtered customer segment (~1/5 of a dimension table) broadcasts;
    lineitem ⋈ orders shuffles on orderkey."""
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == Q44_SEGMENT)
        .select("c_custkey")
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.expr(f"o_orderdate < TIMESTAMP '{Q44_DATE}'")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.expr(f"l_shipdate > TIMESTAMP '{Q44_DATE}'")
    )
    rev = _cents("l_extendedprice * (1.0 - l_discount)").alias("rev_c")
    return (
        li.select("l_orderkey", rev)
        .join(
            orders.select(
                "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev_c").cast("bigint").alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --- Q45: regional supplier volume (TPC-H Q5 shape) --------------------------
def q45_tpch_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation where customer and supplier share the nation,
    within one region and a date range. Six-way join: the three true
    dimensions (supplier/nation/region) broadcast; the lineitem ⋈ orders ⋈
    customer chain shuffles on its keys."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(
        F.expr(
            f"o_orderdate >= TIMESTAMP '{Q45_LO}' "
            f"AND o_orderdate < TIMESTAMP '{Q45_HI}'"
        )
    )
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q45_REGION
    )
    rev = _cents("l_extendedprice * (1.0 - l_discount)").alias("rev_c")
    return (
        li.select("l_orderkey", "l_suppkey", rev)
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(F.sum("rev_c").cast("bigint").alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), "n_name")
    )


# --- Q47: PIVOT --------------------------------------------------------------
def q47_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-count matrix: priority rows × status columns via the native
    `.pivot()` with an explicit value list (pinned values keep the output
    schema static and the plan a SINGLE hash aggregate — no per-value scan,
    no second shuffle; unpinned pivot adds a distinct-values job)."""
    orders = table(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return out.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).alias(f"n_{c}") for c in "FOP"],
    ).orderBy("o_orderpriority")


# --- Q48: GROUPING SETS ------------------------------------------------------
def q48_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary grouping sets (beyond q15 ROLLUP / q20 CUBE): per-priority,
    per-status, and grand-total aggregates in ONE pass — Spark's Expand
    replicates each input row per set before a single partial-agg shuffle.
    GROUPING() flags distinguish the all-rows NULL from a data NULL.
    Money leaves as BIGINT cents (the round-4 DECIMAL trailing-zero
    driver-hash red; dialect.cents docstring has the mechanism)."""
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("q48_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st
        FROM q48_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY g_pri, g_st, o_orderpriority, o_orderstatus
        """
    )


# --- Q49: time-RANGE window frame --------------------------------------------
def q49_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour activity per event via a RANGE window frame over
    event time — the single-table formulation of q38's range aggregate:
    ONE sort-shuffle on user_id instead of an equi-join + range filter,
    which is the shape to prefer at scale when left and right are the
    same stream. Frame bounds are in epoch seconds (RANGE needs a numeric
    ordering key that both engines frame identically)."""
    ev = table(spark, sf_dir, "events")
    ev.select(
        "event_id",
        "user_id",
        F.expr("unix_micros(ts)").alias("ts_us"),
    ).createOrReplaceTempView("q49_events")
    return spark.sql(
        """
        SELECT event_id, user_id, ts_us,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing_1h,
               CAST(ROW_NUMBER() OVER
                    (PARTITION BY user_id ORDER BY ts_us, event_id)
                    AS BIGINT) AS seq
        FROM q49_events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
        """
    )


# --- Q50: approximate percentile (bounded-error oracle) ----------------------
def q50_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch (Greenwald-Khanna at accuracy 1000 — rank error
    ≤ 0.1%): like q23's HLL row, sketch values are engine-specific, so the
    hash-comparable contract is the exact interpolated median plus a
    boolean asserting the estimate landed within ±2% of it. The sketch is
    the 100 TB path — q32's exact `percentile` needs a per-group sort."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("ap"),
    )
    return agg.select(
        "l_returnflag",
        "exact_p50",
        (
            F.abs(F.col("ap") - F.col("exact_p50"))
            <= 0.02 * F.col("exact_p50")
        ).alias("within_tol"),
    ).orderBy("l_returnflag")


# --- Q46: returned items (TPC-H Q10 shape) -----------------------------------
def q46_tpch_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns in one quarter-pair.
    Nation broadcasts; customer ⋈ orders ⋈ lineitem shuffles."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.expr(
            f"o_orderdate >= TIMESTAMP '{Q46_LO}' "
            f"AND o_orderdate < TIMESTAMP '{Q46_HI}'"
        )
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    rev = _cents("l_extendedprice * (1.0 - l_discount)").alias("rev_c")
    return (
        li.select("l_orderkey", rev)
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            cust.select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum("rev_c").cast("bigint").alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), "c_custkey")
        .limit(20)
    )
