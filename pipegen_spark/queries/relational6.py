"""Sixth query tranche: the rest of the classic TPC-H decision-support
shapes adapted to this schema (no partsupp / l_shipmode / l_commitdate,
so Q9/Q12/Q21 predicates are re-targeted to columns that exist — as with
relational5.py, the *plan shapes* are the point):

- q62: Q7  — two-nation volume shipping (4-way join, both directions)
- q63: Q8  — market share ratio per year inside a region
- q64: Q9  — product profit proxy per (nation, year)
- q65: Q12 — priority mix per line status (conditional counts)
- q66: Q13 — customer order-count distribution (outer join with an
             extra join-condition predicate, then a count-of-counts)
- q67: Q17 — small-quantity revenue vs per-part mean (the correlated
             average turned into an integer cross-multiplied gate)
- q68: Q15 — top supplier(s): scalar max over an aggregate, join-back
- q69: Q11 — important parts: group value vs a scalar share threshold
- q70: Q21 — sole-problem supplier: semi + anti join on the same fact
- q71: event-sequencing funnel (nested conditional MINs, one window sort)
- q72: weekly retention cohorts (integer day/week indexes, no Expand)

Gate-hardened money discipline: every monetary aggregate leaves the
engine as BIGINT cents (dialect.cents) and every mean/ratio as integer
millionths (micro_avg / idiv) — the round-2/3 driver hash-reds traced to
DOUBLE/DECIMAL surfaces, so this tranche emits integers only.

100 TB shapes: nation/region/supplier/part dimensions broadcast; the
only wide shuffles are lineitem⋈orders on orderkey and the final group
aggregates. Scalar thresholds (q68 max, q69 total) come back as
broadcast 1-row aggregates, never driver collects.

Reference parity: the reference executes arbitrary user FlinkSQL
(internal/pipeline/sql.go:27-76), so the de-facto query surface is the
engine's — these pin the remaining decision-support corner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipegen_spark.catalog import table
from pipegen_spark.functions import dialect as dl

# Filter constants shared with oracle6.py (data spans 1995..2001).
Q62_NATION_A, Q62_NATION_B = "NATION_1", "NATION_2"
Q62_LO, Q62_HI = "1996-01-01", "1998-01-01"
Q63_REGION = "ASIA"
Q63_TYPE = "ECONOMY"
Q63_SHARE_NATION = "NATION_5"
Q63_LO, Q63_HI = "1996-01-01", "1998-01-01"
Q64_COST_PCT = 10  # retailprice cost proxy: 10% per unit
Q65_YEAR = 1997
Q66_EXCLUDED_PRI = "5-LOW"
Q67_BRAND = "Brand#12"
Q68_LO, Q68_HI = "1996-01-01", "1996-04-01"
Q69_NATION = "NATION_3"
Q69_FRACTION_PPM = 1000  # parts worth > 0.1% of total value
Q79_SIZE_MIN = 45
Q79_TYPE = "STANDARD"
Q79_REGION = "ASIA"
Q80_PREFIX = "small "
Q80_LO, Q80_HI = "1997-01-01", "1998-01-01"
Q80_SHARE_PPM = 400_000  # supplier shipped > 40% of the part's volume


def _cents(expr: str):
    return F.expr(dl.cents(expr, dl.SPARK))


REV = "l_extendedprice * (1.0 - l_discount)"


# --- Q62: volume shipping (TPC-H Q7) -----------------------------------------
def q62_tpch_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue shipped between two nations, both directions, per year.
    supplier+nation and customer+nation broadcast; the symmetric
    two-arm nation predicate filters after the joins (Catalyst pushes
    each arm's nation list into the dimension scans)."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.expr(
            f"l_shipdate >= TIMESTAMP '{Q62_LO}' "
            f"AND l_shipdate < TIMESTAMP '{Q62_HI}'"
        )
    )
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(
            (
                (F.col("supp_nation") == Q62_NATION_A)
                & (F.col("cust_nation") == Q62_NATION_B)
            )
            | (
                (F.col("supp_nation") == Q62_NATION_B)
                & (F.col("cust_nation") == Q62_NATION_A)
            )
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            _cents(REV).alias("rev_c"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev_c").cast("long").alias("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- Q63: market share (TPC-H Q8) --------------------------------------------
def q63_tpch_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year share of one supplier nation's revenue within a customer
    region's ECONOMY-part volume — the ratio is integer ppm over the two
    BIGINT cent sums, no float in any surface."""
    li = table(spark, sf_dir, "lineitem")
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == Q63_TYPE)
        .select("p_partkey")
    )
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").filter(F.col("r_name") == Q63_REGION)
    cust_in_region = (
        table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nat.join(
                    F.broadcast(reg),
                    nat.n_regionkey == reg.r_regionkey,
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.expr(
            f"o_orderdate >= TIMESTAMP '{Q63_LO}' "
            f"AND o_orderdate < TIMESTAMP '{Q63_HI}'"
        )
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(cust_in_region),
            orders.o_custkey == cust_in_region.c_custkey,
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
    )
    return (
        joined.select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _cents(REV).alias("rev_c"),
            F.when(F.col("supp_nation") == Q63_SHARE_NATION, _cents(REV))
            .otherwise(F.lit(0).cast("long"))
            .alias("nation_c"),
        )
        .groupBy("o_year")
        .agg(
            F.sum("nation_c").cast("long").alias("nation_cents"),
            F.sum("rev_c").cast("long").alias("total_cents"),
        )
        .select(
            "o_year",
            "nation_cents",
            "total_cents",
            F.expr(
                dl.idiv(
                    "1000000 * nation_cents",
                    "greatest(total_cents, 1)",
                    dl.SPARK,
                )
            ).alias("mkt_share_ppm"),
        )
        .orderBy("o_year")
    )


# --- Q64: product profit proxy (TPC-H Q9) ------------------------------------
def q64_tpch_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit per (supplier nation, year). Without ps_supplycost the cost
    side is proxied as Q64_COST_PCT% of p_retailprice per unit — the
    plan shape (fact ⋈ two broadcast dims ⋈ orders, then a small group
    agg) is the Q9 skeleton."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        f"{REV} - p_retailprice * l_quantity * {Q64_COST_PCT}.0 / 100.0"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "nation",
            F.year("o_orderdate").cast("long").alias("o_year"),
            _cents(amount).alias("amount_c"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount_c").cast("long").alias("profit_cents"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --- Q65: priority mix per line status (TPC-H Q12) ---------------------------
def q65_tpch_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional counts of high/low order priorities per line status
    over one shipping year — Q12 with l_linestatus standing in for the
    missing l_shipmode. One orderkey join + a 2-group aggregate."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate") == Q65_YEAR
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_linestatus")
    )


# --- Q66: customer order-count distribution (TPC-H Q13) ----------------------
def q66_tpch_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-of-counts: orders left-joined to every customer with the
    priority exclusion INSIDE the join condition (so excluded orders
    count as zero, not as missing customers), then the distribution of
    per-customer counts. Two aggregates, one outer join."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != Q66_EXCLUDED_PRI),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --- Q67: small-quantity revenue (TPC-H Q17) ---------------------------------
def q67_tpch_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lineitems whose quantity is below 20% of their
    part's mean quantity, for one brand. The correlated AVG becomes an
    integer cross-multiplication (5*qty*cnt < sum), so the gate decides
    on exact integers; the per-part stats broadcast back into the fact.
    avg_yearly surfaces as integer millionths (cents*10^4/7)."""
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == Q67_BRAND)
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem")
    branded = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    # Half-up quantization, NOT a bare cast: Spark CAST(double AS LONG)
    # truncates while DuckDB CAST AS BIGINT rounds half-even — identical
    # today only because synthetic quantities are integral. floor(x+0.5)
    # is IEEE-exact and renders the same on both engines (round-4 ADVICE).
    qty_l = F.expr("CAST(floor(l_quantity + 0.5) AS BIGINT)")
    stats = branded.groupBy(F.col("l_partkey").alias("sp_key")).agg(
        F.sum(qty_l).alias("qty_sum"),
        F.count("*").alias("qty_cnt"),
    )
    small = branded.join(
        F.broadcast(stats), branded.l_partkey == stats.sp_key
    ).filter(
        F.lit(5) * qty_l * F.col("qty_cnt")
        < F.col("qty_sum")
    )
    return small.agg(
        F.sum(_cents("l_extendedprice")).cast("long").alias("total_cents"),
        F.count("*").cast("long").alias("n_items"),
    ).select(
        F.expr(dl.idiv("total_cents * 10000", "7", dl.SPARK)).alias(
            "avg_yearly_micro"
        ),
        "n_items",
    )


# --- Q68: top supplier (TPC-H Q15) -------------------------------------------
def q68_tpch_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum quarterly revenue: aggregate, take
    the scalar MAX back as a broadcast 1-row frame, join on equality —
    ties all surface (integer cents cannot near-miss)."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.expr(
            f"l_shipdate >= TIMESTAMP '{Q68_LO}' "
            f"AND l_shipdate < TIMESTAMP '{Q68_HI}'"
        )
    )
    rev = (
        li.select("l_suppkey", _cents(REV).alias("rev_c"))
        .groupBy("l_suppkey")
        .agg(F.sum("rev_c").cast("long").alias("total_cents"))
    )
    mx = rev.agg(F.max("total_cents").alias("max_cents"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(
            F.broadcast(mx), rev.total_cents == mx.max_cents
        )
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_cents").alias("total_revenue_cents"),
        )
        .orderBy("s_suppkey")
    )


# --- Q69: important parts (TPC-H Q11) ----------------------------------------
def q69_tpch_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue from one nation's suppliers exceeds a ppm
    fraction of that nation's total — the scalar threshold comes back as
    a broadcast 1-row aggregate and the HAVING comparison is an integer
    cross-multiplication."""
    nat = table(spark, sf_dir, "nation").filter(F.col("n_name") == Q69_NATION)
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem")
    nation_li = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
    per_part = (
        nation_li.select("l_partkey", _cents(REV).alias("rev_c"))
        .groupBy("l_partkey")
        .agg(F.sum("rev_c").cast("long").alias("value_cents"))
    )
    total = per_part.agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.lit(1_000_000) * F.col("value_cents")
            > F.lit(Q69_FRACTION_PPM) * F.col("total_cents")
        )
        .select("l_partkey", "value_cents")
        .orderBy(F.col("value_cents").desc(), "l_partkey")
    )


# --- Q70: sole-problem supplier (TPC-H Q21) ----------------------------------
def q70_tpch_sole_problem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY supplier with returned items in a
    multi-supplier order — Q21's exists/not-exists pair re-targeted to
    l_returnflag (no l_receiptdate): a left-semi join against orders
    that have another supplier, and a left-anti join against orders
    where another supplier also returned. Both probe sides reduce to
    (orderkey, suppkey) pairs before shuffling."""
    li = table(spark, sf_dir, "lineitem")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    other = pairs.select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp")
    )
    other_ret = returned.select(
        F.col("l_orderkey").alias("r_key"), F.col("l_suppkey").alias("r_supp")
    )
    sole = (
        returned.join(
            other,
            (returned.l_orderkey == other.o_key)
            & (returned.l_suppkey != other.o_supp),
            "left_semi",
        )
        .join(
            other_ret,
            (returned.l_orderkey == other_ret.r_key)
            & (returned.l_suppkey != other_ret.r_supp),
            "left_anti",
        )
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.groupBy("l_suppkey")
        .agg(F.count("*").cast("long").alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# --- Q71: funnel analysis (event sequencing) ---------------------------------
FUNNEL_STAGES = ("view", "click", "purchase")
US_PER_DAY = 86_400_000_000


def q71_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-analytics funnel: per user, the first 'view', the first
    'click' AFTER that view, the first 'purchase' after that click;
    report users reaching each stage + conversion ppm vs stage 1.

    Plan shape: the three stage timestamps are nested conditional MINs
    over the SAME per-user window partitioning — one sort-shuffle on
    user_id, three Window nodes reusing the exchange (the sequencing
    constraint `ts > prev_stage` makes this a genuine event-ORDER
    funnel, not three independent mins). The stage rollup is a 3-row
    aggregate. All surfaces integer (micros, counts, ppm)."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("unix_micros(ts)").alias("us")
    )
    w = W.partitionBy("user_id")
    s1, s2, s3 = FUNNEL_STAGES
    t1 = F.min(F.when(F.col("event_type") == s1, F.col("us"))).over(w)
    staged = ev.select("user_id", "event_type", "us", t1.alias("t1"))
    t2 = F.min(
        F.when(
            (F.col("event_type") == s2) & (F.col("us") > F.col("t1")),
            F.col("us"),
        )
    ).over(w)
    staged = staged.select("*", t2.alias("t2"))
    t3 = F.min(
        F.when(
            (F.col("event_type") == s3) & (F.col("us") > F.col("t2")),
            F.col("us"),
        )
    ).over(w)
    per_user = (
        staged.select("user_id", "t1", "t2", t3.alias("t3"))
        .groupBy("user_id")
        .agg(
            F.max("t1").alias("t1"),
            F.max("t2").alias("t2"),
            F.max("t3").alias("t3"),
        )
    )
    stages = per_user.agg(
        F.count("t1").cast("long").alias("n1"),
        F.count("t2").cast("long").alias("n2"),
        F.count("t3").cast("long").alias("n3"),
    )
    # ONE explode over an array of stage structs — a per-stage union of
    # selects would re-plan (and re-scan) the whole upstream pipeline
    # once per output row.
    structs = [
        F.struct(
            F.lit(i + 1).cast("long").alias("stage"),
            F.lit(name).alias("event_type"),
            F.col(col).alias("users_reached"),
            F.expr(
                dl.idiv(f"1000000 * {col}", "greatest(n1, 1)", dl.SPARK)
            ).alias("conversion_ppm"),
        )
        for i, (col, name) in enumerate(
            zip(("n1", "n2", "n3"), FUNNEL_STAGES)
        )
    ]
    return (
        stages.select(F.explode(F.array(*structs)).alias("r"))
        .select("r.*")
        .orderBy("stage")
    )


# --- Q72: retention cohorts --------------------------------------------------
def q72_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week; for
    each (cohort_week, week_offset) the count of distinct active users.
    All time math is integer day/week indexes from epoch micros — no
    calendar functions to diverge on.

    Plan shape: per-user first-day aggregate (small frame) broadcasts
    back onto events; activity reduces to DISTINCT (cohort, offset,
    user) before the final count — two-level distinct, no Expand."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            dl.idiv("unix_micros(ts)", str(US_PER_DAY), dl.SPARK)
        ).alias("d"),
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    return (
        ev.join(F.broadcast(first), "user_id")
        .select(
            F.expr(dl.idiv("d0", "7", dl.SPARK)).alias("cohort_week"),
            F.expr(dl.idiv("d - d0", "7", dl.SPARK)).alias("week_offset"),
            "user_id",
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("long").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


# --- Q73: KMV distinct-overlap sketch ----------------------------------------
KMV_SET_A, KMV_SET_B = "click", "purchase"


def q73_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user overlap between two event types estimated from KMV
    (k-minimum-values) sketches — O(k) state per slice regardless of
    user cardinality; the sketch content is an order statistic of the
    shared 60-bit hash, so the oracle replays it bit-for-bit."""
    from pipegen_spark.operators import sketches as sk

    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    return sk.kmv_overlap(ev, "event_type", "user_id", KMV_SET_A, KMV_SET_B)


# --- Q74: 3-sigma anomaly days -----------------------------------------------
def q74_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-volume anomaly flags per event type: a day is
    anomalous when its count deviates from the type's mean by more than
    3 population standard deviations — decided ENTIRELY in integers by
    cross-multiplying the variance test with n^2:

        (n*x - S)^2 > 9 * (n*S2 - S^2)

    (x day count, S/S2 the type's count/square sums, n day count).
    No sqrt, no float, no ulp to diverge. BIGINT-safe while daily
    counts stay under ~3e9 (squares below 2^63) — beyond that, scale
    counts to thousands first.

    Shape (100 TB): one (type, day) hash aggregate (map-side partial);
    per-type moment frame is tiny and broadcasts back; the flag is a
    map-side comparison. Anomalies order first for the report."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            dl.idiv("unix_micros(ts)", str(US_PER_DAY), dl.SPARK)
        ).alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count("*").cast("long").alias("cnt")
    )
    moments = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("s2"),
    )
    dev = "(n * cnt - s)"
    var9 = "9 * (n * s2 - s * s)"
    return (
        daily.join(F.broadcast(moments), "event_type")
        .select(
            "event_type",
            "day",
            "cnt",
            F.expr(dl.micro_avg("100 * s", "n", dl.SPARK)).alias(
                "mean_micro"
            ),
            F.expr(f"({dev}) * ({dev}) > {var9}").alias("is_anomaly"),
        )
        .orderBy(
            F.col("is_anomaly").desc(), "event_type", "day"
        )
    )


# --- Q75: forward as-of join (next-event / time-to-conversion) ---------------
def q75_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each click, the user's NEXT purchase (forward as-of join):
    the time-to-conversion primitive. Same one-sort-shuffle union+carry
    shape as the backward q37, run over descending event time."""
    from pipegen_spark.operators import temporal as tp

    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "ts",
    )
    joined = tp.asof_join_forward(
        clicks,
        purchases,
        by="user_id",
        ts_col="ts",
        tiebreak_cols=("event_id", "purchase_id"),
        payload_cols=("purchase_id", "purchase_ts"),
        payload_prefix="",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.expr("unix_micros(ts)").alias("ts_us"),
        "purchase_id",
        F.expr("unix_micros(purchase_ts)").alias("purchase_ts_us"),
        (
            F.expr("unix_micros(purchase_ts)") - F.expr("unix_micros(ts)")
        ).alias("wait_us"),
    ).orderBy("event_id")


# --- Q76: date-spine gap filling ---------------------------------------------
def q76_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event counts per type with MISSING HOURS FILLED — the
    time-series densification primitive (dashboards, anomaly baselines
    and windowed models all need a gap-free grid; a naive groupBy
    silently drops empty hours): generate the full hour spine from the
    corpus min/max, cross it with the distinct event types, left-join
    the actual counts, flag gaps.

    Plan shape (100 TB): the per-(type, hour) count is ONE partial-
    aggregated shuffle over the events scan; the spine is sequence() +
    explode over a broadcast 1-row min/max aggregate crossed with the
    broadcast distinct-type frame — bounded by hours × types, never by
    event rows — and the final join keys the tiny spine against the
    aggregated counts. Integer surfaces only (epoch seconds, counts).
    """
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "CAST(to_unix_timestamp(date_trunc('HOUR', ts)) AS BIGINT)"
        ).alias("hour_epoch"),
    )
    counts = ev.groupBy("event_type", "hour_epoch").agg(
        F.count("*").cast("long").alias("n_events")
    )
    bounds = ev.groupBy().agg(
        F.min("hour_epoch").alias("lo"), F.max("hour_epoch").alias("hi")
    )
    spine = (
        bounds.select(
            F.explode(F.expr("sequence(lo, hi, 3600)")).alias("hour_epoch")
        )
        .crossJoin(
            F.broadcast(ev.select("event_type").distinct())
        )
    )
    return (
        spine.join(counts, ["event_type", "hour_epoch"], "left")
        .select(
            "event_type",
            "hour_epoch",
            F.coalesce("n_events", F.lit(0).cast("long")).alias(
                "n_events"
            ),
        )
        .withColumn("is_gap", F.col("n_events") == 0)
        .orderBy("event_type", "hour_epoch")
    )


# --- Q77: robust (MAD) anomaly detection -------------------------------------
def q77_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type event-count anomalies via MEDIAN ABSOLUTE
    DEVIATION — the robust sibling of q74's 3-sigma test (one wild day
    inflates a standard deviation and masks real outliers; the median
    pair doesn't break down until half the days are bad).

    Integer-exact trick: for integer counts, 2x a median is always an
    integer (interpolation only lands on halves), so the whole test
    runs in scaled integer units — med2 = 2·median(c),
    dev2 = |2c − med2| = 2·|c − med|, mad4 = 2·median(dev2) = 4·MAD,
    and |c − med| > 3·MAD ⇔ 2·dev2 > 3·mad4 — no float tolerance, no
    libm, bit-identical on both engines.

    Plan shape: ONE partial-aggregated (type, day) count over the scan;
    the two median passes group by type over ≤ |days| rows per group —
    bounded groups, the q32 exact-percentile cost class — and the tiny
    per-type stats broadcast back onto the daily frame.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "CAST(to_unix_timestamp(date_trunc('DAY', ts)) DIV 86400"
            " AS BIGINT)"
        ).alias("day_idx"),
    )
    daily = ev.groupBy("event_type", "day_idx").agg(
        F.count("*").cast("long").alias("n_events")
    )
    med = daily.groupBy("event_type").agg(
        F.expr(
            "CAST(2.0 * percentile(n_events, 0.5) AS BIGINT)"
        ).alias("med2")
    )
    dev = daily.join(F.broadcast(med), "event_type").select(
        "event_type",
        "day_idx",
        "n_events",
        "med2",
        F.expr("abs(2 * n_events - med2)").cast("long").alias("dev2"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("CAST(2.0 * percentile(dev2, 0.5) AS BIGINT)").alias(
            "mad4"
        )
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "day_idx",
            "n_events",
            "med2",
            "dev2",
            "mad4",
            (F.col("dev2") * 2 > F.col("mad4") * 3).alias("is_anomaly"),
        )
        .orderBy("event_type", "day_idx")
    )


# --- Q78: activity streaks (gaps & islands) ----------------------------------
def q78_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive-active-day streaks — the classic gaps-and-
    islands shape (retention/engagement reporting): distinct activity
    days per user, island id = day_idx − row_number (constant within a
    consecutive run), then per-user summary: active days, number of
    streaks, longest streak and its start day.

    Plan shape: one distinct over (user, day) — partial-aggregated —
    then ONE sort-shuffle on user_id shared by the row_number window;
    the island and user rollups are hash aggregates on top. user_id is
    high-cardinality, so window partitions stay balanced at any scale.
    All-integer surfaces."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            "CAST(to_unix_timestamp(date_trunc('DAY', ts)) DIV 86400"
            " AS BIGINT)"
        ).alias("day_idx"),
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day_idx")
    islands = ev.select(
        "user_id",
        "day_idx",
        (F.col("day_idx") - F.row_number().over(w)).alias("island"),
    )
    per_streak = islands.groupBy("user_id", "island").agg(
        F.count("*").cast("long").alias("len_days"),
        F.min("day_idx").alias("start_day"),
    )
    summary = per_streak.groupBy("user_id").agg(
        F.sum("len_days").cast("long").alias("n_active_days"),
        F.count("*").cast("long").alias("n_streaks"),
        F.max("len_days").cast("long").alias("max_streak_days"),
    )
    # Earliest start among the longest streaks — an explicit integer
    # tie-break (a struct-keyed max_by would lean on engine-specific
    # struct ordering).
    best = (
        per_streak.join(
            summary.select(
                "user_id", F.col("max_streak_days").alias("len_days")
            ),
            ["user_id", "len_days"],
        )
        .groupBy("user_id")
        .agg(F.min("start_day").cast("long").alias("best_streak_start"))
    )
    return summary.join(best, "user_id").orderBy("user_id")


# --- Q79: min-cost supplier (TPC-H Q2) ---------------------------------------
def q79_tpch_min_cost_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's correlated-MIN shape, completing the 22-query set on
    this schema (no partsupp table, so the supplier-part cost relation
    is DERIVED from the fact: per (part, supplier), the minimum
    discounted line price ever shipped stands in for ps_supplycost).
    For large parts of one type, find the cheapest qualifying supplier
    (region-restricted) — the per-part scalar MIN joins back on integer
    equality so ties all surface, exactly like the reference Q2.

    Plan shape (100 TB): ONE (partkey, suppkey) hash aggregate over the
    fact — partial-aggregated map-side, the only wide shuffle; the part
    filter and the supplier→nation→region chain are broadcast dims that
    prune BEFORE the min-per-part aggregate, so the correlated MIN runs
    over the filtered frame (~|parts(filter)| × |supps(region)| rows),
    not the corpus; the join-back probe is that same small frame."""
    region = table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q79_REGION
    )
    nat = (
        table(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_size") >= Q79_SIZE_MIN) & (F.col("p_type") == Q79_TYPE)
        )
        .select("p_partkey", "p_name")
    )
    li = table(spark, sf_dir, "lineitem")
    ps = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            "s_acctbal",
            "n_name",
            _cents(REV).alias("line_c"),
        )
        .groupBy(
            "p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal",
            "n_name",
        )
        .agg(F.min("line_c").cast("long").alias("cost_cents"))
    )
    floor_ = ps.groupBy(F.col("p_partkey").alias("m_key")).agg(
        F.min("cost_cents").alias("min_cents")
    )
    return (
        ps.join(
            F.broadcast(floor_),
            (ps.p_partkey == floor_.m_key)
            & (ps.cost_cents == floor_.min_cents),
        )
        .select(
            _cents("s_acctbal").alias("acctbal_cents"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "cost_cents",
        )
        .orderBy(
            F.col("acctbal_cents").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


# --- Q80: dominant supplier (TPC-H Q20) --------------------------------------
def q80_tpch_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20's nested-IN ladder re-targeted (no partsupp availqty):
    suppliers who shipped MORE than a ppm share of some name-prefixed
    part's total volume in one year — `s_suppkey IN (pairs WHERE qty
    gate AND partkey IN (filtered parts))` becomes two stacked
    left-semi joins, the same double-subquery plan Q20 compiles to.

    Plan shape: the year-filtered fact reduces to ONE (part, supplier)
    quantity aggregate (the wide shuffle); part totals are a second,
    strictly smaller agg joined back per part (AQE broadcasts it); the
    prefix part filter broadcasts into the pair frame; the supplier
    table then semi-joins against the ~|qualifying pairs| frame. The
    share gate is an integer cross-multiplication — no ratios."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.expr(
            f"l_shipdate >= TIMESTAMP '{Q80_LO}' "
            f"AND l_shipdate < TIMESTAMP '{Q80_HI}'"
        )
    )
    qty_l = F.expr("CAST(floor(l_quantity + 0.5) AS BIGINT)")
    pairs = (
        li.select("l_partkey", "l_suppkey", qty_l.alias("qty"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("qty").cast("long").alias("supp_qty"))
    )
    totals = pairs.groupBy(F.col("l_partkey").alias("t_key")).agg(
        F.sum("supp_qty").cast("long").alias("part_qty")
    )
    pref = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(Q80_PREFIX))
        .select("p_partkey")
    )
    dominant = (
        pairs.join(totals, pairs.l_partkey == totals.t_key)
        .filter(
            F.lit(1_000_000) * F.col("supp_qty")
            > F.lit(Q80_SHARE_PPM) * F.col("part_qty")
        )
        .join(F.broadcast(pref), F.col("l_partkey") == pref.p_partkey, "left_semi")
        .select("l_suppkey")
    )
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
    )
    return (
        supp.join(
            dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi"
        )
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


Q81_MIN_SUPPORT = 2  # pairs must co-occur in >= 2 orders
Q81_LIMIT = 500


def q81_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining over orders: for every pair of parts
    co-occurring in >= Q81_MIN_SUPPORT orders, the support /
    confidence / lift triple — the classic association-rule workload
    (Agrawal & Srikant 1994's frequent 2-itemsets) on the TPC-H
    schema.

    Shape (100 TB): baskets are distinct (orderkey, partkey) rows; the
    pair join is a SELF-EQUI-JOIN ON ORDERKEY with part_a < part_b, so
    pair volume is Σ basket_size² — bounded by the max lines per order
    (~single digits in order data), i.e. linear in lineitem, never
    all-pairs over the catalog. Per-part supports and the order count
    are partial-agg shuffles; the order count re-enters as a broadcast
    1-row aggregate. Integer surfaces: confidence and lift in ppm via
    the two-step idiv (same associativity on both engines; the
    two-step keeps every intermediate under BIGINT at any corpus
    size — the single-expression lift overflows at ~1e9 orders)."""
    items = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = items.select("l_orderkey").distinct().agg(
        F.count("*").cast("long").alias("n_orders")
    )
    part_supp = items.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("supp")
    )
    a = items.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "o")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("pair_support"))
        .filter(F.col("pair_support") >= Q81_MIN_SUPPORT)
    )
    conf = dl.idiv(
        "pair_support * CAST(1000000 AS BIGINT)", "support_a", dl.SPARK
    )
    lift_t = dl.idiv(
        "pair_support * CAST(1000000 AS BIGINT)", "support_a", dl.SPARK
    )
    lift = dl.idiv(f"({lift_t}) * n_orders", "support_b", dl.SPARK)
    return (
        pairs.join(
            part_supp.select(
                F.col("l_partkey").alias("part_a"),
                F.col("supp").alias("support_a"),
            ),
            "part_a",
        )
        .join(
            part_supp.select(
                F.col("l_partkey").alias("part_b"),
                F.col("supp").alias("support_b"),
            ),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "pair_support",
            "support_a",
            "support_b",
            F.expr(conf).cast("long").alias("confidence_ppm"),
            F.expr(lift).cast("long").alias("lift_ppm"),
        )
        .orderBy(
            F.col("pair_support").desc(), "part_a", "part_b"
        )
        .limit(Q81_LIMIT)
    )


def q83_stream_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join (r11 — completes the
    streaming-join family: q41 INNER, q82 LEFT OUTER, this the full
    outer form Spark supports with watermarks + time bounds since
    3.1): purchases joined to same-user clicks in the preceding hour,
    emitting NULL-click rows for never-matched purchases AND
    NULL-purchase rows for never-matched clicks.

    Determinism on finite input extends q82's frontier argument to
    BOTH outer sides, with per-side cuts: an unmatched purchase
    flushes once the global watermark passes p_ts (cut_p =
    min(max_p, max_c) - 1h - 1min, exactly q82's region), but an
    unmatched click only flushes once the watermark passes c_ts + 1h
    (purchases in (c_ts, c_ts + 1h] could still have matched it), so
    its safe region is one join-window deeper: cut_c =
    min(max_p, max_c) - 2h - 1min. The gated surface keeps matched
    rows inside BOTH cuts and each NULL class inside its own cut —
    the identical CASE filter applied to the batch FULL OUTER join by
    the oracle. Margins keep a minute clear of each frontier (rows AT
    the final watermark stay in state forever on a finished stream).

    Shape (100 TB): state is watermark-bounded on both sides (~1 h of
    purchases, ~2 h of clicks — the click side must outlive its
    forward join window), keyed by user; the no-data micro-batch
    after input exhaustion performs the final two-sided flush."""
    from pipegen_spark.streaming.filesource import (
        events_file_stream,
        run_to_file_sink,
        state_partitions,
    )

    purchases = (
        events_file_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        events_file_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.expr("p_ts - INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("p_ts")),
        "fullOuter",
    ).select(
        "event_id",
        "user_id",
        F.expr("unix_micros(p_ts)").alias("p_ts_us"),
        "click_id",
        "c_user",
        F.expr("unix_micros(c_ts)").alias("c_ts_us"),
    )
    with state_partitions(spark, n=4):
        out = run_to_file_sink(spark, joined, "pipegen_q83_")

    ev = table(spark, sf_dir, "events")
    cuts = (
        ev.filter(F.col("event_type") == "purchase")
        .agg(F.expr("unix_micros(max(ts))").alias("max_p"))
        .crossJoin(
            ev.filter(F.col("event_type") == "click").agg(
                F.expr("unix_micros(max(ts))").alias("max_c")
            )
        )
        .select(
            F.expr("least(max_p, max_c) - 3660000000").alias("cut_p_us"),
            F.expr("least(max_p, max_c) - 7260000000").alias("cut_c_us"),
        )
    )
    flushed = out.crossJoin(F.broadcast(cuts)).filter(
        (
            F.col("event_id").isNotNull()
            & F.col("click_id").isNotNull()
            & (F.col("p_ts_us") <= F.col("cut_p_us"))
            & (F.col("c_ts_us") <= F.col("cut_c_us"))
        )
        | (
            F.col("click_id").isNull()
            & (F.col("p_ts_us") <= F.col("cut_p_us"))
        )
        | (
            F.col("event_id").isNull()
            & (F.col("c_ts_us") <= F.col("cut_c_us"))
        )
    )
    return flushed.select(
        "event_id",
        F.coalesce("user_id", "c_user").alias("join_user"),
        "p_ts_us",
        "click_id",
        "c_ts_us",
        F.when(F.col("event_id").isNull(), F.lit("click_only"))
        .when(F.col("click_id").isNull(), F.lit("purchase_only"))
        .otherwise(F.lit("matched"))
        .alias("side"),
    ).orderBy("event_id", "click_id")


def q82_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join (r10 — completes the
    streaming-join family next to q41's inner form, the FlinkSQL outer
    interval join the reference's SQL surface reaches through Flink):
    every purchase, joined to the clicks of the same user in the hour
    before it, with NULL click columns for purchases that never
    matched. Both sides watermarked — the outer side's NULL emission is
    exactly what the watermark exists for: a purchase can only be
    declared unmatched once the click watermark has passed its window.

    Determinism on finite input (the parity contract): Structured
    Streaming emits an outer NULL row only when the global watermark
    (min over both sides, max event time - 1h) passes the purchase's
    window, and rows AT the final watermark frontier stay in state
    forever on a finished stream. The gated surface therefore keeps
    only purchases with p_ts <= cut = min(max_p, max_c) - 1h - 1min —
    strictly inside the flushed region, one minute clear of the
    boundary so neither engine's <=/< convention at the frontier can
    flip a row — computed from the batch events table as a broadcast
    1-row aggregate and applied as a post-stream batch filter. On that
    region the appended stream result equals the batch LEFT OUTER
    interval join the oracle runs.

    Shape (100 TB): the join state is watermark-bounded on both sides
    (each side retains ~1 h of rows), keyed by user — the standard
    production outer-join deployment; the no-data micro-batch after
    input exhaustion performs the final state flush."""
    from pipegen_spark.streaming.filesource import (
        events_file_stream,
        run_to_file_sink,
        state_partitions,
    )

    purchases = (
        events_file_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        events_file_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.expr("p_ts - INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("p_ts")),
        "leftOuter",
    ).select(
        "event_id",
        "user_id",
        F.expr("unix_micros(p_ts)").alias("p_ts_us"),
        "click_id",
        F.expr("unix_micros(c_ts)").alias("c_ts_us"),
    )
    with state_partitions(spark, n=4):
        out = run_to_file_sink(spark, joined, "pipegen_q82_")

    ev = table(spark, sf_dir, "events")
    cut = (
        ev.filter(F.col("event_type") == "purchase")
        .agg(F.expr("unix_micros(max(ts))").alias("max_p"))
        .crossJoin(
            ev.filter(F.col("event_type") == "click").agg(
                F.expr("unix_micros(max(ts))").alias("max_c")
            )
        )
        .select(
            F.expr(
                "least(max_p, max_c) - 3660000000"
            ).alias("cut_us")  # 1 hour + 1 minute in micros
        )
    )
    return (
        out.crossJoin(F.broadcast(cut))
        .filter(F.col("p_ts_us") <= F.col("cut_us"))
        .select(
            "event_id",
            "user_id",
            "p_ts_us",
            "click_id",
            "c_ts_us",
            F.col("click_id").isNotNull().alias("matched"),
        )
        .orderBy("event_id", "click_id")
    )
