"""DuckDB oracles for the fourth query tranche (streaming dedup parity +
TPC-H-shaped analytics). Filter constants and the money() discipline are
shared with relational4.py so both sides render the same computation."""

from pipegen_spark.functions import dialect as dl
from pipegen_spark.queries.relational4 import (
    Q43_CUTOFF,
    Q44_DATE,
    Q44_SEGMENT,
    Q45_HI,
    Q45_LO,
    Q45_REGION,
    Q46_HI,
    Q46_LO,
)


def _c(expr: str) -> str:
    return dl.cents(expr, dl.DUCK)


RELATIONAL4_ORACLE: dict[str, str] = {
    # Batch oracle for the streaming stateful dedup: only key columns are
    # emitted, so the finite-input append result is the distinct key set.
    "q42_stream_dedup": """
        SELECT DISTINCT user_id, event_type FROM events
        ORDER BY user_id, event_type
    """,
    # All-integer output surface (cents + millionths; see
    # relational4.q43_tpch_pricing docstring for the gate-hardening why).
    "q43_tpch_pricing": f"""
        WITH rows_c AS (
            SELECT l_returnflag, l_linestatus,
                   {_c("l_quantity")} AS qty_c,
                   {_c("l_extendedprice")} AS price_c,
                   {_c("l_extendedprice * (1.0 - l_discount)")} AS disc_c,
                   {_c("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")}
                       AS charge_c,
                   {_c("l_discount")} AS discv_c
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '{Q43_CUTOFF}'
        ),
        g AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(qty_c) AS BIGINT) AS sum_qty,
                   CAST(SUM(price_c) AS BIGINT) AS sum_base_price,
                   CAST(SUM(disc_c) AS BIGINT) AS sum_disc_price,
                   CAST(SUM(charge_c) AS BIGINT) AS sum_charge,
                   CAST(SUM(discv_c) AS BIGINT) AS sum_discv,
                   CAST(COUNT(*) AS BIGINT) AS count_order
            FROM rows_c
            GROUP BY l_returnflag, l_linestatus
        )
        SELECT l_returnflag, l_linestatus,
               sum_qty, sum_base_price, sum_disc_price, sum_charge,
               {dl.micro_avg("sum_qty", "count_order", dl.DUCK)} AS avg_qty,
               {dl.micro_avg("sum_base_price", "count_order", dl.DUCK)}
                   AS avg_price,
               {dl.micro_avg("sum_discv", "count_order", dl.DUCK)} AS avg_disc,
               count_order
        FROM g
        ORDER BY l_returnflag, l_linestatus
    """,
    "q44_tpch_shipping": f"""
        SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
               CAST(SUM({_c("l.l_extendedprice * (1.0 - l.l_discount)")})
                    AS BIGINT) AS revenue_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = '{Q44_SEGMENT}'
          AND o.o_orderdate < TIMESTAMP '{Q44_DATE}'
          AND l.l_shipdate > TIMESTAMP '{Q44_DATE}'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue_cents DESC, o.o_orderdate, l.l_orderkey
        LIMIT 10
    """,
    "q45_tpch_region_volume": f"""
        SELECT n.n_name,
               CAST(SUM({_c("l.l_extendedprice * (1.0 - l.l_discount)")})
                    AS BIGINT) AS revenue_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND s.s_nationkey = c.c_nationkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = '{Q45_REGION}'
          AND o.o_orderdate >= TIMESTAMP '{Q45_LO}'
          AND o.o_orderdate < TIMESTAMP '{Q45_HI}'
        GROUP BY n.n_name
        ORDER BY revenue_cents DESC, n.n_name
    """,
    # Pivot as conditional aggregation — the portable rendering of the
    # same single hash-agg plan Spark produces for a pinned-values pivot.
    "q47_pivot": """
        SELECT o_orderpriority,
               CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_F,
               CAST(COUNT(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_O,
               CAST(COUNT(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_P
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q48_grouping_sets": """
        SELECT o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY g_pri, g_st, o_orderpriority, o_orderstatus
    """,
    "q49_range_frame": """
        WITH e AS (
            SELECT event_id, user_id,
                   CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us
            FROM events
        )
        SELECT event_id, user_id, ts_us,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing_1h,
               CAST(ROW_NUMBER() OVER
                    (PARTITION BY user_id ORDER BY ts_us, event_id)
                    AS BIGINT) AS seq
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """,
    # Sketch values are engine-specific; the comparable contract is
    # "estimate within ±2% of the exact interpolated median" (q23 pattern).
    "q50_approx_percentile": """
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.5) AS exact_p50,
               TRUE AS within_tol
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q46_tpch_returns": f"""
        SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
               CAST(SUM({_c("l.l_extendedprice * (1.0 - l.l_discount)")})
                    AS BIGINT) AS revenue_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '{Q46_LO}'
          AND o.o_orderdate < TIMESTAMP '{Q46_HI}'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue_cents DESC, c.c_custkey
        LIMIT 20
    """,
}
