"""DuckDB oracles for the fifth query tranche (TPC-H Q6/Q4/Q14/Q18/
Q19/Q16/Q22 shapes). Filter constants and the money() discipline are
shared with relational5.py so both sides render the same computation."""

from pipegen_spark.functions import dialect as dl
from pipegen_spark.queries.relational5 import (
    Q51_HI,
    Q51_LO,
    Q52_HI,
    Q52_LO,
    Q53_HI,
    Q53_LO,
    Q54_QTY,
    Q56_SIZES,
)


def _c(expr: str) -> str:
    return dl.cents(expr, dl.DUCK)


_Q55_ARM = """
    (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
     AND l_quantity BETWEEN 1 AND 11)
    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
     AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
     AND l_quantity BETWEEN 20 AND 30)
"""

from pipegen_spark.functions import dialect as _dl

_Z = _dl.zorder16("(user_id % 256)",
                  "(CAST(dayofyear(ts) AS BIGINT) % 256)", _dl.DUCK)


def _pagerank_sql(iters: int = 3) -> str:
    """Mirror of graph.pagerank_fixed on the part<->supplier bipartite
    graph: the same integer-mass iterations unrolled as CTE rounds."""
    from pipegen_spark.operators import graph as _gr

    tele = (
        f"(({_gr.PR_DAMP_DEN - _gr.PR_DAMP_NUM} * "
        f"CAST({_gr.PR_SCALE} AS BIGINT)) // ({_gr.PR_DAMP_DEN} * t.n))"
    )
    damp = (
        f"(({_gr.PR_DAMP_NUM} * COALESCE(c.s, CAST(0 AS BIGINT))) "
        f"// {_gr.PR_DAMP_DEN})"
    )
    ctes = [
        """edges AS (
        SELECT l_partkey AS src, l_suppkey + 100000 AS dst FROM de
        UNION ALL
        SELECT l_suppkey + 100000 AS src, l_partkey AS dst FROM de
    )""",
        "nodes AS (SELECT DISTINCT src AS id FROM edges)",
        "outdeg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS od"
        " FROM edges GROUP BY src)",
        "ncnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        f"r0 AS (SELECT id, CAST({_gr.PR_SCALE} AS BIGINT) // n AS r"
        " FROM nodes CROSS JOIN ncnt)",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""c{i} AS (
        SELECT e.dst AS id, CAST(SUM(r.r // o.od) AS BIGINT) AS s
        FROM edges e JOIN r{i - 1} r ON e.src = r.id
        JOIN outdeg o ON e.src = o.id
        GROUP BY e.dst
    )""")
        ctes.append(f"""r{i} AS (
        SELECT n.id, CAST({tele} + {damp} AS BIGINT) AS r
        FROM nodes n CROSS JOIN ncnt t LEFT JOIN c{i} c ON n.id = c.id
    )""")
    joined = ",\n    ".join(ctes)
    return f"""
    WITH de AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    {joined}
    SELECT id AS node_id,
           CASE WHEN id >= 100000 THEN 'supplier' ELSE 'part' END
               AS node_type,
           CAST(r AS BIGINT) AS rank_micro
    FROM r{iters} ORDER BY node_id
    """


RELATIONAL5_ORACLE: dict[str, str] = {
    "q61_pagerank": _pagerank_sql(),

    "q60_stream_enrich": f"""
        SELECT CAST((epoch_ns(ts) // 1000 // 3600000000) * 3600000000
                    AS BIGINT) AS win_us,
               c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM({_dl.cents("value", _dl.DUCK)}) AS BIGINT)
                   AS value_cents
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY 1, 2 ORDER BY 1, 2
    """,

    "q59_table_profile": f"""
    WITH prof AS (
        SELECT CAST(l_orderkey AS VARCHAR) AS c_key,
               l_returnflag AS c_flag,
               CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS c_ship,
               CAST({_dl.cents("l_extendedprice", _dl.DUCK)} AS VARCHAR)
                   AS c_price
        FROM lineitem
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN c_key IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_c_key, CAST(COUNT(DISTINCT c_key) AS BIGINT) AS nd_c_key, MIN(c_key) AS mn_c_key, MAX(c_key) AS mx_c_key, CAST(SUM(CASE WHEN c_flag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_c_flag, CAST(COUNT(DISTINCT c_flag) AS BIGINT) AS nd_c_flag, MIN(c_flag) AS mn_c_flag, MAX(c_flag) AS mx_c_flag, CAST(SUM(CASE WHEN c_ship IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_c_ship, CAST(COUNT(DISTINCT c_ship) AS BIGINT) AS nd_c_ship, MIN(c_ship) AS mn_c_ship, MAX(c_ship) AS mx_c_ship, CAST(SUM(CASE WHEN c_price IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_c_price, CAST(COUNT(DISTINCT c_price) AS BIGINT) AS nd_c_price, MIN(c_price) AS mn_c_price, MAX(c_price) AS mx_c_price
        FROM prof
    )
    SELECT * FROM (
        SELECT 'c_key' AS column_name, n_rows,
               nn_c_key AS n_nulls, nd_c_key AS n_distinct,
               mn_c_key AS min_value, mx_c_key AS max_value FROM agg
        UNION ALL
        SELECT 'c_flag' AS column_name, n_rows,
               nn_c_flag AS n_nulls, nd_c_flag AS n_distinct,
               mn_c_flag AS min_value, mx_c_flag AS max_value FROM agg
        UNION ALL
        SELECT 'c_ship' AS column_name, n_rows,
               nn_c_ship AS n_nulls, nd_c_ship AS n_distinct,
               mn_c_ship AS min_value, mx_c_ship AS max_value FROM agg
        UNION ALL
        SELECT 'c_price' AS column_name, n_rows,
               nn_c_price AS n_nulls, nd_c_price AS n_distinct,
               mn_c_price AS min_value, mx_c_price AS max_value FROM agg
    ) ORDER BY column_name
    """,
    "q58_zorder_layout": f"""
        SELECT zkey // 64 AS tile,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(MIN(zkey) AS BIGINT) AS zmin,
               CAST(MAX(zkey) AS BIGINT) AS zmax
        FROM (SELECT {_Z} AS zkey, user_id FROM events)
        GROUP BY 1 ORDER BY 1
    """,
    "q51_tpch_forecast_revenue": f"""
        SELECT CAST(SUM({_c("l_extendedprice * l_discount")})
                    AS BIGINT) AS revenue_cents,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{Q51_LO}'
          AND l_shipdate < TIMESTAMP '{Q51_HI}'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "q52_tpch_priority_check": f"""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '{Q52_LO}'
          AND o.o_orderdate < TIMESTAMP '{Q52_HI}'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q53_tpch_promo_ratio": f"""
        WITH rows_c AS (
            SELECT {_c("l_extendedprice * (1.0 - l_discount)")} AS rev_c,
                   CASE WHEN p_type = 'PROMO'
                        THEN {_c("l_extendedprice * (1.0 - l_discount)")}
                        ELSE CAST(0 AS BIGINT) END AS promo_c
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '{Q53_LO}'
              AND l_shipdate < TIMESTAMP '{Q53_HI}'
        )
        SELECT CAST(SUM(promo_c) AS BIGINT) AS promo_revenue_cents,
               CAST(SUM(rev_c) AS BIGINT) AS total_revenue_cents,
               100.0 * CAST(SUM(promo_c) AS DOUBLE)
                     / CAST(SUM(rev_c) AS DOUBLE) AS promo_pct
        FROM rows_c
    """,
    "q54_tpch_big_orders": f"""
        WITH big AS (
            SELECT l_orderkey,
                   CAST(SUM({_c("l_quantity")}) AS BIGINT) AS total_qty_cents
            FROM lineitem
            GROUP BY l_orderkey
            HAVING CAST(SUM({_c("l_quantity")}) AS BIGINT) > {Q54_QTY * 100}
        )
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
               {_c("o.o_totalprice")} AS totalprice_cents,
               big.total_qty_cents
        FROM orders o
        JOIN big ON o.o_orderkey = big.l_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY totalprice_cents DESC, o.o_orderkey
        LIMIT 100
    """,
    "q55_tpch_disjunctive": f"""
        SELECT CAST(SUM({_c("l_extendedprice * (1.0 - l_discount)")})
                    AS BIGINT) AS revenue_cents,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE {_Q55_ARM}
    """,
    "q56_tpch_supplier_cnt": f"""
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#45'
          AND p_type <> 'PROMO'
          AND p_size IN {Q56_SIZES}
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        LIMIT 100
    """,
    "q57_tpch_idle_rich": f"""
        WITH thresh AS (
            SELECT CAST(SUM({_c("c_acctbal")}) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS avg_bal_c
            FROM customer WHERE c_acctbal > 0
        )
        SELECT n.n_name,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM({_c("c.c_acctbal")}) AS BIGINT) AS totacctbal_cents
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        CROSS JOIN thresh
        WHERE {_c("c.c_acctbal")} > thresh.avg_bal_c
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        GROUP BY n.n_name
        ORDER BY n.n_name
    """,
}
