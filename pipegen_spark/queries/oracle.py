"""DuckDB oracle SQL for the declared query corpus.

One ANSI-SQL string per query key, runnable by DuckDB over the same parquet
tables (pre-registered views). Aliases match the Spark side exactly; numeric
discipline mirrors relational.py (DECIMAL(18,2) sums, ROUND→DOUBLE casts).
"""

RELATIONAL_ORACLE: dict[str, str] = {
    "q01_scan_project": """
        SELECT l_orderkey, l_partkey FROM lineitem
        ORDER BY l_orderkey, l_partkey LIMIT 100
    """,
    "q02_filter_expr": """
        SELECT l_orderkey,
               CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS rev
        FROM lineitem WHERE l_quantity > 30
        ORDER BY l_orderkey, rev LIMIT 1000
    """,
    "q03_agg_having": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS c,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) / COUNT(*), 2) AS DOUBLE) AS avg_price
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        HAVING COUNT(*) > 10
        ORDER BY l_returnflag, l_linestatus
    """,
    "q04_join_broadcast": """
        SELECT n_name, COUNT(*) AS cnt
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
    """,
    "q05_multi_join": """
        SELECT r_name, n_name, COUNT(*) AS cnt
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name
    """,
    "q06_semi_join": """
        SELECT c_custkey FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
        ORDER BY c_custkey LIMIT 100
    """,
    "q06_anti_join": """
        SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey LIMIT 100
    """,
    "q07_case_agg": """
        SELECT o_orderpriority,
               COUNT(CASE WHEN o_totalprice > 100000 THEN 1 END) AS big,
               COUNT(*) AS cnt
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q08_window_rownum": """
        SELECT o_custkey, o_orderkey FROM (
            SELECT o_custkey, o_orderkey,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS rn
            FROM orders
        ) t WHERE rn = 1
        ORDER BY o_custkey LIMIT 100
    """,
    "q09_rank_topk": """
        SELECT l_partkey, CAST(rev_dec AS DOUBLE) AS rev, CAST(rk AS INT) AS rk
        FROM (
            SELECT l_partkey,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev_dec,
                   RANK() OVER (ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,2))) DESC,
                                l_partkey) AS rk
            FROM lineitem GROUP BY l_partkey
        ) t WHERE rk <= 10
        ORDER BY rk, l_partkey
    """,
    "q10_intersect": """
        SELECT o_custkey AS key FROM orders
        INTERSECT
        SELECT c_custkey AS key FROM customer
        ORDER BY key LIMIT 100
    """,
    "q10_except": """
        SELECT c_custkey AS key FROM customer
        EXCEPT
        SELECT o_custkey AS key FROM orders
        ORDER BY key LIMIT 100
    """,
    "q10_union_all": """
        SELECT key, COUNT(*) AS cnt FROM (
            SELECT c_custkey AS key FROM customer
            UNION ALL
            SELECT o_custkey AS key FROM orders
        ) u GROUP BY key ORDER BY cnt DESC, key LIMIT 100
    """,
    "q11_string_funcs": """
        SELECT UPPER(n_name) AS uname, SUBSTR(n_name, 1, 3) AS pre,
               CAST(LENGTH(n_name) AS INT) AS ln
        FROM nation ORDER BY uname
    """,
    "q12_date_trunc": """
        SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS m,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY m ORDER BY m
    """,
    "q13_event_window": """
        SELECT DATE_TRUNC('hour', ts) AS w, event_type, COUNT(*) AS cnt
        FROM events GROUP BY w, event_type ORDER BY w, event_type
    """,
    "q14_distinct_dedup": """
        SELECT COUNT(*) AS cnt FROM (
            SELECT DISTINCT user_id, event_type FROM events
        ) t
    """,
    "q15_rollup": """
        SELECT COALESCE(l_returnflag, 'ALL') AS rf,
               COALESCE(l_linestatus, 'ALL') AS ls,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY rf, ls
    """,
    "q16_count_distinct": """
        SELECT COUNT(DISTINCT o_custkey) AS cnt FROM orders
    """,
    "q17_scalar_subquery": """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE CAST(o_totalprice AS DECIMAL(18,2))
              * (SELECT COUNT(*) FROM orders)
              > (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
        ORDER BY o_orderkey LIMIT 100
    """,
    "q18_left_join": """
        SELECT c_custkey, COALESCE(order_cnt, 0) AS order_cnt
        FROM customer LEFT JOIN (
            SELECT o_custkey, COUNT(*) AS order_cnt FROM orders GROUP BY o_custkey
        ) o ON c_custkey = o_custkey
        ORDER BY c_custkey LIMIT 100
    """,
    "q19_props_extract": """
        SELECT CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS k,
               COUNT(*) AS cnt
        FROM events GROUP BY k ORDER BY k
    """,
}
