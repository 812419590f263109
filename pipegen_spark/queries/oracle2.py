"""DuckDB oracle SQL for the extended relational surface (relational2.py).

q23_approx_distinct is oracled as a bounded-error check: the estimate
itself is estimator-specific, so the comparable output is the exact count
plus a within-±5% boolean (TRUE on the oracle side).
"""

from pipegen_spark.functions import dialect as dl

_FOLD_SUM = dl.fold(
    dl.transform("embedding", "x -> CAST(x AS DOUBLE)", dl.DUCK),
    "CAST(0.0 AS DOUBLE)",
    "(acc,x) -> acc + x",
    dl.DUCK,
)

RELATIONAL2_ORACLE: dict[str, str] = {
    # Estimator values are engine-specific; the comparable contract is
    # "estimate within ±5% of exact" — the Spark side emits that boolean,
    # the oracle asserts it must be TRUE alongside the exact count.
    "q23_approx_distinct": """
        SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_cust,
               TRUE AS within_tol
        FROM orders
    """,
    "q20_cube": """
        SELECT COALESCE(o_orderstatus, 'ALL') AS st,
               COALESCE(o_orderpriority, 'ALL') AS pri,
               COUNT(*) AS cnt
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY st, pri
    """,
    "q21_math_funcs": """
        SELECT l_orderkey, l_linenumber,
               ABS(l_quantity - 25) AS dev,
               CAST(CEIL(l_extendedprice) AS BIGINT) AS ceil_p,
               CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_p,
               SQRT(l_quantity) AS sqrt_q,
               l_orderkey % 7 AS mod7
        FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 200
    """,
    "q22_array_funcs": f"""
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS dim,
               CAST(list_extract(embedding, 1) AS DOUBLE) AS first_v,
               {_FOLD_SUM} AS vec_sum
        FROM embeddings ORDER BY vec_id LIMIT 200
    """,
    "q24_conditional_funcs": """
        SELECT l_orderkey, l_linenumber,
               NULLIF(l_returnflag, 'N') AS rf_or_null,
               COALESCE(NULLIF(l_linestatus, 'O'), 'open') AS st,
               LEAST(l_quantity, l_discount * 100) AS lo,
               GREATEST(l_quantity, l_tax * 100) AS hi
        FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 200
    """,
    "q25_full_outer": """
        SELECT COALESCE(c_custkey, o_custkey) AS key,
               COALESCE(big_orders, 0) AS big_orders
        FROM (SELECT c_custkey FROM customer) c
        FULL OUTER JOIN (
            SELECT o_custkey, COUNT(*) AS big_orders FROM orders
            WHERE o_totalprice > 300000 GROUP BY o_custkey
        ) o ON c_custkey = o_custkey
        ORDER BY key LIMIT 200
    """,
    "q26_cross_join": """
        SELECT r_name, n_name FROM region CROSS JOIN nation
        ORDER BY r_name, n_name
    """,
    "q27_exists_correlated": """
        SELECT o_orderkey FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        ORDER BY o_orderkey LIMIT 200
    """,
    "q28_union_distinct": """
        SELECT c_nationkey AS nk FROM customer
        UNION
        SELECT s_nationkey AS nk FROM supplier
        ORDER BY nk
    """,
    "q29_like_regex": """
        SELECT COUNT(CASE WHEN p_name LIKE '%gold%' THEN 1 END) AS with_gold,
               COUNT(CASE WHEN regexp_matches(p_type, '^[A-Z]+ [a-z]+') THEN 1 END) AS typed,
               COUNT(CASE WHEN substr(p_brand, 1, 5) = 'Brand' THEN 1 END) AS branded,
               COUNT(*) AS total
        FROM part
    """,
    "q30_buckets": """
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 200000 THEN 'medium'
                    ELSE 'large' END AS bucket,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY bucket ORDER BY bucket
    """,
    "q31_sessionize": """
        WITH e AS (
            SELECT user_id, ts,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             > INTERVAL 30 MINUTE
                        OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        s AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS session_no
            FROM e
        )
        SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
        FROM s GROUP BY user_id, session_no
        ORDER BY user_id, session_start LIMIT 500
    """,
}
