"""DuckDB oracles for the sixth query tranche (TPC-H Q7/Q8/Q9/Q12/Q13/
Q17/Q15/Q11/Q21 shapes). Filter constants and the integer-cent money
discipline are shared with relational6.py so both sides render the same
computation; every surfaced aggregate is BIGINT (cents / ppm / micro).
"""

from pipegen_spark.functions import dialect as dl
from pipegen_spark.queries.relational6 import (
    Q62_HI,
    Q62_LO,
    Q62_NATION_A,
    Q62_NATION_B,
    Q63_HI,
    Q63_LO,
    Q63_REGION,
    Q63_SHARE_NATION,
    Q63_TYPE,
    Q64_COST_PCT,
    Q65_YEAR,
    Q66_EXCLUDED_PRI,
    Q67_BRAND,
    Q68_HI,
    Q68_LO,
    Q69_FRACTION_PPM,
    Q69_NATION,
    REV,
)

D = dl.DUCK


def _c(expr: str) -> str:
    return dl.cents(expr, D)


RELATIONAL6_ORACLE = {
    "q62_tpch_volume_shipping": f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({_c(REV)}) AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '{Q62_LO}'
      AND l.l_shipdate < TIMESTAMP '{Q62_HI}'
      AND ((sn.n_name = '{Q62_NATION_A}' AND cn.n_name = '{Q62_NATION_B}')
        OR (sn.n_name = '{Q62_NATION_B}' AND cn.n_name = '{Q62_NATION_A}'))
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    "q63_tpch_market_share": f"""
    WITH joined AS (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               {_c(REV)} AS rev_c,
               CASE WHEN sn.n_name = '{Q63_SHARE_NATION}'
                    THEN {_c(REV)} ELSE 0 END AS nation_c
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN region r ON cn.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        WHERE p.p_type = '{Q63_TYPE}' AND r.r_name = '{Q63_REGION}'
          AND o.o_orderdate >= TIMESTAMP '{Q63_LO}'
          AND o.o_orderdate < TIMESTAMP '{Q63_HI}'
    )
    SELECT o_year,
           CAST(SUM(nation_c) AS BIGINT) AS nation_cents,
           CAST(SUM(rev_c) AS BIGINT) AS total_cents,
           (1000000 * CAST(SUM(nation_c) AS BIGINT))
               // GREATEST(CAST(SUM(rev_c) AS BIGINT), 1) AS mkt_share_ppm
    FROM joined GROUP BY o_year ORDER BY o_year
    """,
    "q64_tpch_profit": f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM({_c(
               f"{REV} - p_retailprice * l_quantity * {Q64_COST_PCT}.0 / 100.0"
           )}) AS BIGINT) AS profit_cents
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
    "q65_tpch_priority_mix": f"""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE year(l.l_shipdate) = {Q65_YEAR}
    GROUP BY 1 ORDER BY 1
    """,
    "q66_tpch_cust_distribution": f"""
    WITH per_cust AS (
        SELECT c.c_custkey,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '{Q66_EXCLUDED_PRI}'
        GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    "q67_tpch_small_qty": f"""
    WITH branded AS (
        SELECT l.* FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = '{Q67_BRAND}'
    ),
    stats AS (
        SELECT l_partkey AS sp_key,
               CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
                   AS qty_sum,
               CAST(COUNT(*) AS BIGINT) AS qty_cnt
        FROM branded GROUP BY l_partkey
    ),
    small AS (
        SELECT b.l_extendedprice
        FROM branded b JOIN stats s ON b.l_partkey = s.sp_key
        WHERE 5 * CAST(floor(b.l_quantity + 0.5) AS BIGINT) * s.qty_cnt
              < s.qty_sum
    )
    SELECT (CAST(SUM({_c("l_extendedprice")}) AS BIGINT) * 10000) // 7
               AS avg_yearly_micro,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM small
    """,
    "q68_tpch_top_supplier": f"""
    WITH rev AS (
        SELECT l_suppkey,
               CAST(SUM({_c(REV)}) AS BIGINT) AS total_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{Q68_LO}'
          AND l_shipdate < TIMESTAMP '{Q68_HI}'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           r.total_cents AS total_revenue_cents
    FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_cents = (SELECT MAX(total_cents) FROM rev)
    ORDER BY s.s_suppkey
    """,
    "q69_tpch_important_parts": f"""
    WITH per_part AS (
        SELECT l.l_partkey,
               CAST(SUM({_c(REV)}) AS BIGINT) AS value_cents
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = '{Q69_NATION}'
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, value_cents
    FROM per_part
    WHERE 1000000 * value_cents >
          {Q69_FRACTION_PPM} * (SELECT SUM(value_cents) FROM per_part)
    ORDER BY value_cents DESC, l_partkey
    """,
    "q70_tpch_sole_problem": """
    WITH pairs AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    returned AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        WHERE l_returnflag = 'R'
    ),
    sole AS (
        SELECT r.l_orderkey, r.l_suppkey
        FROM returned r
        WHERE EXISTS (
            SELECT 1 FROM pairs p
            WHERE p.l_orderkey = r.l_orderkey
              AND p.l_suppkey <> r.l_suppkey
        )
        AND NOT EXISTS (
            SELECT 1 FROM returned r2
            WHERE r2.l_orderkey = r.l_orderkey
              AND r2.l_suppkey <> r.l_suppkey
        )
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM sole j JOIN supplier s ON j.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
}


def _funnel_sql() -> str:
    from pipegen_spark.queries.relational6 import FUNNEL_STAGES

    s1, s2, s3 = FUNNEL_STAGES
    stage_rows = []
    for i, (col, name) in enumerate(zip(("n1", "n2", "n3"), (s1, s2, s3))):
        stage_rows.append(
            f"SELECT CAST({i + 1} AS BIGINT) AS stage,"
            f" '{name}' AS event_type, {col} AS users_reached,"
            f" (1000000 * {col}) // GREATEST(n1, 1) AS conversion_ppm"
            " FROM st"
        )
    union = "\n    UNION ALL ".join(stage_rows)
    return f"""
    WITH ev AS (
        SELECT user_id, event_type,
               CAST(epoch_ns(ts) // 1000 AS BIGINT) AS us
        FROM events
    ),
    w1 AS (
        SELECT *, MIN(CASE WHEN event_type = '{s1}' THEN us END)
                      OVER (PARTITION BY user_id) AS t1
        FROM ev
    ),
    w2 AS (
        SELECT *, MIN(CASE WHEN event_type = '{s2}' AND us > t1 THEN us END)
                      OVER (PARTITION BY user_id) AS t2
        FROM w1
    ),
    w3 AS (
        SELECT *, MIN(CASE WHEN event_type = '{s3}' AND us > t2 THEN us END)
                      OVER (PARTITION BY user_id) AS t3
        FROM w2
    ),
    per_user AS (
        SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
        FROM w3 GROUP BY user_id
    ),
    st AS (
        SELECT CAST(COUNT(t1) AS BIGINT) AS n1,
               CAST(COUNT(t2) AS BIGINT) AS n2,
               CAST(COUNT(t3) AS BIGINT) AS n3
        FROM per_user
    )
    {union}
    ORDER BY stage
    """


RELATIONAL6_ORACLE["q71_funnel"] = _funnel_sql()

RELATIONAL6_ORACLE["q72_retention"] = """
    WITH ev AS (
        SELECT user_id,
               CAST((epoch_ns(ts) // 1000) // 86400000000 AS BIGINT) AS d
        FROM events
    ),
    f AS (SELECT user_id, MIN(d) AS d0 FROM ev GROUP BY user_id),
    act AS (
        SELECT DISTINCT CAST(d0 // 7 AS BIGINT) AS cohort_week,
               CAST((d - d0) // 7 AS BIGINT) AS week_offset,
               ev.user_id
        FROM ev JOIN f ON ev.user_id = f.user_id
    )
    SELECT cohort_week, week_offset,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM act GROUP BY 1, 2 ORDER BY 1, 2
    """


def _kmv_sql() -> str:
    from pipegen_spark.operators import sketches as sk
    from pipegen_spark.queries.relational6 import KMV_SET_A, KMV_SET_B

    k, space = sk.KMV_K, sk.KMV_SPACE
    h = dl.hash60("CAST(user_id AS STRING)", D)

    def _est(kth: str) -> str:
        return (
            f"CAST(({k} - 1) AS BIGINT) * "
            f"(CAST({space} AS BIGINT) // GREATEST({kth}, {k}))"
        )
    return f"""
    WITH members AS (
        SELECT DISTINCT event_type AS s, {h} AS h FROM events
        WHERE event_type IN ('{KMV_SET_A}', '{KMV_SET_B}')
    ),
    ka AS (SELECT h FROM members WHERE s = '{KMV_SET_A}'
           ORDER BY h LIMIT {k}),
    kb AS (SELECT h FROM members WHERE s = '{KMV_SET_B}'
           ORDER BY h LIMIT {k}),
    uk AS (SELECT DISTINCT h FROM (
               SELECT h FROM ka UNION ALL SELECT h FROM kb) u
           ORDER BY h LIMIT {k}),
    inter AS (
        SELECT h FROM uk
        WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)
    ),
    sa AS (SELECT MAX(h) AS kth_a, CAST(COUNT(*) AS BIGINT) AS na FROM ka),
    sb AS (SELECT MAX(h) AS kth_b, CAST(COUNT(*) AS BIGINT) AS nb FROM kb),
    si AS (SELECT CAST(COUNT(*) AS BIGINT) AS kmv_inter FROM inter),
    su AS (SELECT CAST(COUNT(*) AS BIGINT) AS kmv_union FROM uk)
    SELECT kth_a, kth_b,
           CAST(CASE WHEN na < {k} THEN na
                ELSE {_est("kth_a")} END AS BIGINT) AS est_distinct_a,
           CAST(CASE WHEN nb < {k} THEN nb
                ELSE {_est("kth_b")} END AS BIGINT) AS est_distinct_b,
           kmv_inter, kmv_union,
           (1000000 * kmv_inter) // GREATEST(kmv_union, 1)
               AS est_jaccard_ppm
    FROM sa CROSS JOIN sb CROSS JOIN si CROSS JOIN su
    """


RELATIONAL6_ORACLE["q73_kmv_overlap"] = _kmv_sql()


RELATIONAL6_ORACLE["q74_anomaly"] = f"""
    WITH ev AS (
        SELECT event_type,
               CAST((epoch_ns(ts) // 1000) // 86400000000 AS BIGINT) AS day
        FROM events
    ),
    daily AS (
        SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM ev GROUP BY 1, 2
    ),
    moments AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cnt) AS BIGINT) AS s,
               CAST(SUM(cnt * cnt) AS BIGINT) AS s2
        FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.day, d.cnt,
           {dl.micro_avg("100 * m.s", "m.n", D)} AS mean_micro,
           (m.n * d.cnt - m.s) * (m.n * d.cnt - m.s)
               > 9 * (m.n * m.s2 - m.s * m.s) AS is_anomaly
    FROM daily d JOIN moments m ON d.event_type = m.event_type
    ORDER BY is_anomaly DESC, d.event_type, d.day
    """


RELATIONAL6_ORACLE["q75_asof_forward"] = """
    WITH c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
    p AS (SELECT event_id AS purchase_id, user_id, ts FROM events
          WHERE event_type = 'purchase'),
    u AS (
        SELECT user_id, ts, 1 AS il, event_id AS tb,
               event_id, NULL::BIGINT AS pid, NULL::TIMESTAMP_NS AS pts
        FROM c
        UNION ALL
        SELECT user_id, ts, 0, purchase_id, NULL, purchase_id, ts FROM p
    ),
    m AS (
        SELECT user_id, ts, il, event_id,
               last_value(pid IGNORE NULLS) OVER w AS purchase_id,
               last_value(pts IGNORE NULLS) OVER w AS purchase_ts
        FROM u
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts DESC, il DESC, tb DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us,
           purchase_id,
           CAST(epoch_ns(purchase_ts) // 1000 AS BIGINT) AS purchase_ts_us,
           CAST(epoch_ns(purchase_ts) // 1000 - epoch_ns(ts) // 1000
                AS BIGINT) AS wait_us
    FROM m WHERE il = 1 ORDER BY event_id
    """

RELATIONAL6_ORACLE["q76_gap_fill"] = """
WITH ev AS (
    SELECT event_type,
           CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch
    FROM events
),
counts AS (
    SELECT event_type, hour_epoch, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM ev GROUP BY event_type, hour_epoch
),
bounds AS (SELECT MIN(hour_epoch) AS lo, MAX(hour_epoch) AS hi FROM ev),
hours AS (
    SELECT CAST(unnest(generate_series(lo, hi, 3600)) AS BIGINT)
        AS hour_epoch
    FROM bounds
),
spine AS (
    SELECT t.event_type, h.hour_epoch
    FROM hours h CROSS JOIN (SELECT DISTINCT event_type FROM ev) t
)
SELECT s.event_type, s.hour_epoch,
       CAST(COALESCE(c.n_events, 0) AS BIGINT) AS n_events,
       (COALESCE(c.n_events, 0) = 0) AS is_gap
FROM spine s LEFT JOIN counts c
  ON s.event_type = c.event_type AND s.hour_epoch = c.hour_epoch
ORDER BY s.event_type, s.hour_epoch
"""

RELATIONAL6_ORACLE["q77_mad_anomaly"] = """
WITH ev AS (
    SELECT event_type,
           CAST(epoch(date_trunc('day', ts)) // 86400 AS BIGINT) AS day_idx
    FROM events
),
daily AS (
    SELECT event_type, day_idx, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM ev GROUP BY event_type, day_idx
),
med AS (
    SELECT event_type,
           CAST(2.0 * quantile_cont(n_events, 0.5) AS BIGINT) AS med2
    FROM daily GROUP BY event_type
),
dev AS (
    SELECT d.event_type, d.day_idx, d.n_events, m.med2,
           CAST(ABS(2 * d.n_events - m.med2) AS BIGINT) AS dev2
    FROM daily d JOIN med m ON d.event_type = m.event_type
),
mad AS (
    SELECT event_type,
           CAST(2.0 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4
    FROM dev GROUP BY event_type
)
SELECT dev.event_type, dev.day_idx, dev.n_events, dev.med2, dev.dev2,
       mad.mad4, (dev.dev2 * 2 > mad.mad4 * 3) AS is_anomaly
FROM dev JOIN mad ON dev.event_type = mad.event_type
ORDER BY dev.event_type, dev.day_idx
"""

RELATIONAL6_ORACLE["q78_streaks"] = """
WITH ev AS (
    SELECT DISTINCT user_id,
           CAST(epoch(date_trunc('day', ts)) // 86400 AS BIGINT) AS day_idx
    FROM events
),
isl AS (
    SELECT user_id, day_idx,
           day_idx - ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY day_idx) AS island
    FROM ev
),
per_streak AS (
    SELECT user_id, island,
           CAST(COUNT(*) AS BIGINT) AS len_days,
           MIN(day_idx) AS start_day
    FROM isl GROUP BY user_id, island
),
summary AS (
    SELECT user_id,
           CAST(SUM(len_days) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len_days) AS BIGINT) AS max_streak_days
    FROM per_streak GROUP BY user_id
),
best AS (
    SELECT p.user_id, CAST(MIN(p.start_day) AS BIGINT)
        AS best_streak_start
    FROM per_streak p JOIN summary s
      ON p.user_id = s.user_id AND p.len_days = s.max_streak_days
    GROUP BY p.user_id
)
SELECT s.user_id, s.n_active_days, s.n_streaks, s.max_streak_days,
       b.best_streak_start
FROM summary s JOIN best b ON s.user_id = b.user_id
ORDER BY s.user_id
"""

from pipegen_spark.queries.relational6 import (  # noqa: E402
    Q79_REGION,
    Q79_SIZE_MIN,
    Q79_TYPE,
    Q80_HI,
    Q80_LO,
    Q80_PREFIX,
    Q80_SHARE_PPM,
)

RELATIONAL6_ORACLE["q79_tpch_min_cost_supp"] = f"""
WITH ps AS (
    SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal,
           n.n_name,
           CAST(MIN({_c(REV)}) AS BIGINT) AS cost_cents
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size >= {Q79_SIZE_MIN}
      AND p.p_type = '{Q79_TYPE}'
      AND r.r_name = '{Q79_REGION}'
    GROUP BY p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal,
             n.n_name
)
SELECT {_c("s_acctbal")} AS acctbal_cents,
       s_name, n_name, p_partkey, p_name, cost_cents
FROM ps
WHERE cost_cents = (
    SELECT MIN(cost_cents) FROM ps p2 WHERE p2.p_partkey = ps.p_partkey
)
ORDER BY acctbal_cents DESC, n_name, s_name, p_partkey
LIMIT 100
"""

RELATIONAL6_ORACLE["q80_tpch_dominant_supplier"] = f"""
WITH pairs AS (
    SELECT l_partkey, l_suppkey,
           CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
               AS supp_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q80_LO}'
      AND l_shipdate < TIMESTAMP '{Q80_HI}'
    GROUP BY l_partkey, l_suppkey
),
totals AS (
    SELECT l_partkey, CAST(SUM(supp_qty) AS BIGINT) AS part_qty
    FROM pairs GROUP BY l_partkey
)
SELECT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (
    SELECT p.l_suppkey
    FROM pairs p
    JOIN totals t ON p.l_partkey = t.l_partkey
    WHERE 1000000 * p.supp_qty > {Q80_SHARE_PPM} * t.part_qty
      AND p.l_partkey IN (
          SELECT p_partkey FROM part
          WHERE p_name LIKE '{Q80_PREFIX}%'
      )
)
ORDER BY s_name
"""

from pipegen_spark.queries.relational6 import Q81_LIMIT, Q81_MIN_SUPPORT

_Q81_CONF = dl.idiv(
    "pair_support * CAST(1000000 AS BIGINT)", "support_a", dl.DUCK
)
_Q81_LIFT = dl.idiv(f"({_Q81_CONF}) * n_orders", "support_b", dl.DUCK)

RELATIONAL6_ORACLE["q81_basket_pairs"] = f"""
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n1 AS (
    SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM items
),
ps AS (
    SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS supp
    FROM items GROUP BY l_partkey
),
pairs AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS pair_support
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    HAVING COUNT(*) >= {Q81_MIN_SUPPORT}
)
SELECT part_a, part_b, pair_support,
       sa.supp AS support_a, sb.supp AS support_b,
       CAST({_Q81_CONF.replace("support_a", "sa.supp")} AS BIGINT)
           AS confidence_ppm,
       CAST({_Q81_LIFT.replace("support_a", "sa.supp").replace("support_b", "sb.supp")}
            AS BIGINT) AS lift_ppm
FROM pairs
JOIN ps sa ON pairs.part_a = sa.l_partkey
JOIN ps sb ON pairs.part_b = sb.l_partkey
CROSS JOIN n1
ORDER BY pair_support DESC, part_a, part_b
LIMIT {Q81_LIMIT}
"""

# q82: the batch LEFT OUTER interval join restricted to the flushed
# region p_ts <= min(max_p, max_c) - 61 min (see the query docstring —
# the watermark-frontier-safe cut both engines compute identically).
RELATIONAL6_ORACLE["q82_stream_outer_join"] = """
    WITH p AS (SELECT event_id, user_id, ts AS p_ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS click_id, user_id AS c_user, ts AS c_ts
          FROM events WHERE event_type = 'click'),
    wm AS (
        SELECT LEAST(
                   (SELECT CAST(epoch_ns(max(p_ts)) // 1000 AS BIGINT)
                    FROM p),
                   (SELECT CAST(epoch_ns(max(c_ts)) // 1000 AS BIGINT)
                    FROM c)
               ) - 3660000000 AS cut_us
    )
    SELECT p.event_id, p.user_id,
           CAST(epoch_ns(p.p_ts) // 1000 AS BIGINT) AS p_ts_us,
           c.click_id,
           CAST(epoch_ns(c.c_ts) // 1000 AS BIGINT) AS c_ts_us,
           (c.click_id IS NOT NULL) AS matched
    FROM p
    LEFT JOIN c
      ON p.user_id = c.c_user
     AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
     AND c.c_ts < p.p_ts
    CROSS JOIN wm
    WHERE CAST(epoch_ns(p.p_ts) // 1000 AS BIGINT) <= wm.cut_us
    ORDER BY p.event_id, c.click_id
"""

# q83: the batch FULL OUTER interval join restricted to the two-sided
# flushed region — matched rows inside BOTH cuts, each NULL class
# inside its own (purchase side: min - 61 min, q82's region; click
# side: min - 121 min, one join-window deeper because an unmatched
# click only flushes when the watermark passes c_ts + 1h). Mirrors the
# query's post-stream CASE filter exactly.
RELATIONAL6_ORACLE["q83_stream_full_outer_join"] = """
    WITH p AS (SELECT event_id, user_id, ts AS p_ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS click_id, user_id AS c_user, ts AS c_ts
          FROM events WHERE event_type = 'click'),
    wm AS (
        SELECT LEAST(
                   (SELECT CAST(epoch_ns(max(p_ts)) // 1000 AS BIGINT)
                    FROM p),
                   (SELECT CAST(epoch_ns(max(c_ts)) // 1000 AS BIGINT)
                    FROM c)
               ) - 3660000000 AS cut_p_us,
               LEAST(
                   (SELECT CAST(epoch_ns(max(p_ts)) // 1000 AS BIGINT)
                    FROM p),
                   (SELECT CAST(epoch_ns(max(c_ts)) // 1000 AS BIGINT)
                    FROM c)
               ) - 7260000000 AS cut_c_us
    ),
    j AS (
        SELECT p.event_id, p.user_id,
               CAST(epoch_ns(p.p_ts) // 1000 AS BIGINT) AS p_ts_us,
               c.click_id, c.c_user,
               CAST(epoch_ns(c.c_ts) // 1000 AS BIGINT) AS c_ts_us
        FROM p
        FULL JOIN c
          ON p.user_id = c.c_user
         AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
         AND c.c_ts < p.p_ts
    )
    SELECT event_id,
           COALESCE(user_id, c_user) AS join_user,
           p_ts_us, click_id, c_ts_us,
           CASE WHEN event_id IS NULL THEN 'click_only'
                WHEN click_id IS NULL THEN 'purchase_only'
                ELSE 'matched' END AS side
    FROM j CROSS JOIN wm
    WHERE (event_id IS NOT NULL AND click_id IS NOT NULL
           AND p_ts_us <= wm.cut_p_us AND c_ts_us <= wm.cut_c_us)
       OR (click_id IS NULL AND p_ts_us <= wm.cut_p_us)
       OR (event_id IS NULL AND c_ts_us <= wm.cut_c_us)
    ORDER BY event_id, click_id
"""
