"""DuckDB oracles for the third query tranche. The curation oracle is
assembled from the same dual-dialect text expressions the Spark side uses."""

from pipegen_spark.functions import dialect as dl
from pipegen_spark.operators import text as tx


def _curation_sql() -> str:
    q = tx.quality_exprs("text", dl.DUCK)
    lang = tx.langid_exprs("text", dl.DUCK)
    cols = ",\n               ".join(
        [
            f"{q['n_tokens']} AS n_tokens",
            f"{q['quality_score']} AS quality_score",
        ]
        + [f"{e} AS {n}" for n, e in lang.items()]
    )
    return f"""
    WITH base AS (
        SELECT doc_id, text,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) > 1
                   AS is_dup
        FROM documents
    ),
    scored AS (
        SELECT doc_id, is_dup,
               {cols}
        FROM base
    )
    SELECT doc_id, is_dup, quality_score, n_tokens, pred_lang,
           ((NOT is_dup) AND quality_score >= 0.35 AND n_tokens >= 20) AS keep
    FROM scored ORDER BY doc_id
    """


RELATIONAL3_ORACLE: dict[str, str] = {
    "q32_percentiles": """
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.5) AS median_qty,
               quantile_cont(l_extendedprice, 0.9) AS p90_price,
               quantile_cont(l_discount, 0.25) AS p25_disc
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q33_window_family": """
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
                   AS running_total,
               LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey)
                   AS prev_price,
               LEAD(o_totalprice) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey)
                   AS next_price,
               PERCENT_RANK() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice, o_orderkey) AS pr,
               CUME_DIST() OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_totalprice, o_orderkey) AS cd
        FROM orders
        ORDER BY o_custkey, o_orderkey LIMIT 300
    """,
    "q34_string_funcs2": """
        SELECT p_partkey,
               concat_ws('-', p_brand, substr(p_name, 1, 4)) AS tag,
               lpad(p_brand, 12, '*') AS lp,
               rpad(p_brand, 12, '.') AS rp,
               replace(p_type, ' ', '_') AS typ,
               reverse(p_brand) AS rev,
               split_part(p_type, ' ', 1) AS first_word,
               CAST(instr(p_name, 'a') AS BIGINT) AS pos_a,
               left(p_name, 5) AS l5,
               right(p_name, 5) AS r5,
               trim(lpad(p_brand, 12, ' ')) AS trimmed
        FROM part ORDER BY p_partkey LIMIT 200
    """,
    "q35_date_funcs": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS y,
               CAST(month(o_orderdate) AS BIGINT) AS m,
               CAST(day(o_orderdate) AS BIGINT) AS dom,
               CAST(quarter(o_orderdate) AS BIGINT) AS q,
               CAST(o_orderdate AS DATE) + 30 AS due,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(DATE '2025-01-01' - CAST(o_orderdate AS DATE) AS INT)
                   AS age_days
        FROM orders ORDER BY o_orderkey LIMIT 200
    """,
    "q36_curation_decision": _curation_sql(),
    # Backward as-of join as portable window SQL (union + carry-forward).
    # epoch_ns // 1000 floor-matches the engine's nanos->micros ingest
    # truncation (catalog.py: timestamp_micros(ts div 1000)).
    "q37_asof_join": """
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
        c AS (SELECT event_id AS click_id, user_id, ts FROM events
              WHERE event_type = 'click'),
        u AS (
            SELECT user_id, ts, 1 AS il, event_id AS tb,
                   event_id, NULL::BIGINT AS cid, NULL::TIMESTAMP_NS AS cts
            FROM p
            UNION ALL
            SELECT user_id, ts, 0, click_id, NULL, click_id, ts FROM c
        ),
        m AS (
            SELECT user_id, ts, il, event_id,
                   last_value(cid IGNORE NULLS) OVER w AS click_id,
                   last_value(cts IGNORE NULLS) OVER w AS click_ts
            FROM u
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, il, tb
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT event_id, user_id,
               CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us,
               click_id,
               CAST(epoch_ns(click_ts) // 1000 AS BIGINT) AS click_ts_us,
               CAST(epoch_ns(ts) // 1000 - epoch_ns(click_ts) // 1000
                    AS BIGINT) AS gap_us
        FROM m WHERE il = 1 ORDER BY event_id
    """,
    # Batch oracle for the stream-stream interval join: inner-join
    # emission is watermark-independent on finite input.
    "q41_stream_join": """
        WITH p AS (SELECT event_id, user_id, ts AS p_ts FROM events
                   WHERE event_type = 'purchase'),
        c AS (SELECT event_id AS click_id, user_id AS c_user, ts AS c_ts
              FROM events WHERE event_type = 'click')
        SELECT p.event_id, p.user_id,
               CAST(epoch_ns(p.p_ts) // 1000 AS BIGINT) AS p_ts_us,
               c.click_id,
               CAST(epoch_ns(c.c_ts) // 1000 AS BIGINT) AS c_ts_us
        FROM p JOIN c
          ON p.user_id = c.c_user
         AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
         AND c.c_ts < p.p_ts
        ORDER BY p.event_id, c.click_id
    """,
    # Hopping windows arithmetically: 15 min slide = 900_000_000 us,
    # 30 min size = 1_800_000_000 us; every event belongs to exactly
    # size/slide = 2 windows with starts floor(us/slide)*slide - k*slide.
    "q40_hopping_window": """
        WITH e AS (
            SELECT event_type, epoch_ns(ts) // 1000 AS us FROM events
        ),
        w AS (
            SELECT event_type,
                   (us // 900000000) * 900000000 - k.k * 900000000
                       AS start_us
            FROM e CROSS JOIN (SELECT unnest(range(0, 2)) AS k) k
        )
        SELECT make_timestamp(start_us) AS win_start,
               make_timestamp(start_us + 1800000000) AS win_end,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM w GROUP BY start_us, event_type
        ORDER BY win_start, event_type
    """,
    # Batch-parity oracle for the STREAMING sessionization: complete-mode
    # session_window over a finite file stream equals batch gaps-and-islands.
    # New-session predicate is diff >= gap (Spark: event joins a session iff
    # ts < previous ts + gap); session_end = last event ts + gap.
    "q39_stream_session": """
        WITH e AS (
            SELECT user_id, ts,
                   CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             IS NULL
                        OR ts - LAG(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts)
                             >= INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        s AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING)
                       AS session_no
            FROM e
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id, session_no
        ORDER BY user_id, session_start LIMIT 500
    """,
    # click_value is a BIGINT cent count (dialect.cents): the integer
    # surface cannot hash-diverge on decimal formatting or last-ulp
    # rounding across engine builds (the rounds-2/3 driver red).
    "q38_range_agg": f"""
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
        c AS (SELECT user_id, ts AS c_ts,
                     {dl.cents("value", dl.DUCK)} AS c_value
              FROM events WHERE event_type = 'click')
        SELECT p.event_id, p.user_id,
               CAST(COUNT(c.c_ts) AS BIGINT) AS n_clicks,
               CAST(COALESCE(SUM(c.c_value), 0) AS BIGINT) AS click_value
        FROM p LEFT JOIN c
          ON p.user_id = c.user_id
         AND c.c_ts >= p.ts - INTERVAL 1 HOUR
         AND c.c_ts < p.ts
        GROUP BY p.event_id, p.user_id
        ORDER BY p.event_id
    """,
}
