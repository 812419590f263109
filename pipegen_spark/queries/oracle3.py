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
}
