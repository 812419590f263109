"""Third query tranche: analytic window family, string/date function
families, exact percentiles, and the composed curation-decision pipeline
(the training-data operators chained into one keep/reject output).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pipegen_spark.catalog import table

DEC = "decimal(18,2)"


# --- Q32: exact percentiles --------------------------------------------------
def q32_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`): deterministic, unlike the approx sketches."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90_price"),
            F.expr("percentile(l_discount, 0.25)").alias("p25_disc"),
        )
        .orderBy("l_returnflag")
    )


# --- Q33: analytic window family ---------------------------------------------
def q33_window_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast(DEC))
            .over(w)
            .cast("double")
            .alias("running_total"),
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
            F.percent_rank().over(wp).alias("pr"),
            F.cume_dist().over(wp).alias("cd"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(300)
    )


# --- Q34: string function family ---------------------------------------------
def q34_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.expr("concat_ws('-', p_brand, substr(p_name, 1, 4))").alias("tag"),
            F.expr("lpad(p_brand, 12, '*')").alias("lp"),
            F.expr("rpad(p_brand, 12, '.')").alias("rp"),
            F.expr("replace(p_type, ' ', '_')").alias("typ"),
            F.expr("reverse(p_brand)").alias("rev"),
            F.expr("split_part(p_type, ' ', 1)").alias("first_word"),
            F.expr("CAST(instr(p_name, 'a') AS BIGINT)").alias("pos_a"),
            F.expr("left(p_name, 5)").alias("l5"),
            F.expr("right(p_name, 5)").alias("r5"),
            F.expr("trim(lpad(p_brand, 12, ' '))").alias("trimmed"),
        )
        .orderBy("p_partkey")
        .limit(200)
    )


# --- Q35: date function family -----------------------------------------------
def q35_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        orders.select(
            "o_orderkey",
            F.expr("CAST(year(o_orderdate) AS BIGINT)").alias("y"),
            F.expr("CAST(month(o_orderdate) AS BIGINT)").alias("m"),
            F.expr("CAST(day(o_orderdate) AS BIGINT)").alias("dom"),
            F.expr("CAST(quarter(o_orderdate) AS BIGINT)").alias("q"),
            F.date_add(d, 30).alias("due"),
            F.last_day(d).alias("month_end"),
            F.datediff(F.lit("2025-01-01").cast("date"), d).alias("age_days"),
        )
        .orderBy("o_orderkey")
        .limit(200)
    )


# --- Q37/Q38: temporal joins (as-of, windowed range aggregate) ---------------
def q37_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the most recent preceding click by the same user
    (backward as-of join; distributed union+window shape, one sort-shuffle
    on user_id — see operators/temporal.py)."""
    from pipegen_spark.operators import temporal as tp

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        "ts",
    )
    joined = tp.asof_join(
        purchases,
        clicks,
        by="user_id",
        ts_col="ts",
        tiebreak_cols=("event_id", "click_id"),
        payload_cols=("click_id", "click_ts"),
        payload_prefix="",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.expr("unix_micros(ts)").alias("ts_us"),
        "click_id",
        F.expr("unix_micros(click_ts)").alias("click_ts_us"),
        (F.expr("unix_micros(ts)") - F.expr("unix_micros(click_ts)")).alias(
            "gap_us"
        ),
    ).orderBy("event_id")


def q38_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase: count + cent-sum of the same user's clicks in the
    preceding hour [ts - 1h, ts).

    Formulation: purchases and clicks are two filters of ONE keyed stream,
    so this plans as `temporal.range_agg_self` — a RANGE window frame over
    event-time micros after a single sort-shuffle on user_id, with zero
    per-key row expansion (the join formulation materializes
    |purchases_u| x |clicks_u| pairs per user — quadratic on a hot user
    and 6x slower at sf0.1). Asserted join-free in test_plan_audit.

    Output surface: `click_value` is a BIGINT count of CENTS
    (dialect.cents — half-up in pure double arithmetic, then integer):
    rounds 2-3 proved a DECIMAL surface can hash-diverge across driver
    environments even when byte-exact locally; an int64 cannot.
    """
    from pipegen_spark.functions import dialect as dl
    from pipegen_spark.operators import temporal as tp

    ev = table(spark, sf_dir, "events")
    is_click = F.col("event_type") == "click"
    base = ev.filter(
        F.col("event_type").isin("purchase", "click")
    ).select(
        "event_id",
        "user_id",
        "ts",
        (F.col("event_type") == "purchase").alias("_is_purchase"),
        F.when(is_click, F.lit(1)).otherwise(F.lit(0)).alias("_cnt"),
        F.when(is_click, F.expr(dl.cents("value", dl.SPARK)))
        .otherwise(F.lit(0).cast("bigint"))
        .alias("_val"),
    )
    out = tp.range_agg_self(
        base,
        by="user_id",
        ts_col="ts",
        is_left=F.col("_is_purchase"),
        sum_cols={"_n_clicks": F.col("_cnt"), "_click_value": F.col("_val")},
        lower_micros=-3_600_000_000,
        upper_micros=-1,
    )
    return out.select(
        "event_id",
        "user_id",
        F.coalesce(F.col("_n_clicks"), F.lit(0)).cast("bigint").alias(
            "n_clicks"
        ),
        F.coalesce(F.col("_click_value"), F.lit(0)).cast("bigint").alias(
            "click_value"
        ),
    ).orderBy("event_id")


# --- Q39: STREAMING sessionization (Structured Streaming superset) -----------
def q39_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-STREAM sessionization, end-to-end distributed: readStream over
    events.parquet → the custom arbitrary-stateful sessionizer
    (`streaming/stateful.py`, applyInPandasWithState, O(1) state/key) in
    UPDATE mode (each batch emits closed sessions plus the current extent
    of touched open sessions) → foreachBatch into the idempotent file
    sink, batch-stamped, executor-side — no driver-bound memory/complete
    sink anywhere in the pipeline → final compaction read
    (`sink.compact_session_updates`: a session row is superseded iff a
    later batch emitted an overlapping interval for the same user).

    On a finite input the compacted update stream equals batch
    sessionization, which is what the gaps-and-islands oracle computes —
    so the streaming path gets a real hash-checked correctness row
    (SURVEY §2C), not just unit tests. At scale this is also the
    production shape: update emissions are proportional to CHANGED state
    per batch (complete mode would re-emit ALL state every batch), the
    sink write is distributed, and the compaction joins on the session
    key. `session_window`-style bounds are restored by adding the gap to
    the operator's last-event `session_end`."""
    import tempfile

    from pipegen_spark.streaming.filesource import (
        events_file_stream,
        session_state_partitions,
    )
    from pipegen_spark.streaming.sink import (
        compact_session_updates,
        idempotent_dir_sink,
        read_committed,
    )
    from pipegen_spark.streaming.stateful import sessionize_stream

    stream = events_file_stream(spark, sf_dir)
    sessions = sessionize_stream(
        stream.select("user_id", "ts"),
        gap="30 minutes",
        emit_open=True,
    )
    work_dir = tempfile.mkdtemp(prefix="pipegen_q39_")
    sink_dir = os.path.join(work_dir, "out")
    # Session state scales with event volume: size the state shuffle
    # from the events table, not a constant (r14 sf1 sweep — see
    # session_state_partitions; at sf0.1 this resolves to the same n=8
    # the r13 A/B picked, so bench comparability is unchanged).
    with session_state_partitions(spark, sf_dir):
        q = (
            sessions.writeStream.foreachBatch(
                idempotent_dir_sink(sink_dir, stamp_batch=True)
            )
            .outputMode("update")
            .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    final = compact_session_updates(
        read_committed(spark, sink_dir),
        by="user_id",
        start_col="session_start",
        end_col="session_end",
    )
    return final.select(
        "user_id",
        "session_start",
        F.expr("session_end + INTERVAL 30 MINUTE").alias("session_end"),
        F.col("n_events").cast("long").alias("n_events"),
    ).orderBy("user_id", "session_start").limit(500)


# --- Q40: hopping (sliding) window aggregate ---------------------------------
def q40_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOP/sliding window: 30-minute windows every 15 minutes — each event
    lands in size/slide = 2 windows. Spark's window(ts, size, slide)
    explodes to the overlapping windows before a single hash-agg shuffle;
    the oracle derives the same window starts arithmetically
    (floor(us/slide)*slide - k*slide for k in 0..size/slide-1, epoch-
    aligned in UTC exactly like Spark's window())."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "30 minutes", "15 minutes").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n_events",
        )
        .orderBy("win_start", "event_type")
    )


# --- Q41: STREAMING stream-stream interval join ------------------------------
def q41_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream INNER interval join (Structured Streaming superset):
    purchases stream ⋈ clicks stream on user with the click in the hour
    before the purchase, both sides watermarked (state-cleanup bound).
    Inner-join emission is watermark-independent, so on a finite input the
    appended result equals the batch interval join the oracle runs."""
    from pipegen_spark.streaming.filesource import events_file_stream

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
        "inner",
    ).select(
        "event_id",
        "user_id",
        F.expr("unix_micros(p_ts)").alias("p_ts_us"),
        "click_id",
        F.expr("unix_micros(c_ts)").alias("c_ts_us"),
    )
    from pipegen_spark.streaming.filesource import (
        run_to_file_sink,
        state_partitions,
    )

    with state_partitions(spark, n=4):
        out = run_to_file_sink(spark, joined, "pipegen_q41_")
    return out.orderBy("event_id", "click_id")


# --- Q36: composed curation decision (the training-data story) ---------------
def q36_curation_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operators composed the way a 100 TB curation pass runs them:
    exact-dup flag + quality score + language ID → one keep/reject column.
    Map-only except the dedup window (hash-partitioned by content hash)."""
    from pipegen_spark.operators import dedup as dd
    from pipegen_spark.operators import text as tx

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    flagged = dd.exact_dedup(docs, "text", "doc_id")
    scored = tx.with_quality(flagged, "text")
    labeled = tx.with_langid(scored.select(
        "doc_id", "text", "is_dup", "quality_score", "n_tokens"
    ), "text")
    keep = (
        (~F.col("is_dup"))
        & (F.col("quality_score") >= 0.35)
        & (F.col("n_tokens") >= 20)
    )
    return (
        labeled.select(
            "doc_id",
            "is_dup",
            "quality_score",
            "n_tokens",
            "pred_lang",
            keep.alias("keep"),
        )
        .orderBy("doc_id")
    )
