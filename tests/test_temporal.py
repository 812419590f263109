"""Unit tests for as-of join and range aggregate (operators/temporal.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as hst
from pyspark.sql import functions as F

from pipegen_spark.operators import temporal as tp


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (10, 1, _ts("2024-01-01T10:00:00")),
            (11, 1, _ts("2024-01-01T12:00:00")),
            (12, 2, _ts("2024-01-01T09:00:00")),  # no preceding right row
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01T09:30:00")),
            (1, 101, _ts("2024-01-01T10:00:00")),  # equal ts -> matches (<=)
            (1, 102, _ts("2024-01-01T10:00:00")),  # tie -> larger id wins
            (1, 103, _ts("2024-01-01T11:00:00")),
            (2, 104, _ts("2024-01-01T09:30:00")),  # after left row of user 2
        ],
        "user_id long, click_id long, ts timestamp",
    )
    return left, right


def test_asof_backward_match_ties_and_nulls(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: r
        for r in tp.asof_join(
            left,
            right.withColumn("click_ts", F.col("ts")),
            by="user_id",
            ts_col="ts",
            tiebreak_cols=("event_id", "click_id"),
            payload_cols=("click_id", "click_ts"),
            payload_prefix="",
        ).collect()
    }
    # equal-ts rows match; among the 10:00 tie, click_id 102 (larger) wins
    assert out[10]["click_id"] == 102
    # most recent preceding click for the 12:00 purchase is 11:00
    assert out[11]["click_id"] == 103
    # user 2's only click is AFTER the purchase -> no match
    assert out[12]["click_id"] is None and out[12]["click_ts"] is None
    # left columns survive
    assert out[11]["user_id"] == 1


def test_asof_plan_has_single_shuffle(spark):
    left, right = _frames(spark)
    out = tp.asof_join(
        left,
        right.withColumn("click_ts", F.col("ts")),
        by="user_id",
        ts_col="ts",
        tiebreak_cols=("event_id", "click_id"),
        payload_cols=("click_id",),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union + window => exactly one Exchange (the partitionBy(user_id) sort)
    assert plan.count("Exchange") == 1, plan


def test_range_agg_counts_window_only(spark):
    left, right = _frames(spark)
    clicks = right.select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.lit(1.0).cast("decimal(18,2)").alias("c_value"),
    )
    out = {
        r["event_id"]: r
        for r in tp.range_agg(
            left,
            clicks,
            by="user_id",
            left_ts="ts",
            right_ts="c_ts",
            window_expr="INTERVAL 1 HOUR",
            aggs=[
                F.count(F.col("r.c_ts")).alias("n_clicks"),
                F.coalesce(F.sum("r.c_value"), F.lit(0))
                .cast("decimal(18,2)")
                .alias("v"),
            ],
        ).collect()
    }
    # 10:00 purchase: only the 09:30 click is in [09:00, 10:00)
    assert out[10]["n_clicks"] == 1
    # 12:00 purchase: the 11:00 click is in [11:00, 12:00)
    assert out[11]["n_clicks"] == 1 and float(out[11]["v"]) == 1.0
    # user 2: click at 09:30 is not BEFORE the 09:00 purchase
    assert out[12]["n_clicks"] == 0 and float(out[12]["v"]) == 0.0


def _self_frame(spark):
    """One keyed stream holding both purchases and clicks (q38 shape)."""
    return spark.createDataFrame(
        [
            (10, 1, _ts("2024-01-01T10:00:00"), "purchase", 0.0),
            (11, 1, _ts("2024-01-01T12:00:00"), "purchase", 0.0),
            (12, 2, _ts("2024-01-01T09:00:00"), "purchase", 0.0),
            (100, 1, _ts("2024-01-01T09:30:00"), "click", 1.0),
            (101, 1, _ts("2024-01-01T10:00:00"), "click", 1.0),  # == p.ts
            (103, 1, _ts("2024-01-01T11:00:00"), "click", 2.5),
            (104, 2, _ts("2024-01-01T09:30:00"), "click", 1.0),  # after p
        ],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )


def test_range_agg_self_matches_join_semantics(spark):
    ev = _self_frame(spark)
    is_click = F.col("event_type") == "click"
    base = ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.col("event_type") == "purchase").alias("_is_p"),
        F.when(is_click, F.lit(1)).otherwise(F.lit(0)).alias("_cnt"),
        F.when(is_click, (F.col("value") * 100).cast("bigint"))
        .otherwise(F.lit(0))
        .alias("_val"),
    )
    out = {
        r["event_id"]: r
        for r in tp.range_agg_self(
            base,
            by="user_id",
            ts_col="ts",
            is_left=F.col("_is_p"),
            sum_cols={"n": F.col("_cnt"), "v": F.col("_val")},
            lower_micros=-3_600_000_000,
            upper_micros=-1,
        ).collect()
    }
    assert set(out) == {10, 11, 12}  # purchases only
    # 10:00 purchase: 09:30 click in frame; the 10:00 click is EXCLUDED
    # (strictly-before upper bound -1 us).
    assert out[10]["n"] == 1 and out[10]["v"] == 100
    # 12:00 purchase: only the 11:00 click (11:00 >= 12:00 - 1h inclusive).
    assert out[11]["n"] == 1 and out[11]["v"] == 250
    # user 2: click after the purchase -> empty frame -> NULL sums.
    assert out[12]["n"] is None and out[12]["v"] is None


def test_range_agg_self_single_sort_shuffle(spark):
    ev = _self_frame(spark)
    out = tp.range_agg_self(
        ev.withColumn("_c", F.lit(1)),
        by="user_id",
        ts_col="ts",
        is_left=F.col("event_type") == "purchase",
        sum_cols={"n": F.col("_c")},
        lower_micros=-3_600_000_000,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1, plan


# Tie-heavy offsets: multiples of 15 min force frequent exact collisions
# at the frame bounds (ts, ts-1h) where off-by-one-microsecond bugs live.
_OFFSETS = [0, 900, 1800, 3600, 4500, 5400, 7200, 7201]

_events_strategy = hst.lists(
    hst.tuples(
        hst.integers(0, 3),              # user_id
        hst.sampled_from(_OFFSETS),      # ts offset seconds
        hst.booleans(),                  # is purchase
        hst.integers(0, 1000),           # click value (cents)
    ),
    min_size=1,
    max_size=40,
)


@given(events=_events_strategy)
@settings(max_examples=12, deadline=None)
def test_range_agg_self_matches_bruteforce_model(spark, events):
    """The window-frame formulation must equal the O(n^2) reference model
    (count + sum of same-user clicks with p.ts - 1h <= c.ts < p.ts),
    including boundary ties and duplicate timestamps."""
    base_ts = datetime(2024, 1, 1)
    rows = [
        (i, u, base_ts + timedelta(seconds=off), bool(p), v)
        for i, (u, off, p, v) in enumerate(events)
    ]
    expected = {}
    for i, u, ts, is_p, _v in rows:
        if not is_p:
            continue
        lo = ts - timedelta(hours=1)
        hits = [
            v2
            for (_j, u2, ts2, p2, v2) in rows
            if u2 == u and not p2 and lo <= ts2 < ts
        ]
        expected[i] = (len(hits), sum(hits) if hits else None)
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, is_p boolean, v long"
    )
    out = tp.range_agg_self(
        df.select(
            "event_id",
            "user_id",
            "ts",
            "is_p",
            F.when(~F.col("is_p"), F.lit(1)).otherwise(0).alias("_c"),
            F.when(~F.col("is_p"), F.col("v")).otherwise(0).alias("_v"),
        ),
        by="user_id",
        ts_col="ts",
        is_left=F.col("is_p"),
        sum_cols={"n": F.col("_c"), "val": F.col("_v")},
        lower_micros=-3_600_000_000,
        upper_micros=-1,
    ).collect()
    got = {
        r["event_id"]: (r["n"] or 0, r["val"] if (r["n"] or 0) else None)
        for r in out
    }
    assert got == expected


def test_range_agg_expansion_guard(spark):
    left, right = _frames(spark)
    clicks = right.select("user_id", F.col("ts").alias("c_ts"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="quadratic"):
        tp.range_agg(
            left,
            clicks,
            by="user_id",
            left_ts="ts",
            right_ts="c_ts",
            window_expr="INTERVAL 1 HOUR",
            aggs=[F.count(F.col("r.c_ts")).alias("n")],
            max_right_per_key=2,  # user 1 has 4 clicks
        )
    # A satisfied bound must not change results.
    rows = tp.range_agg(
        left,
        clicks,
        by="user_id",
        left_ts="ts",
        right_ts="c_ts",
        window_expr="INTERVAL 1 HOUR",
        aggs=[F.count(F.col("r.c_ts")).alias("n")],
        max_right_per_key=10,
    ).collect()
    assert len(rows) == 3


def test_range_agg_preserves_duplicate_left_rows(spark):
    """Two identical left rows must each produce their own output row with
    UN-doubled right-side aggregates (internal row-id group key)."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:00:00")],
        "user_id int, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00"), (1, "2024-01-01 09:45:00")],
        "user_id int, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("c_ts"))
    rows = tp.range_agg(
        left,
        right,
        by="user_id",
        left_ts="ts",
        right_ts="c_ts",
        window_expr="INTERVAL 1 HOUR",
        aggs=[F.count(F.col("r.c_ts")).alias("n")],
    ).collect()
    assert len(rows) == 2
    assert [r["n"] for r in rows] == [2, 2]


def test_asof_forward_next_event_semantics(spark):
    from pipegen_spark.operators import temporal as tp
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def t(sec):
        return t0 + dt.timedelta(seconds=sec)

    left = spark.createDataFrame(
        [(1, 7, t(10)), (2, 7, t(20)), (3, 7, t(99)), (4, 8, t(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        # user 7: purchases at 15 and 20 (equal-ts to click 2) and 30;
        # user 8: none after its click.
        [(7, 100, t(15), t(15)), (7, 101, t(20), t(20)),
         (7, 102, t(30), t(30)), (8, 103, t(1), t(1))],
        "user_id long, purchase_id long, purchase_ts timestamp, ts timestamp",
    )
    out = {
        r["event_id"]: r["purchase_id"]
        for r in tp.asof_join_forward(
            left, right, by="user_id", ts_col="ts",
            tiebreak_cols=("event_id", "purchase_id"),
            payload_cols=("purchase_id",), payload_prefix="",
        ).collect()
    }
    assert out[1] == 100  # next after t10 is t15
    assert out[2] == 102  # equal ts (t20) does NOT match -> t30
    assert out[3] is None  # nothing after t99
    assert out[4] is None  # user 8's only purchase precedes the click
