"""Temporal join operators Spark lacks natively: as-of join and
windowed range join/aggregate.

Spark-first shapes (no UDFs, no driver loops):

- `asof_join` is the classic distributed as-of: union both sides with a
  tag, ONE shuffle+sort per partition key, then `last(..., ignorenulls)`
  over a rows-frame window carries the most recent right-side payload
  forward onto each left row. Cost is a single sort-shuffle on the `by`
  key regardless of how many right rows precede each left row — against
  the naive range-join-then-argmax (a join blow-up plus a second
  aggregation shuffle) this is strictly less data movement, and it's the
  standard shape pandas' merge_asof distributes to.
- `range_agg_self` is the scale-safe trailing-interval aggregate for the
  common case where "left" and "right" are two filters of the SAME keyed
  stream: one scan, a RANGE window frame over event-time micros, ONE
  sort-shuffle on the key, zero row expansion. A hot key costs
  O(rows log rows) in the partition sort instead of the join
  formulation's O(left x right) pair blow-up.
- `range_agg` is the genuinely-two-stream fallback: an equi-join on the
  partition key with the time-range predicate applied as a post-join
  filter. Catalyst plans a hash join on the key and AQE's skew handling
  splits hot keys, but the per-key pair space DOES materialize between
  the join and the aggregate — quadratic on a hot key. Callers whose
  inputs share a source should use `range_agg_self`; callers that can
  bound the per-key right-side cardinality can pass
  `max_right_per_key` to fail fast instead of degrading.

Semantics of asof_join (backward): for each left row, the right row with
the greatest ts <= left.ts within the same `by` group; ts ties include the
right row (<=), multiple right rows on the same ts resolve to the largest
tiebreaker. Deterministic by construction: the window order
(ts, side-tag, tiebreaker) is a total order.

Reference parity: the reference (mcolomerc/pipegen) expresses no as-of /
range joins (its SQL surface is FlinkSQL pass-through); these extend the
engine per SURVEY.md §2B [EXT].
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str,
    tiebreak_cols: tuple[str, str],
    payload_cols: tuple[str, ...],
    payload_prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join. Returns left rows + `{prefix}{payload}` columns
    from the matched right row (NULL where no right row precedes).

    `tiebreak_cols` is a (left, right) pair of unique numeric columns that
    totalize the window order (the right one also breaks equal-ts ties:
    largest wins). Left rows keep all their columns. One shuffle+sort on
    `by`.
    """
    l_tb, r_tb = tiebreak_cols
    l_keep = [c for c in left.columns if c not in (by, ts_col)]
    lt = left.select(
        F.col(by).alias("_by"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_il"),
        F.col(l_tb).cast("long").alias("_tb"),
        *[F.col(c).alias(f"_l_{c}") for c in l_keep],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in payload_cols],
    )
    rt = right.select(
        F.col(by).alias("_by"),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_il"),
        F.col(r_tb).cast("long").alias("_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in l_keep],
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
    )
    w = (
        Window.partitionBy("_by")
        .orderBy("_ts", "_il", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(
                f"{payload_prefix}{c}"
            )
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("_il") == 1).select(
        F.col("_by").alias(by),
        F.col("_ts").alias(ts_col),
        *[F.col(f"_l_{c}").alias(c) for c in l_keep],
        *[F.col(f"{payload_prefix}{c}") for c in payload_cols],
    )


def range_agg_self(
    df: DataFrame,
    by: str,
    ts_col: str,
    is_left: Column,
    sum_cols: dict[str, Column],
    lower_micros: int,
    upper_micros: int = -1,
) -> DataFrame:
    """Trailing-interval aggregate when both sides derive from one keyed
    stream: for each row where `is_left` holds, sum each `sum_cols`
    expression over the rows of the same `by` group whose event time lies
    in [ts + lower_micros, ts + upper_micros] microseconds (the default
    upper bound -1 means "strictly before", matching
    `right.ts < left.ts` join semantics).

    Contribution expressions must evaluate to 0/NULL on non-right rows
    (left rows sit inside their own frame's key group, so e.g. a click
    count is `WHEN is_click THEN 1 ELSE 0`). An empty frame sums to NULL —
    coalesce downstream if 0 is wanted.

    Physical shape: ONE Exchange(hashpartitioning(by)) + per-partition
    sort + Window. No join, no per-key row expansion — the 100 TB-safe
    plan for q38-style "activity in the preceding hour" aggregates
    (the join formulation is quadratic on a hot key; measured 6.3 s -> ~1 s
    at sf0.1 when q38 moved here).
    """
    base = df.withColumn("_ts_us", F.expr(f"unix_micros({ts_col})"))
    w = (
        Window.partitionBy(by)
        .orderBy("_ts_us")
        .rangeBetween(lower_micros, upper_micros)
    )
    out = base.select(
        "*",
        *[F.sum(expr).over(w).alias(name) for name, expr in sum_cols.items()],
    )
    return out.filter(is_left).drop("_ts_us")


def range_agg(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    window_expr: str,
    aggs: list[Column],
    max_right_per_key: int | None = None,
) -> DataFrame:
    """Per-left-row aggregate of right rows with
    left.ts - window <= right.ts < left.ts within the same `by` group.

    `window_expr` is a SQL interval literal (e.g. "INTERVAL 1 HOUR").
    Left join semantics: left rows with no in-window right rows survive
    with empty-aggregate values (COUNT 0 / NULL sums — coalesce in `aggs`).

    Contract notes:
    - Duplicate left rows are preserved: each left ROW (not each distinct
      left tuple) gets its own output row, via an internal
      monotonically_increasing_id group key.
    - Point `aggs` at RIGHT-side columns (e.g. ``F.count("r.c_ts")``, not
      ``F.count("*")``): the left join emits one all-NULL right row for
      match-less left rows, which a * count would count as 1.
    - The join materializes up to |left_k| x |right_k| rows per key before
      aggregating — quadratic on a hot key. When both inputs derive from
      one stream use `range_agg_self` (single sort-shuffle) instead;
      otherwise `max_right_per_key` runs a cheap pre-count (a per-key
      partial-aggregate job over the right side's key column only) and
      fails fast if any key would expand past the bound.
    """
    if max_right_per_key is not None:
        top = (
            right.select(by).groupBy(by).count().agg(F.max("count")).first()[0]
        )
        if top is not None and top > max_right_per_key:
            raise ValueError(
                f"range_agg: hottest {by!r} key has {top} right rows "
                f"(> bound {max_right_per_key}); the join formulation would "
                "expand quadratically — use range_agg_self or raise the bound"
            )
    l = left.withColumn("_lrow", F.monotonically_increasing_id()).alias("l")
    r = right.alias("r")
    cond = (
        (F.col(f"l.{by}") == F.col(f"r.{by}"))
        & (F.col(f"r.{right_ts}") >= F.expr(f"l.{left_ts} - {window_expr}"))
        & (F.col(f"r.{right_ts}") < F.col(f"l.{left_ts}"))
    )
    grouped = (
        l.join(r, cond, "left")
        .groupBy(
            F.col("l._lrow"), *[F.col(f"l.{c}") for c in left.columns]
        )
        .agg(*aggs)
        .drop("_lrow")
    )
    return grouped


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str,
    tiebreak_cols: tuple[str, str],
    payload_cols: tuple[str, ...],
    payload_prefix: str = "r_",
) -> DataFrame:
    """FORWARD as-of join: for each left row, the EARLIEST right row of
    the same `by` key with ts strictly AFTER the left ts (NULL when none
    follows) — next-event semantics (time-to-conversion, next-restock).

    Same distributed shape as the backward `asof_join`: union both
    sides, ONE sort-shuffle on `by`, and an ignore-nulls carry — here
    over the DESCENDING time order, where "last non-null preceding"
    is exactly the nearest later right row. Equal timestamps do NOT
    match (left sorts before right at the same ts); among right rows
    sharing the match ts the smallest tiebreak id wins.
    """
    l_tb, r_tb = tiebreak_cols
    l_keep = [c for c in left.columns if c not in (by, ts_col)]
    lt = left.select(
        F.col(by).alias("_by"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_il"),
        F.col(l_tb).cast("long").alias("_tb"),
        *[F.col(c).alias(f"_l_{c}") for c in l_keep],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in payload_cols],
    )
    rt = right.select(
        F.col(by).alias("_by"),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_il"),
        F.col(r_tb).cast("long").alias("_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in l_keep],
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
    )
    w = (
        Window.partitionBy("_by")
        .orderBy(
            F.col("_ts").desc(), F.col("_il").desc(), F.col("_tb").desc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(
                f"{payload_prefix}{c}"
            )
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("_il") == 1).select(
        F.col("_by").alias(by),
        F.col("_ts").alias(ts_col),
        *[F.col(f"_l_{c}").alias(c) for c in l_keep],
        *[F.col(f"{payload_prefix}{c}") for c in payload_cols],
    )
