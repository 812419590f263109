"""Physical layout: bucketed co-located joins (no Exchange), partitioned
writes (directory pruning), partition sizing guidance."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

from pipegen_spark.catalog import table
from pipegen_spark.plans import layout

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark):
    orders = table(spark, SF, "orders")
    li = table(spark, SF, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    layout.write_bucketed(orders, "orders_b", ["o_orderkey"], 4)
    layout.write_bucketed(li, "lineitem_b", ["o_orderkey"], 4)
    joined = layout.shuffle_free_join(
        spark, "orders_b", "lineitem_b", ["o_orderkey"]
    )
    # disable broadcast so the join is sort-merge; bucketed layout means no
    # shuffle on either side
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_unbucketed_join_does_exchange(spark):
    """Control: same join without bucketing shuffles both sides."""
    orders = table(spark, SF, "orders")
    li = table(spark, SF, "lineitem")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(li, orders.o_orderkey == li.l_orderkey)
        assert "Exchange" in _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_partitioned_write_prunes(spark, tmp_path):
    ev = table(spark, SF, "events").withColumn(
        "day", F.to_date("ts")
    )
    out = str(tmp_path / "ev-part")
    layout.write_partitioned(ev, out, ["day"])
    back = spark.read.parquet(out).filter(F.col("day") == "2024-01-01")
    plan = _plan(back)
    # partition filter present and data read is restricted to one partition
    assert "PartitionFilters" in plan
    assert back.count() > 0
    days = [
        d for d in __import__("os").listdir(out) if d.startswith("day=")
    ]
    assert len(days) > 1  # multiple partitions existed; we read one


def test_salted_join_matches_plain_join(spark):
    """Salting changes the shuffle distribution, never the result."""
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey")
    salted = layout.salted_join(li, orders, "l_orderkey", n_salts=4)
    assert salted.count() == plain.count()
    a = plain.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).collect()
    b = salted.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).collect()
    assert a == b


def test_recommend_shuffle_partitions():
    mb = 1024 * 1024
    assert layout.recommend_shuffle_partitions(0) == 1
    assert layout.recommend_shuffle_partitions(128 * mb) == 1
    assert layout.recommend_shuffle_partitions(129 * mb) == 2
    assert layout.recommend_shuffle_partitions(10 * 1024 * mb) == 80
