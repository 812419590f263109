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


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(5, 3), (0, 255), (255, 0)], "x long, y long"
    )
    rows = {
        (r["x"], r["y"]): r["zkey"]
        for r in layout.with_zorder_key(df, "x", "y").collect()
    }

    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert rows[(5, 3)] == morton(5, 3) == 27
    assert rows[(0, 255)] == morton(0, 255)
    assert rows[(255, 0)] == morton(255, 0)


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    # 32x32 grid; after the z-order write each file owns a zkey band, so
    # a narrow filter on EITHER x or y should touch a strict subset of
    # the files.
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x long, y long")
    path = str(tmp_path / "zordered")
    layout.zorder_write(df, path, "x", "y", n_files=8)

    import glob
    import pyarrow.parquet as pq

    files = sorted(glob.glob(path + "/part-*.parquet"))
    assert len(files) >= 4

    def touched(pred):
        hit = 0
        for f in files:
            t = pq.read_table(f)
            xs = t.column("x").to_pylist()
            ys = t.column("y").to_pylist()
            if any(pred(x, y) for x, y in zip(xs, ys)):
                hit += 1
        return hit

    # Narrow ranges in each dimension prune files (min/max stats would
    # skip the untouched ones).
    assert touched(lambda x, y: x < 4) < len(files)
    assert touched(lambda x, y: y < 4) < len(files)
