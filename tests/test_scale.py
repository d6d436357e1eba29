"""Scale-primitive tests: bucketed join elides exchanges; salted join
preserves results under skew; throughput anchor correctness."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from conduit_spark.functions.scale import salted_join, write_bucketed
from conduit_spark.sources.tables import load_table


def test_salted_join_matches_plain_join(spark):
    # skewed left: one hot key with 10k rows, plus a long tail
    left = spark.range(10_000).select(F.lit(7).alias("k"), F.col("id").alias("v")).unionAll(
        spark.range(100).select((F.col("id") % 50).alias("k"), F.col("id").alias("v"))
    )
    right = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    plain = left.join(right, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    ).collect()[0]
    salted = salted_join(left, right, "k", salt=8).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    ).collect()[0]
    assert (plain.n, plain.sv, plain.sw) == (salted.n, salted.sv, salted.sw)
    assert plain.n == 10_000 + 100  # hot key (10k×1) + tail (100×1)


def test_salted_join_left_outer(spark):
    left = spark.range(20).select((F.col("id") % 5).alias("k"), F.col("id").alias("v"))
    right = spark.range(2).select(F.col("id").alias("k"), F.lit("x").alias("w"))
    plain = sorted(
        (r.k, r.v, r.w) for r in left.join(right, "k", "left").collect()
    )
    salted = sorted(
        (r.k, r.v, r.w) for r in salted_join(left, right, "k", salt=4, how="left").collect()
    )
    assert plain == salted


def test_bucketed_join_elides_exchange(spark, sf_dir, tmp_path):
    # (warehouse dir is static conf — managed tables land in
    # ./spark-warehouse and are dropped at the end)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", bucket_cols=["o_orderkey"], n_buckets=4)
    write_bucketed(li, "lineitem_b", bucket_cols=["l_orderkey"], n_buckets=4)
    a = spark.table("orders_b")
    b = spark.table("lineitem_b")
    # disable broadcast so the join strategy is key-based
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a.o_orderkey == b.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        n = joined.count()
        assert n == li.count()  # every lineitem matches exactly one order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
