from __future__ import annotations

import pytest

from conduit_spark.analytics import relational
from tests.oracle_util import compare_spark_duckdb


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_matches_oracle(spark, sf_dir, duck, name):
    df = relational.QUERIES[name](spark, sf_dir)
    compare_spark_duckdb(df, duck, relational.ORACLES[name])


def test_q1_nonempty(spark, sf_dir):
    assert relational.q1_pricing_summary(spark, sf_dir).count() > 0


def test_bloom_runtime_filter_prunes_but_never_drops_matches(spark, sf_dir):
    """The runtime filter must pass EVERY true match (no false
    negatives) while rejecting most non-matching probe rows — that's
    the entire point of shipping it ahead of the shuffle."""
    import pyspark.sql.functions as F

    from conduit_spark.sources.tables import load_table

    orders_f = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    might = relational.bloom_runtime_filter(orders_f, "o_orderkey")
    li = load_table(spark, sf_dir, "lineitem")
    total = li.count()
    survived = li.filter(might(F.col("l_orderkey"))).count()
    true_matches = li.join(
        orders_f.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi"
    ).count()
    assert survived >= true_matches  # no false negatives
    assert survived < total * 0.6  # actually prunes (URGENT+date ≈ 1/7 of rows)


def test_salted_join_spreads_hot_key(spark):
    """A pathologically hot key must land in every salt bucket, and the
    salted join must still return exactly one match per probe row."""
    import pyspark.sql.functions as F

    n = 4000
    fact = spark.range(n).select(
        F.lit(7).alias("k"),
        F.col("id").alias("row_id"),
        F.pmod(F.xxhash64(F.lit(7), F.col("id")), F.lit(relational.SALT_BUCKETS)).alias(
            "__salt"
        ),
    )
    dim = spark.createDataFrame([(7, "hot")], "k long, v string").withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(relational.SALT_BUCKETS - 1)))
    )
    joined = fact.join(
        dim, (fact.k == dim.k) & (fact["__salt"] == dim["__salt"].cast("long"))
    )
    assert joined.count() == n  # exactly one replica matches each row
    buckets = fact.select("__salt").distinct().count()
    assert buckets == relational.SALT_BUCKETS  # the hot key actually spreads
