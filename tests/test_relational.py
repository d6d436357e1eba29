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
