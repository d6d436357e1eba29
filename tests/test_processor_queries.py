from __future__ import annotations

import pytest

from conduit_spark.analytics import processor_queries as pq
from tests.oracle_util import compare_spark_duckdb


@pytest.mark.parametrize("name", sorted(pq.QUERIES))
def test_processor_query_matches_oracle(spark, sf_dir, duck, name):
    df = pq.QUERIES[name](spark, sf_dir)
    assert df.count() > 0, f"{name} produced no rows — vacuous"
    compare_spark_duckdb(df, duck, pq.ORACLES[name])
