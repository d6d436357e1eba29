"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` maps
every implemented operator/query to a ``(spark, sf_dir) -> DataFrame``
callable; ``oracle_sql()`` gives the DuckDB-equivalent SQL the driver
uses for the correctness gate. Query registries live next to their
implementations in ``conduit_spark`` and are aggregated here.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from conduit_spark.analytics import (
    chunking,
    dedup,
    multimodal,
    pipeline_queries,
    processor_queries,
    rag,
    relational,
    similarity,
    text,
)

_REGISTRIES = [
    (relational.QUERIES, relational.ORACLES),
    (processor_queries.QUERIES, processor_queries.ORACLES),
    (text.QUERIES, text.ORACLES),
    (dedup.QUERIES, dedup.ORACLES),
    (similarity.QUERIES, similarity.ORACLES),
    (multimodal.QUERIES, multimodal.ORACLES),
    (pipeline_queries.QUERIES, pipeline_queries.ORACLES),
    (chunking.QUERIES, chunking.ORACLES),
    (rag.QUERIES, rag.ORACLES),  # rows-only (no oracle entry)
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for q, _ in _REGISTRIES:
        overlap = out.keys() & q.keys()
        if overlap:
            raise ValueError(f"duplicate query names across registries: {overlap}")
        out.update(q)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for _, o in _REGISTRIES:
        out.update(o)
    return out
