"""Parquet table catalog for the driver's TPC-H-ish testdata.

``load_tables(spark, sf_dir)`` returns lazily-planned DataFrames — no
I/O happens until an action, and Catalyst prunes columns/pushes filters
into the parquet scan, so loading "all tables" costs nothing.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as the raw int64 epoch-nanos column (no
    micros conversion) — for queries that need nanos-exact ordering
    parity with DuckDB's TIMESTAMP_NS (``epoch_ns``)."""
    from conduit_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") != "bigint":  # pre-nanos parquet writer
        df = df.withColumn("ts", F.unix_micros(F.col("ts")) * F.lit(1000))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from conduit_spark.session import ensure_session_confs

    ensure_session_confs(spark)  # driver-provided sessions lack our confs
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which vanilla Spark
        # rejects; the nanosAsLong flag (set above) reads it as long;
        # convert to a micros timestamp with exact integer division —
        # identical to DuckDB's nanos->micros truncation.
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose all tables as temp views so ``spark.sql`` queries run."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
