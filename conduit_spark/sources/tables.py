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

# Resolved parquet schema per (applicationId, path) — r14 (guide §1.2:
# the profiled dominant CONSTRUCTION cost suite-wide was
# ``spark.read.parquet`` re-resolving the same footer schema ~90 ms per
# call; dq_referential alone paid it 12x per build). Passing the
# once-resolved StructType back through ``spark.read.schema(...)``
# skips resolution while returning a FRESH DataFrame (no self-join
# alias aliasing), with identical scan semantics — pruning/pushdown
# unaffected, no data cached. This is catalog-metadata caching, the
# thing a real ``spark.table()`` deployment gets from its metastore.
_SCHEMA_CACHE: dict[tuple[str, str], object] = {}


def _read_parquet_resolved(spark: SparkSession, path: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, path)
    st = _SCHEMA_CACHE.get(key)
    if st is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(st).parquet(path)


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as the raw int64 epoch-nanos column (no
    micros conversion) — for queries that need nanos-exact ordering
    parity with DuckDB's TIMESTAMP_NS (``epoch_ns``)."""
    from conduit_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    df = _read_parquet_resolved(spark, os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") != "bigint":  # pre-nanos parquet writer
        df = df.withColumn("ts", F.unix_micros(F.col("ts")) * F.lit(1000))
    return df


# Scan fan-out bounds: below the floor a table is dim-sized (shuffling
# it buys nothing); above the ceiling the files carry enough natural
# splits that adding a shuffle would be a 100 TB-scale mistake.
_FANOUT_MIN_BYTES = 256 << 10
_FANOUT_MAX_BYTES = 1 << 30


def _scan_fanout(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Round-robin-spread a scan whose natural split count is below the
    session's core count. The test parquet is written as ONE row group
    per table, so a scan — and the map-side work above it (JSON parse,
    tokenization, shingling) — otherwise runs as ONE task no matter the
    core count. Filter pushdown and column pruning are unaffected
    (Catalyst moves both through Repartition; pinned by test). On a
    real cluster the condition cannot trigger for large tables: 100 TB
    of properly-sized files always has splits >= cores, and sub-GiB
    relations cost nothing to shuffle once.

    Opt-in per query (``load_table(..., fanout=True)``), NOT global:
    measured A/B at sf0.1 shows it wins 2-3x exactly where pre-shuffle
    per-row compute dominates and the first shuffle reduces (character
    folds, n-gram shingling into sketches), and loses ~0.3-0.6s where
    the query is join/shuffle-bound anyway (the extra exchange is pure
    overhead — TPC-H-style joins shuffle on their keys immediately)."""
    try:
        size = os.path.getsize(path)
    except OSError:
        return df
    if not (_FANOUT_MIN_BYTES <= size < _FANOUT_MAX_BYTES):
        return df
    cores = spark.sparkContext.defaultParallelism
    try:
        max_pb = int(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        )
    except ValueError:  # "128m"-style values
        max_pb = 128 * 1024 * 1024
    if size // max_pb >= cores:
        return df
    return df.repartition(cores)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, *, fanout: bool = False
) -> DataFrame:
    from conduit_spark.session import ensure_session_confs

    ensure_session_confs(spark)  # driver-provided sessions lack our confs
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which vanilla Spark
        # rejects; the nanosAsLong flag (set above) reads it as long;
        # convert to a micros timestamp with exact integer division —
        # identical to DuckDB's nanos->micros truncation.
        df = _read_parquet_resolved(spark, path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
    else:
        df = _read_parquet_resolved(spark, path)
    return _scan_fanout(spark, df, path) if fanout else df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose all tables as temp views so ``spark.sql`` queries run."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
