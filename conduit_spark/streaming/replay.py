"""Replay a bounded table as a stream (the events-table streaming
fixture — TESTDATA.md: 'the events table doubles as the
streaming-source fixture').

Spark's parquet file source streams existing files with exactly-once
tracking, so a batch table replays as a stream with identical
semantics — the engine's batch/stream unification made testable: any
windowed aggregation must produce byte-identical results in both
modes (asserted in tests/test_streaming.py)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from conduit_spark.session import ensure_session_confs

_EVENTS_DDL = "event_id bigint, ts {ts_type}, user_id bigint, event_type string, value double, props string"


def events_stream(
    spark: SparkSession,
    sf_dir: str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """events.parquet as a streaming DataFrame (ts normalized to a
    micros timestamp exactly like the batch loader)."""
    ensure_session_confs(spark)
    # probe the parquet footer via the batch reader: older testdata has
    # ts as TIMESTAMP(NANOS) (bigint under nanosAsLong, needs div 1000),
    # regenerated testdata has plain micros (read as timestamp directly)
    ts_is_nanos = (
        dict(
            spark.read.parquet(os.path.join(sf_dir, "events.parquet")).dtypes
        ).get("ts")
        == "bigint"
    )
    ddl = _EVENTS_DDL.format(ts_type="bigint" if ts_is_nanos else "timestamp")
    # the streaming file source requires a directory — point it at the
    # sf dir and glob-filter to the events file
    reader = (
        spark.readStream.schema(ddl)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.load(sf_dir)
    if ts_is_nanos:
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
