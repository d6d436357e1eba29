"""Event-time windowed aggregation over envelope streams.

Watermarks bound state (late data beyond the watermark is dropped —
the explicit policy the reference never needed because it acked by
position). All three window shapes work identically on batch
DataFrames (Spark's unified semantics), which is how the oracle gate
exercises them.

Scale: windowed aggregation state is partitioned by (key, window) in
the state store; watermark eviction keeps it bounded. Use
``spark.sql.shuffle.partitions`` ≈ cores × executors for the implicit
state-store partitioning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def tumbling_aggregate(
    df: DataFrame,
    ts_col: str,
    window: str,
    *,
    keys: list[str] | None = None,
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping event-time windows (e.g. ``"1 hour"``)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    group = [F.window(F.col(ts_col), window).alias("win")] + [
        F.col(k) for k in (keys or [])
    ]
    return df.groupBy(*group).agg(*aggs)


def sliding_aggregate(
    df: DataFrame,
    ts_col: str,
    window: str,
    slide: str,
    *,
    keys: list[str] | None = None,
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows (window length + slide interval)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    group = [F.window(F.col(ts_col), window, slide).alias("win")] + [
        F.col(k) for k in (keys or [])
    ]
    return df.groupBy(*group).agg(*aggs)


def session_aggregate(
    df: DataFrame,
    ts_col: str,
    gap: str,
    *,
    keys: list[str] | None = None,
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    group = [F.session_window(F.col(ts_col), gap).alias("win")] + [
        F.col(k) for k in (keys or [])
    ]
    return df.groupBy(*group).agg(*aggs)
