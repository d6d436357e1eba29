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


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lookback: str,
    *,
    watermark: str = "1 minute",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join where the right event falls in
    ``[left_ts - lookback, left_ts]`` — the windowed join every
    attribution pipeline needs (purchase ⋈ clicks in the prior hour).

    Both sides get event-time watermarks; together with the interval
    condition Spark bounds the join state to ``lookback + watermark``
    per key and evicts behind the watermark — state is O(rate ×
    lookback), independent of stream lifetime. The same call works on
    batch DataFrames (the condition degrades to a plain range
    predicate), which is how the batch-equality test pins semantics.

    ``left_ts`` / ``right_ts`` (and any non-key columns) must have
    disjoint names across the two sides — rename before joining, as
    any stream-stream join output would otherwise be ambiguous.
    """
    lcol, rcol = f"`{left_ts}`", f"`{right_ts}`"
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    cond = (
        F.expr(f"{rcol} >= {lcol} - INTERVAL {lookback}")
        & F.expr(f"{rcol} <= {lcol}")
    )
    for k in on:
        cond = cond & (left[k] == right[k])
    return left.join(right, cond, how)


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


def watermark_dedup(
    df: DataFrame,
    keys: list[str],
    *,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """At-least-once → effectively-once dedup on the JVM state store:
    drop records whose ``keys`` already arrived within the watermark
    horizon (``dropDuplicatesWithinWatermark``).

    This is the built-in fast path for delivery dedup — redeliveries
    after a retry/restart land within seconds of the original, so a
    modest watermark suppresses them while state stays bounded by the
    horizon (unlike plain streaming ``dropDuplicates``, whose state
    grows forever). For dedup that must span arbitrary time (or needs
    a custom TTL/audit trail), use ``stateful.running_dedup_state`` —
    that one keeps explicit per-key state in Python. On a batch
    DataFrame this degrades to plain ``dropDuplicates(keys)`` over the
    whole input, which is the batch-equality oracle for the streaming
    semantics.

    Reference context: conduit guarantees at-least-once delivery and
    leaves exact-once to idempotent destinations; this operator is the
    engine-side suppression half of that contract.
    """
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return df.dropDuplicates(keys)
