"""Stream inspector — tap a running pipeline.

Reference: any connector/processor can be inspected in-flight through
a buffered broadcast that drops on overflow so inspection never blocks
the pipeline (pkg/inspector/inspector.go:33-68; gRPC surface
api.proto:775,1011-1018).

Spark analog: a bounded in-memory sink fed by a listener-driven
side-query. The tap is a separate streaming query over the same
source plan (Spark dedupes the scan per micro-batch), writing the
last N rows to the driver's ring buffer via foreachBatch — bounded
memory, drop-oldest, zero impact on the main query's checkpointing.
"""

from __future__ import annotations

from collections import deque
from threading import Lock

from pyspark.sql import DataFrame


class StreamInspector:
    """Bounded record tap (drop-oldest, like the reference's
    drop-on-full broadcast buffer)."""

    def __init__(self, buffer_size: int = 100, sample_per_batch: int = 10):
        self.buffer: deque = deque(maxlen=buffer_size)
        self.sample_per_batch = sample_per_batch
        self._lock = Lock()
        self._query = None

    def attach(self, stream_df: DataFrame, checkpoint_dir: str):
        """Start the tap query on a streaming DataFrame."""

        def grab(batch_df: DataFrame, batch_id: int) -> None:
            rows = batch_df.limit(self.sample_per_batch).collect()
            with self._lock:
                for r in rows:
                    self.buffer.append(r.asDict(recursive=True))

        self._query = (
            stream_df.writeStream.foreachBatch(grab)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        return self._query

    def tap_batch(self, df: DataFrame) -> None:
        """Batch-mode tap (inspect a bounded pipeline run)."""
        rows = df.limit(self.sample_per_batch).collect()
        with self._lock:
            for r in rows:
                self.buffer.append(r.asDict(recursive=True))

    def records(self) -> list[dict]:
        with self._lock:
            return list(self.buffer)

    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()


def jsonable(value):
    """Record values → JSON-clean: bytes become base64 text (the
    reference's OpenCDC JSON renders raw data the same way), temporal
    and Decimal values become strings."""
    import base64
    import datetime
    import decimal

    if isinstance(value, dict):
        return {k: jsonable(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [jsonable(v) for v in value]
    if isinstance(value, (bytes, bytearray)):
        return base64.b64encode(bytes(value)).decode("ascii")
    if isinstance(value, (datetime.datetime, datetime.date)):
        return value.isoformat()
    if isinstance(value, decimal.Decimal):
        return str(value)
    return value
