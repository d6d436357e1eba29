"""Stateful streaming on Spark 4's ``transformWithStateInPandas``
(the stateful-processing v2 API), unblocked by the pure-Python
protobuf runtime in ``functions/miniproto.py``.

This is the second implementation of the engine's custom-stateful
extension point (reference: standalone WASM processors with host-side
state). ``streaming/stateful.py`` carries the same semantics on the v1
``applyInPandasWithState`` API; this module ports them to v2, which
adds first-class per-state TTL (state-store-enforced, not
timeout-callback-emulated), composable state variables (value / list /
map per key), and timers. Both stay supported: v1 has no extra runtime
requirements, v2 needs the protobuf shim and the RocksDB state-store
provider (bundled with Spark: ``rocksdbjni`` jar).

Scale: identical posture to v1 — state is sharded by grouping key
across the cluster's state stores, per-key payload here is one
(count, payload) row, and TTL bounds the live keyspace to the keys
active in any TTL window, which is the 100 TB / unbounded-keyspace
configuration.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# The TWS worker lazily imports the generated protobuf module inside
# the state-client calls; installing the shim at import time here
# guarantees it is present in every process that unpickles the
# processor (driver, TWS driver-worker, executor workers) before any
# of those lazy imports run. No-op when real protobuf exists.
from conduit_spark.functions.miniproto import install as _install_protobuf

_install_protobuf()

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

from conduit_spark.streaming.stateful import DEDUP_OUT_SCHEMA  # noqa: E402


def _maybe_enable_trace() -> None:
    """CONDUIT_TWS_TRACE=1: append every state-server send/receive to
    /tmp/tws_trace_<pid>.log from inside the worker — the only
    practical way to see where a silent executor↔state-server hang
    sits, since worker stdout is swallowed by the daemon."""
    import os

    if os.environ.get("CONDUIT_TWS_TRACE") != "1":
        return
    from pyspark.sql.streaming import stateful_processor_api_client as mod

    cls = mod.StatefulProcessorApiClient
    if getattr(cls, "_tws_traced", False):
        return
    cls._tws_traced = True
    orig_send = cls._send_proto_message
    orig_recv = cls._receive_proto_message

    def _log(line: str) -> None:
        with open(f"/tmp/tws_trace_{os.getpid()}.log", "a") as f:
            f.write(line + "\n")
            f.flush()

    def send(self, message: bytes) -> None:
        _log(f"SEND {len(message)}B {message.hex()}")
        orig_send(self, message)
        _log("SEND done")

    def recv(self):
        _log("RECV wait")
        out = orig_recv(self)
        _log(f"RECV {out!r}"[:400])
        return out

    cls._send_proto_message = send
    cls._receive_proto_message = recv


_maybe_enable_trace()

_STATE_DDL = "seen BIGINT, first_payload STRING"


class DedupProcessor(StatefulProcessor):
    """Cross-micro-batch exact dedup, first occurrence wins — the v2
    port of ``stateful._make_dedup_fn`` with the SAME output schema
    and emission rules, so the two APIs are drop-in interchangeable:

    - first sighting of a key emits one row
      ``(dedup_key, first_payload, n_duplicates_dropped)``;
    - every later sighting (same or later batch) is suppressed and
      counted into state;
    - with ``ttl_ms``, the state store evicts a key's marker after
      that long without an update (v2's native TTL — every update
      resets the clock, matching v1's sliding ``setTimeoutDuration``),
      after which the key re-emits.
    """

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState(
            "seen", _STATE_DDL, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        total = 0
        first_payload = None
        for pdf in rows:
            if first_payload is None and len(pdf) > 0:
                first_payload = pdf["payload_after_json"].iloc[0]
            total += len(pdf)
        already = self._seen.exists()
        if already:
            seen, payload = self._seen.get()
            self._seen.update((seen + total, payload))
            return  # suppressed — emitted in an earlier batch
        self._seen.update((total, first_payload))
        yield pd.DataFrame(
            {
                "dedup_key": [key[0]],
                "first_payload": [first_payload],
                "n_duplicates_dropped": [total - 1],
            }
        )

    def close(self) -> None:
        pass


def running_dedup_state_v2(
    env_stream: DataFrame, key_col: str = "key_json", ttl_ms: int | None = None
) -> DataFrame:
    """``stateful.running_dedup_state`` on the v2 API. Same contract:
    works on streaming and batch-grouped data, state survives restarts
    via the checkpoint, ``ttl_ms=None`` means lifetime dedup.

    Requires the RocksDB state-store provider; call
    :func:`use_rocksdb_state_store` (or set
    ``spark.sql.streaming.stateStore.providerClass`` yourself) before
    starting the query.
    """
    # timeMode gates clock plumbing: state TTL needs ProcessingTime;
    # without TTL, "None" lets availableNow triggers drain and STOP
    # (a ProcessingTime clock keeps the trigger scheduling batches).
    return env_stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=DedupProcessor(ttl_ms),
        outputStructType=DEDUP_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None" if ttl_ms is None else "ProcessingTime",
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state_store(spark) -> str:
    """Switch the session to the RocksDB state-store provider that
    transformWithState requires; returns the previous provider so
    tests can restore it. (HDFS-backed state keeps serving the v1
    operators — the setting only affects queries started after it.)"""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    return prev
