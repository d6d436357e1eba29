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


_HLL_STATE_DDL = "regs STRING"

HLL_OUT_SCHEMA = (
    "source STRING, n_buckets_hit BIGINT, est_distinct DOUBLE"
)


class HllDistinctProcessor(StatefulProcessor):
    """Continuous distinct-count via mergeable HyperLogLog register
    state — the streaming leg of the merge algebra that
    ``analytics.sketches.sk_hll_merge`` proves in batch (register
    merge = element-wise ``max`` is lossless, so per-micro-batch
    partial sketches roll up to exactly the sketch of the union).

    Input rows carry ``(bucket, rho)`` precomputed by the SAME
    JVM-side expressions the batch sketch uses (``hll_bucket_cols``),
    so the Python side only max-merges integers into the per-key
    64-register vector and re-emits the estimate — one row per key per
    micro-batch, the continuously-updated distinct count a 100 TB
    ingest pipeline reads off its monitoring stream.

    Exactness: registers are integers; Z is a sum of exact powers of
    two (every term ≥ 2^-27, total < 2^6 — all inside one 53-bit
    mantissa window, so the float sum is exact regardless of order)
    plus an exact integer, and the final division has identical
    operands to the batch fold — the emitted estimate is bit-identical
    to ``sk_hll_distinct``'s unrounded value on the same rows.

    Scale: state is one 64-byte-ish vector per key, sharded by the
    grouping key across the cluster's state stores; merge work per
    batch is O(distinct buckets touched). No TTL — a distinct-count
    register set is meant to live for the stream's lifetime (bound the
    keyspace upstream if sources churn).
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._regs = handle.getValueState("regs", _HLL_STATE_DDL)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        from conduit_spark.analytics.sketches import (
            HLL_ALPHA,
            HLL_M,
        )

        regs = [0] * HLL_M
        if self._regs.exists():
            regs = [int(v) for v in self._regs.get()[0].split(",")]
        for pdf in rows:
            for b, r in zip(pdf["bucket"], pdf["rho"]):
                b = int(b)
                if int(r) > regs[b]:
                    regs[b] = int(r)
        self._regs.update((",".join(str(m) for m in regs),))
        # Z in bucket order: exact powers of two + exact integer (see
        # class docstring) — bit-identical to the batch fold
        hit = sum(1 for m in regs if m > 0)
        z = 0.0
        for m in regs:
            if m > 0:
                z += 2.0 ** -m
        z += float(HLL_M - hit)
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "n_buckets_hit": [hit],
                "est_distinct": [HLL_ALPHA * HLL_M * HLL_M / z],
            }
        )

    def close(self) -> None:
        pass


def hll_bucket_cols(df: DataFrame, hash_col: str = "x") -> DataFrame:
    """Project the ``(bucket, rho)`` pair the HLL processor consumes,
    with the exact JVM-side expressions of the batch sketch
    (``sk_hll_distinct``): bucket = low 6 bits of the 32-bit md5 hash,
    rho = 1-based first-set-bit position of the top 26 bits (27 when
    zero). Keeping this in Spark SQL means the streaming and batch
    paths share one definition and the Python processor never touches
    the hash."""
    import pyspark.sql.functions as F

    from conduit_spark.analytics.sketches import HLL_M, _REST_BITS

    rest = F.expr(f"{hash_col} div {HLL_M}")
    rho = F.instr(F.lpad(F.bin(rest), _REST_BITS, "0"), "1")
    return df.withColumns(
        {
            "bucket": (F.col(hash_col) % HLL_M).cast("int"),
            "rho": F.when(rho == 0, F.lit(_REST_BITS + 1))
            .otherwise(rho)
            .cast("int"),
        }
    )


def running_hll_distinct_v2(
    stream: DataFrame, key_col: str = "source"
) -> DataFrame:
    """Per-key continuous HLL distinct count on the v2 stateful API:
    group by ``key_col``, max-merge each micro-batch's ``(bucket,
    rho)`` rows into checkpointed register state, emit the updated
    estimate every batch. Restarting from the checkpoint resumes the
    registers exactly (merge is lossless), so the final estimate
    equals the batch sketch over everything ever ingested."""
    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=HllDistinctProcessor(),
        outputStructType=HLL_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


_HIST_STATE_DDL = "bins STRING"

HIST_OUT_SCHEMA = (
    "event_type STRING, n BIGINT, p50_est DOUBLE, p90_est DOUBLE, "
    "p99_est DOUBLE"
)


class HistQuantilesProcessor(StatefulProcessor):
    """Continuous percentile monitoring via mergeable histogram-sketch
    state — the ADDITIVE counterpart of :class:`HllDistinctProcessor`
    (HLL merges by register max; a fixed-bin histogram merges by
    element-wise SUM, the other half of the sketch-merge algebra
    ``analytics.sketches`` proves in batch). Input rows carry the bin
    index precomputed by the SAME JVM clamp/floor expression the batch
    sketch uses (:func:`hist_bin_col`); the Python side adds the
    micro-batch's bin counts into the per-key 64-bin integer vector
    and re-emits p50/p90/p99 every batch.

    Exactness: bins and cumulative counts are integers, the estimate
    is (first bin whose cumulative count reaches p·n, + 1) × bin
    width — the identical order-statistic rule as
    ``sk_hist_quantiles``'s batch form, so the emitted floats are
    bit-identical to the batch sketch on the same rows.

    Scale: one 64-int vector per key in the state store; merge work
    per batch is O(bins touched). The continuously-updated latency/
    value percentile per event type is the canonical streaming-
    monitoring aggregation.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._bins = handle.getValueState("bins", _HIST_STATE_DDL)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        from conduit_spark.analytics.sketches import (
            _HIST_PS,
            HIST_BIN_W,
            HIST_NBINS,
        )

        bins = [0] * HIST_NBINS
        if self._bins.exists():
            bins = [int(v) for v in self._bins.get()[0].split(",")]
        for pdf in rows:
            for b in pdf["bin"]:
                bins[int(b)] += 1
        self._bins.update((",".join(str(c) for c in bins),))
        n = sum(bins)
        ests = []
        for p in _HIST_PS:
            cum = 0
            est = None
            for b, c in enumerate(bins):
                cum += c
                if float(cum) >= p * float(n):
                    est = (b + 1) * HIST_BIN_W
                    break
            ests.append(est)
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n": [n],
                "p50_est": [ests[0]],
                "p90_est": [ests[1]],
                "p99_est": [ests[2]],
            }
        )

    def close(self) -> None:
        pass


def hist_bin_col(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Project the clamped bin index the histogram processor consumes,
    with the exact JVM-side expression of the batch sketch
    (``sk_hist_quantiles``): ``clamp(floor(value / w), 0, nbins-1)``.
    One definition shared by the streaming and batch paths."""
    import pyspark.sql.functions as F

    from conduit_spark.analytics.sketches import HIST_BIN_W, HIST_NBINS

    return df.withColumn(
        "bin",
        F.least(
            F.greatest(
                F.floor(F.col(value_col) / F.lit(HIST_BIN_W)), F.lit(0)
            ),
            F.lit(HIST_NBINS - 1),
        ).cast("int"),
    )


def running_hist_quantiles_v2(
    stream: DataFrame, key_col: str = "event_type"
) -> DataFrame:
    """Per-key continuous histogram percentiles on the v2 stateful
    API: group by ``key_col``, sum each micro-batch's bin counts into
    checkpointed 64-bin state, emit updated p50/p90/p99 every batch.
    Restarting from the checkpoint resumes the bins exactly (vector
    sum is lossless), so the final estimates equal the batch sketch
    over everything ever ingested."""
    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=HistQuantilesProcessor(),
        outputStructType=HIST_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
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
