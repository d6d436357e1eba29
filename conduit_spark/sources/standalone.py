"""Standalone (subprocess) connector plugins — any-language sources
and destinations over a JSON-lines protocol.

The reference dispenses connector plugins as separate processes
speaking gRPC (pkg/plugin/connector/standalone/dispenser.go:25); the
engine analog keeps the process boundary but swaps the transport for
JSON-lines on stdin/stdout, matching the ``custom.standalone``
processor contract (operators/custom.py).

Protocol (one JSON object per line):

- engine → child, first line:
  ``{"cmd": "configure", "settings": {...}, "connector_id": "..."}``
- **source**: child then emits one envelope object per line and exits
  0 when drained (exit != 0 fails the read). Envelope fields mirror
  ENVELOPE_SCHEMA; binary fields (``position``, ``key_raw``,
  ``payload_after_raw``) travel base64; missing fields default null.
- **destination**: engine streams envelope objects (same shape) after
  the configure line; the child answers EXACTLY one ack per record —
  ``{"ok": true}`` or ``{"ok": false, "error": "..."}`` — and exits
  when stdin closes.

Scale notes: a source plugin is inherently one process — the same
boundary the reference draws (one plugin process per connector); the
snapshot it emits is immediately repartitioned across the cluster.
Destinations run ONE CHILD PER PARTITION on the executors, so write
throughput scales with partitions, not the driver.
"""

from __future__ import annotations

import base64
import json
import shlex
import subprocess
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from conduit_spark.envelope import ENVELOPE_SCHEMA

_BIN_FIELDS = ("position", "key_raw", "payload_after_raw")


def _parse_command(command: Any) -> list[str]:
    if isinstance(command, str):
        return shlex.split(command)
    return list(command)


# --- resource sandbox (the WASM/WASI capability-cap analog) -----------

# The reference runs standalone processors under wazero with hard
# memory/fuel caps (pkg/plugin/processor/standalone); a subprocess
# can't be capability-sandboxed the same way, but POSIX rlimits give
# the same *resource* guarantees: a plugin cannot OOM the executor,
# spin a CPU forever, fill the disk, or fork-bomb the node. Declared
# per connector/processor as a ``sandbox:`` settings block.
_RLIMIT_KEYS = {
    "max_memory_bytes": "RLIMIT_AS",
    "max_cpu_seconds": "RLIMIT_CPU",
    "max_output_bytes": "RLIMIT_FSIZE",
    "max_open_files": "RLIMIT_NOFILE",
    "max_processes": "RLIMIT_NPROC",
}
_SANDBOX_KEYS = set(_RLIMIT_KEYS) | {"wall_timeout_seconds"}


def sandbox_preexec(sandbox: dict | None):
    """``sandbox`` settings → a ``preexec_fn`` that applies hard POSIX
    rlimits in the child between fork and exec (both soft and hard set,
    so the plugin cannot raise them back). Returns None when no caps
    are declared. Unknown keys are config errors, not silent no-ops."""
    if not sandbox:
        return None
    unknown = set(sandbox) - _SANDBOX_KEYS
    if unknown:
        raise ValueError(
            f"unknown sandbox keys {sorted(unknown)}; "
            f"supported: {sorted(_SANDBOX_KEYS)}"
        )
    caps = {
        _RLIMIT_KEYS[k]: int(v) for k, v in sandbox.items() if k in _RLIMIT_KEYS
    }
    if not caps:
        return None

    def _apply() -> None:
        import resource

        for rname, lim in caps.items():
            resource.setrlimit(getattr(resource, rname), (lim, lim))

    return _apply


def wall_killer(proc, sandbox: dict | None):
    """Arm a wall-clock kill timer (``wall_timeout_seconds``) for a
    plugin child; returns the timer (or None) — cancel on clean exit.
    rlimit CPU time doesn't cover a plugin that simply *hangs*; this
    does.

    Semantics: a HARD cap on the child's total lifetime, armed once at
    spawn — NOT an idle/inactivity timeout. For processor children
    (one per partition, alive for every batch of the task) set it
    above the worst-case partition wall time, or omit it and rely on
    ``max_cpu_seconds`` for runaway protection."""
    import threading

    seconds = (sandbox or {}).get("wall_timeout_seconds")
    if not seconds:
        return None
    t = threading.Timer(float(seconds), proc.kill)
    t.daemon = True
    t.start()
    return t


def _decode_envelope(obj: dict) -> tuple:
    """JSON envelope object → a row tuple in ENVELOPE_SCHEMA order."""
    vals = []
    for f in ENVELOPE_SCHEMA.fields:
        v = obj.get(f.name)
        if f.name in _BIN_FIELDS and v is not None:
            v = base64.b64decode(v)
        if f.name == "metadata" and v is not None:
            v = {str(k): str(x) for k, x in v.items()}
        vals.append(v)
    return tuple(vals)


def encode_envelope(rec: dict) -> str:
    """Row dict → JSON line (binary → base64), the destination feed."""
    out = {}
    for f in ENVELOPE_SCHEMA.fields:
        v = rec.get(f.name)
        if f.name in _BIN_FIELDS and v is not None:
            out[f.name] = base64.b64encode(bytes(v)).decode()
        elif f.name == "metadata" and v is not None:
            out[f.name] = dict(v)
        else:
            out[f.name] = _json_safe(v)
    return json.dumps(out, allow_nan=False)


def _json_safe(v):
    if hasattr(v, "item"):  # numpy scalar
        v = v.item()
    if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
        return None
    return v


def standalone_source(
    spark: SparkSession,
    command: Any,
    *,
    settings: dict | None = None,
    source_id: str = "standalone",
    num_partitions: int | None = None,
    sandbox: dict | None = None,
) -> DataFrame:
    """Run a standalone source plugin to completion and return its
    records as an envelope DataFrame.

    The child is spawned on the driver (one process per connector —
    dispenser.go's model), configured with one JSON line, and its
    stdout is drained until EOF. A non-zero exit fails the source.
    ``sandbox`` caps the child's resources (see :func:`sandbox_preexec`).
    """
    cmd = _parse_command(command)
    settings = dict(settings or {})
    sandbox = sandbox or settings.pop("sandbox", None)
    proc = subprocess.Popen(  # noqa: S603 — the command IS the plugin
        cmd,
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        text=True,
        preexec_fn=sandbox_preexec(sandbox),
    )
    killer = wall_killer(proc, sandbox)
    rows = []
    try:
        proc.stdin.write(
            json.dumps(
                {
                    "cmd": "configure",
                    "settings": settings or {},
                    "connector_id": source_id,
                }
            )
            + "\n"
        )
        proc.stdin.flush()
        proc.stdin.close()  # sources take no further input
        for line in proc.stdout:
            line = line.strip()
            if not line:
                continue
            rows.append(_decode_envelope(json.loads(line)))
    finally:
        proc.stdout.close()
        rc = proc.wait(timeout=30)
        if killer is not None:
            killer.cancel()
    if rc != 0:
        raise RuntimeError(
            f"standalone source {cmd[0]} exited {rc} after {len(rows)} records"
        )
    df = spark.createDataFrame(rows, ENVELOPE_SCHEMA)
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


def standalone_sink(
    df: DataFrame,
    command: Any,
    *,
    settings: dict | None = None,
    connector_id: str = "standalone",
    sandbox: dict | None = None,
) -> None:
    """Deliver an envelope DataFrame to a standalone destination
    plugin: one child process per PARTITION (executor-side — write
    throughput scales with partitions), each configured then fed
    envelope JSON-lines; every record must be acked ``{"ok": true}``.

    A nack or a child death raises, failing the batch — the runtime's
    recovery path (rerun / restart_with_backoff) then redelivers, so
    plugins should make writes idempotent per batch like the built-in
    file sink's ``batch_id=N`` convention. ``sandbox`` rlimit caps
    apply to EVERY per-partition child (see :func:`sandbox_preexec`);
    the dict ships to executors inside the closure and the preexec is
    rebuilt there, so caps hold on every node.
    """
    cmd = _parse_command(command)
    settings = dict(settings or {})
    sandbox = sandbox or settings.pop("sandbox", None)
    sandbox_preexec(sandbox)  # validate keys on the driver, fail fast
    conf_line = json.dumps(
        {"cmd": "configure", "settings": settings, "connector_id": connector_id}
    )

    def feed_partition(rows) -> None:
        import subprocess as sp
        import threading

        from conduit_spark.sources.standalone import (
            sandbox_preexec as _pe,
            wall_killer as _wk,
        )

        proc = sp.Popen(  # noqa: S603
            cmd, stdin=sp.PIPE, stdout=sp.PIPE, text=True, preexec_fn=_pe(sandbox)
        )
        killer = _wk(proc, sandbox)
        sent = 0
        acked = 0
        err: list[str] = []

        def pump() -> None:
            nonlocal sent
            try:
                proc.stdin.write(conf_line + "\n")
                for row in rows:
                    proc.stdin.write(encode_envelope(row.asDict()) + "\n")
                    sent += 1
                proc.stdin.close()
            except BrokenPipeError:
                err.append("child closed stdin early")

        t = threading.Thread(target=pump)
        t.start()
        for line in proc.stdout:
            line = line.strip()
            if not line:
                continue
            ack = json.loads(line)
            if not ack.get("ok"):
                err.append(str(ack.get("error", "nack")))
            acked += 1
        t.join()
        rc = proc.wait(timeout=30)
        if killer is not None:
            killer.cancel()
        if err:
            raise RuntimeError(
                f"standalone destination {cmd[0]}: {len(err)} nacks "
                f"(first: {err[0]})"
            )
        if rc != 0 or acked != sent:
            raise RuntimeError(
                f"standalone destination {cmd[0]}: exit={rc}, "
                f"acked {acked}/{sent}"
            )

    df.foreachPartition(feed_partition)
