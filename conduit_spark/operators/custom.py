"""custom.* — the user-code escape hatch.

The reference embeds a JS engine (goja) running a per-record
``process(rec)`` that returns a transformed record or null (= filter)
(impl/custom/javascript.go:83-95,151-322), plus WASM standalone
processors and gRPC standalone connectors
(pkg/plugin/processor/standalone/). Per the reference's own ADR
against bespoke DSLs
(docs/architecture-decision-records/20260704-no-bespoke-dsl.md), our
extension surfaces are:

- ``custom_python`` — in-process Python fn over the envelope dict,
  executed in Arrow-batched partitions via mapInPandas: the same
  1-in / 1-or-0-out contract, distributed, no driver involvement.
- ``custom_subprocess`` — the STANDALONE-plugin analog: any executable
  speaking JSON-lines over stdin/stdout (one JSON envelope per line in,
  one-or-zero per line out, same record order). One subprocess per
  partition; the child's interpreter/venv/runtime is whatever the
  command names, so user code is isolated from the executor Python —
  the same process boundary the reference draws with its WASM/gRPC
  plugins, minus the capability-negotiation handshake (stdin/stdout
  framing replaces it).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

RecordFn = Callable[[dict], dict | None]


def custom_python(df: DataFrame, fn: RecordFn) -> DataFrame:
    """Run ``fn(record_dict) -> dict | None`` per record.

    ``None`` filters the record (javascript.go:93-95 null semantics).
    Returned dicts may modify any envelope field except ``position``
    (immutable, field/set.go:48).
    """
    schema = df.schema
    cols = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for rec in pdf.to_dict("records"):
                original_position = rec.get("position")
                res = fn(dict(rec))
                if res is None:
                    continue
                res["position"] = original_position
                out_rows.append({c: res.get(c) for c in cols})
            yield pd.DataFrame(out_rows, columns=cols) if out_rows else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in cols}
            )

    return df.mapInPandas(run, schema)


def custom_subprocess(
    df: DataFrame,
    command: list[str],
    *,
    extra_env: dict[str, str] | None = None,
    sandbox: dict | None = None,
    egress: dict | None = None,
    configure: dict | None = None,
) -> DataFrame:
    """Run records through a standalone executable (one per partition)
    speaking JSON-lines: line i of stdout answers record i of stdin
    with a transformed envelope object or ``null`` to filter.

    The standalone-plugin analog (pkg/plugin/processor/standalone/):
    the child can be any language/venv/runtime; its process boundary
    isolates user code from the executor Python. Binary envelope
    fields travel base64-encoded under the same field name; position
    stays immutable. ``sandbox`` applies hard rlimit caps to every
    per-partition child (memory/CPU/output/fds/processes — the
    resource half of the reference's wazero sandbox; see
    ``sources.standalone.sandbox_preexec``).

    ``egress`` enables HOST-MEDIATED HTTP for the child (the analog of
    the reference's WASM egress capability,
    20260726-wasm-host-egress-capability.md): instead of answering a
    record, the child may first emit
    ``{"cmd": "http_request", "id": …, "method": …, "url": …,
    "headers": …, "body": …}`` lines; the ENGINE performs the call
    through the two-stage allowlist (``functions/egress.py`` —
    hostname pre-filter + resolved-IP dial check) and writes
    ``{"cmd": "http_response", "id": …, status/headers/body | error,
    denied}`` back on the child's stdin, then keeps waiting for the
    record's real answer. ``configure`` (a ``{"settings": …,
    "connector_id": …}`` dict) switches the child to the
    REGISTRY-ARTIFACT dialect: one ``{"cmd": "configure", …}`` line is
    written before the first record, matching the scaffolded-processor
    driver (``scaffold.py`` ``_PROCESSOR_MAIN``) and the standalone
    connector handshake (``sources/standalone.py``). The child answers
    nothing to configure. Without it the stream is records-only — the
    original ``custom.standalone`` contract, unchanged.

    Because the engine PIPELINES records, lines
    arriving on the child's stdin while an http_response is pending
    may be further records — children must match on ``cmd ==
    "http_response"`` and queue the rest (see the reference child in
    ``tests/test_egress.py``). With no ``egress`` block every request
    is denied — the child never gets a socket either way (combine with
    ``sandbox`` for resource caps).
    """
    from conduit_spark.functions.egress import policy_from_settings
    from conduit_spark.sources.standalone import sandbox_preexec

    sandbox_preexec(sandbox)  # validate keys on the driver, fail fast
    policy_from_settings(egress)  # driver-side validation, fail fast
    import base64

    from pyspark.sql.types import BinaryType

    schema = df.schema
    cols = [f.name for f in schema.fields]
    bin_cols = {f.name for f in schema.fields if isinstance(f.dataType, BinaryType)}

    def _ser(rec: dict) -> str:
        out = {}
        for k, v in rec.items():
            if v is None:
                out[k] = None
            elif k in bin_cols:
                out[k] = base64.b64encode(bytes(v)).decode()
            elif hasattr(v, "item"):  # numpy scalar
                out[k] = v.item()
            else:
                out[k] = v
            # NaN/Inf would serialize as bare `NaN`/`Infinity` tokens —
            # invalid JSON that a strict parser in a non-Python child
            # runtime rejects mid-stream; map to null (allow_nan=False
            # below enforces the protocol stays spec-compliant)
            fv = out[k]
            if isinstance(fv, float) and (fv != fv or fv in (float("inf"), float("-inf"))):
                out[k] = None
        return json.dumps(out, allow_nan=False)

    def _de(obj: dict) -> dict:
        return {
            c: (
                base64.b64decode(obj[c])
                if c in bin_cols and obj.get(c) is not None
                else obj.get(c)
            )
            for c in cols
            if c != "position"  # immutable; caller restores the original
        }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os
        import subprocess
        import threading

        from conduit_spark.functions.egress import (
            EgressDenied,
            policy_from_settings as _pfs,
        )
        from conduit_spark.sources.standalone import (
            sandbox_preexec as _pe,
            wall_killer as _wk,
        )

        policy = _pfs(egress)
        child_env = dict(os.environ, **(extra_env or {}))
        proc = subprocess.Popen(  # noqa: S603 — the command IS the plugin
            command,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            text=True,
            env=child_env,
            preexec_fn=_pe(sandbox),
        )
        killer = _wk(proc, sandbox)
        use_rpc = policy is not None
        stdin_lock = threading.Lock()  # feeder + egress replies share stdin
        STALL_S = 60.0
        # Two writers (feeder thread + egress replies from the reader
        # loop) share the child's stdin in EVERY mode — a child may
        # emit http_request even without an egress block (it gets a
        # denial), so the denial write and the record feed must never
        # interleave mid-line. A NON-BLOCKING fd + stall deadline
        # additionally keeps a protocol-violating child (one that
        # stops draining stdin while waiting for its http_response) a
        # diagnosable failure, never a deadlock.
        os.set_blocking(proc.stdin.fileno(), False)

        def _locked_write(text: str) -> None:
            import select as _select
            import time as _time

            data = text.encode("utf-8")
            fd = proc.stdin.fileno()
            end = _time.monotonic() + STALL_S
            with stdin_lock:
                while data:
                    _r, w, _x = _select.select([], [fd], [], 1.0)
                    if w:
                        try:
                            n = os.write(fd, data)
                        except BlockingIOError:
                            n = 0
                        if n:
                            data = data[n:]
                            end = _time.monotonic() + STALL_S
                            continue
                    if _time.monotonic() > end:
                        raise RuntimeError(
                            f"custom_subprocess: {command[0]} stopped "
                            f"draining stdin for {STALL_S:.0f}s (is the "
                            "plugin waiting for an http_response without "
                            "reading queued records?)"
                        )

        def _egress_reply(req: dict) -> dict:
            rid = req.get("id")
            if policy is None:
                return {
                    "cmd": "http_response",
                    "id": rid,
                    "error": "egress denied: no egress policy configured",
                    "denied": True,
                }
            try:
                out = policy.request(
                    req.get("method", "GET"),
                    req["url"],
                    headers=req.get("headers"),
                    body=req.get("body"),
                )
                return {"cmd": "http_response", "id": rid, **out}
            except EgressDenied as e:
                return {
                    "cmd": "http_response",
                    "id": rid,
                    "error": str(e),
                    "denied": True,
                }
            except Exception as e:  # noqa: BLE001 — network errors → child
                return {
                    "cmd": "http_response",
                    "id": rid,
                    "error": f"{type(e).__name__}: {e}",
                }

        import select as _select

        out_fd = proc.stdout.fileno()
        rbuf = bytearray()
        feed_err: list[BaseException] = []

        def _readline_checked() -> str:
            # Unbuffered select-based line reader over stdout's raw fd
            # (proc.stdout's TextIOWrapper is bypassed everywhere, so
            # no bytes ever hide in its buffer). On each 1s poll tick
            # a failed feeder is re-raised here instead of blocking
            # forever on answers to records that were never sent.
            nonlocal rbuf
            while True:
                i = rbuf.find(b"\n")
                if i >= 0:
                    line = bytes(rbuf[: i + 1])
                    del rbuf[: i + 1]
                    return line.decode("utf-8")
                r, _w, _x = _select.select([out_fd], [], [], 1.0)
                if r:
                    chunk = os.read(out_fd, 1 << 16)
                    if not chunk:
                        if rbuf:
                            line = bytes(rbuf)
                            rbuf.clear()
                            return line.decode("utf-8")
                        return ""  # EOF
                    rbuf += chunk
                elif feed_err:
                    raise RuntimeError(
                        f"custom_subprocess: feeding {command[0]} failed"
                    ) from feed_err[0]

        # Feeder runs in a thread: a child that answers before reading
        # everything would otherwise deadlock both pipes. Both modes
        # route through the stall-bounded locked writer (egress
        # replies share the fd); non-rpc amortizes syscalls by writing
        # line-aligned ~256 KiB chunks, so a denial can only ever land
        # BETWEEN complete record lines, never inside one.
        CHUNK = 1 << 18

        def feed(data: list[str]) -> None:
            try:
                if use_rpc:
                    for ln in data:
                        _locked_write(ln + "\n")
                else:
                    buf: list[str] = []
                    size = 0
                    for ln in data:
                        buf.append(ln)
                        size += len(ln) + 1
                        if size >= CHUNK:
                            _locked_write("\n".join(buf) + "\n")
                            buf, size = [], 0
                    if buf:
                        _locked_write("\n".join(buf) + "\n")
            except BaseException as e:  # noqa: BLE001 — surfaced by reader
                feed_err.append(e)

        if configure is not None:
            _locked_write(
                json.dumps(
                    {"cmd": "configure", **configure}, allow_nan=False
                )
                + "\n"
            )

        try:
            for pdf in batches:
                recs = pdf.to_dict("records")
                if not recs:
                    continue
                lines = [_ser(r) for r in recs]

                t = threading.Thread(target=feed, args=(lines,))
                t.start()
                out_rows = []
                for rec in recs:
                    while True:
                        line = _readline_checked()
                        if not line:
                            raise RuntimeError(
                                f"custom_subprocess: {command[0]} closed stdout "
                                f"mid-batch (exit={proc.poll()})"
                            )
                        obj = json.loads(line)
                        if isinstance(obj, dict) and obj.get("cmd") == "http_request":
                            _locked_write(
                                json.dumps(_egress_reply(obj), allow_nan=False)
                                + "\n"
                            )
                            continue  # still waiting for the record answer
                        break
                    if obj is None:
                        continue
                    row = _de(obj)
                    row["position"] = rec.get("position")  # immutable
                    out_rows.append(row)
                t.join()
                if feed_err:
                    raise RuntimeError(
                        f"custom_subprocess: feeding {command[0]} failed"
                    ) from feed_err[0]
                yield pd.DataFrame(out_rows, columns=cols) if out_rows else (
                    pd.DataFrame({c: pd.Series(dtype="object") for c in cols})
                )
        finally:
            try:
                proc.stdin.close()
            except Exception:  # noqa: BLE001
                pass
            proc.terminate()
            proc.wait(timeout=10)
            if killer is not None:
                killer.cancel()

    return df.mapInPandas(run, schema)
