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
    """
    from conduit_spark.sources.standalone import sandbox_preexec

    sandbox_preexec(sandbox)  # validate keys on the driver, fail fast
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

        from conduit_spark.sources.standalone import (
            sandbox_preexec as _pe,
            wall_killer as _wk,
        )

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
        try:
            for pdf in batches:
                recs = pdf.to_dict("records")
                if not recs:
                    continue
                payload = "\n".join(_ser(r) for r in recs) + "\n"

                # writer thread: a child that answers before reading
                # everything would otherwise deadlock both pipes
                def feed(data: str = payload) -> None:
                    proc.stdin.write(data)
                    proc.stdin.flush()

                t = threading.Thread(target=feed)
                t.start()
                out_rows = []
                for rec in recs:
                    line = proc.stdout.readline()
                    if not line:
                        raise RuntimeError(
                            f"custom_subprocess: {command[0]} closed stdout "
                            f"mid-batch (exit={proc.poll()})"
                        )
                    obj = json.loads(line)
                    if obj is None:
                        continue
                    row = _de(obj)
                    row["position"] = rec.get("position")  # immutable
                    out_rows.append(row)
                t.join()
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
