"""custom.* — the user-code escape hatch.

The reference embeds a JS engine (goja) running a per-record
``process(rec)`` that returns a transformed record or null (= filter)
(impl/custom/javascript.go:83-95,151-322), plus WASM standalone
processors. Per the reference's own ADR against bespoke DSLs
(docs/architecture-decision-records/20260704-no-bespoke-dsl.md), our
extension surface is Python: a user function over the envelope dict,
executed in Arrow-batched partitions via mapInPandas — the same 1-in /
1-or-0-out contract, distributed, no driver involvement.
"""

from __future__ import annotations

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
