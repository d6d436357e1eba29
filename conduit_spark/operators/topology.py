"""filter / clone / split / error — cardinality & routing operators.

Reference behavior:
- ``filter`` — drops every record that reaches it; the condition
  selects which records reach it (impl/filter.go:49-55 +
  pkg/processor/runnable_processor.go:70-110). Net effect:
  ``WHERE NOT condition`` (no condition → drop all).
- ``clone`` — emit N+1 copies with ``clone.index`` metadata 0..N
  (impl/clone.go:73-90, arch-v2 only).
- ``split`` — explode an array field into one record per element with
  ``split.index`` metadata (impl/split.go:91-125, arch-v2 only).
- ``error`` — fail every (condition-matching) record with a templated
  message (impl/error.go:83-117); failures are *routed* (nack → DLQ),
  not raised, so here they tag the ``_error`` column for the runtime.

Scale: filter is a codegen'd predicate (pushed toward the scan when it
references scan columns); clone/split are generate/explode — narrow,
no shuffle; error is a projection.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from conduit_spark.expr import compile_template, parse_ref
from conduit_spark.expr.refs import resolve
from conduit_spark.operators.base import ERROR_COL, ensure_error_col, to_condition


def filter_records(
    df: DataFrame, *, condition: str | Column | None = None
) -> DataFrame:
    """Drop records matching ``condition`` (all records if none)."""
    cond = to_condition(df, condition)
    if cond is None:
        return df.filter(F.lit(False))
    return df.filter(~F.coalesce(cond, F.lit(False)))


def clone(
    df: DataFrame,
    times: int,
    *,
    condition: str | Column | None = None,
) -> DataFrame:
    """Emit ``times``+1 copies of each matching record, tagging
    ``clone.index`` metadata 0..times (impl/clone.go:73-90).

    posexplode over a generated sequence — row-local, no shuffle, no
    driver involvement; non-matching records pass through unchanged.
    """
    if times < 1:
        raise ValueError("clone.times must be >= 1")
    cond = to_condition(df, condition)
    n = F.when(cond, F.lit(times)).otherwise(F.lit(0)) if cond is not None else F.lit(times)
    exploded = df.select(
        "*", F.posexplode(F.sequence(F.lit(0), n)).alias("__clone_idx", "__clone_val")
    )
    out = exploded.withColumn(
        "metadata",
        F.when(
            F.lit(True) if cond is None else cond,
            F.map_concat(
                F.col("metadata"),
                F.create_map(
                    F.lit("clone.index"), F.col("__clone_idx").cast("string")
                ),
            ),
        ).otherwise(F.col("metadata")),
    )
    return out.drop("__clone_idx", "__clone_val")


def split(
    df: DataFrame,
    field: str,
    *,
    condition: str | Column | None = None,
) -> DataFrame:
    """Explode the array at ``field`` into one record per element,
    tagging ``split.index`` (impl/split.go:91-125).

    Requires a schema-bound payload whose target field is an array (the
    reference likewise errors on non-array fields, split.go:98-103).
    """
    ref = parse_ref(field)
    if not ref.root.startswith("payload.") or not ref.path:
        raise ValueError("split targets an array field inside the payload")
    arr = resolve(ref, df)
    cond = to_condition(df, condition)
    from pyspark.sql.types import ArrayType

    # resolve() returns the typed column when bound — verify it's an array
    try:
        dt = df.select(arr.alias("__a")).schema["__a"].dataType
    except Exception:  # pragma: no cover
        dt = None
    if not isinstance(dt, ArrayType):
        raise ValueError(f"split field {field!r} is not an array (split.go:98-103)")

    matching = df if cond is None else df.filter(F.coalesce(cond, F.lit(False)))
    passthrough = None if cond is None else df.filter(~F.coalesce(cond, F.lit(False)))

    from conduit_spark.operators.field_ops import _PAYLOAD_TYPED, _resync_json

    typed = _PAYLOAD_TYPED[ref.root]
    exploded = matching.select(
        "*", F.posexplode(arr).alias("__split_idx", "__split_val")
    )
    exploded = exploded.withColumn(
        typed, F.col(typed).withField(".".join(ref.path), F.col("__split_val"))
    ).withColumn(
        "metadata",
        F.map_concat(
            F.col("metadata"),
            F.create_map(F.lit("split.index"), F.col("__split_idx").cast("string")),
        ),
    )
    exploded = _resync_json(exploded.drop("__split_idx", "__split_val"), ref.root)
    if passthrough is None:
        return exploded
    return exploded.unionByName(passthrough)


def error(
    df: DataFrame,
    message: str = "error processor triggered",
    *,
    condition: str | Column | None = None,
) -> DataFrame:
    """Tag matching records as errored with a templated message
    (impl/error.go:83-117); the pipeline runtime routes them to the
    DLQ instead of raising (stream/dlq.go semantics)."""
    df = ensure_error_col(df)
    cond = to_condition(df, condition)
    msg = compile_template(message, df)
    if cond is None:
        return df.withColumn(ERROR_COL, msg)
    return df.withColumn(
        ERROR_COL, F.when(cond, msg).otherwise(F.col(ERROR_COL))
    )
