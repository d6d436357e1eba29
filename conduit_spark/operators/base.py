"""Processor plumbing shared by every operator.

Reference semantics being replicated:

- every processor may carry a *condition* (template → bool) and records
  that don't match bypass the processor untouched
  (pkg/processor/runnable_processor.go:70-110 splits kept/passthrough);
- processors are uniform batch transforms
  (``Process(ctx, []Record) []ProcessedRecord``) — here each operator
  is a pure ``DataFrame -> DataFrame`` over the envelope schema;
- error outputs are routed, not thrown
  (ErrorRecord → nack → DLQ, pkg/lifecycle/stream/dlq.go) — operators
  tag rows in an ``_error`` column and the pipeline runtime routes
  them (conduit_spark.pipeline).

In Spark the bypass is expressed per column: changed columns become
``when(cond, new).otherwise(old)`` so matching and non-matching records
stay in one DataFrame — one codegen stage, no union, no extra shuffle.
Cardinality-changing operators (filter/clone/split) split/recombine
explicitly.
"""

from __future__ import annotations

from collections.abc import Mapping

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from conduit_spark.expr import compile_condition

ERROR_COL = "_error"


def to_condition(df: DataFrame, condition: str | Column | None) -> Column | None:
    """Normalize a condition (template string or Column) to a Column."""
    if condition is None:
        return None
    if isinstance(condition, Column):
        return condition
    return compile_condition(condition, df)


def conditional_with_columns(
    df: DataFrame,
    condition: str | Column | None,
    changes: Mapping[str, Column],
) -> DataFrame:
    """Apply column changes only where ``condition`` holds.

    Non-matching records keep their original values — the Spark
    equivalent of the reference's keep/passthrough split, without
    splitting the DataFrame.
    """
    cond = to_condition(df, condition)
    if cond is None:
        return df.withColumns(dict(changes))
    guarded = {
        name: F.when(cond, col).otherwise(F.col(name) if name in df.columns else F.lit(None))
        for name, col in changes.items()
    }
    return df.withColumns(guarded)


def ensure_error_col(df: DataFrame) -> DataFrame:
    if ERROR_COL not in df.columns:
        return df.withColumn(ERROR_COL, F.lit(None).cast("string"))
    return df


def split_errors(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(ok, errored) — errored rows carry the failure in ``_error``."""
    df = ensure_error_col(df)
    return (
        df.filter(F.col(ERROR_COL).isNull()),
        df.filter(F.col(ERROR_COL).isNotNull()),
    )
