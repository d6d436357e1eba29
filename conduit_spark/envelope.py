"""The OpenCDC record envelope as a Spark schema.

The reference's only data abstraction is the OpenCDC record — a
row-oriented, schema-optional CDC envelope with position, operation,
metadata, key and before/after payloads, where key/payload are *per
record* either raw bytes or structured data
(reference: docs/design-documents/20220309-opencdc.md:1-150,
pkg/connector/source.go:1005-1029).

Spark has no per-row dynamic typing, so the envelope keeps a dual
representation: ``*_raw`` BinaryType columns for raw data and JSON
StringType columns for structured data (``is_structured`` says which
side is authoritative per record). Pipelines that know their payload
schema can *bind* it — ``with_typed_payload`` parses the JSON into a
typed StructType column so every downstream operator stays inside
whole-stage codegen (from_json is JVM-side, no Python).

Operations: create / update / delete / snapshot
(reference: pkg/plugin/processor/builtin/impl/unwrap/debezium.go:276-283).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    MapType,
    StringType,
    StructField,
    StructType,
)

OPERATIONS = ("create", "update", "delete", "snapshot")

# Standard metadata keys (reference: pkg/connector/source.go:1005-1029).
META_READ_AT = "opencdc.readAt"
META_CREATED_AT = "opencdc.createdAt"
META_COLLECTION = "opencdc.collection"
META_SOURCE_ID = "conduit.source.connector.id"

ENVELOPE_SCHEMA = StructType(
    [
        StructField("position", BinaryType(), True),
        StructField("operation", StringType(), True),
        StructField("metadata", MapType(StringType(), StringType()), True),
        StructField("key_raw", BinaryType(), True),
        StructField("key_json", StringType(), True),
        StructField("payload_before_json", StringType(), True),
        StructField("payload_after_json", StringType(), True),
        StructField("payload_after_raw", BinaryType(), True),
        StructField("is_structured", BooleanType(), True),
    ]
)

ENVELOPE_COLUMNS = tuple(f.name for f in ENVELOPE_SCHEMA.fields)


def from_table(
    df: DataFrame,
    *,
    key_cols: list[str],
    source_id: str = "source",
    operation: str = "create",
    position_col: str | None = None,
    typed: bool = False,
) -> DataFrame:
    """Wrap an arbitrary relational DataFrame into OpenCDC envelopes.

    This is the batch analog of a source connector snapshot: each row
    becomes one ``create`` (default) record whose structured payload is
    the row itself as JSON, key is the JSON of ``key_cols``, and
    position is a deterministic per-row token (mirroring
    sanitizeRecord / auto-populated metadata in
    pkg/connector/source.go:1005-1029). Pure column expressions — no
    shuffle, no Python.
    """
    if operation not in OPERATIONS:
        raise ValueError(f"operation must be one of {OPERATIONS}, got {operation!r}")
    pos_src: Column = (
        F.col(position_col)
        if position_col
        else F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols])
    )
    key_struct = F.struct(*[F.col(c) for c in key_cols])
    payload_struct = F.struct(*[F.col(c) for c in df.columns])
    cols = [
        pos_src.cast("string").cast("binary").alias("position"),
        F.lit(operation).alias("operation"),
        F.create_map(
            F.lit(META_SOURCE_ID),
            F.lit(source_id),
        ).alias("metadata"),
        F.lit(None).cast("binary").alias("key_raw"),
        F.to_json(key_struct).alias("key_json"),
        F.lit(None).cast("string").alias("payload_before_json"),
        F.to_json(payload_struct).alias("payload_after_json"),
        F.lit(None).cast("binary").alias("payload_after_raw"),
        F.lit(True).alias("is_structured"),
    ]
    if typed:
        # bind the typed struct straight from the source columns —
        # avoids the from_json(to_json(...)) round-trip per reference
        # that Catalyst does not collapse (measured 2-4× on envelope
        # pipelines; see .explain of any payload condition)
        cols.append(payload_struct.alias("payload_after"))
    return df.select(*cols)


def with_typed_payload(
    df: DataFrame,
    schema: StructType,
    *,
    field: str = "payload_after_json",
    out: str = "payload_after",
) -> DataFrame:
    """Bind a payload schema: parse the JSON column into a typed struct.

    After binding, operators address ``payload_after.foo`` as a native
    nested column — codegen'd, prunable, no JSON re-parse per operator.
    """
    return df.withColumn(out, F.from_json(F.col(field), schema))


def collapse_typed_payload(
    df: DataFrame, *, field: str = "payload_after", out: str = "payload_after_json"
) -> DataFrame:
    """Inverse of ``with_typed_payload`` — serialize the struct back."""
    return df.withColumn(out, F.to_json(F.col(field))).drop(field)


def validate(df: DataFrame) -> DataFrame:
    """Schema-level envelope check (cheap, plan-time)."""
    missing = [c for c in ENVELOPE_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"not an OpenCDC envelope DataFrame; missing {missing}")
    return df
