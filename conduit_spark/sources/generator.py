"""builtin:generator — synthetic record source.

Reference: the generator connector produces records from a field-type
spec (``format.options.id: int``, ``name: string`` … —
examples/pipelines/multiple-destinations.yaml,
cmd/conduit/root/quickstart/quickstart.go:50-54), at an optional rate,
bounded by recordCount.

Batch mode: ``spark.range(n)`` (parallel, no driver data) + column
synthesis → envelope. Streaming mode: the ``rate`` source with the
same synthesis projection. Synthesis is a pure function of the row
index, so output is deterministic and oracle-checkable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

FIELD_TYPES = ("int", "string", "bool", "time")

_BASE_TS = "2024-01-01 00:00:00"


def _synth(field: str, ftype: str, idx: Column) -> Column:
    if ftype == "int":
        return (idx * F.lit(17) + F.lit(3)) % F.lit(1000)
    if ftype == "string":
        return F.concat(F.lit(f"{field}-"), idx.cast("string"))
    if ftype == "bool":
        return (idx % 2) == 0
    if ftype == "time":
        return F.timestamp_seconds(
            F.unix_timestamp(F.lit(_BASE_TS).cast("timestamp")) + idx
        )
    raise ValueError(f"generator field type must be one of {FIELD_TYPES}, got {ftype!r}")


def generator_source(
    spark: SparkSession,
    *,
    fields: dict[str, str],
    record_count: int | None = None,
    rate: float | None = None,
    source_id: str = "generator",
    streaming: bool = False,
    typed: bool = False,
    operations: list[str] | None = None,
    fmt: str = "structured",
    collections: list[str] | None = None,
) -> DataFrame:
    """Produce OpenCDC envelopes from a field spec.

    Batch: ``record_count`` rows. Streaming: unbounded at
    ``rate`` rows/sec (Spark ``rate`` source; its ``value`` column is
    the record index, so batch and stream synthesize identically).

    Reference-connector parity knobs: ``operations`` cycles the record
    operation per index (default all-create), ``fmt="raw"`` puts the
    serialized payload into ``payload_after_raw`` instead of the JSON
    column, and ``collections`` cycles the ``opencdc.collection``
    metadata key so multi-collection routing is exercisable end-to-end.
    """
    from conduit_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    if streaming:
        reader = spark.readStream.format("rate").option(
            "rowsPerSecond", int(rate or 10)
        )
        base = reader.load().select(F.col("value").alias("__idx"))
    else:
        if not record_count:
            raise ValueError("batch generator needs record_count")
        base = spark.range(record_count).select(F.col("id").alias("__idx"))
    if fmt not in ("structured", "raw"):
        raise ValueError("generator format.type must be structured or raw")
    idx = F.col("__idx")
    payload = F.struct(
        *[_synth(name, ftype, idx).alias(name) for name, ftype in fields.items()]
    )
    if operations:
        op = None
        for i, o in enumerate(operations):
            branch = F.when(idx % len(operations) == i, F.lit(o))
            op = branch if op is None else op.when(idx % len(operations) == i, F.lit(o))
    else:
        op = F.lit("create")
    meta_pairs = [F.lit("conduit.source.connector.id"), F.lit(source_id)]
    if collections:
        coll = None
        for i, name in enumerate(collections):
            branch = F.when(idx % len(collections) == i, F.lit(name))
            coll = branch if coll is None else coll.when(
                idx % len(collections) == i, F.lit(name)
            )
        meta_pairs += [F.lit("opencdc.collection"), coll]
    cols = [
        F.concat(F.lit(f"{source_id}:"), idx.cast("string")).cast("binary").alias("position"),
        op.alias("operation"),
        F.create_map(*meta_pairs).alias("metadata"),
        F.lit(None).cast("binary").alias("key_raw"),
        F.to_json(F.struct(idx.alias("id"))).alias("key_json"),
        F.lit(None).cast("string").alias("payload_before_json"),
        (
            F.lit(None).cast("string") if fmt == "raw" else F.to_json(payload)
        ).alias("payload_after_json"),
        (
            F.to_json(payload).cast("binary")
            if fmt == "raw"
            else F.lit(None).cast("binary")
        ).alias("payload_after_raw"),
        F.lit(fmt == "structured").alias("is_structured"),
    ]
    if typed and fmt == "structured":
        # bind the struct directly — keeps operator chains codegen'd
        cols.append(payload.alias("payload_after"))
    return base.select(*cols)
