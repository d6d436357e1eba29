"""Destination connectors.

Reference destinations (pkg/plugin/connector/builtin/registry.go:42-49):
file (append lines), log (print each record), kafka, postgres, s3.
Spark mapping: file/s3 = DataFrame writers on paths (s3a:// works
unchanged), log = console/show, kafka = format("kafka"), postgres =
JDBC. Multi-collection routing uses the ``opencdc.collection``
metadata key as a partition column
(docs/design-documents/20240402-multiple-collections.md:19-51).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from conduit_spark.envelope import META_COLLECTION


def _serializable(df: DataFrame) -> DataFrame:
    """Envelope → JSON-friendly projection (binary → base64/strings)."""
    cols = []
    for name, dtype in df.dtypes:
        if dtype == "binary":
            cols.append(F.col(name).cast("string").alias(name))
        else:
            cols.append(F.col(name))
    return df.select(*cols)


def file_sink(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "json",
    mode: str = "append",
    partition_by_collection: bool = False,
) -> None:
    """Write envelopes to files (json/parquet/text).

    ``partition_by_collection=True`` routes records to per-collection
    directories (the destination-table-template analog) — at scale
    this is a partitioned write, one task per collection shard, no
    driver routing.
    """
    out = df
    writer_df = out
    if partition_by_collection:
        writer_df = out.withColumn(
            "collection",
            F.coalesce(F.col("metadata").getItem(META_COLLECTION), F.lit("default")),
        )
    if fmt == "json":
        writer_df = _serializable(writer_df)
    w = writer_df.write.mode(mode)
    if partition_by_collection:
        w = w.partitionBy("collection")
    w.format(fmt).save(path)


def log_sink(df: DataFrame, n: int = 20) -> None:
    """builtin:log — print records (dev/debug destination)."""
    _serializable(df).show(n=n, truncate=False)


def jdbc_sink(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    options: dict[str, str] | None = None,
) -> None:
    """builtin:postgres destination (batch/foreachBatch insert path).

    Upsert parity requires a MERGE-capable target or ON CONFLICT via
    option("truncate", ...) patterns; plain insert here, upsert left to
    a foreachBatch with staging-table MERGE (documented delta vs the
    reference's per-record upsert)."""
    w = df.write.mode(mode)
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.jdbc(url, table)


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
) -> None:
    """builtin:kafka destination — envelope → key/value Kafka records."""
    out = df.select(
        F.coalesce(F.col("key_json"), F.col("key_raw").cast("string")).cast("binary").alias("key"),
        F.coalesce(
            F.col("payload_after_json"), F.col("payload_after_raw").cast("string")
        ).cast("binary").alias("value"),
    )
    (
        out.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )
