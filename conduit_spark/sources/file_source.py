"""builtin:file source + parquet/json/orc table sources.

Reference: the file source tails a file line-by-line, each line one
raw record (pkg/plugin/connector/builtin/registry.go:42-49). Spark
mapping: ``read.text`` / ``readStream.text`` (file-arrival streaming
with exactly-once file tracking via the checkpoint), lines as raw
payloads. JSON/parquet sources land as structured payloads.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def file_source(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "text",
    source_id: str = "file",
    schema: StructType | str | None = None,
    streaming: bool = False,
    reader_options: dict[str, str] | None = None,
) -> DataFrame:
    """Read a file/directory as OpenCDC envelopes.

    - ``text``: each line → raw payload (file-source parity)
    - ``json``/``parquet``/``csv``/``orc``: rows → structured payload
      (csv defaults to header=true, schema inference in batch)

    Position is content+file derived (deterministic); streaming mode
    relies on Spark's file-source checkpointing for exactly-once —
    the engine's replacement for the reference's position/ack plumbing
    (SURVEY.md §3).
    """
    reader = spark.readStream if streaming else spark.read
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    if fmt == "text":
        if streaming and schema is None:
            df = reader.format("text").load(path)
        else:
            df = reader.text(path)
        line = F.col("value")
        return df.select(
            F.md5(F.concat(F.input_file_name(), line)).cast("binary").alias("position"),
            F.lit("create").alias("operation"),
            F.create_map(
                F.lit("conduit.source.connector.id"), F.lit(source_id),
                F.lit("file.path"), F.input_file_name(),
            ).alias("metadata"),
            F.lit(None).cast("binary").alias("key_raw"),
            F.lit(None).cast("string").alias("key_json"),
            F.lit(None).cast("string").alias("payload_before_json"),
            F.lit(None).cast("string").alias("payload_after_json"),
            line.cast("binary").alias("payload_after_raw"),
            F.lit(False).alias("is_structured"),
        )
    if fmt in ("json", "parquet", "csv", "orc"):
        if fmt == "csv" and "header" not in (reader_options or {}):
            reader = reader.option("header", "true")
        if streaming:
            if schema is None:
                raise ValueError(
                    "streaming json/parquet/csv/orc sources need an explicit schema"
                )
            df = reader.format(fmt).schema(schema).load(path)
        else:
            if fmt == "csv" and schema is None:
                reader = reader.option("inferSchema", "true")
            df = reader.format(fmt).load(path)
        payload = F.struct(*[F.col(c) for c in df.columns])
        return df.select(
            F.md5(F.to_json(payload)).cast("binary").alias("position"),
            F.lit("create").alias("operation"),
            F.create_map(
                F.lit("conduit.source.connector.id"), F.lit(source_id)
            ).alias("metadata"),
            F.lit(None).cast("binary").alias("key_raw"),
            F.lit(None).cast("string").alias("key_json"),
            F.lit(None).cast("string").alias("payload_before_json"),
            F.to_json(payload).alias("payload_after_json"),
            F.lit(None).cast("binary").alias("payload_after_raw"),
            F.lit(True).alias("is_structured"),
        )
    raise ValueError(f"unsupported file source format {fmt!r}")
