"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct (modality, n_bytes, content digest, decoded
dimensions). The Spark-side machinery — schema, partition-preserving
mapInPandas over Arrow batches, batch shapes — is real and tested; the
actual media decode is stubbed (no image/audio libs in this container)
behind ``decode_media``, which raises ``NotImplementedError`` for real
codecs and provides a deterministic fake ("dimensions" derived from
the md5 digest) that the DuckDB oracle reproduces, so even the stub
path is correctness-gated.

At scale: binary payloads stay columnar in parquet, the metadata
struct supports predicate pushdown (filter by modality/size without
touching bytes), and decode parallelism is per-partition with Arrow
batch sizing bounding executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from conduit_spark.sources.tables import load_table

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("content", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def as_media(df: DataFrame, content_col: str, id_col: str, modality: str) -> DataFrame:
    """Wrap any binary/string column as a media table (pure projection)."""
    content = F.col(content_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(modality).alias("modality"),
        content.alias("content"),
        F.length(content).cast("long").alias("n_bytes"),
        F.md5(content).alias("digest"),
    )


def decode_media(df: DataFrame, *, real_codecs: bool = False) -> DataFrame:
    """Decode media content → metadata (mapInPandas, Arrow-batched).

    ``real_codecs=True`` is the integration point for PIL/ffmpeg-style
    decoding (unavailable here → NotImplementedError). The default
    deterministic fake derives width/height from the content digest —
    stable, partition-parallel, and SQL-reproducible.
    """
    if real_codecs:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) are not available in this environment; "
            "plug a decoder into decode_media.run when they are"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = [
                hashlib.md5(bytes(c)).hexdigest() if c is not None else None
                for c in pdf["content"]
            ]
            pdf_out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "digest": digests,
                    "width": [
                        (int(d[0:2], 16) + 1) if d else None for d in digests
                    ],
                    "height": [
                        (int(d[2:4], 16) + 1) if d else None for d in digests
                    ],
                }
            )
            yield pdf_out

    return df.mapInPandas(run, DECODED_SCHEMA)


def m_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as fake image bytes → decode metadata."""
    docs = load_table(spark, sf_dir, "documents")
    media = as_media(docs, "text", "doc_id", "image")
    return decode_media(media).orderBy("media_id")


QUERIES = {"m_decode_stub": m_decode_stub}

ORACLES = {
    "m_decode_stub": """
        SELECT doc_id AS media_id,
               'image' AS modality,
               length(text) AS n_bytes,
               md5(text) AS digest,
               CAST(('0x' || substr(md5(text), 1, 2)) AS INT) + 1 AS width,
               CAST(('0x' || substr(md5(text), 3, 2)) AS INT) + 1 AS height
        FROM documents ORDER BY media_id
    """,
}
