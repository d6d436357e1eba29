"""Text chunking for LLM/RAG pipelines (beyond the reference; its
precedent is the AI components design —
docs/design-documents/20260724-ai-pipeline-components.md — which
pairs chunking with the cohere/openai embed processors).

Token-window chunking with overlap, as pure array algebra: tokenize →
window starts via sequence(stride) → slice per start → posexplode.
Narrow (no shuffle), codegen'd, and exactly reproducible in SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from conduit_spark.sources.tables import load_table

CHUNK_SIZE = 32  # tokens per chunk
CHUNK_OVERLAP = 8  # tokens shared between consecutive chunks
_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    *,
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Explode each document into overlapping token-window chunks.

    Adds ``chunk_idx``, ``chunk_text``, ``chunk_n_tokens``. Documents
    shorter than one stride still yield chunk 0.
    """
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # one start per stride; last partial window included iff it adds tokens
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(stride)).cast("int"),
        F.lit(1),
    )
    starts = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        starts,
        lambda s: F.slice(toks, s * stride + 1, size),
    )
    out = df.withColumn("__chunks", chunks).select(
        "*",
        F.posexplode("__chunks").alias("chunk_idx", "__chunk_toks"),
    )
    return (
        out.withColumn("chunk_text", F.concat_ws(" ", F.col("__chunk_toks")))
        .withColumn("chunk_n_tokens", F.size("__chunk_toks"))
        .drop("__chunks", "__chunk_toks")
    )


def c_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_text(docs).select(
        "doc_id", "chunk_idx", "chunk_text", "chunk_n_tokens"
    )


QUERIES = {"c_chunk_documents": c_chunk_documents}

ORACLES = {
    "c_chunk_documents": f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS n
            FROM documents),
        starts AS (
            SELECT doc_id, toks,
                   unnest(generate_series(0,
                       greatest(CAST(ceil(CAST(n - {CHUNK_OVERLAP} AS DOUBLE)
                                / {_STRIDE}) AS INT), 1) - 1)) AS c
            FROM t)
        SELECT doc_id, CAST(c AS INT) AS chunk_idx,
               array_to_string(toks[c * {_STRIDE} + 1 : c * {_STRIDE} + {CHUNK_SIZE}], ' ')
                   AS chunk_text,
               len(toks[c * {_STRIDE} + 1 : c * {_STRIDE} + {CHUNK_SIZE}])
                   AS chunk_n_tokens
        FROM starts
    """,
}
