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


# --- GPT-style sequence packing --------------------------------------

PACK_BLOCK = 512  # tokens per training block
PACK_BUCKET = 4096  # docs per prefix-sum bucket


def c_pack_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-then-chunk sequence packing: lay every document's
    tokens end-to-end in ``doc_id`` order and cut ``PACK_BLOCK``-token
    training blocks — each doc's global token offset and the block
    range it spans (the standard LLM pretraining data layout).

    The global offset is a prefix sum. A single ``Window.orderBy``
    computes it in ONE task over ALL docs — the q15 regression class —
    so this uses the two-phase shape instead: per-bucket token sums
    (keyed agg, ``PACK_BUCKET`` docs per bucket) → running sum over
    the tiny bucket relation (the only global window, n_docs/4096
    rows — ~250k rows at 10⁹ docs, trivially one task) → join back +
    an intra-bucket window partitioned by bucket. Work per task stays
    bounded by the bucket size at any corpus scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        F.expr(f"doc_id div {PACK_BUCKET}").alias("bucket"),
    ).localCheckpoint()  # feeds the bucket sums AND the join back
    from pyspark.sql import Window

    bsums = per_doc.groupBy("bucket").agg(F.sum("n_tokens").alias("bt"))
    wb = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boffs = bsums.select(
        "bucket", F.coalesce(F.sum("bt").over(wb), F.lit(0)).alias("bucket_off")
    )
    wi = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.col("bucket_off") + F.coalesce(
        F.sum("n_tokens").over(wi), F.lit(0)
    )
    return (
        per_doc.join(boffs, "bucket")
        .withColumn("token_offset", off)
        .select(
            "doc_id",
            "n_tokens",
            "token_offset",
            F.expr(f"token_offset div {PACK_BLOCK}").alias("start_block"),
            F.expr(
                f"(token_offset + n_tokens - 1) div {PACK_BLOCK}"
            ).alias("end_block"),
        )
        .orderBy("doc_id")
    )


QUERIES = {
    "c_chunk_documents": c_chunk_documents,
    "c_pack_blocks": c_pack_blocks,
}

ORACLES = {
    "c_pack_blocks": f"""
        WITH d AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents),
        o AS (
            SELECT doc_id, n_tokens,
                   CAST(COALESCE(sum(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS token_offset
            FROM d)
        SELECT doc_id, n_tokens, token_offset,
               token_offset // {PACK_BLOCK} AS start_block,
               (token_offset + n_tokens - 1) // {PACK_BLOCK} AS end_block
        FROM o
        ORDER BY doc_id
    """,
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
