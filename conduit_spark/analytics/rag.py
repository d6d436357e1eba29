"""End-to-end RAG ingestion pipeline: chunk → embed → ANN retrieve.

The reference's RAG precedent is its e2e pipeline test
(rag-e2e.yml workflow) built from cohere.embed + processors; here the
whole flow is one DataFrame plan: overlapping chunking (array
algebra), Arrow-batched embedding, sign-LSH-ready vectors, and top-k
retrieval against a query string — no driver-side loops, every stage
partition-parallel.

The embedding stage runs through the real ``llm_embed`` operator
(envelope, mapInPandas, batching, error routing) with the
``hash_embed_transport`` — per-text md5-derived vectors that are
batch- and partition-invariant, so the WHOLE pipeline (chunk → embed
→ cosine top-k) has an exact DuckDB oracle: the embedding of each
chunk is ``md5(model:text:dim)`` scaled to [0,1), reproduced in SQL
via the cross-engine md5 trick (functions/hashing.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from conduit_spark import envelope as env
from conduit_spark import operators as ops
from conduit_spark.analytics.chunking import (
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    _STRIDE,
    chunk_text,
)
from conduit_spark.analytics.similarity import cosine
from conduit_spark.operators.enrich import HASH_EMBED_DIM
from conduit_spark.sources.tables import load_table

TOP_K = 5
QUERY_TEXT = "fast hash join on big table"
EMBED_MODEL = "embed-v3"


def rag_ingest_retrieve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk all documents, embed chunks + the query (same transport),
    return the top-k chunks by cosine similarity."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = chunk_text(docs).select(
        "doc_id", "chunk_idx", F.col("chunk_text").alias("text")
    )

    def embed(df: DataFrame) -> DataFrame:
        env_df = env.from_table(
            df, key_cols=["doc_id", "chunk_idx"], source_id="rag", typed=True
        )
        out = ops.llm_embed(
            env_df,
            provider="cohere",
            model=EMBED_MODEL,
            input_field=".Payload.After.text",
            output_col="embedding",
            transport=ops.hash_embed_transport,
        )
        return out.select(
            F.col("payload_after.doc_id").alias("doc_id"),
            F.col("payload_after.chunk_idx").alias("chunk_idx"),
            F.col("embedding"),
        )

    # embed the 1-row query through the SAME transport function as the
    # corpus, but driver-side: a full envelope+mapInPandas stage for
    # one row cost ~0.4s of pure scheduling (r5), and the transport is
    # deterministic pure Python, so calling it directly yields the
    # bit-identical doubles the distributed path would.
    vecs = embed(chunks)
    qv = ops.hash_embed_transport(
        {"kind": "embed", "model": EMBED_MODEL, "input": [QUERY_TEXT]}
    )["output"][0]
    qvec = spark.range(1).select(
        F.array(*[F.lit(float(x)) for x in qv]).alias("qvec")
    )
    return (
        vecs.crossJoin(F.broadcast(qvec))
        .select(
            "doc_id",
            "chunk_idx",
            F.round(cosine(F.col("embedding"), F.col("qvec")), 9).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"), F.asc("chunk_idx"))
        .limit(TOP_K)
    )


def _sql_hash_vec(text_expr: str) -> str:
    """DuckDB list literal mirroring hash_embed_transport."""
    dims = ", ".join(
        f"CAST('0x' || substr(md5('{EMBED_MODEL}:' || {text_expr} || ':{j}'), 1, 8)"
        f" AS BIGINT) / 4294967296.0"
        for j in range(HASH_EMBED_DIM)
    )
    return f"[{dims}]"


def _sql_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform({a}, (x, i) -> x * {b}[i]))"
    )


def _sql_norm(a: str) -> str:
    return f"sqrt(list_sum(list_transform({a}, x -> x * x)))"


QUERIES = {"rag_ingest_retrieve": rag_ingest_retrieve}

ORACLES = {
    "rag_ingest_retrieve": f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS n
            FROM documents),
        starts AS (
            SELECT doc_id, toks,
                   unnest(generate_series(0,
                       greatest(CAST(ceil(CAST(n - {CHUNK_OVERLAP} AS DOUBLE)
                                / {_STRIDE}) AS INT), 1) - 1)) AS c
            FROM t),
        chunks AS (
            SELECT doc_id, CAST(c AS INT) AS chunk_idx,
                   array_to_string(
                       toks[c * {_STRIDE} + 1 : c * {_STRIDE} + {CHUNK_SIZE}],
                       ' ') AS chunk_text
            FROM starts),
        emb AS (
            SELECT doc_id, chunk_idx,
                   {_sql_hash_vec("chunk_text")} AS v
            FROM chunks),
        q AS (SELECT {_sql_hash_vec(f"'{QUERY_TEXT}'")} AS qv)
        SELECT doc_id, chunk_idx,
               round({_sql_dot("v", "qv")}
                     / ({_sql_norm("v")} * {_sql_norm("qv")}), 9) AS score
        FROM emb, q
        ORDER BY score DESC, doc_id ASC, chunk_idx ASC
        LIMIT {TOP_K}
    """,
}
