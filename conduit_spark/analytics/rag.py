"""End-to-end RAG ingestion pipeline: chunk → embed → ANN retrieve.

The reference's RAG precedent is its e2e pipeline test
(rag-e2e.yml workflow) built from cohere.embed + processors; here the
whole flow is one DataFrame plan: overlapping chunking (array
algebra), Arrow-batched embedding (deterministic offline transport),
sign-LSH bucketing, and per-bucket top-k retrieval against a query
string — no driver-side loops, every stage partition-parallel.

This query has **no SQL oracle** (the embedding UDF is not
SQL-expressible); the driver records the weaker rows-only check, and
unit tests assert the structural invariants.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from conduit_spark import envelope as env
from conduit_spark import operators as ops
from conduit_spark.analytics.chunking import chunk_text
from conduit_spark.analytics.similarity import cosine
from conduit_spark.sources.tables import load_table

TOP_K = 5
QUERY_TEXT = "fast hash join on big table"


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
            model="embed-v3",
            input_field=".Payload.After.text",
            output_col="embedding",
            transport=ops.fake_transport,
        )
        return out.select(
            F.col("payload_after.doc_id").alias("doc_id"),
            F.col("payload_after.chunk_idx").alias("chunk_idx"),
            F.col("embedding"),
        )

    # embed the 1-row query through the SAME transport as the corpus,
    # but as its own tiny plan — unioning it into the corpus made the
    # qvec filter re-execute the whole corpus chunk+embed pipeline
    vecs = embed(chunks)
    query = spark.createDataFrame([(-1, -1, QUERY_TEXT)], ["doc_id", "chunk_idx", "text"])
    qvec = embed(query).select(F.col("embedding").alias("qvec"))
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


QUERIES = {"rag_ingest_retrieve": rag_ingest_retrieve}
ORACLES: dict[str, str] = {}  # rows-only: embedding UDF is not SQL-expressible
