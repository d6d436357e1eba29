"""Distinct-count sketches for corpus statistics (beyond the reference).

KMV (k-minimum-values, Bar-Yossef et al. 2002): keep the k smallest
hash values of a set; the k-th smallest ``h_k`` estimates the distinct
count as ``(k-1) * H / h_k`` for hash space ``[0, H)``. Unlike
HyperLogLog the sketch is *deterministic* given the hash function, so
the md5-based hash (``functions/hashing.py``) makes the whole query —
sketch, estimate, and relative error — bit-identical in Spark and
DuckDB.

Why a sketch at all: counting distinct shingles across 100 TB exactly
means shuffling every distinct (key, value) pair. The KMV sketch is
mergeable with O(k) state — at cluster scale each partition keeps its
k smallest values and the merge is a k-way min (a custom Aggregator or
``sortWithinPartitions`` + ``mapPartitions`` head-k). The query below
also computes the exact count so the result self-reports estimation
error; a production run drops the exact branch.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from conduit_spark.analytics.dedup import SHINGLE_W, word_grams
from conduit_spark.functions.hashing import md5_int32, sql_md5_int32
from conduit_spark.sources.tables import load_table

KMV_K = 64
HASH_SPACE = float(2**32)  # md5_int32 range


def sk_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct word-``SHINGLE_W``-gram count: exact vs the
    KMV-``KMV_K`` estimate, with relative error.

    Plan: narrow explode → hashed distinct (source, x) relation (one
    shuffle), then a per-source rank to pick ``h_k`` and a keyed count
    for the exact side. With fewer than k distinct values the sketch
    degenerates to the exact count (rank k is absent → estimate :=
    exact), mirrored in the oracle.
    """
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " "))
    rel = (
        docs.filter(n >= SHINGLE_W)
        .select("source", F.explode(word_grams(SHINGLE_W)).alias("gram"))
        .select("source", md5_int32(F.col("gram")).alias("x"))
        .distinct()
    ).localCheckpoint()  # feeds both the rank and the exact count
    w = Window.partitionBy("source").orderBy("x")
    kth = (
        rel.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == KMV_K)
        .select("source", F.col("x").alias("kth_hash"))
    )
    exact = rel.groupBy("source").agg(F.count(F.lit(1)).alias("n_exact"))
    est = F.when(
        F.col("kth_hash").isNull(), F.col("n_exact").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1)) * F.lit(HASH_SPACE) / F.col("kth_hash").cast("double")
    )
    return (
        exact.join(kth, "source", "left")
        .select(
            "source",
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.col("kth_hash").cast("bigint").alias("kth_hash"),
            F.round(est, 6).alias("est_distinct"),
            F.round(
                F.abs(est - F.col("n_exact").cast("double"))
                / F.col("n_exact").cast("double"),
                6,
            ).alias("rel_error"),
        )
        .orderBy("source")
    )


_REL_SQL = f"""
    SELECT DISTINCT source, {sql_md5_int32("g")} AS x
    FROM (
        SELECT source,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(string_split(text,' ')) - {SHINGLE_W - 1}),
                   i -> array_to_string(string_split(text,' ')[i:i+{SHINGLE_W - 1}], ' ')
               ))) AS g
        FROM documents
        WHERE len(string_split(text,' ')) >= {SHINGLE_W})
"""

QUERIES = {
    "sk_kmv_distinct": sk_kmv_distinct,
}

ORACLES = {
    "sk_kmv_distinct": f"""
        WITH rel AS ({_REL_SQL}),
        kth AS (
            SELECT source, x AS kth_hash
            FROM (
                SELECT source, x,
                       row_number() OVER (PARTITION BY source ORDER BY x) AS rn
                FROM rel)
            WHERE rn = {KMV_K}),
        exact AS (SELECT source, count(*) AS n_exact FROM rel GROUP BY 1),
        j AS (
            SELECT e.source, e.n_exact, kth.kth_hash,
                   CASE WHEN kth.kth_hash IS NULL
                        THEN CAST(e.n_exact AS DOUBLE)
                        ELSE {float(KMV_K - 1)} * {HASH_SPACE}
                             / CAST(kth.kth_hash AS DOUBLE)
                   END AS est
            FROM exact e LEFT JOIN kth USING (source))
        SELECT source,
               CAST(n_exact AS BIGINT) AS n_exact,
               CAST(kth_hash AS BIGINT) AS kth_hash,
               round(est, 6) AS est_distinct,
               round(abs(est - CAST(n_exact AS DOUBLE))
                     / CAST(n_exact AS DOUBLE), 6) AS rel_error
        FROM j
        ORDER BY source
    """,
}
