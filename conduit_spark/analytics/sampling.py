"""Deterministic corpus sampling for training-data curation.

Large-scale pipelines rarely train on the full crawl: they sample per
stratum (language, source, quality band) at configured rates. Doing it
with ``rand()`` is irreproducible and unauditable; the standard
practice is hash-gating — keep a doc iff
``hash(doc_id) / 2^32 < rate(stratum)``. That makes the sample:

- **deterministic** — same corpus, same rates → same sample, on any
  cluster layout (no RNG seeds per partition);
- **stable under growth** — new docs don't flip old keep decisions;
- **exactly SQL-auditable** — the md5-derived gate reproduces in any
  engine (functions/hashing.md5_int32), so the oracle is exact.

Plan shape: one narrow scan (hash + per-row gate), one tiny groupBy —
no joins, no shuffle beyond the stratum agg. SF-invariant at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from conduit_spark.functions.hashing import md5_int32, sql_md5_int32
from conduit_spark.sources.tables import load_table

# per-language keep rates (the stratification config)
RATES = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.1}
DEFAULT_RATE = 0.05
_SCALE = 2**32


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = DEFAULT_RATE,
) -> DataFrame:
    """Rows whose hash-gate admits them at their stratum's rate."""
    rate = None
    for s, r in sorted(rates.items()):
        branch = F.when(F.col(stratum_col) == s, F.lit(r))
        rate = branch if rate is None else rate.when(F.col(stratum_col) == s, F.lit(r))
    rate = rate.otherwise(F.lit(default_rate)) if rate is not None else F.lit(default_rate)
    gate = md5_int32(F.col(key_col)).cast("double") / F.lit(float(_SCALE))
    return df.filter(gate < rate)


def smp_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sample audit: kept vs total vs configured rate."""
    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_sample(docs, "lang", "doc_id", RATES).select(
        "lang", F.lit(1).alias("keep")
    )
    totals = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    kept_counts = kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))
    return (
        totals.join(kept_counts, "lang", "left")
        .select(
            "lang",
            "n_total",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        )
        .orderBy("lang")
    )


def smp_stratified_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sampled doc ids themselves (audit-joinable downstream)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        stratified_sample(docs, "lang", "doc_id", RATES)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


IMPORTANCE_FULL_AT = 512  # docs with >= this many tokens always kept


def smp_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance sampling with Horvitz-Thompson weights:
    keep each document with probability proportional to its length
    (``rate = min(1, n_tokens/512)``) via the same md5 hash-gate, and
    attach ``weight = 1/rate`` so any downstream statistic over the
    sample re-weights to an unbiased full-corpus estimate — the
    standard curation move when short/low-signal docs dominate a crawl
    but must not dominate training.

    Exactness: the rate is an integer token count divided by one
    double literal — bit-identical in both engines — and the gate is
    the shared md5 hash, so the kept SET and the weights are
    oracle-exact. Plan: one narrow scan, zero shuffles before the
    final order; SF-invariant at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    rate = F.least(
        F.lit(1.0),
        F.greatest(n_tok, F.lit(1)).cast("double")
        / F.lit(float(IMPORTANCE_FULL_AT)),
    )
    gate = md5_int32(F.col("doc_id")).cast("double") / F.lit(float(_SCALE))
    return (
        docs.select(
            "doc_id",
            n_tok.cast("bigint").alias("n_tokens"),
            F.round(rate, 9).alias("keep_rate"),
            F.round(F.lit(1.0) / rate, 9).alias("ht_weight"),
            gate.alias("g"),
        )
        .filter(F.col("g") < F.col("keep_rate"))
        .drop("g")
        .orderBy("doc_id")
    )


QUERIES = {
    "smp_stratified": smp_stratified,
    "smp_importance": smp_importance,
    "smp_stratified_ids": smp_stratified_ids,
}

_GATE = f"CAST({sql_md5_int32('CAST(doc_id AS VARCHAR)')} AS DOUBLE) / {float(_SCALE)}"
_RATE = (
    "CASE "
    + " ".join(f"WHEN lang = '{s}' THEN {r}" for s, r in sorted(RATES.items()))
    + f" ELSE {DEFAULT_RATE} END"
)

ORACLES = {
    # rate = n/512 terminates within 9 decimals (2^-9), so round(.,9)
    # is exact and the kept SET matches bit-for-bit; 1/rate rounds the
    # same double in both engines
    "smp_importance": f"""
        WITH t AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents),
        r AS (
            SELECT doc_id, n_tokens,
                   least(CAST(1 AS DOUBLE),
                         CAST(greatest(n_tokens, 1) AS DOUBLE)
                         / {float(IMPORTANCE_FULL_AT)}) AS rate
            FROM t)
        SELECT doc_id, n_tokens,
               round(rate, 9) AS keep_rate,
               round(CAST(1 AS DOUBLE) / rate, 9) AS ht_weight
        FROM r
        WHERE {_GATE} < round(rate, 9)
        ORDER BY doc_id
    """,
    "smp_stratified": f"""
        WITH kept AS (
            SELECT lang FROM documents WHERE {_GATE} < {_RATE})
        SELECT d.lang, count(*) AS n_total,
               coalesce(k.n_kept, 0) AS n_kept
        FROM documents d
        LEFT JOIN (SELECT lang, count(*) AS n_kept FROM kept GROUP BY lang) k
          ON d.lang = k.lang
        GROUP BY d.lang, k.n_kept
        ORDER BY d.lang
    """,
    "smp_stratified_ids": f"""
        SELECT doc_id, lang FROM documents
        WHERE {_GATE} < {_RATE}
        ORDER BY doc_id
    """,
}
