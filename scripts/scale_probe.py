"""10x scale probe: replicate the sf0.1 documents/embeddings tables
10x (shifted ids, so every text/vector has 10 exact copies — a HARDER
dedup/similarity workload than organic growth) and time the heaviest
operators against both sizes. The interesting number is the time
ratio: an SF-linear operator with bounded candidate generation should
scale well under the 10x data growth + the quadratic-in-copies pair
blowup its caps are there to bound.

Usage: python scripts/scale_probe.py [names...]
Writes the replicated tables to /tmp/conduit_scale10/ (reused if
present) and prints one line per query: name, sf0.1 sec, 10x sec,
ratio, and the 10x output row count.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG_DIR = "/tmp/conduit_scale10"
COPIES = 10
DOC_SHIFT = 1_000_000
VEC_SHIFT = 1_000_000

DEFAULT = [
    "d_exact",
    "d_minhash_lsh_pairs",
    "d_substring_dedup",
    "d_incremental",
    "smp_dsir",
    "t_bigram_lm",
    "t_bm25_topk",
    "cur_ppl_buckets",
    "s_semantic_dedup",
    "sk_hll_distinct",
    # round-7 additions: the hashed-gram DF pipeline and the two other
    # webdata operators (document-shaped, probe-eligible)
    "cur_boilerplate",
    "d_url_dedup",
    "t_gopher_rules",
    # round-8 restructures: the two-phase KMV sketches (r7's weak
    # plans) and the input-scaled token-budget banding — tracked so a
    # regression back toward the one-task shapes shows up as a ratio
    "sk_kmv_distinct",
    "sk_kmv_overlap",
    "cur_token_budget",
]


def build_big(spark) -> None:
    os.makedirs(BIG_DIR, exist_ok=True)
    for table, key, shift in (
        ("documents", "doc_id", DOC_SHIFT),
        ("embeddings", "vec_id", VEC_SHIFT),
    ):
        out = os.path.join(BIG_DIR, f"{table}.parquet")
        if os.path.exists(out):
            continue
        base = spark.read.parquet(os.path.join(SF_DIR, f"{table}.parquet"))
        parts = [
            base.withColumn(key, F.col(key) + F.lit(i * shift))
            for i in range(COPIES)
        ]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.write.mode("overwrite").parquet(out)


def main() -> None:
    from conduit_spark import get_spark
    import __spark_entry__ as entrymod

    names = sys.argv[1:] or DEFAULT
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build_big(spark)
    queries = entrymod.extended_queries()
    print(f"{'query':24} {'sf0.1':>8} {'10x':>8} {'ratio':>6}  rows(10x)")
    for name in names:
        fn = queries[name]
        t0 = time.monotonic()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        small = time.monotonic() - t0
        t0 = time.monotonic()
        df = fn(spark, BIG_DIR)
        df.write.format("noop").mode("overwrite").save()
        big = time.monotonic() - t0
        n = df.count()
        print(f"{name:24} {small:8.2f} {big:8.2f} {big / small:6.2f}  {n}")


if __name__ == "__main__":
    main()
