"""Scale-primitive tests: bucketed join elides exchanges; salted join
preserves results under skew; throughput anchor correctness; and the
bucket-cap invariants that keep every dedup/similarity candidate
generator sub-quadratic — at 100 TB a single degenerate bucket is the
difference between a bounded task and an executor OOM, so these are
pinned against BOTH the real testdata histograms and synthetic
hot-bucket corpora that trip each cap."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from conduit_spark.analytics import dedup, similarity
from conduit_spark.functions.scale import salted_join, write_bucketed
from conduit_spark.sources.tables import load_table


def test_salted_join_matches_plain_join(spark):
    # skewed left: one hot key with 10k rows, plus a long tail
    left = spark.range(10_000).select(F.lit(7).alias("k"), F.col("id").alias("v")).unionAll(
        spark.range(100).select((F.col("id") % 50).alias("k"), F.col("id").alias("v"))
    )
    right = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    plain = left.join(right, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    ).collect()[0]
    salted = salted_join(left, right, "k", salt=8).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    ).collect()[0]
    assert (plain.n, plain.sv, plain.sw) == (salted.n, salted.sv, salted.sw)
    assert plain.n == 10_000 + 100  # hot key (10k×1) + tail (100×1)


def test_salted_join_left_outer(spark):
    left = spark.range(20).select((F.col("id") % 5).alias("k"), F.col("id").alias("v"))
    right = spark.range(2).select(F.col("id").alias("k"), F.lit("x").alias("w"))
    plain = sorted(
        (r.k, r.v, r.w) for r in left.join(right, "k", "left").collect()
    )
    salted = sorted(
        (r.k, r.v, r.w) for r in salted_join(left, right, "k", salt=4, how="left").collect()
    )
    assert plain == salted


def test_bucketed_join_elides_exchange(spark, sf_dir, tmp_path):
    # (warehouse dir is static conf — managed tables land in
    # ./spark-warehouse and are dropped at the end)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", bucket_cols=["o_orderkey"], n_buckets=4)
    write_bucketed(li, "lineitem_b", bucket_cols=["l_orderkey"], n_buckets=4)
    a = spark.table("orders_b")
    b = spark.table("lineitem_b")
    # disable broadcast so the join strategy is key-based
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a.o_orderkey == b.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        n = joined.count()
        assert n == li.count()  # every lineitem matches exactly one order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


# ---- bucket-cap invariants (the sub-quadratic contract) -----------------

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"


def _minhash_bucket_hist(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup._shingles_df(docs)
    from conduit_spark.functions.hashing import MINHASH_PRIME

    aggs = [
        F.min((F.lit(a) * F.col("x") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"h{j}")
        for j, (a, b) in enumerate(dedup._PARAMS)
    ]
    sigs = sh.groupBy("doc_id").agg(*aggs)
    return (
        dedup._band_buckets(sigs)
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@pytest.mark.parametrize("sf", [SF_SMALL, SF_BIG])
def test_minhash_candidates_stay_linear(spark, sf):
    """After the cap, per-bucket candidate pairs are ≤ cap² and the
    TOTAL candidate count stays a small multiple of corpus size — the
    all-pairs explosion the banding exists to avoid."""
    hist = _minhash_bucket_hist(spark, sf)
    kept = hist.filter(F.col("n") <= dedup.MINHASH_BUCKET_CAP)
    stats = kept.agg(
        F.max("n").alias("max_n"),
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("cands"),
    ).collect()[0]
    n_docs = load_table(spark, sf, "documents").count()
    assert stats.max_n <= dedup.MINHASH_BUCKET_CAP
    assert stats.cands <= 25 * n_docs, (
        f"candidate blowup: {stats.cands} pairs for {n_docs} docs"
    )


@pytest.mark.parametrize("sf", [SF_SMALL, SF_BIG])
def test_neardup_embedding_candidates_stay_linear(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    hists = []
    for band in range(similarity.NEARDUP_BANDS):
        hists.append(
            emb.select(
                F.lit(band).alias("band"),
                similarity._band_bucket("embedding", band).alias("bucket"),
            )
        )
    bb = hists[0]
    for h in hists[1:]:
        bb = bb.unionByName(h)
    hist = bb.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n"))
    kept = hist.filter(F.col("n") <= similarity.NEARDUP_BUCKET_CAP)
    stats = kept.agg(
        F.max("n").alias("max_n"),
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("cands"),
    ).collect()[0]
    n_vecs = emb.count()
    assert stats.max_n <= similarity.NEARDUP_BUCKET_CAP
    assert stats.cands <= 40 * n_vecs


def _write_documents(spark, path, texts):
    spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(path / "documents.parquet"))


def _hot_corpus():
    """250 identical docs (trips every documents-side cap), a 10-doc
    dup group under the cap, and unique background docs."""
    rng = random.Random(7)
    words = [f"w{i}" for i in range(500)]
    hot = " ".join(words[:40])
    small = " ".join(words[40:80])
    texts = [hot] * 250 + [small] * 10
    for _ in range(50):
        texts.append(" ".join(rng.sample(words, 40)))
    return texts


def test_minhash_cap_drops_degenerate_bucket(spark, tmp_path):
    """A 250-doc identical group exceeds MINHASH_BUCKET_CAP (200): its
    bucket is dropped in every band, so the candidate join emits ZERO
    pairs for it — bounded work — while the 10-doc group still pairs
    fully (45 pairs at jaccard 1.0)."""
    _write_documents(spark, tmp_path, _hot_corpus())
    pairs = dedup.d_minhash_lsh_pairs(spark, str(tmp_path)).collect()
    in_small = [r for r in pairs if 250 <= r.id_a < 260 and 250 <= r.id_b < 260]
    in_hot = [r for r in pairs if r.id_a < 250 and r.id_b < 250]
    assert len(in_hot) == 0, "capped bucket must produce no candidate pairs"
    assert len(in_small) == 45
    assert all(r.jaccard == 1.0 for r in in_small)


def test_simhash_cap_drops_degenerate_bucket(spark, tmp_path):
    """Same story for the simhash banded-hamming path (cap 200)."""
    _write_documents(spark, tmp_path, _hot_corpus())
    pairs = dedup.d_simhash_pairs(spark, str(tmp_path)).collect()
    in_hot = [r for r in pairs if r.id_a < 250 and r.id_b < 250]
    in_small = [r for r in pairs if 250 <= r.id_a < 260 and 250 <= r.id_b < 260]
    assert len(in_hot) == 0
    assert len(in_small) == 45
    assert all(r.hamming == 0 for r in in_small)


def test_neardup_cap_drops_degenerate_bucket(spark, tmp_path):
    """150 identical embeddings exceed NEARDUP_BUCKET_CAP (100) → all
    three band buckets dropped, no pairs; a 10-vector identical group
    under the cap pairs fully."""
    rng = random.Random(11)
    hot = [rng.uniform(-1, 1) for _ in range(similarity.DIM)]
    small = [rng.uniform(-1, 1) for _ in range(similarity.DIM)]
    rows = [(i, hot, 0) for i in range(150)]
    rows += [(150 + i, small, 1) for i in range(10)]
    for i in range(30):
        rows.append((160 + i, [rng.uniform(-1, 1) for _ in range(similarity.DIM)], 2))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    pairs = similarity.s_neardup_pairs(spark, str(tmp_path)).collect()
    in_hot = [r for r in pairs if r.id_a < 150 and r.id_b < 150]
    in_small = [r for r in pairs if 150 <= r.id_a < 160 and 150 <= r.id_b < 160]
    assert len(in_hot) == 0
    assert len(in_small) == 45


def test_ngram_df_cap_bounds_shingle_join(spark):
    """The document-frequency cap must actually exclude hot shingles
    from the verify join at sf0.1 (the F² blowup guard)."""
    docs = load_table(spark, SF_BIG, "documents")
    sh = dedup._shingles_df(docs)
    dfreq = sh.groupBy("x").agg(F.count(F.lit(1)).alias("df"))
    kept = sh.join(
        F.broadcast(dfreq.filter(F.col("df") > dedup.NGRAM_DF_CAP)), "x", "left_anti"
    )
    kept_max = (
        kept.groupBy("x").agg(F.count(F.lit(1)).alias("df")).agg(F.max("df")).collect()[0][0]
    )
    assert kept_max <= dedup.NGRAM_DF_CAP
