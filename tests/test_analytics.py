from __future__ import annotations

import pytest

from conduit_spark.analytics import dedup, multimodal, sampling, similarity, text
from tests.oracle_util import compare_spark_duckdb

MODULES = {
    "text": text,
    "dedup": dedup,
    "similarity": similarity,
    "multimodal": multimodal,
    "sampling": sampling,
}

CASES = [
    (mod_name, qname)
    for mod_name, mod in MODULES.items()
    for qname in sorted(mod.QUERIES)
]


@pytest.mark.parametrize("mod_name,name", CASES, ids=[c[1] for c in CASES])
def test_analytics_matches_oracle(spark, sf_dir, duck, mod_name, name):
    mod = MODULES[mod_name]
    df = mod.QUERIES[name](spark, sf_dir)
    n = df.count()
    if name not in ("s_neardup_pairs", "d_minhash_lsh_pairs", "d_ngram_jaccard"):
        assert n > 0, f"{name} produced no rows — vacuous"
    compare_spark_duckdb(df, duck, mod.ORACLES[name])


def test_connected_components_multihop(spark):
    """Chain 1-2-3-4-5 plus isolated pair 10-11: label propagation must
    cross multiple hops (chain diameter 4 > 1 round) and keep disjoint
    components separate."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "id_a long, id_b long"
    )
    got = {
        r.node: r.lbl for r in dedup.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_rag_end_to_end(spark, sf_dir):
    from conduit_spark.analytics import rag

    rows = rag.rag_ingest_retrieve(spark, sf_dir).collect()
    assert len(rows) == rag.TOP_K
    assert all(-1.0 <= r.score <= 1.0 for r in rows)
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # deterministic across runs (fake transport is content-hashed)
    rows2 = rag.rag_ingest_retrieve(spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in rows2]


def test_ngram_df_cap_bounds_hot_shingle_blowup(spark, tmp_path, monkeypatch):
    """Pathological fixture: one boilerplate shingle shared by EVERY
    doc. Without the document-frequency cap the pair join is quadratic
    in corpus size; with it, only genuinely-similar pairs survive."""
    import pyspark.sql.functions as F

    n_docs = 150  # > NGRAM_DF_CAP (100)
    rows = [
        # common boilerplate prefix (hot shingles) + unique tail
        (i, f"terms of service apply here uniquely{i} tail{i} end{i}")
        for i in range(n_docs)
    ]
    # two true near-dups sharing their whole text
    rows.append((900, "alpha beta gamma delta epsilon zeta"))
    rows.append((901, "alpha beta gamma delta epsilon zeta extra"))
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    path = str(tmp_path / "documents.parquet")
    docs.repartition(1).write.parquet(path)

    orig = dedup.load_table
    monkeypatch.setattr(
        dedup, "load_table", lambda sp, d, name: sp.read.parquet(path)
    )
    try:
        out = dedup.d_ngram_jaccard(spark, str(tmp_path)).collect()
    finally:
        monkeypatch.setattr(dedup, "load_table", orig)
    pairs = {(r.id_a, r.id_b) for r in out}
    # the 150 boilerplate docs share only hot (capped) shingles -> no
    # pairs among them; the true near-dup pair survives
    assert (900, 901) in pairs
    assert all(a >= 900 for a, b in pairs), pairs
