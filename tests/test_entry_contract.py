"""Driver-contract invariants for __spark_entry__.

The driver verifies at most the first GATE_CAP queries and compares
result columns by sorted name — these tests fail fast locally if a
change would silently push a query past the cap or break the
gate/oracle pairing.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_gate_within_cap():
    q = entry_mod.queries()
    assert len(q) <= entry_mod.GATE_CAP


def test_every_gate_query_has_oracle_or_is_rows_only():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    missing = set(q) - set(o)
    # rows-only queries are deliberate and few (non-SQL-expressible)
    assert missing <= {"rag_ingest_retrieve"}, missing


def test_extended_superset_of_gate():
    gate = set(entry_mod.queries())
    ext = set(entry_mod.extended_queries())
    assert gate <= ext
    assert set(entry_mod.extended_oracle_sql()) <= ext


def test_no_orphan_oracles():
    ext = set(entry_mod.extended_queries())
    orphans = set(entry_mod.extended_oracle_sql()) - ext
    assert not orphans


def test_priority_families_inside_gate():
    """The whole similarity/multimodal/pipeline/chunking/dedup/text
    core must hold driver CORRECTNESS rows (round-1 regression: they
    fell past the cap)."""
    gate = set(entry_mod.queries())
    for name in (
        "s_cosine_topk", "s_lsh_buckets", "s_ann_lsh_topk", "s_ivf_topk",
        "s_neardup_pairs", "m_decode_stub", "g_generator", "g_pipeline_chain",
        "g_throughput_1m", "c_chunk_documents", "rag_ingest_retrieve",
        "d_exact", "d_minhash_lsh_pairs", "t_fingerprint",
        "p_avro_encode", "p_avro_decode", "p_cdc_upsert",
    ):
        assert name in gate, f"{name} fell out of the driver gate"
