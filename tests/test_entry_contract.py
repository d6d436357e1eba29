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
    """Every operator family must hold at least one driver CORRECTNESS
    row (round-1 regression: whole families fell past the cap). Names
    rotate between rounds so not-yet-verified entries earn rows; the
    invariant is per-FAMILY representation, pinned by prefix."""
    gate = set(entry_mod.queries())
    families = {
        "similarity": "s_",
        "multimodal": "m_",
        "generator/pipeline": "g_",
        "chunking": "c_",
        "sampling": "smp_",
        "dedup": "d_",
        "sketches": "sk_",
        "curation": "cur_",
        "quality-checks": "dq_",
        "text": "t_",
        "processors": "p_",
        "relational/temporal": "q",
        "rag": "rag_",
    }
    for fam, prefix in families.items():
        assert any(n.startswith(prefix) for n in gate), (
            f"family {fam!r} (prefix {prefix!r}) has no driver gate row"
        )
    # anchors that must never rotate out: the e2e flagship paths
    # (rag_ingest_retrieve rotated to extended in r7 after 4 green
    # rounds; the rag family stays represented via the prefix loop)
    for name in ("p_cdc_upsert", "g_throughput_1m"):
        assert name in gate, f"{name} fell out of the driver gate"


def test_gate_lint_flags_complex_columns(spark):
    """The driver canonicalizer pandas-sorts result columns; array/map
    values are unhashable there (round-6 m_features red row). The
    gate_check lint must flag them and pass scalar schemas."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts"),
    )
    from gate_check import complex_output_cols

    bad = spark.sql(
        "SELECT 1 AS a, array(1,2) AS arr, map('k','v') AS m, "
        "named_struct('x', 1) AS s"
    )
    assert complex_output_cols(bad.schema) == ["arr", "m", "s"]
    ok = spark.sql("SELECT 1 AS a, 'x' AS b, CAST(1.5 AS DOUBLE) AS c")
    assert complex_output_cols(ok.schema) == []


def test_no_gate_query_emits_complex_columns(spark, sf_dir):
    """Schema-level sweep of every gate query at sf0.001: none may
    emit an array/map/struct output column (the class the round-6
    m_features row died on). Schemas come from the lazy plan — no
    query executes here except bounded driver-side setup."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts"),
    )
    from gate_check import complex_output_cols

    offenders = {}
    for name, fn in entry_mod.queries().items():
        cols = complex_output_cols(fn(spark, sf_dir).schema)
        if cols:
            offenders[name] = cols
    assert not offenders, (
        f"gate queries with array/map/struct output columns: {offenders} "
        "— stringify (m_resize thumb pattern) or explode to rows"
    )


def test_pandas_canonicalizer_probe_flags_unhashable():
    """The gate_check pandas-canonicalizer probe must fail exactly the
    way the driver harness does on list-valued cells, and pass scalar
    result sets (incl. bytes and None)."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts"),
    )
    from gate_check import pandas_canonicalizer_accepts

    err = pandas_canonicalizer_accepts(
        ["a", "hist"], [(1, [1, 2]), (2, [3, 4]), (3, [3, 4])]
    )
    assert err and "unhashable" in err
    assert pandas_canonicalizer_accepts(
        ["a", "b", "c"], [(1, "x", b"\x00"), (2, None, b"\xff")]
    ) is None
