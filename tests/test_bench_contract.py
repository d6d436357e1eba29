"""Driver-contract guards for bench.py: the final stdout line must stay
within the driver's ~2000-char tail capture (the BENCH_r03 record was
unparseable because 96 queries overflowed it), for the real gate names
at realistic timing widths."""

from __future__ import annotations

import json


def test_gate_stdout_line_fits_tail_capture():
    import __spark_entry__ as m

    gate = sorted(m.queries())
    assert len(gate) == 50
    # worst-case rendering: three-digit seconds, 2 decimals
    line = json.dumps(
        {
            "metric": "conduit_spark_query_suite_total",
            "value": 999.99,
            "unit": "sec",
            "queries": {n: 999.99 for n in gate},
            "sf": 0.1,
            "detail": "BENCH_DETAIL.json",
        },
        separators=(",", ":"),
    )
    assert len(line) < 1800, (
        f"bench stdout line would be {len(line)} chars; rotate shorter "
        "gate names or drop the per-query map"
    )


def test_every_gate_query_has_matching_oracle_columns():
    """Sanity: every oracle is a SELECT (not DDL) and every gate entry
    either has an oracle or is deliberately rows-only."""
    import __spark_entry__ as m

    q, o = m.queries(), m.oracle_sql()
    rows_only = set(q) - set(o)
    assert rows_only <= {"rag_ingest_retrieve"}, rows_only
    for name, sql in o.items():
        assert "select" in sql.lower(), name
