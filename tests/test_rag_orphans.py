"""The derived-store orphan symptom that exposed the reference's
snapshot-handoff deadlock (20260728-snapshot-handoff-deferred-ack-
deadlock.md: a post-snapshot DELETE never reached the destination, so
a RAG pipeline's derived pgvector rows were never removed — silent
invariant-3 breach while the pipeline looked "running").

This engine's handoff is a relation, not an ack protocol
(ADR 20260815-handoff-liveness-by-construction.md); the test pins the
OBSERVABLE end to end: snapshot → post-snapshot WAL changes (incl. a
DELETE) → cdc_apply materialization → chunk+embed derivation — the
deleted document's derived chunk/vector rows are gone, the insert's
appear.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from conduit_spark.analytics.chunking import chunk_text
from conduit_spark.operators.cdc import cdc_apply
from conduit_spark.sources.postgres_wal import (
    lsn_to_long,
    snapshot_handoff_source,
)


def _wal_line(action: str, lsn: str, doc_id: int, text: str | None) -> str:
    doc = {
        "action": action,
        "schema": "public",
        "table": "docs",
        "lsn": lsn,
        "columns": [
            {"name": "doc_id", "type": "bigint", "value": doc_id},
        ],
    }
    if text is not None:
        doc["columns"].append({"name": "text", "type": "text", "value": text})
    if action in ("U", "D"):
        doc["identity"] = [
            {"name": "doc_id", "type": "bigint", "value": doc_id}
        ]
    if action == "D":
        del doc["columns"]
    return json.dumps(doc)


def test_post_snapshot_delete_removes_derived_rows(spark, tmp_path):
    words = " ".join(f"w{i}" for i in range(40))
    snapshot = spark.createDataFrame(
        [(1, words), (2, words), (3, words)], "doc_id long, text string"
    )
    wal = tmp_path / "wal.jsonl"
    wal.write_text(
        "\n".join(
            [
                # at-or-before the snapshot point: must NOT re-apply
                _wal_line("I", "0/4", 2, words),
                # post-snapshot: the delete that orphaned the
                # reference's vectors, plus a late insert
                _wal_line("D", "0/6", 2, None),
                _wal_line("I", "0/7", 4, words),
            ]
        )
        + "\n"
    )
    env = snapshot_handoff_source(
        spark,
        snapshot,
        str(wal),
        snapshot_lsn="0/5",
        key_cols=["doc_id"],
        collection="public.docs",
    )
    final = cdc_apply(
        env,
        F.get_json_object(
            F.coalesce(F.col("key_json"), F.col("payload_after_json")),
            "$.doc_id",
        ).cast("bigint"),
        lsn_to_long(F.col("metadata").getItem("postgres.lsn")),
    )
    docs = final.select(
        F.get_json_object("payload_after_json", "$.doc_id")
        .cast("bigint")
        .alias("doc_id"),
        F.get_json_object("payload_after_json", "$.text").alias("text"),
    )
    derived = chunk_text(docs)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in derived.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # doc 2's derived rows are GONE (the reference's orphan symptom),
    # survivors and the post-snapshot insert have chunks
    assert 2 not in per_doc
    assert set(per_doc) == {1, 3, 4}
    assert all(n >= 1 for n in per_doc.values())
