"""JDBC connector tests against embedded Derby (ships with Spark).

The builtin:postgres source/destination were wiring-only in round 1
("no database in the container") — Derby's embedded driver IS a real
database on the Spark classpath, so the snapshot-source envelopes and
the insert sink are exercised end-to-end here. The same code path
serves postgres by swapping the URL/driver.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from conduit_spark.pipeline.registry import build_source
from conduit_spark.sinks import jdbc_sink

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _url(tmp_path, name):
    return f"jdbc:derby:{tmp_path}/{name};create=true"


def test_jdbc_snapshot_source_envelopes(spark, tmp_path):
    url = _url(tmp_path, "srcdb")
    seed = spark.range(10).select(
        F.col("id").alias("pid"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    seed.write.format("jdbc").option("url", url).option("dbtable", "people").option(
        "driver", DRIVER
    ).save()

    env = build_source(
        spark,
        "builtin:postgres",
        {
            "url": url,
            "table": "people",
            "keyColumns": "pid",
            "options": {"driver": DRIVER},
        },
        "pg-src",
    )
    import json

    rows = env.collect()
    assert len(rows) == 10
    assert all(r.operation == "snapshot" for r in rows)
    assert sorted(json.loads(r.key_json)["pid"] for r in rows) == list(range(10))
    payloads = {
        json.loads(r.key_json)["pid"]: json.loads(r.payload_after_json)
        for r in rows
    }
    assert payloads[3]["name"] == "n3"


def test_jdbc_sink_roundtrip(spark, tmp_path):
    url = _url(tmp_path, "sinkdb")
    df = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    jdbc_sink(df, url, "target", options={"driver": DRIVER})
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "target")
        .option("driver", DRIVER)
        .load()
    )
    assert sorted((r.k, r.v) for r in back.collect()) == [
        (i, i * 10) for i in range(5)
    ]


def test_jdbc_upsert_merge(spark, tmp_path):
    """Staging + MERGE upsert: overlapping keys update, new keys
    insert — the reference postgres destination's write semantics."""
    from conduit_spark.sinks import jdbc_upsert_sink

    url = _url(tmp_path, "upsertdb")
    seed = spark.range(3).select(F.col("id").alias("k"), F.lit("old").alias("v"))
    jdbc_sink(seed, url, "tgt", options={"driver": DRIVER})
    batch = spark.createDataFrame(
        [(1, "new1"), (2, "new2"), (7, "new7")], "k long, v string"
    )
    jdbc_upsert_sink(batch, url, "tgt", ["k"], options={"driver": DRIVER})
    back = (
        spark.read.format("jdbc")
        .option("url", url).option("dbtable", "tgt").option("driver", DRIVER)
        .load()
    )
    assert sorted((r.k, r.v) for r in back.collect()) == [
        (0, "old"), (1, "new1"), (2, "new2"), (7, "new7"),
    ]


def test_jdbc_cdc_sink_applies_changelog(spark, tmp_path):
    """Envelope changelog → upsert + delete against Derby: final table
    state must reflect creates, updates, and deletes."""
    import json as _json

    from conduit_spark.sinks import jdbc_cdc_sink

    url = _url(tmp_path, "cdcdb")
    seed = spark.range(4).select(F.col("id").alias("k"), F.lit("seed").alias("v"))
    jdbc_sink(seed, url, "state", options={"driver": DRIVER})

    def env_row(op, k, v=None):
        return {
            "position": f"p:{op}:{k}".encode(),
            "operation": op,
            "metadata": {},
            "key_raw": None,
            "key_json": _json.dumps({"k": k}),
            "payload_before_json": None,
            "payload_after_json": (
                _json.dumps({"k": k, "v": v}) if v is not None else None
            ),
            "payload_after_raw": None,
            "is_structured": True,
        }

    from conduit_spark import envelope as env

    changes = spark.createDataFrame(
        [
            env_row("update", 1, "u1"),
            env_row("create", 9, "c9"),
            env_row("delete", 2),
            env_row("delete", 3),
        ],
        schema=env.ENVELOPE_SCHEMA,
    )
    jdbc_cdc_sink(
        changes, url, "state", ["k"], "k long, v string",
        options={"driver": DRIVER},
    )
    back = (
        spark.read.format("jdbc")
        .option("url", url).option("dbtable", "state").option("driver", DRIVER)
        .load()
    )
    assert sorted((r.k, r.v) for r in back.collect()) == [
        (0, "seed"), (1, "u1"), (9, "c9"),
    ]


def test_streaming_cdc_pipeline_into_jdbc_upsert(spark, tmp_path):
    """Full connector loop: file-based Debezium changelog → streaming
    pipeline (unwrap.debezium) → JDBC upsert destination; the Derby
    table's final state must equal the logical table state."""
    import json as _json

    from conduit_spark.pipeline.config import parse_yaml
    from conduit_spark.pipeline.runtime import Pipeline

    url = _url(tmp_path, "cdcstreamdb")
    # target table pre-exists (snapshot load), as for a real upsert dest
    seed = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "id long, v long"
    )
    jdbc_sink(seed, url, "state", options={"driver": DRIVER})

    src_dir = tmp_path / "cdc"
    src_dir.mkdir()

    def env_line(op, lsn, before=None, after=None):
        return _json.dumps(
            {
                "payload": {
                    "before": before,
                    "after": after,
                    "source": {"table": "state", "lsn": str(lsn)},
                    "op": op,
                    "ts_ms": 1700000000000 + lsn,
                }
            }
        )

    (src_dir / "changes.json").write_text(
        "\n".join(
            [
                env_line("u", 5, before={"id": 2, "v": 20}, after={"id": 2, "v": 999}),
                env_line("d", 6, before={"id": 3, "v": 30}),
                env_line("c", 7, after={"id": 5, "v": 50}),
            ]
        )
        + "\n"
    )
    schema = (
        "payload struct<before:struct<id:bigint,v:bigint>,"
        "after:struct<id:bigint,v:bigint>,"
        "source:struct<table:string,lsn:string>,op:string,ts_ms:bigint>"
    )
    yaml_text = f"""
version: "2.2"
pipelines:
  - id: cdc-jdbc
    connectors:
      - id: src
        type: source
        plugin: builtin:file
        settings: {{path: "{src_dir}", format: json, schema: "{schema}"}}
      - id: db
        type: destination
        plugin: builtin:postgres
        settings:
          url: "{url}"
          table: state
          writeMode: upsert
          keyColumns: id
          payloadSchema: "id long, v long"
          options: {{driver: {DRIVER}}}
    processors:
      - id: unwrap
        plugin: unwrap.debezium
"""
    cfg = parse_yaml(yaml_text)[0]
    Pipeline(spark, cfg).run_streaming(str(tmp_path / "ckpt"), trigger_once=True)

    back = (
        spark.read.format("jdbc")
        .option("url", url).option("dbtable", "state").option("driver", DRIVER)
        .load()
    )
    assert sorted((r.id, r.v) for r in back.collect()) == [
        (1, 10), (2, 999), (4, 40), (5, 50),
    ]


def test_postgres_snapshot_cdc_handoff_via_yaml(spark, tmp_path):
    """YAML builtin:postgres with url+table+cdc.path+cdc.snapshotLsn:
    JDBC snapshot at the slot LSN plus only the WAL changes strictly
    after it — the reference source's snapshot→CDC handoff, end to end
    through the registry."""
    import json

    import pyspark.sql.functions as F

    from conduit_spark.operators.cdc import cdc_apply
    from conduit_spark.pipeline.registry import build_source
    from conduit_spark.sources.postgres_wal import lsn_to_long

    url = _url(tmp_path, "handoffdb")
    # table state as of LSN 0/1000003: alice updated, bob still present
    snap = spark.createDataFrame(
        [(1, "alice", 99.9), (2, "bob", 20.0)],
        "id long, name string, balance double",
    )
    snap.write.format("jdbc").option("url", url).option(
        "dbtable", "accounts"
    ).option("driver", DRIVER).mode("overwrite").save()
    wal = tmp_path / "wal.jsonl"
    wal.write_text(
        "\n".join(
            [
                # already in the snapshot (must NOT double-apply)
                '{"action":"I","schema":"public","table":"accounts","lsn":"0/1000001","columns":[{"name":"id","type":"integer","value":1},{"name":"name","type":"text","value":"alice"},{"name":"balance","type":"numeric","value":10.5}]}',
                '{"action":"I","schema":"public","table":"accounts","lsn":"0/1000002","columns":[{"name":"id","type":"integer","value":2},{"name":"name","type":"text","value":"bob"},{"name":"balance","type":"numeric","value":20.0}]}',
                '{"action":"U","schema":"public","table":"accounts","lsn":"0/1000003","columns":[{"name":"id","type":"integer","value":1},{"name":"name","type":"text","value":"alice"},{"name":"balance","type":"numeric","value":99.9}],"identity":[{"name":"id","type":"integer","value":1}]}',
                # after the cutover: the tail applies these two
                '{"action":"I","schema":"public","table":"accounts","lsn":"0/1000004","columns":[{"name":"id","type":"integer","value":3},{"name":"name","type":"text","value":"carol"},{"name":"balance","type":"numeric","value":7.25}]}',
                '{"action":"D","schema":"public","table":"accounts","lsn":"0/1000005","identity":[{"name":"id","type":"integer","value":2}]}',
            ]
        )
        + "\n"
    )
    env = build_source(
        spark,
        "builtin:postgres",
        {
            "url": url,
            "table": "accounts",
            "options": {"driver": DRIVER},
            "cdc.path": str(wal),
            "cdc.snapshotLsn": "0/1000003",
            "keyColumns": "id",
        },
        "pg",
    )
    assert env.filter(F.col("operation") == "snapshot").count() == 2
    assert env.filter(F.col("operation") != "snapshot").count() == 2
    final = cdc_apply(
        env,
        F.get_json_object(
            F.coalesce(F.col("key_json"), F.col("payload_after_json")), "$.id"
        ).cast("bigint"),
        F.struct(
            lsn_to_long(F.col("metadata").getItem("postgres.lsn")),
            F.col("position").cast("string"),
        ),
    )
    rows = {
        json.loads(r["payload_after_json"])["id"]: json.loads(
            r["payload_after_json"]
        )
        for r in final.collect()
    }
    assert set(rows) == {1, 3}
    assert rows[1]["balance"] == 99.9 and rows[3]["name"] == "carol"

    # missing the consistent point is refused, never silently wrong
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cdc.snapshotLsn"):
        build_source(
            spark,
            "builtin:postgres",
            {"url": url, "table": "accounts", "cdc.path": str(wal)},
            "pg",
        )


def test_jdbc_multi_table_snapshot_with_collections(spark, tmp_path):
    """`tables: a,b` (the reference's plural form) snapshots every
    table into one envelope stream, each record tagged with its source
    table in opencdc.collection metadata."""
    import json

    url = _url(tmp_path, "multidb")
    spark.range(4).select(F.col("id").alias("pid")).write.format("jdbc").option(
        "url", url
    ).option("dbtable", "t_users").option("driver", DRIVER).save()
    spark.range(3).select(F.col("id").alias("pid")).write.format("jdbc").option(
        "url", url
    ).option("dbtable", "t_orders").option("driver", DRIVER).save()

    env = build_source(
        spark,
        "builtin:postgres",
        {
            "url": url,
            "tables": "t_users, t_orders",
            "keyColumns": "pid",
            "options": {"driver": DRIVER},
        },
        "pg-multi",
    )
    rows = env.collect()
    assert len(rows) == 7
    by_coll = {}
    for r in rows:
        coll = dict(r.metadata)["opencdc.collection"]
        by_coll.setdefault(coll, []).append(json.loads(r.key_json)["pid"])
    assert sorted(by_coll) == ["t_orders", "t_users"]
    assert sorted(by_coll["t_users"]) == [0, 1, 2, 3]
    assert sorted(by_coll["t_orders"]) == [0, 1, 2]


def test_validate_postgres_tables_plural():
    from conduit_spark.pipeline.registry import validate_connector

    assert validate_connector(
        "source", "builtin:postgres", {"url": "jdbc:x", "tables": "a,b"}
    ) == []
    errs = validate_connector("source", "builtin:postgres", {"url": "jdbc:x"})
    assert any("table" in e for e in errs)
