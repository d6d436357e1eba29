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
