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
