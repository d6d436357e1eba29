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
