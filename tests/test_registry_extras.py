"""Tests for schema registry, chunking, and the new relational queries."""

from __future__ import annotations

import pytest

from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from conduit_spark.schema_registry import (
    SchemaNotFound,
    SchemaRegistry,
    struct_to_avro_schema,
)
from tests.oracle_util import compare_spark_duckdb


def test_registry_versioning_and_dedup(tmp_path):
    reg = SchemaRegistry(str(tmp_path / "reg.json"))
    s1 = '{"type":"record","name":"r","fields":[{"name":"a","type":"string"}]}'
    s2 = '{"type":"record","name":"r","fields":[{"name":"a","type":"string"},{"name":"b","type":"long"}]}'
    r1 = reg.register("orders-value", s1)
    assert (r1.version, r1.schema_id) == (1, 1)
    r1b = reg.register("orders-value", s1)  # identical → same registration
    assert r1b == r1
    r2 = reg.register("orders-value", s2)
    assert r2.version == 2
    assert reg.latest("orders-value") == r2
    assert reg.get("orders-value", 1) == r1
    assert reg.by_id(r2.schema_id) == r2
    with pytest.raises(SchemaNotFound):
        reg.latest("missing")

    # persistence across restart
    reg2 = SchemaRegistry(str(tmp_path / "reg.json"))
    assert reg2.latest("orders-value") == r2
    r3 = reg2.register("other", s1)
    assert r3.schema_id == 3  # id sequence survives reload


def test_registry_strategies():
    reg = SchemaRegistry()
    payload = StructType(
        [
            StructField("id", LongType()),
            StructField("tags", ArrayType(StringType())),
        ]
    )
    auto = reg.resolve_encode_schema(
        strategy="autoRegister", subject="s", payload_schema=payload
    )
    assert '"type": "array"' in auto.schema_json or '"array"' in auto.schema_json
    pre = reg.resolve_encode_schema(strategy="preRegistered", subject="s", version=1)
    assert pre == auto
    with pytest.raises(ValueError):
        reg.resolve_encode_schema(strategy="bogus")


def test_struct_to_avro_nested():
    st = StructType([
        StructField("addr", StructType([StructField("city", StringType())])),
    ])
    import json
    schema = json.loads(struct_to_avro_schema(st, "doc"))
    assert schema["fields"][0]["type"][1]["type"] == "record"


def test_chunking_matches_oracle(spark, sf_dir, duck):
    from conduit_spark.analytics import chunking

    df = chunking.c_chunk_documents(spark, sf_dir)
    assert df.count() > 500  # more chunks than docs
    compare_spark_duckdb(df, duck, chunking.ORACLES["c_chunk_documents"])


def test_chunk_overlap_property(spark):
    from conduit_spark.analytics.chunking import chunk_text

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(100)))], ["doc_id", "text"]
    )
    out = chunk_text(df, size=32, overlap=8).collect()
    # stride 24: ceil((100-8)/24) = 4 chunks at starts 0,24,48,72
    assert len(out) == 4
    c0 = out[0].chunk_text.split(" ")
    c1 = out[1].chunk_text.split(" ")
    assert c0[24:] == c1[:8]  # 8-token overlap
    assert out[-1].chunk_n_tokens == 28  # tail window 72..99
    covered = {t for r in out for t in r.chunk_text.split(" ")}
    assert len(covered) == 100  # every token lands in some chunk


@pytest.mark.parametrize(
    "name",
    [
        "q6_forecast_revenue",
        "q9_product_profit",
        "q10_returned_items",
        "q_rollup_region_nation",
        "q_orders_antijoin",
    ],
)
def test_new_relational_matches_oracle(spark, sf_dir, duck, name):
    from conduit_spark.analytics import relational

    df = relational.QUERIES[name](spark, sf_dir)
    assert df.count() > 0
    compare_spark_duckdb(df, duck, relational.ORACLES[name])


def test_queries_survive_foreign_session_confs(spark, sf_dir, duck):
    """The driver hands us ITS SparkSession — ensure_session_confs must
    repair timezone/map-policy/nanos flags at query time."""
    foreign = spark.newSession()
    foreign.conf.set("spark.sql.session.timeZone", "America/New_York")
    foreign.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    foreign.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    from conduit_spark.analytics import processor_queries, relational

    compare_spark_duckdb(
        relational.q_events_hourly(foreign, sf_dir),
        duck,
        relational.ORACLES["q_events_hourly"],
    )
    compare_spark_duckdb(
        processor_queries.p_field_set(foreign, sf_dir),
        duck,
        processor_queries.ORACLES["p_field_set"],
    )
