"""External (Confluent REST) schema-registry parity tests.

The same strategy/round-trip suite runs against BOTH the embedded
registry and a RestSchemaRegistry talking to a wire-protocol server
(start_registry_server — the conduit-schema-registry service analog),
so the two registry types are interchangeable behind avro.encode/
decode, like the reference's builtin vs external config
(pkg/conduit/config.go:45-46,251-262).
"""

from __future__ import annotations

import pytest

from conduit_spark import envelope as env
from conduit_spark import operators as ops
from conduit_spark.schema_registry import (
    RestSchemaRegistry,
    SchemaNotFound,
    SchemaRegistry,
    start_registry_server,
)

REC_A = '{"type":"record","name":"r","fields":[{"name":"a","type":"string"}]}'
REC_AB = (
    '{"type":"record","name":"r","fields":'
    '[{"name":"a","type":"string"},{"name":"b","type":"long"}]}'
)


@pytest.fixture(params=["embedded", "rest"])
def any_registry(request):
    backing = SchemaRegistry()
    if request.param == "embedded":
        yield backing
        return
    srv = start_registry_server(backing)
    try:
        yield RestSchemaRegistry(f"http://127.0.0.1:{srv.server_address[1]}")
    finally:
        srv.shutdown()


def test_register_version_dedup_and_lookup(any_registry):
    reg = any_registry
    r1 = reg.register("orders-value", REC_A)
    assert (r1.version, r1.schema_id) == (1, 1)
    r1b = reg.register("orders-value", REC_A)  # identical → same version
    assert (r1b.version, r1b.schema_id) == (1, 1)
    r2 = reg.register("orders-value", REC_AB)
    assert r2.version == 2
    assert reg.latest("orders-value").schema_id == r2.schema_id
    assert reg.get("orders-value", 1).schema_json == REC_A
    assert reg.by_id(r2.schema_id).schema_json == REC_AB
    assert reg.subjects() == ["orders-value"]
    with pytest.raises(SchemaNotFound):
        reg.latest("missing")
    with pytest.raises(SchemaNotFound):
        reg.get("orders-value", 99)
    with pytest.raises(SchemaNotFound):
        reg.by_id(999)


def test_strategies_against_both_backends(any_registry):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    reg = any_registry
    pre = reg.register("s", REC_A)
    assert (
        reg.resolve_encode_schema(
            strategy="preRegistered", subject="s", version=1
        ).schema_id
        == pre.schema_id
    )
    payload = StructType(
        [StructField("a", StringType()), StructField("b", LongType())]
    )
    auto = reg.resolve_encode_schema(
        strategy="autoRegister", subject="auto-sub", payload_schema=payload
    )
    assert auto.version == 1
    # second resolve of identical payload dedups to the same version
    again = reg.resolve_encode_schema(
        strategy="autoRegister", subject="auto-sub", payload_schema=payload
    )
    assert (again.version, again.schema_id) == (auto.version, auto.schema_id)


def test_avro_roundtrip_through_rest_registry(spark):
    """avro.encode(autoRegister) + avro.decode resolve via the REST
    client against the wire server — full operator path, external
    registry."""
    backing = SchemaRegistry()
    srv = start_registry_server(backing)
    try:
        reg = RestSchemaRegistry(f"http://127.0.0.1:{srv.server_address[1]}")
        df = spark.createDataFrame(
            [(1, "hello"), (2, "world")], "doc_id long, text string"
        )
        e = env.from_table(df, key_cols=["doc_id"], source_id="t", typed=True)
        enc = ops.avro_encode(e, registry=reg, subject="docs")
        rows = enc.collect()
        assert all(bytes(r.payload_after_raw)[:1] == b"\x00" for r in rows)
        # registration happened on the SERVER (shared registry state)
        assert backing.subjects() == ["docs"]
        dec = ops.avro_decode(enc, registry=reg)
        out = {r["doc_id"]: r["text"] for r in dec.select(
            "payload_after.doc_id", "payload_after.text").collect()}
        assert out == {1: "hello", 2: "world"}
    finally:
        srv.shutdown()


def test_yaml_declared_external_registry(spark, tmp_path):
    """A pipeline processor declares `registry.url` — the build wires a
    REST client with no injected transport."""
    from conduit_spark.pipeline.config import parse_yaml
    from conduit_spark.pipeline.registry import build_processor

    backing = SchemaRegistry()
    srv = start_registry_server(backing)
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        cfg = parse_yaml(
            f"""
version: "2.2"
pipelines:
  - id: ext-reg
    connectors:
      - id: s
        type: source
        plugin: builtin:generator
        settings: {{recordCount: 3, format.options: {{id: int}}}}
      - id: d
        type: destination
        plugin: builtin:log
        settings: {{}}
    processors:
      - id: enc
        plugin: avro.encode
        settings: {{"schema.subject": gen-value, "registry.url": "{url}"}}
"""
        )[0]
        proc = cfg.processors[0]
        transform = build_processor(proc.plugin, proc.settings, proc.condition)
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
        src = env.from_table(df, key_cols=["id"], source_id="g", typed=True)
        out = transform(src)
        rows = out.collect()
        assert len(rows) == 2
        assert all(bytes(r.payload_after_raw)[:1] == b"\x00" for r in rows)
        assert backing.subjects() == ["gen-value"]  # auto-registered remotely
    finally:
        srv.shutdown()
