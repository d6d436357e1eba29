"""Avro codec + avro.encode/decode operator tests.

Golden vectors are hand-computed from the Avro 1.11 binary spec
(zigzag varints, length-prefixed strings) so the pure-Python codec is
checked against the spec, not against itself. Operator tests run the
full envelope path with the embedded schema registry (reference:
impl/avro/encode.go:135-206, decode.go:114-166, config.go:22-57).
"""

from __future__ import annotations

import datetime
import json

import pytest

import conduit_spark.envelope as env
import conduit_spark.operators as ops
from conduit_spark.functions import avro_codec as ac
from conduit_spark.schema_registry import SchemaRegistry, avro_schema_to_struct

REC_AB = (
    '{"type":"record","name":"r","fields":'
    '[{"name":"a","type":"long"},{"name":"b","type":"string"}]}'
)


def test_golden_vectors():
    assert ac.encode_record({"a": 1, "b": "hi"}, REC_AB) == b"\x02\x04hi"
    sch = '{"type":"record","name":"r","fields":[{"name":"a","type":"long"}]}'
    assert ac.encode_record({"a": 0}, sch) == b"\x00"
    assert ac.encode_record({"a": -1}, sch) == b"\x01"
    assert ac.encode_record({"a": 64}, sch) == b"\x80\x01"
    assert ac.encode_record({"a": -64}, sch) == b"\x7f"
    assert ac.encode_record({"a": 2**31}, sch) == b"\x80\x80\x80\x80\x10"


def test_union_and_null():
    sch = '{"type":"record","name":"r","fields":[{"name":"s","type":["null","string"]}]}'
    assert ac.encode_record({"s": None}, sch) == b"\x00"
    assert ac.encode_record({"s": "x"}, sch) == b"\x02\x02x"
    assert ac.decode_record(b"\x00", sch) == {"s": None}
    assert ac.decode_record(b"\x02\x02x", sch) == {"s": "x"}


def test_complex_roundtrip():
    sch = json.loads(
        """{"type":"record","name":"r","fields":[
        {"name":"ok","type":"boolean"},{"name":"x","type":"double"},
        {"name":"f","type":"float"},{"name":"raw","type":"bytes"},
        {"name":"tags","type":{"type":"array","items":"string"}},
        {"name":"m","type":{"type":"map","values":"long"}},
        {"name":"nested","type":{"type":"record","name":"n","fields":
            [{"name":"k","type":["null","long"]}]}},
        {"name":"ts","type":{"type":"long","logicalType":"timestamp-micros"}}]}"""
    )
    rec = {
        "ok": True,
        "x": 2.5,
        "f": 0.5,
        "raw": b"\x00\xff",
        "tags": ["a", "bb"],
        "m": {"k": 9, "j": -3},
        "nested": {"k": 7},
        "ts": datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
    }
    assert ac.decode_record(ac.encode_record(rec, sch), sch) == rec


def test_wire_format_frame_unframe():
    payload = b"\x02\x04hi"
    framed = ac.frame(payload, 1234)
    assert framed[:1] == b"\x00" and len(framed) == 5 + len(payload)
    sid, out = ac.unframe(framed)
    assert sid == 1234 and out == payload
    with pytest.raises(ValueError):
        ac.unframe(b"\x01oops")


def test_json_bridging():
    sch = json.loads(
        """{"type":"record","name":"r","fields":[
        {"name":"ts","type":{"type":"long","logicalType":"timestamp-micros"}},
        {"name":"raw","type":"bytes"}]}"""
    )
    coerced = ac.coerce_json(sch, {"ts": "2024-01-02T03:04:05.000123", "raw": "AP8="})
    assert coerced["ts"] == datetime.datetime(2024, 1, 2, 3, 4, 5, 123)
    assert coerced["raw"] == b"\x00\xff"
    back = ac.jsonify(ac.decode_record(ac.encode_record(coerced, sch), sch))
    assert back == {"ts": "2024-01-02T03:04:05.000123", "raw": "AP8="}


def test_avro_schema_to_struct_roundtrip():
    st = avro_schema_to_struct(REC_AB)
    assert [f.name for f in st.fields] == ["a", "b"]
    assert st["a"].dataType.simpleString() == "bigint"
    assert st["b"].dataType.simpleString() == "string"


def test_registry_strategies():
    reg = SchemaRegistry()
    r1 = reg.register("s", REC_AB)
    r2 = reg.register("s", REC_AB)  # dedup: same content, same version
    assert (r1.version, r1.schema_id) == (r2.version, r2.schema_id)
    assert reg.resolve_encode_schema(
        strategy="preRegistered", subject="s", version=1
    ).schema_id == r1.schema_id


def _docs_env(spark):
    rows = [(1, "hello world"), (2, "x"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    return env.from_table(df, key_cols=["doc_id"], source_id="t", typed=True)


def test_avro_encode_decode_operator_roundtrip(spark):
    reg = SchemaRegistry()
    e = _docs_env(spark)
    enc = ops.avro_encode(e, registry=reg, subject="docs")
    enc_rows = {r.doc_id: r for r in enc.selectExpr(
        "get_json_object(key_json, '$.doc_id')::bigint AS doc_id",
        "payload_after_raw", "is_structured", "payload_after_json",
    ).collect()}
    assert all(not r.is_structured for r in enc_rows.values())
    assert all(r.payload_after_json is None for r in enc_rows.values())
    assert bytes(enc_rows[1].payload_after_raw)[:1] == b"\x00"  # framed

    dec = ops.avro_decode(ops.avro_encode(e, registry=reg, subject="docs"), registry=reg)
    out = {r["doc_id"]: r["text"] for r in dec.select(
        "payload_after.doc_id", "payload_after.text").collect()}
    assert out == {1: "hello world", 2: "x", 3: ""}


def test_avro_encode_explicit_schema_bare_bytes(spark):
    e = _docs_env(spark)
    sch = (
        '{"type":"record","name":"doc","fields":'
        '[{"name":"doc_id","type":"long"},{"name":"text","type":"string"}]}'
    )
    enc = ops.avro_encode(e, sch)
    row = enc.filter("get_json_object(key_json, '$.doc_id') = 1").collect()[0]
    assert bytes(row.payload_after_raw) == b"\x02\x16hello world"
    dec = ops.avro_decode(enc, sch)
    row = dec.filter("payload_after.doc_id = 1").collect()[0]
    assert row["payload_after"]["text"] == "hello world"


def test_avro_decode_framed_with_only_schema(spark):
    """Bytes framed by avro_encode(registry=...) must decode with just
    the schema when framing is pinned explicitly — no registry and no
    magic-byte guessing (impl/avro/decode.go config-driven framing)."""
    reg = SchemaRegistry()
    e = _docs_env(spark)
    sch = (
        '{"type":"record","name":"docs","fields":'
        '[{"name":"doc_id","type":["null","long"]},'
        '{"name":"text","type":["null","string"]}]}'
    )
    enc = ops.avro_encode(e, registry=reg, subject="docs")
    dec = ops.avro_decode(enc, sch, framed=True)
    out = {r["doc_id"]: r["text"] for r in dec.select(
        "payload_after.doc_id", "payload_after.text").collect()}
    assert out == {1: "hello world", 2: "x", 3: ""}


def test_avro_decode_framed_false_keeps_leading_zero_byte(spark):
    """A bare record whose first byte is legitimately 0x00 must not be
    mis-unframed when framing is pinned off."""
    sch = '{"type":"record","name":"r","fields":[{"name":"n","type":"long"}]}'
    rows = [(0,)]  # zigzag(0) encodes as byte 0x00
    df = spark.createDataFrame(rows, "n: long")
    e = env.from_table(df, key_cols=["n"], source_id="t", typed=True)
    enc = ops.avro_encode(e, sch)
    row = enc.collect()[0]
    assert bytes(row.payload_after_raw)[:1] == b"\x00"  # looks framed
    dec = ops.avro_decode(enc, sch, framed=False)
    assert dec.select("payload_after.n").collect()[0][0] == 0


# ---- property-based round-trip (hypothesis) ------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:
    PROP_SCHEMA = json.loads(
        """{"type":"record","name":"r","fields":[
        {"name":"i","type":"long"},
        {"name":"s","type":"string"},
        {"name":"maybe","type":["null","string"]},
        {"name":"b","type":"boolean"},
        {"name":"x","type":"double"},
        {"name":"raw","type":"bytes"},
        {"name":"tags","type":{"type":"array","items":"long"}},
        {"name":"m","type":{"type":"map","values":"string"}}]}"""
    )

    record_st = st.fixed_dictionaries(
        {
            "i": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            "s": st.text(max_size=200),
            "maybe": st.none() | st.text(max_size=50),
            "b": st.booleans(),
            "x": st.floats(allow_nan=False),
            "raw": st.binary(max_size=100),
            "tags": st.lists(st.integers(-(2**31), 2**31), max_size=10),
            "m": st.dictionaries(st.text(max_size=20), st.text(max_size=20), max_size=5),
        }
    )

    @given(record_st)
    @settings(max_examples=200, deadline=None)
    def test_avro_property_roundtrip(rec):
        assert ac.decode_record(ac.encode_record(rec, PROP_SCHEMA), PROP_SCHEMA) == rec

    @given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
    @settings(max_examples=300, deadline=None)
    def test_varint_roundtrip(n):
        import io as _io

        buf = _io.BytesIO(ac.varint_bytes(n))
        assert ac.read_long(buf) == n


def test_decimal_column_round_trips_through_registry(spark):
    """A Spark DecimalType column infers a decimal-logical Avro schema
    and survives encode->decode bit-exactly through the registry path
    (money columns are the canonical CDC payload)."""
    import pyspark.sql.functions as F

    from conduit_spark import envelope as env
    from conduit_spark.operators import codec_ops as ops
    from conduit_spark.schema_registry import SchemaRegistry

    df = spark.createDataFrame(
        [(1, "9999999.99"), (2, "-0.01"), (3, "123.45")], "id long, amt string"
    ).select("id", F.col("amt").cast("decimal(9,2)").alias("amt"))
    e = env.from_table(df, key_cols=["id"], source_id="t", typed=True)
    reg = SchemaRegistry()
    enc = ops.avro_encode(e, registry=reg, subject="money")
    schema = __import__("json").loads(reg.latest("money").schema_json)
    amt_branch = next(
        f for f in schema["fields"] if f["name"] == "amt"
    )["type"]
    dec_branch = next(
        b for b in amt_branch if isinstance(b, dict)
    )
    assert dec_branch["logicalType"] == "decimal"
    assert (dec_branch["precision"], dec_branch["scale"]) == (9, 2)
    out = ops.avro_decode(enc, registry=reg)
    got = {
        r["id"]: str(r["amt"])
        for r in out.select(
            F.col("payload_after.id").alias("id"),
            F.col("payload_after.amt").alias("amt"),
        ).collect()
    }
    assert got == {1: "9999999.99", 2: "-0.01", 3: "123.45"}
