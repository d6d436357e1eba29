"""Property tests for the pure-Python Avro binary codec: arbitrary
values conforming to a generated record schema must round-trip
encode_record → decode_record exactly (the byte layer under
avro.encode/avro.decode when no spark-avro jar is present)."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from conduit_spark.functions.avro_codec import decode_record, encode_record

# field name → (avro type, value strategy)
_SCALARS = {
    "long": st.integers(min_value=-(2**62), max_value=2**62),
    "int": st.integers(min_value=-(2**31), max_value=2**31 - 1),
    "double": st.floats(allow_nan=False, allow_infinity=False),
    "boolean": st.booleans(),
    "string": st.text(max_size=40),
    "bytes": st.binary(max_size=40),
}


@st.composite
def record_and_schema(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    fields = []
    obj = {}
    for i in range(n):
        tname = draw(st.sampled_from(sorted(_SCALARS)))
        nullable = draw(st.booleans())
        name = f"f{i}_{tname}"
        if nullable:
            fields.append({"name": name, "type": ["null", tname]})
            val = draw(st.one_of(st.none(), _SCALARS[tname]))
        else:
            fields.append({"name": name, "type": tname})
            val = draw(_SCALARS[tname])
        obj[name] = val
    # one array field and one map field exercise the blocked encodings
    fields.append({"name": "arr", "type": {"type": "array", "items": "long"}})
    obj["arr"] = draw(st.lists(st.integers(min_value=-(2**40), max_value=2**40), max_size=8))
    fields.append({"name": "m", "type": {"type": "map", "values": "string"}})
    obj["m"] = draw(st.dictionaries(st.text(max_size=8), st.text(max_size=8), max_size=4))
    schema = json.dumps({"type": "record", "name": "r", "fields": fields})
    return obj, schema


@settings(max_examples=200, deadline=None)
@given(data=record_and_schema())
def test_avro_round_trip_any_record(data):
    obj, schema = data
    out = decode_record(encode_record(obj, schema), schema)
    for k, v in obj.items():
        got = out[k]
        if isinstance(v, bytes):
            assert got in (v, bytearray(v))
        else:
            assert got == v, (k, v, got)


def test_enum_fixed_decimal_round_trip_and_wire_bytes():
    """enum/fixed/decimal per the Avro spec: enum = symbol index as
    long; fixed = raw bytes, no length; decimal = two's-complement
    big-endian unscaled value (length-prefixed on bytes, padded on
    fixed). Wire bytes are checked against hand-built spec encodings,
    not just a self-round-trip."""
    import decimal
    import io

    from conduit_spark.functions.avro_codec import (
        decode_value,
        encode_value,
    )

    def enc(schema, v):
        buf = io.BytesIO()
        encode_value(buf, schema, v)
        return buf.getvalue()

    def dec(schema, raw):
        return decode_value(io.BytesIO(raw), schema)

    enum_s = {"type": "enum", "name": "Op", "symbols": ["C", "U", "D"]}
    assert enc(enum_s, "U") == b"\x02"  # zigzag(1)
    assert dec(enum_s, b"\x04") == "D"

    fixed_s = {"type": "fixed", "name": "md5", "size": 4}
    assert enc(fixed_s, b"\x01\x02\x03\x04") == b"\x01\x02\x03\x04"  # no length
    assert dec(fixed_s, b"\xaa\xbb\xcc\xdd") == b"\xaa\xbb\xcc\xdd"

    dec_s = {"type": "bytes", "logicalType": "decimal", "precision": 9, "scale": 2}
    # 123.45 -> unscaled 12345 = 0x3039 -> varint len 2 (zigzag 0x04)
    assert enc(dec_s, decimal.Decimal("123.45")) == b"\x04\x30\x39"
    assert dec(dec_s, b"\x04\x30\x39") == decimal.Decimal("123.45")
    # negative: -1.00 -> unscaled -100 -> two's complement 0x9c (1 byte)
    assert enc(dec_s, decimal.Decimal("-1.00")) == b"\x02\x9c"
    assert dec(dec_s, b"\x02\x9c") == decimal.Decimal("-1.00")

    decf_s = {
        "type": "fixed", "name": "amt", "size": 4,
        "logicalType": "decimal", "precision": 9, "scale": 2,
    }
    # padding: positive pads 0x00, negative pads 0xff (sign extension)
    assert enc(decf_s, decimal.Decimal("1.00")) == b"\x00\x00\x00\x64"
    assert enc(decf_s, decimal.Decimal("-1.00")) == b"\xff\xff\xff\x9c"
    assert dec(decf_s, b"\xff\xff\xff\x9c") == decimal.Decimal("-1.00")

    # unions pick the right branch for all three
    u = ["null", enum_s]
    assert enc(u, None) == b"\x00"
    assert enc(u, "C") == b"\x02\x00"
    assert dec(u, b"\x02\x04") == "D"
    ud = ["null", dec_s]
    assert dec(ud, enc(ud, decimal.Decimal("7.25"))) == decimal.Decimal("7.25")

    # errors are typed, not corrupt output
    import pytest as _pytest

    from conduit_spark.functions.avro_codec import AvroTypeError

    with _pytest.raises(AvroTypeError, match="enum"):
        enc(enum_s, "X")
    with _pytest.raises(AvroTypeError, match="fixed"):
        enc(fixed_s, b"\x01")


def test_decimal_round_trip_property():
    import decimal
    import io

    from hypothesis import given, settings, strategies as st

    from conduit_spark.functions.avro_codec import decode_value, encode_value

    schema = {"type": "bytes", "logicalType": "decimal",
              "precision": 20, "scale": 3}

    @settings(max_examples=60, deadline=None)
    @given(st.integers(-(10**17), 10**17))
    def check(unscaled):
        v = decimal.Decimal(unscaled).scaleb(-3)
        buf = io.BytesIO()
        encode_value(buf, schema, v)
        assert decode_value(io.BytesIO(buf.getvalue()), schema) == v

    check()
