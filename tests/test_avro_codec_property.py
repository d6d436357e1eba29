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
