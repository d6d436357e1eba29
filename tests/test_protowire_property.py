"""Property tests: protowire encode/decode round-trips arbitrary
messages, and unknown fields are skipped without corrupting knowns."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from conduit_spark.functions import protowire as pw

DESC = {
    1: ("s", "string"),
    2: ("b", "bytes"),
    3: ("u", "uint64"),
    4: ("i", "int64"),
    5: ("i32", "int32"),
    6: ("flag", "bool"),
    7: ("tags", "string*"),
    8: ("kv", "map", ("string", "string")),
    9: ("child", "message", {1: ("x", "int64"), 2: ("name", "string")}),
    10: ("children", "message*", {1: ("x", "int64")}),
}

msg_strategy = st.fixed_dictionaries(
    {
        "s": st.text(max_size=40),
        "b": st.binary(max_size=40),
        "u": st.integers(min_value=0, max_value=2**64 - 1),
        "i": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "i32": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "flag": st.booleans(),
        "tags": st.lists(st.text(max_size=10), max_size=5),
        "kv": st.dictionaries(st.text(max_size=8), st.text(max_size=8), max_size=4),
        "child": st.one_of(
            st.none(),
            st.fixed_dictionaries(
                {"x": st.integers(-(2**31), 2**31), "name": st.text(max_size=8)}
            ),
        ),
        "children": st.lists(
            st.fixed_dictionaries({"x": st.integers(-100, 100)}), max_size=4
        ),
    }
)


def _norm(obj: dict) -> dict:
    """Decode always materializes proto3 defaults; normalize the input
    the same way (None child stays None, scalars to zero values)."""
    out = dict(obj)
    if out["child"] is not None:
        out["child"] = {
            "x": out["child"].get("x", 0),
            "name": out["child"].get("name", ""),
        }
    return out


@settings(max_examples=200, deadline=None)
@given(msg_strategy)
def test_roundtrip(obj):
    assert pw.decode(DESC, pw.encode(DESC, obj)) == _norm(obj)


@settings(max_examples=100, deadline=None)
@given(msg_strategy, st.text(max_size=20), st.binary(max_size=20))
def test_unknown_fields_skipped(obj, extra_s, extra_b):
    """Interleave unknown varint/LEN fields; knowns must survive."""
    extra = pw.encode(
        {90: ("a", "string"), 91: ("c", "bytes"), 92: ("n", "uint64")},
        {"a": extra_s, "c": extra_b, "n": 7},
    )
    body = extra + pw.encode(DESC, obj) + extra
    assert pw.decode(DESC, body) == _norm(obj)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**64 - 1))
def test_varint_roundtrip(n):
    dec, pos = pw.decode_varint(pw.encode_varint(n), 0)
    expect = n if n >= 0 else n + (1 << 64)  # wire carries two's complement
    assert dec == expect
    assert pos == len(pw.encode_varint(n))
