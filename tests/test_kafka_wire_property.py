"""Property tests for the Kafka RecordBatch v2 codec: any combination
of keys/values/headers/timestamps must round-trip byte-faithfully, and
every single-bit corruption of the post-CRC body must be detected."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from conduit_spark.functions.kafka_wire import (
    decode_record_batches,
    encode_record_batch,
)

blob = st.one_of(st.none(), st.binary(max_size=64))
header_key = st.text(min_size=0, max_size=12)
record = st.fixed_dictionaries(
    {
        "key": blob,
        "value": blob,
        "headers": st.dictionaries(header_key, blob, max_size=4),
        "timestamp": st.integers(min_value=-(2**40), max_value=2**40),
    }
)


@settings(max_examples=150, deadline=None)
@given(
    records=st.lists(record, min_size=1, max_size=12),
    base_offset=st.integers(min_value=0, max_value=2**40),
)
def test_round_trip_any_records(records, base_offset):
    out = decode_record_batches(encode_record_batch(records, base_offset=base_offset))
    assert len(out) == len(records)
    for i, (orig, dec) in enumerate(zip(records, out)):
        assert dec["offset"] == base_offset + i
        assert dec["timestamp"] == orig["timestamp"]
        assert dec["key"] == (bytes(orig["key"]) if orig["key"] is not None else None)
        assert dec["value"] == (
            bytes(orig["value"]) if orig["value"] is not None else None
        )
        assert dec["headers"] == {
            k: (bytes(v) if v is not None else None)
            for k, v in orig["headers"].items()
        }


@settings(max_examples=60, deadline=None)
@given(
    records=st.lists(record, min_size=1, max_size=4),
    data=st.data(),
)
def test_single_bitflip_detected_or_harmless(records, data):
    import pytest

    wire = bytearray(encode_record_batch(records))
    # flip one bit anywhere after the batch header's crc field (byte 21
    # onward = the crc-protected region)
    idx = data.draw(st.integers(min_value=21, max_value=len(wire) - 1))
    bit = data.draw(st.integers(min_value=0, max_value=7))
    wire[idx] ^= 1 << bit
    with pytest.raises(ValueError):
        decode_record_batches(bytes(wire))


def test_gzip_batches_round_trip_property():
    """Property: gzip-compressed batches round-trip for arbitrary
    key/value/header content; the CRC covers the compressed bytes
    (flipping one compressed byte fails integrity, not gunzip); and
    unsupported codecs are refused by name."""
    import struct

    from hypothesis import given, settings, strategies as st

    from conduit_spark.functions.kafka_wire import (
        decode_record_batches,
        encode_record_batch,
    )

    blob = st.binary(min_size=0, max_size=60)

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.tuples(st.one_of(st.none(), blob), st.one_of(st.none(), blob)),
            min_size=1,
            max_size=8,
        )
    )
    def check(kvs):
        records = [
            {"key": k, "value": v, "headers": {"n": b"1"}, "timestamp": i}
            for i, (k, v) in enumerate(kvs)
        ]
        raw = encode_record_batch(records, compression="gzip")
        out = decode_record_batches(raw)
        assert [(r["key"], r["value"]) for r in out] == kvs

    check()

    records = [{"key": b"k", "value": b"v" * 100, "headers": {}, "timestamp": 0}]
    raw = bytearray(encode_record_batch(records, compression="gzip"))
    raw[-1] ^= 0xFF  # corrupt one compressed byte
    try:
        decode_record_batches(bytes(raw))
        raise AssertionError("expected CRC failure")
    except ValueError as e:
        assert "CRC32C" in str(e)

    # every wire codec round-trips through the pure-Python codecs
    many = [
        {"key": f"k{i}".encode(), "value": (f"v{i}" * 30).encode(),
         "headers": {"h": b"x"}, "timestamp": i}
        for i in range(50)
    ]
    for codec in ("gzip", "snappy", "lz4", "zstd"):
        raw = encode_record_batch(many, compression=codec)
        out = decode_record_batches(raw)
        assert [(r["key"], r["value"]) for r in out] == [
            (r["key"], r["value"]) for r in many
        ], codec

    # a zstd-flagged batch whose payload is not a zstd frame fails by
    # name (bad magic), not with a gunzip error
    good = encode_record_batch(records)
    body_at = 12
    attrs_at = body_at + 9  # past partitionLeaderEpoch+magic+crc
    patched = bytearray(good)
    struct.pack_into(">h", patched, attrs_at, 4)  # zstd
    # recompute crc over the patched after_crc
    from conduit_spark.functions.kafka_wire import crc32c

    after = bytes(patched[attrs_at:])
    struct.pack_into(">I", patched, body_at + 5, crc32c(after))
    try:
        decode_record_batches(bytes(patched))
        raise AssertionError("expected codec refusal")
    except ValueError as e:
        assert "zstd" in str(e)

