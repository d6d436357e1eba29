"""From-spec verification of the pure-Python snappy/LZ4/zstd codecs
(``functions/compression.py``) plus their kafka_wire integration.

Hand-built byte vectors come straight from the published format
documents (google/snappy format_description.txt, lz4_Block_format.md /
lz4_Frame_format.md, RFC 8878, xxhash spec) so the decoders are pinned
to the specs, not merely to our own encoders."""

from __future__ import annotations

import os
import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from conduit_spark.functions.compression import (
    kafka_compress,
    kafka_decompress,
    lz4_block_compress,
    lz4_block_decompress,
    lz4_frame_compress,
    lz4_frame_decompress,
    snappy_compress,
    snappy_decode_kafka,
    snappy_decompress,
    xerial_frame,
    xxh32,
    zstd_compress,
    zstd_decompress,
)
from conduit_spark.functions.kafka_wire import (
    decode_record_batches,
    encode_record_batch,
)


# --- published XXH32 vectors (xxhash repo README / spec) ------------------


def test_xxh32_published_vectors():
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"abc") == 0x32D153FF
    # seed participates in the accumulator init for both size branches
    assert xxh32(b"", 1) != xxh32(b"", 0)
    assert xxh32(b"x" * 64, 1) != xxh32(b"x" * 64, 0)


# --- snappy: spec vectors ---------------------------------------------------


def test_snappy_spec_literal():
    # varint(5) + literal tag ((5-1)<<2) + bytes
    assert snappy_decompress(b"\x05\x10hello") == b"hello"


def test_snappy_spec_two_byte_offset_copy():
    # "abcd" literal then copy(len=8, offset=4) -> abcdabcdabcd
    raw = b"\x0c" + b"\x0cabcd" + bytes([((8 - 1) << 2) | 2]) + b"\x04\x00"
    assert snappy_decompress(raw) == b"abcdabcdabcd"


def test_snappy_spec_one_byte_offset_copy():
    # copy kind 1: len=((tag>>2)&7)+4, offset=((tag>>5)<<8)|next
    raw = b"\x08" + b"\x0cabcd" + bytes([(0 << 2) | 1, 4])
    assert snappy_decompress(raw) == b"abcdabcd"


def test_snappy_overlapping_copy_is_rle():
    # literal "a" + copy(offset=1, len=7) == "a"*8  (overlap semantics)
    raw = b"\x08" + b"\x00a" + bytes([((7 - 1) << 2) | 2]) + b"\x01\x00"
    assert snappy_decompress(raw) == b"a" * 8


def test_snappy_long_literal_extension():
    data = os.urandom(300)  # needs the 1-byte length extension (len>60)
    assert snappy_decompress(snappy_compress(data)) == data


def test_snappy_bad_offset_rejected():
    with pytest.raises(ValueError, match="offset"):
        snappy_decompress(b"\x04" + bytes([((4 - 1) << 2) | 2]) + b"\x09\x00")


def test_xerial_framing_sniffed():
    data = b"kafka snappy batch " * 100
    framed = xerial_frame(data, block_size=256)  # multi-chunk
    assert framed[:8] == b"\x82SNAPPY\x00"
    assert snappy_decode_kafka(framed) == data
    # raw (non-framed) blocks are also accepted, as non-Java clients send
    assert snappy_decode_kafka(snappy_compress(data)) == data


# --- lz4: spec vectors ------------------------------------------------------


def test_lz4_block_spec_vector():
    # token(lit=4, match=4+4) + "abcd" + offset 4 LE -> abcd repeated
    raw = bytes([(4 << 4) | 4]) + b"abcd" + b"\x04\x00"
    assert lz4_block_decompress(raw) == b"abcdabcdabcd"


def test_lz4_block_overlap_rle():
    raw = bytes([(1 << 4) | (8 - 4)]) + b"a" + b"\x01\x00"
    assert lz4_block_decompress(raw) == b"a" * 9


def test_lz4_block_literal_runlength_extension():
    data = os.urandom(20)
    # 15-in-token + extension byte 5 -> 20 literals
    raw = bytes([0xF0, 5]) + data
    assert lz4_block_decompress(raw) == data


def test_lz4_frame_header_checksum_enforced():
    frame = bytearray(lz4_frame_compress(b"payload"))
    frame[6] ^= 0xFF  # HC byte
    with pytest.raises(ValueError, match="descriptor checksum"):
        lz4_frame_decompress(bytes(frame))


def test_lz4_frame_content_checksum_enforced():
    frame = bytearray(lz4_frame_compress(b"payload payload payload"))
    frame[-1] ^= 0xFF
    with pytest.raises(ValueError, match="content checksum"):
        lz4_frame_decompress(bytes(frame))


def test_lz4_frame_multiblock():
    data = (b"0123456789abcdef" * 8192) + os.urandom(100_000)  # > 64 KB blocks
    assert lz4_frame_decompress(lz4_frame_compress(data)) == data


# --- zstd: RFC 8878 Raw/RLE subset ------------------------------------------


def test_zstd_rle_collapses_runs():
    data = bytes(100_000)
    frame = zstd_compress(data)
    assert len(frame) < 50
    assert zstd_decompress(frame) == data


def test_zstd_mixed_raw_and_rle():
    data = os.urandom(500) + b"\x42" * 5000 + os.urandom(500)
    assert zstd_decompress(zstd_compress(data)) == data


def test_zstd_corrupt_compressed_block_raises():
    # magic + FHD(single-segment, 1-byte FCS) + size + block(type=2)
    # whose 1-byte payload is not a valid literals section: the full
    # decoder must fail loudly, not emit garbage
    frame = (
        struct.pack("<I", 0xFD2FB528)
        + bytes([0x20, 1])
        + struct.pack("<I", 1 | (2 << 1) | (1 << 3))[:3]
        + b"\x00"
    )
    with pytest.raises(ValueError):
        zstd_decompress(frame)


# --- property round-trips ----------------------------------------------------

_blobs = st.one_of(
    st.binary(max_size=2000),
    # low-entropy inputs exercise the match emitters hard
    st.binary(max_size=40).flatmap(
        lambda s: st.integers(1, 200).map(lambda k: s * k)
    ),
)


@settings(max_examples=60, deadline=None)
@given(_blobs)
def test_snappy_roundtrip(data):
    assert snappy_decompress(snappy_compress(data)) == data


@settings(max_examples=60, deadline=None)
@given(_blobs)
def test_lz4_roundtrip(data):
    assert lz4_block_decompress(lz4_block_compress(data)) == data
    assert lz4_frame_decompress(lz4_frame_compress(data)) == data


@settings(max_examples=40, deadline=None)
@given(_blobs)
def test_zstd_roundtrip(data):
    assert zstd_decompress(zstd_compress(data)) == data


# --- kafka batch integration --------------------------------------------------


@pytest.mark.parametrize("codec", ["gzip", "snappy", "lz4", "zstd"])
def test_record_batch_roundtrip_all_codecs(codec):
    rng = random.Random(13)
    records = [
        {
            "key": f"key-{i % 7}".encode(),
            "value": bytes(rng.randrange(256) for _ in range(rng.randrange(200))),
            "headers": {"h": b"v"},
            "timestamp": 1_700_000_000_000 + i,
        }
        for i in range(100)
    ]
    raw = encode_record_batch(records, compression=codec)
    out = decode_record_batches(raw)
    assert [(r["key"], r["value"]) for r in out] == [
        (r["key"], r["value"]) for r in records
    ]
    # compressed framing actually shrinks a compressible batch
    compressible = [
        {"key": b"k", "value": b"the same value " * 20, "headers": {},
         "timestamp": 0}
        for _ in range(50)
    ]
    plain = encode_record_batch(compressible)
    packed = encode_record_batch(compressible, compression=codec)
    if codec != "zstd":  # zstd subset is RLE-only; no cross-record matches
        assert len(packed) < len(plain)


def test_kafka_codec_dispatch_unknown():
    with pytest.raises(ValueError):
        kafka_compress(b"x", "brotli")
    with pytest.raises(ValueError):
        kafka_decompress(b"x", "brotli")
