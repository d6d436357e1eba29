"""Golden-frame interop for the pure-Python codecs against the NATIVE
implementations bundled with Spark's JVM (zstd-jni, snappy-java,
lz4-java — the same libraries real Kafka clients use).

This is the strongest verification available in this container: the
snappy/LZ4 codecs must round-trip against the reference native codecs
in BOTH directions, and the full zstd decoder
(``functions/zstd_decode.py``) must decode entropy-coded frames
produced by the real zstd compressor across levels and data shapes.
"""

from __future__ import annotations

import os
import random

import pytest

from conduit_spark.functions.compression import (
    lz4_block_compress,
    lz4_block_decompress,
    lz4_frame_compress,
    lz4_frame_decompress,
    snappy_compress,
    snappy_decompress,
    zstd_compress,
)
from conduit_spark.functions.zstd_decode import xxh64, zstd_decompress_full


def _samples() -> list[bytes]:
    rng = random.Random(99)
    text = (
        b"Spark-first analytics engine; record batches flow through the "
        b"wire transport when no jar is present. "
    )
    return [
        b"",
        b"a",
        b"abcabcabcabc",
        text * 50,
        bytes(rng.randrange(256) for _ in range(10_000)),  # incompressible
        bytes(10_000),  # long run -> RLE paths
        (text + bytes(rng.randrange(256) for _ in range(64))) * 40,  # mixed
        os.urandom(3) + b"x" * 500 + os.urandom(2000) + b"y" * 300,
        # > 128 KB: multiple blocks, window-spanning matches
        (text * 400 + os.urandom(1024)) * 8,
    ]


@pytest.fixture(scope="module")
def jvm(spark):
    return spark._jvm


def test_snappy_both_directions(jvm):
    Snappy = jvm.org.xerial.snappy.Snappy
    for data in _samples():
        # native-compressed raw block -> our decoder
        assert snappy_decompress(bytes(Snappy.compress(data))) == data
        # our compressor -> native decoder
        assert bytes(Snappy.uncompress(snappy_compress(data))) == data


def test_lz4_block_both_directions(jvm):
    factory = jvm.net.jpountz.lz4.LZ4Factory.fastestInstance()
    comp = factory.fastCompressor()
    dec = factory.fastDecompressor()
    for data in _samples():
        assert lz4_block_decompress(bytes(comp.compress(data))) == data
        assert bytes(dec.decompress(lz4_block_compress(data), len(data))) == data


def test_lz4_frame_both_directions(jvm):
    for data in _samples():
        # our frame -> native LZ4FrameInputStream
        bis = jvm.java.io.ByteArrayInputStream(lz4_frame_compress(data))
        fin = jvm.net.jpountz.lz4.LZ4FrameInputStream(bis)
        got = bytes(fin.readAllBytes())  # py4j arrays pass by value
        fin.close()
        assert got == data
        # native frame -> our decoder
        bos = jvm.java.io.ByteArrayOutputStream()
        fos = jvm.net.jpountz.lz4.LZ4FrameOutputStream(bos)
        fos.write(data, 0, len(data))
        fos.close()
        assert lz4_frame_decompress(bytes(bos.toByteArray())) == data


def test_zstd_full_decoder_against_native(jvm):
    """The core claim: entropy-coded (FSE/Huffman) frames from the real
    zstd compressor decode bit-exactly, across compression levels."""
    Zstd = jvm.com.github.luben.zstd.Zstd
    for data in _samples():
        for level in (1, 3, 9, 19):
            frame = bytes(Zstd.compress(data, level))
            assert zstd_decompress_full(frame) == data, (len(data), level)


def test_zstd_native_accepts_our_rawrle_frames(jvm):
    Zstd = jvm.com.github.luben.zstd.Zstd
    for data in _samples():
        frame = zstd_compress(data)
        if data:
            assert bytes(Zstd.decompress(frame, len(data))) == data
        else:
            assert zstd_decompress_full(frame) == b""


def test_zstd_full_decoder_rejects_dictionary_frames(jvm):
    # train-less quick check: dict IDs are refused by name, not garbled
    import struct

    frame = bytearray(zstd_compress(b"payload"))
    frame[4] |= 1  # dictionary-ID flag, 1-byte ID
    frame.insert(5, 7)
    with pytest.raises(ValueError, match="dictionary"):
        zstd_decompress_full(bytes(frame))
    assert struct.unpack_from("<I", frame, 0)[0] == 0xFD2FB528


def test_xxh64_against_jvm(jvm):
    # spark bundles xxhash in zstd-jni's XXHash? use lz4-java's XXHash64
    factory = jvm.net.jpountz.xxhash.XXHashFactory.fastestInstance()
    h = factory.hash64()
    for data in _samples():
        for seed in (0, 1, 0x9E3779B185EBCA87):
            want = h.hash(data, 0, len(data), seed & 0x7FFFFFFFFFFFFFFF)
            got = xxh64(data, seed & 0x7FFFFFFFFFFFFFFF)
            assert got == want & 0xFFFFFFFFFFFFFFFF, (len(data), seed)


def test_foreign_zstd_record_batch_decodes(jvm):
    """End-to-end foreign-producer shape: a RecordBatch v2 whose
    records section was compressed by the NATIVE zstd (as a real
    client with zstd-jni would produce) must decode through the wire
    transport's normal path."""
    import struct

    from conduit_spark.functions.kafka_wire import (
        crc32c,
        decode_record_batches,
        encode_record_batch,
    )

    records = [
        {"key": f"k{i}".encode(), "value": (f"payload-{i} " * 8).encode(),
         "headers": {"src": b"native"}, "timestamp": 1_700_000_000_000 + i}
        for i in range(64)
    ]
    # build an uncompressed batch, then re-compress its records section
    # with native zstd and restamp attributes + CRC, byte-for-byte what
    # a zstd-producing client emits
    plain = encode_record_batch(records)
    body = plain[12:]
    after_crc = bytearray(body[9:])
    payload = bytes(after_crc[40:])
    Zstd = jvm.com.github.luben.zstd.Zstd
    native = bytes(Zstd.compress(payload, 3))
    struct.pack_into(">h", after_crc, 0, 4)  # attributes: codec=zstd
    recompressed = bytes(after_crc[:40]) + native
    new_body = (
        body[:5] + struct.pack(">I", crc32c(recompressed)) + recompressed
    )
    frame = plain[:8] + struct.pack(">i", len(new_body)) + new_body
    out = decode_record_batches(frame)
    assert [(r["key"], r["value"]) for r in out] == [
        (r["key"], r["value"]) for r in records
    ]
