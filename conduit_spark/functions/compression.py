"""Pure-Python snappy / LZ4 / zstd codecs for the jar-free Kafka wire
transport.

The reference's Kafka connector consumes and produces every codec the
wire allows because franz-go bundles native implementations
(reference: pkg/plugin/connector/builtin's kafka source/destination).
This container has no python-snappy / lz4 / zstandard packages, so the
wire transport previously refused those attribute bits by name
(``kafka_wire.py``). These codecs close that gap from the published
format specifications alone:

- **snappy** — full block-format compressor (greedy hash-table
  matcher) and decompressor, plus the xerial stream framing
  (``\\x82SNAPPY\\x00``) the Java Kafka client wraps batches in.
  Spec: google/snappy ``format_description.txt``.
- **lz4** — full block-format compressor/decompressor and the v1.6.x
  frame format (magic ``0x184D2204``, descriptor + HC byte, optional
  block/content checksums) with a from-spec XXH32. Kafka v2 record
  batches carry LZ4 *frames*. Specs: lz4_Block_format.md,
  lz4_Frame_format.md, xxhash spec.
- **zstd** — the writer emits frames restricted to Raw and RLE blocks
  (RFC 8878 §3.1.1; valid to every decoder, RLE-only ratio). The
  DECODER is the full RFC 8878 implementation in ``zstd_decode.py``
  (FSE + Huffman + sequences + XXH64 checksums), so entropy-coded
  frames from real producers decode exactly — golden-tested against
  the JVM's zstd-jni across levels in ``tests/test_zstd_interop.py``.

Scale note: these run driver-side (wire-transport framing) or inside
``mapInPandas`` batches on the executor; byte-level Python loops are
acceptable there because the wire transport is the no-jar fallback
path — the JVM ``format("kafka")`` source remains the high-throughput
path when the jar is present.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# snappy block format
# ---------------------------------------------------------------------------


def _uvarint_encode(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def _uvarint_decode(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: uvarint overflow")


def snappy_compress(data: bytes) -> bytes:
    """Greedy snappy block compression: 4-byte-step hash table over the
    input, 2-byte-offset copies (the common element — 1-byte-offset
    copies are an emitter optimization we skip), literals for the rest.
    Always produces valid snappy; compresses repetitive data well."""
    out = bytearray(_uvarint_encode(len(data)))
    n = len(data)
    if n == 0:
        return bytes(out)

    def emit_literal(start: int, end: int) -> None:
        length = end - start
        while length > 0:
            chunk = min(length, 65536)  # 2-byte extension cap per element
            if chunk <= 60:
                out.append((chunk - 1) << 2)
            elif chunk <= 256:
                out.append(60 << 2)
                out.append(chunk - 1)
            else:
                out.append(61 << 2)
                out.extend(struct.pack("<H", chunk - 1))
            out.extend(data[start : start + chunk])
            start += chunk
            length -= chunk

    def emit_copy(offset: int, length: int) -> None:
        # 2-byte-offset copies carry 4..64 bytes each
        while length >= 4:
            chunk = min(length, 64)
            if length - chunk in (1, 2, 3):  # never strand a <4 tail
                chunk = length - 4
            out.append(((chunk - 1) << 2) | 2)
            out.extend(struct.pack("<H", offset))
            length -= chunk

    table: dict[int, int] = {}
    i = 0
    lit_start = 0
    limit = n - 4
    while i <= limit:
        key = data[i : i + 4]
        cand = table.get(key)  # type: ignore[arg-type]
        table[key] = i  # type: ignore[index]
        if cand is not None and i - cand <= 0xFFFF and data[cand : cand + 4] == key:
            # extend the match forward
            m = 4
            max_m = n - i
            while m < max_m and data[cand + m] == data[i + m]:
                m += 1
            if lit_start < i:
                emit_literal(lit_start, i)
            emit_copy(i - cand, m)
            i += m
            lit_start = i
        else:
            i += 1
    if lit_start < n:
        emit_literal(lit_start, n)
    return bytes(out)


def snappy_decompress(data: bytes) -> bytes:
    """Full block-format decoder: literals (with 1/2/3/4-byte length
    extensions) and 1/2/4-byte-offset copies, overlap-safe."""
    expected, pos = _uvarint_decode(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            length = tag >> 2
            if length >= 60:
                extra = length - 59  # 60..63 -> 1..4 bytes little-endian
                length = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            length += 1
            out += data[pos : pos + length]
            pos += length
            continue
        if kind == 1:  # copy, 1-byte offset
            length = ((tag >> 2) & 0x07) + 4
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            offset = struct.unpack_from("<H", data, pos)[0]
            pos += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            offset = struct.unpack_from("<I", data, pos)[0]
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: invalid copy offset")
        # overlapping copies replicate the trailing window byte-by-byte
        start = len(out) - offset
        for k in range(length):
            out.append(out[start + k])
    if len(out) != expected:
        raise ValueError(
            f"snappy: length mismatch (header {expected}, got {len(out)})"
        )
    return bytes(out)


_XERIAL_MAGIC = b"\x82SNAPPY\x00"


def xerial_frame(data: bytes, *, block_size: int = 32 * 1024) -> bytes:
    """snappy-java stream framing: magic + version/compat ints, then
    ``[len:int32 BE][snappy block]`` chunks — what the Java Kafka
    producer wraps each compressed records section in."""
    out = bytearray(_XERIAL_MAGIC)
    out += struct.pack(">ii", 1, 1)  # version, min compatible version
    for at in range(0, len(data), block_size) or (0,):
        block = snappy_compress(data[at : at + block_size])
        out += struct.pack(">i", len(block)) + block
    if not data:  # zero chunks is a valid empty stream
        pass
    return bytes(out)


def snappy_decode_kafka(data: bytes) -> bytes:
    """Kafka batches arrive either xerial-framed (Java producers) or as
    a raw snappy block (several non-Java clients): sniff the magic."""
    if data[:8] == _XERIAL_MAGIC:
        pos = 16  # magic + version + compat
        out = bytearray()
        while pos < len(data):
            (block_len,) = struct.unpack_from(">i", data, pos)
            pos += 4
            out += snappy_decompress(data[pos : pos + block_len])
            pos += block_len
        return bytes(out)
    return snappy_decompress(data)


# ---------------------------------------------------------------------------
# XXH32 (needed by the LZ4 frame format's header-checksum + content hash)
# ---------------------------------------------------------------------------

_P1, _P2, _P3, _P4, _P5 = (
    2654435761,
    2246822519,
    3266489917,
    668265263,
    374761393,
)
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 from the published xxhash specification (stripe-of-4
    accumulators over 16-byte lanes, avalanche finisher)."""
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        limit = n - 16
        while pos <= limit:
            lanes = struct.unpack_from("<IIII", data, pos)
            v1 = (_rotl32((v1 + lanes[0] * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl32((v2 + lanes[1] * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl32((v3 + lanes[2] * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl32((v4 + lanes[3] * _P2) & _M32, 13) * _P1) & _M32
            pos += 16
        acc = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)
        ) & _M32
    else:
        acc = (seed + _P5) & _M32
    acc = (acc + n) & _M32
    while pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        acc = (_rotl32((acc + lane * _P3) & _M32, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        acc = (_rotl32((acc + data[pos] * _P5) & _M32, 11) * _P1) & _M32
        pos += 1
    acc ^= acc >> 15
    acc = (acc * _P2) & _M32
    acc ^= acc >> 13
    acc = (acc * _P3) & _M32
    acc ^= acc >> 16
    return acc


# ---------------------------------------------------------------------------
# LZ4 block + frame formats
# ---------------------------------------------------------------------------


def lz4_block_compress(data: bytes) -> bytes:
    """Greedy LZ4 block compression honoring the spec's end-of-block
    restrictions (last 5 bytes always literals; no match starts within
    12 bytes of the end)."""
    n = len(data)
    out = bytearray()

    def emit(lit_start: int, lit_end: int, offset: int, match_len: int) -> None:
        lit_len = lit_end - lit_start
        token_lit = min(lit_len, 15)
        token_match = min(match_len - 4, 15) if match_len else 0
        out.append((token_lit << 4) | token_match)
        if token_lit == 15:
            rest = lit_len - 15
            while rest >= 255:
                out.append(255)
                rest -= 255
            out.append(rest)
        out.extend(data[lit_start:lit_end])
        if match_len:
            out.extend(struct.pack("<H", offset))
            if token_match == 15:
                rest = match_len - 4 - 15
                while rest >= 255:
                    out.append(255)
                    rest -= 255
                out.append(rest)

    if n == 0:
        return b"\x00"  # one empty-literal token
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    # matches must not start within the last 12 bytes (mflimit)
    limit = n - 12
    while i <= limit:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF and data[cand : cand + 4] == key:
            m = 4
            # matchlength may run up to the last-5-literals boundary
            max_m = (n - 5) - i
            while m < max_m and data[cand + m] == data[i + m]:
                m += 1
            if m >= 4:
                emit(lit_start, i, i - cand, m)
                i += m
                lit_start = i
                continue
        i += 1
    emit(lit_start, n, 0, 0)  # trailing literals, no match
    return bytes(out)


def lz4_block_decompress(data: bytes, max_size: int | None = None) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = data[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        out += data[pos : pos + lit_len]
        pos += lit_len
        if pos >= n:
            break  # last sequence has no match part
        (offset,) = struct.unpack_from("<H", data, pos)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError("lz4: invalid match offset")
        match_len = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                b = data[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        start = len(out) - offset
        for k in range(match_len):
            out.append(out[start + k])
        if max_size is not None and len(out) > max_size:
            raise ValueError("lz4: output exceeds declared size")
    return bytes(out)


_LZ4_MAGIC = 0x184D2204
# BD block-max-size table: id 4..7 -> 64 KB..4 MB
_LZ4_BLOCK_MAX = {4: 64 * 1024, 5: 256 * 1024, 6: 1024 * 1024, 7: 4 * 1024 * 1024}


def lz4_frame_compress(data: bytes, *, block_max_id: int = 4) -> bytes:
    """LZ4 frame: FLG(version=01, block-independent, content-checksum),
    BD(block max size), HC = byte 1 of XXH32(descriptor); independent
    blocks, end mark, XXH32 content checksum — the exact shape the
    Kafka Java client emits for LZ4 batches (message format v2 uses the
    spec-correct HC; the legacy v0 HC-over-magic quirk predates record
    batches and is not produced here)."""
    flg = (1 << 6) | (1 << 5) | (1 << 2)  # version 01, B.Indep, C.Checksum
    bd = block_max_id << 4
    descriptor = bytes([flg, bd])
    hc = (xxh32(descriptor) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", _LZ4_MAGIC) + descriptor + bytes([hc]))
    block_max = _LZ4_BLOCK_MAX[block_max_id]
    # empty content = zero data blocks (what reference encoders emit;
    # an explicit size-0 block is rejected by lz4-java's frame reader)
    for at in range(0, len(data), block_max):
        chunk = data[at : at + block_max]
        comp = lz4_block_compress(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp)) + comp
        else:  # incompressible: store raw, high bit set
            out += struct.pack("<I", len(chunk) | 0x80000000) + chunk
    out += struct.pack("<I", 0)  # EndMark
    out += struct.pack("<I", xxh32(data))  # content checksum
    return bytes(out)


def lz4_frame_decompress(data: bytes) -> bytes:
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != _LZ4_MAGIC:
        raise ValueError(f"lz4: bad frame magic {magic:#x}")
    flg = data[4]
    if (flg >> 6) != 1:
        raise ValueError("lz4: unsupported frame version")
    content_checksum = bool(flg & (1 << 2))
    block_checksum = bool(flg & (1 << 4))
    content_size_present = bool(flg & (1 << 3))
    dict_id_present = bool(flg & 1)
    pos = 6  # magic + FLG + BD
    declared_size = None
    if content_size_present:
        (declared_size,) = struct.unpack_from("<Q", data, pos)
        pos += 8
    if dict_id_present:
        pos += 4
    hc = data[pos]
    pos += 1
    descriptor = data[4 : pos - 1]
    if ((xxh32(descriptor) >> 8) & 0xFF) != hc:
        raise ValueError("lz4: frame descriptor checksum mismatch")
    block_max = _LZ4_BLOCK_MAX.get((data[5] >> 4) & 0x07, 4 * 1024 * 1024)
    out = bytearray()
    while True:
        (block_size,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if block_size == 0:  # EndMark
            break
        is_raw = bool(block_size & 0x80000000)
        block_size &= 0x7FFFFFFF
        block = data[pos : pos + block_size]
        pos += block_size
        if block_checksum:
            (bsum,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if xxh32(block) != bsum:
                raise ValueError("lz4: block checksum mismatch")
        out += block if is_raw else lz4_block_decompress(block, block_max)
    if content_checksum:
        (csum,) = struct.unpack_from("<I", data, pos)
        if xxh32(bytes(out)) != csum:
            raise ValueError("lz4: content checksum mismatch")
    if declared_size is not None and len(out) != declared_size:
        raise ValueError("lz4: content size mismatch")
    return bytes(out)


# ---------------------------------------------------------------------------
# zstd frames, Raw/RLE blocks only (RFC 8878)
# ---------------------------------------------------------------------------

_ZSTD_MAGIC = 0xFD2FB528


def zstd_compress(data: bytes, *, block_max: int = 128 * 1024) -> bytes:
    """A valid zstd frame using only Raw and RLE blocks (RFC 8878
    §3.1.1.2): single-segment, content size in the header, no checksum.
    Any conformant zstd decoder accepts it; compression ratio is
    RLE-only (runs collapse, everything else is stored)."""
    out = bytearray(struct.pack("<I", _ZSTD_MAGIC))
    n = len(data)
    # frame header descriptor: single-segment, FCS field sized to fit
    if n <= 255:
        out.append((0 << 6) | (1 << 5))  # FCS 1 byte via single-segment
        out.append(n)
    elif n <= 0xFFFF + 256:
        out.append((1 << 6) | (1 << 5))
        out += struct.pack("<H", n - 256)
    else:
        out.append((2 << 6) | (1 << 5))
        out += struct.pack("<I", n)
    blocks: list[tuple[int, bytes]] = []  # (type, payload)
    at = 0
    while at < n:
        run_byte = data[at]
        run = 1
        while at + run < n and data[at + run] == run_byte and run < 0x1FFFFF:
            run += 1
        if run >= 16:  # RLE block (type 1): regenerated size = run
            blocks.append((1, bytes([run_byte])))
            blocks.append((run, b""))  # carry size via a marker pair
            at += run
        else:
            end = min(at + block_max, n)
            # stop a raw block early if a long run starts inside it
            scan = at + 1
            while scan < end:
                if (
                    data[scan] == data[scan - 1]
                    and data[scan : scan + 16] == bytes([data[scan]]) * 16
                ):
                    end = scan
                    break
                scan += 1
            blocks.append((0, data[at:end]))
            at = end
    if not blocks:
        blocks.append((0, b""))
    # serialize: Block_Header = 3 bytes LE: last(1) | type(2) | size(21)
    i = 0
    emitted = []
    while i < len(blocks):
        btype, payload = blocks[i]
        if btype == 1:  # RLE pair: next entry holds the run length
            size = blocks[i + 1][0]
            i += 2
        else:
            size = len(payload)
            i += 1
        emitted.append((btype, size, payload))
    for j, (btype, size, payload) in enumerate(emitted):
        last = 1 if j == len(emitted) - 1 else 0
        header = last | (btype << 1) | (size << 3)
        out += struct.pack("<I", header)[:3]
        out += payload
    return bytes(out)


def zstd_decompress(data: bytes) -> bytes:
    """Decode any zstd frame: delegates to the full RFC 8878 decoder
    (``zstd_decode.zstd_decompress_full`` — FSE + Huffman + sequences,
    golden-tested against zstd-jni), keeping this module's historical
    fast path for the Raw/RLE frames our own encoder emits."""
    from conduit_spark.functions.zstd_decode import zstd_decompress_full

    try:
        return zstd_decompress_full(data)
    except (IndexError, struct.error) as e:  # truncated/corrupt input
        raise ValueError(f"zstd: truncated or corrupt frame ({e})") from e


# ---------------------------------------------------------------------------
# Kafka codec dispatch (attribute bits 0-2 of a v2 record batch)
# ---------------------------------------------------------------------------


def kafka_compress(payload: bytes, codec: str) -> bytes:
    if codec == "gzip":
        import gzip

        return gzip.compress(payload, mtime=0)
    if codec == "snappy":
        return xerial_frame(payload)
    if codec == "lz4":
        return lz4_frame_compress(payload)
    if codec == "zstd":
        return zstd_compress(payload)
    raise ValueError(f"unknown codec {codec!r}")


def kafka_decompress(payload: bytes, codec: str) -> bytes:
    if codec == "gzip":
        import gzip

        return gzip.decompress(payload)
    if codec == "snappy":
        return snappy_decode_kafka(payload)
    if codec == "lz4":
        return lz4_frame_decompress(payload)
    if codec == "zstd":
        return zstd_decompress(payload)
    raise ValueError(f"unknown codec {codec!r}")
