"""Fuzz the pure-Python zstd decoder against a native libzstd loaded
via ctypes (present in this image under miniconda; skipped cleanly when
absent — the JVM golden tests in ``test_zstd_interop.py`` still cover
the decoder).

This exercises shapes the fixed JVM samples don't: every compression
level, explicit checksum frames (XXH64 verification path), window-
spanning matches over multi-block frames, and adversarial low-entropy
inputs that drive RLE/repeat-offset sequences hard.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import glob
import os
import random

import pytest

from conduit_spark.functions.compression import zstd_decompress

_CANDIDATES = (
    [ctypes.util.find_library("zstd")]
    + sorted(glob.glob("/root/miniconda/lib/libzstd.so*"))
    + sorted(glob.glob("/usr/lib/*/libzstd.so*"))
)


def _load_libzstd():
    for cand in _CANDIDATES:
        if not cand:
            continue
        try:
            lib = ctypes.CDLL(cand)
            lib.ZSTD_versionNumber.restype = ctypes.c_uint
            if lib.ZSTD_versionNumber() >= 10400:  # compress2 API
                return lib
        except OSError:
            continue
    return None


_LIB = _load_libzstd()

pytestmark = pytest.mark.skipif(_LIB is None, reason="no native libzstd")

# stable public parameter enums from zstd.h
_ZSTD_c_compressionLevel = 100
_ZSTD_c_checksumFlag = 201


def _native_compress(data: bytes, level: int, checksum: bool) -> bytes:
    lib = _LIB
    lib.ZSTD_createCCtx.restype = ctypes.c_void_p
    cctx = lib.ZSTD_createCCtx()
    try:
        lib.ZSTD_CCtx_setParameter(
            ctypes.c_void_p(cctx), _ZSTD_c_compressionLevel, level
        )
        lib.ZSTD_CCtx_setParameter(
            ctypes.c_void_p(cctx), _ZSTD_c_checksumFlag, int(checksum)
        )
        lib.ZSTD_compressBound.restype = ctypes.c_size_t
        cap = lib.ZSTD_compressBound(ctypes.c_size_t(len(data)))
        dst = ctypes.create_string_buffer(cap)
        lib.ZSTD_compress2.restype = ctypes.c_size_t
        n = lib.ZSTD_compress2(
            ctypes.c_void_p(cctx), dst, ctypes.c_size_t(cap), data,
            ctypes.c_size_t(len(data)),
        )
        lib.ZSTD_isError.restype = ctypes.c_uint
        assert not lib.ZSTD_isError(ctypes.c_size_t(n))
        return dst.raw[:n]
    finally:
        lib.ZSTD_freeCCtx(ctypes.c_void_p(cctx))


def _corpus(rng: random.Random) -> list[bytes]:
    words = [b"alpha", b"beta", b"gamma", b"delta", b"sigma", b"\x00\x01",
             b"the quick brown fox ", b"0123456789", b"{}[]()"]
    out = []
    for _ in range(40):
        kind = rng.randrange(6)
        n = rng.randrange(0, 5000)
        if kind == 0:  # random bytes
            out.append(bytes(rng.randrange(256) for _ in range(n)))
        elif kind == 1:  # word salad (text-like, huffman-friendly)
            out.append(b"".join(rng.choice(words) for _ in range(n // 4)))
        elif kind == 2:  # long runs (RLE / repeat offsets)
            out.append(
                b"".join(
                    bytes([rng.randrange(4)]) * rng.randrange(1, 400)
                    for _ in range(n // 50 + 1)
                )
            )
        elif kind == 3:  # periodic with noise (cross-block matches)
            period = rng.choice(words) + os.urandom(rng.randrange(1, 30))
            out.append(period * (n // max(1, len(period)) + 1))
        elif kind == 4:  # almost-incompressible with islands
            out.append(
                os.urandom(n // 2) + b"x" * rng.randrange(100) + os.urandom(n // 2)
            )
        else:  # tiny inputs
            out.append(os.urandom(rng.randrange(0, 12)))
    # window-spanning: > 1 MiB with long-range repeats
    big_seed = os.urandom(64 * 1024)
    out.append(big_seed + os.urandom(512 * 1024) + big_seed + b"tail")
    return out


def test_fuzz_native_frames_decode_exactly():
    rng = random.Random(20260814)
    for data in _corpus(rng):
        level = rng.choice([1, 2, 3, 5, 7, 9, 12, 15, 17, 19, 22])
        checksum = rng.random() < 0.5
        frame = _native_compress(data, level, checksum)
        assert zstd_decompress(frame) == data, (len(data), level, checksum)


def test_checksum_verification_catches_corruption():
    data = b"conduit" * 4000
    frame = bytearray(_native_compress(data, 3, checksum=True))
    frame[-1] ^= 0xFF  # last checksum byte
    with pytest.raises(ValueError, match="checksum"):
        zstd_decompress(bytes(frame))


def test_truncated_frame_raises_valueerror():
    data = os.urandom(5000)
    frame = _native_compress(data, 3, checksum=False)
    for cut in (5, len(frame) // 2, len(frame) - 1):
        with pytest.raises(ValueError):
            zstd_decompress(frame[:cut])


def test_corpus_exercises_the_interesting_paths(monkeypatch):
    """Guard against silent coverage rot: the fuzz corpus must drive
    the decoder through raw/RLE/Huffman literals and through FSE-coded
    and predefined sequence tables — otherwise a regression in those
    paths could pass the suite unnoticed."""
    import conduit_spark.functions.zstd_decode as Z

    seen = {"lit": set(), "mode": set()}
    orig_lits = Z._decode_literals
    orig_tab = Z._read_seq_table

    def probe_lits(block, at, prev):
        seen["lit"].add(block[at] & 3)
        return orig_lits(block, at, prev)

    def probe_tab(block, at, mode, default, prev, max_symbol, max_log):
        seen["mode"].add(mode)
        return orig_tab(block, at, mode, default, prev, max_symbol, max_log)

    monkeypatch.setattr(Z, "_decode_literals", probe_lits)
    monkeypatch.setattr(Z, "_read_seq_table", probe_tab)

    rng = random.Random(7)
    for data in _corpus(rng):
        for level in (1, 9, 19):
            frame = _native_compress(data, level, checksum=False)
            assert zstd_decompress(frame) == data
    # 0=raw,2=huffman-compressed literals (1=rle literals don't occur
    # naturally in this corpus — pinned by the handcrafted vector
    # below); modes 0=predefined, 1=rle, 2=fse-compressed (3=repeat
    # shows up only on multi-block table reuse, which the one-shot
    # API rarely emits)
    assert {0, 2} <= seen["lit"], seen
    assert {0, 1, 2} <= seen["mode"], seen


def test_rle_literals_spec_vector():
    """Handcrafted compressed block: RLE literals (type 1), 20 x 'Z',
    zero sequences — RFC 8878 §3.1.1.3.1."""
    import struct

    block = bytes([1 | (20 << 3)]) + b"Z" + b"\x00"  # lits hdr, byte, nseq=0
    frame = (
        struct.pack("<I", 0xFD2FB528)
        + bytes([0x20, 20])  # single-segment, FCS=20
        + struct.pack("<I", 1 | (2 << 1) | (len(block) << 3))[:3]
        + block
    )
    assert zstd_decompress(frame) == b"Z" * 20
