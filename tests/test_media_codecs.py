"""Real multimodal decode tests: stdlib PNG + WAV codecs behind
``decode_media(real_codecs=True)`` (previously NotImplementedError-only
seams). The PNG fixture is encoded in-test per the spec with every
filter type (0-4) so the decoder's unfilter path is fully exercised;
the WAV fixture is written by the stdlib ``wave`` writer — an
independent implementation of the format our RIFF walk decodes."""

from __future__ import annotations

import io
import struct
import wave
import zlib

import pytest

from conduit_spark.analytics.media_codecs import (
    decode_any,
    decode_png,
    decode_wav,
    sniff,
)


def encode_png(pixels: list[list[tuple[int, int, int]]], filters: list[int]) -> bytes:
    """Minimal spec-conformant RGB8 PNG encoder (filter per scanline)."""
    h = len(pixels)
    w = len(pixels[0])
    channels = 3
    stride = w * channels

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    flat = [bytes(v for px in row for v in px) for row in pixels]
    raw = bytearray()
    prev = bytes(stride)
    for row, ftype in zip(flat, filters):
        raw.append(ftype)
        if ftype == 0:
            raw += row
        elif ftype == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - channels] if i >= channels else 0)) & 0xFF
                for i in range(stride)
            )
        elif ftype == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif ftype == 3:  # Average
            raw += bytes(
                (row[i] - ((row[i - channels] if i >= channels else 0) + prev[i]) // 2)
                & 0xFF
                for i in range(stride)
            )
        elif ftype == 4:  # Paeth
            out = bytearray()
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                up = prev[i]
                ul = prev[i - channels] if i >= channels else 0
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                out.append((row[i] - pred) & 0xFF)
            raw += out
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # RGB8
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def make_png() -> tuple[bytes, list[list[tuple[int, int, int]]]]:
    # 5 rows, one per filter type; gradient pixels so every filter is
    # non-trivial to reverse
    pixels = [
        [((x * 37 + y * 11) % 256, (x * 5) % 256, (y * 29) % 256) for x in range(6)]
        for y in range(5)
    ]
    return encode_png(pixels, filters=[0, 1, 2, 3, 4]), pixels


def make_wav(freq_step: int = 3, n: int = 800) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        frames = b"".join(
            struct.pack("<hh", (i * freq_step) % 3000 - 1500, -((i * 7) % 2000) + 1000)
            for i in range(n)
        )
        w.writeframes(frames)
    return buf.getvalue()


def test_png_roundtrip_all_filters():
    raw, pixels = make_png()
    assert sniff(raw) == "png"
    meta = decode_png(raw)
    assert (meta["width"], meta["height"], meta["channels"]) == (6, 5, 3)
    flat = [v for row in pixels for px in row for v in px]
    assert meta["pixel_mean"] == pytest.approx(sum(flat) / len(flat))
    assert meta["pixel_min"] == min(flat)
    assert meta["pixel_max"] == max(flat)


def test_wav_riff_walk_matches_wave_module():
    raw = make_wav()
    assert sniff(raw) == "wav"
    meta = decode_wav(raw)
    with wave.open(io.BytesIO(raw), "rb") as w:
        assert meta["n_channels"] == w.getnchannels()
        assert meta["framerate"] == w.getframerate()
        assert meta["n_frames"] == w.getnframes()
    assert meta["bits_per_sample"] == 16
    assert meta["duration_sec"] == pytest.approx(800 / 8000)
    assert meta["sample_peak"] <= 1500 + 1


def test_unsupported_containers_stay_honest_seams():
    # a JPEG that is only magic bytes is now a DECODE error (the codec
    # is real), not a missing-codec seam
    with pytest.raises(ValueError, match="JPEG"):
        decode_any(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
    with pytest.raises(NotImplementedError):
        decode_any(b"garbage-not-a-container")


def test_decode_media_real_codecs_end_to_end(spark):
    """PNG + WAV media rows through the Spark plumbing with
    real_codecs=True: true dimensions come back, per-row, Arrow-batched."""
    import pyspark.sql.functions as F

    from conduit_spark.analytics.multimodal import as_media, decode_media

    png, _ = make_png()
    wav = make_wav()
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(wav))], "media_id long, content binary"
    )
    media = as_media(df, "content", "media_id", "mixed")
    out = {
        r["media_id"]: r
        for r in decode_media(media, real_codecs=True).collect()
    }
    assert (out[1]["width"], out[1]["height"]) == (6, 5)  # true PNG dims
    assert (out[2]["width"], out[2]["height"]) == (800, 2)  # frames, channels
    # and the fake path still disagrees (digest-derived) — proving the
    # real path isn't falling back
    fake = {r["media_id"]: r for r in decode_media(media).collect()}
    assert (fake[1]["width"], fake[1]["height"]) != (6, 5)

    # a JPEG decodes for real through the Spark plumbing now
    jpg_df = spark.createDataFrame(
        [(3, bytearray(encode_jpeg(_gradient_rgb(16, 24))))],
        "media_id long, content binary",
    )
    jpg = decode_media(
        as_media(jpg_df, "content", "media_id", "image"), real_codecs=True
    ).collect()[0]
    assert (jpg["width"], jpg["height"]) == (24, 16)

    # an unknown container still fails inside the task (honest seam)
    unk_df = spark.createDataFrame(
        [(4, bytearray(b"garbage-not-a-container"))],
        "media_id long, content binary",
    )
    with pytest.raises(Exception, match="NotImplementedError|pure-Python"):
        decode_media(
            as_media(unk_df, "content", "media_id", "image"), real_codecs=True
        ).collect()


# -- baseline JPEG: in-test encoder (independent implementation) ------


class _BitWriter:
    """MSB-first bit writer with JPEG 0xFF00 byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def align(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


# simple LEGAL canonical tables (not Annex K): DC symbols 0..11 as
# 4-bit codes, AC symbols 0..255 as 9-bit codes — the decoder must
# honor whatever DHT declares, so these exercise table-building too
_DC_COUNTS = bytes([0, 0, 0, 12] + [0] * 12)
_DC_SYMS = bytes(range(12))
_AC_COUNTS = bytes([0] * 8 + [255] + [1] + [0] * 6)
_AC_SYMS = bytes(list(range(255)) + [255])

_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _ac_code(sym: int) -> tuple[int, int]:
    # canonical codes for _AC_COUNTS/_AC_SYMS: symbols 0..254 at 9 bits
    # (codes 0..254), symbol 255 at 10 bits (code 510)
    return (510, 10) if sym == 255 else (sym, 9)


def _encode_block(w, block, qt, pred, np):
    import math

    m = np.zeros((8, 8))
    for u in range(8):
        a = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
        for x in range(8):
            m[u, x] = a * math.cos((2 * x + 1) * u * math.pi / 16)
    coefs = m @ (block - 128.0) @ m.T
    q = [int(round(coefs.flat[_ZZ[k]] / qt[k])) for k in range(64)]
    diff = q[0] - pred
    t = diff.bit_length() if diff else 0
    w.write(t, 4)  # DC symbol t at 4-bit canonical code == t
    if t:
        w.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        if q[k] == 0:
            run += 1
            continue
        while run > 15:
            c, n = _ac_code(0xF0)  # ZRL
            w.write(c, n)
            run -= 16
        s = abs(q[k]).bit_length()
        c, n = _ac_code((run << 4) | s)
        w.write(c, n)
        v = q[k]
        w.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        c, n = _ac_code(0x00)  # EOB
        w.write(c, n)
    return q[0]


def encode_jpeg(rgb, subsample=False, restart_interval=0):
    """Minimal baseline JFIF encoder: flat quant tables of 16, simple
    legal Huffman tables, optional 4:2:0 subsampling and restart
    markers. Independent of the decoder under test."""
    import numpy as np

    rgb = np.asarray(rgb, dtype=np.float64)
    h, width = rgb.shape[:2]
    gray = rgb.ndim == 2
    qt = [16] * 64
    if gray:
        comps = [(1, 1, 1, 0)]  # id, hx, vx, qt-id
        planes = [rgb]
    else:
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        if subsample:
            comps = [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)]
            # 2x2 mean downsample (pad odd dims by edge-replication)
            def down(p):
                ph = p[: (p.shape[0] // 2) * 2, : (p.shape[1] // 2) * 2]
                return (ph[0::2, 0::2] + ph[1::2, 0::2] + ph[0::2, 1::2] + ph[1::2, 1::2]) / 4
            planes = [y, down(cb), down(cr)]
        else:
            comps = [(1, 1, 1, 0), (2, 1, 1, 0), (3, 1, 1, 0)]
            planes = [y, cb, cr]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # pad each plane to its MCU grid
    padded = []
    for (cid, hx, vx, _), p in zip(comps, planes):
        th, tw = mcus_y * vx * 8, mcus_x * hx * 8
        pp = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        padded.append(pp)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(qt))
    sof = struct.pack(">BHHB", 8, h, width, len(comps))
    for cid, hx, vx, tq in comps:
        sof += bytes([cid, (hx << 4) | vx, tq])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + _DC_COUNTS + _DC_SYMS)
    out += seg(0xC4, bytes([0x10]) + _AC_COUNTS + _AC_SYMS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    w = _BitWriter()
    pred = {c[0]: 0 for c in comps}
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            w.align()
            out += w.out
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            w = _BitWriter()
            pred = {c[0]: 0 for c in comps}
        my, mx = divmod(mcu, mcus_x)
        for (cid, hx, vx, _), p in zip(comps, padded):
            for v in range(vx):
                for hh in range(hx):
                    by = (my * vx + v) * 8
                    bx = (mx * hx + hh) * 8
                    pred[cid] = _encode_block(
                        w, p[by : by + 8, bx : bx + 8], qt, pred[cid],
                        __import__("numpy"),
                    )
    w.align()
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)


def _gradient_rgb(h, w):
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xx * 255 / max(w - 1, 1)),
            (yy * 255 / max(h - 1, 1)),
            ((xx + yy) * 255 / max(h + w - 2, 1)),
        ],
        axis=-1,
    )


def test_jpeg_roundtrip_444():
    import numpy as np

    from conduit_spark.analytics.media_codecs import decode_jpeg

    img = _gradient_rgb(24, 33)  # non-multiple-of-8 exercises padding
    raw = encode_jpeg(img)
    assert sniff(raw) == "jpeg"
    meta = decode_jpeg(raw)
    assert (meta["width"], meta["height"], meta["channels"]) == (33, 24, 3)
    err = np.abs(meta["pixels"].astype(float) - img)
    assert err.max() <= 20 and err.mean() <= 4  # flat-16 quant bound


def test_jpeg_roundtrip_grayscale_and_restart():
    import numpy as np

    from conduit_spark.analytics.media_codecs import decode_jpeg

    img = np.tile(np.linspace(0, 255, 40), (16, 1))
    raw = encode_jpeg(img, restart_interval=2)
    assert b"\xff\xd0" in raw  # RST0 present
    meta = decode_jpeg(raw)
    assert (meta["width"], meta["height"], meta["channels"]) == (40, 16, 1)
    err = np.abs(meta["pixels"].astype(float) - img)
    assert err.max() <= 12 and err.mean() <= 3


def test_jpeg_roundtrip_420_subsampled():
    import numpy as np

    from conduit_spark.analytics.media_codecs import decode_jpeg

    img = _gradient_rgb(32, 32)
    raw = encode_jpeg(img, subsample=True)
    meta = decode_jpeg(raw)
    assert (meta["width"], meta["height"]) == (32, 32)
    # chroma is 2x2-averaged then nearest-upsampled: luma stays tight,
    # chroma error bounded by the gradient step across the 2x2 cell
    y_dec = (
        0.299 * meta["pixels"][..., 0]
        + 0.587 * meta["pixels"][..., 1]
        + 0.114 * meta["pixels"][..., 2]
    )
    y_src = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    assert np.abs(y_dec - y_src).mean() <= 4
    assert np.abs(meta["pixels"].astype(float) - img).max() <= 40


def test_jpeg_progressive_refused():
    import pytest as _pytest

    from conduit_spark.analytics.media_codecs import decode_jpeg

    raw = encode_jpeg(_gradient_rgb(8, 8))
    bad = raw.replace(b"\xff\xc0", b"\xff\xc2", 1)  # SOF0 -> SOF2
    with _pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bad)


# -- MP4 container metadata -------------------------------------------


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def make_mp4() -> bytes:
    mvhd = _box(
        b"mvhd",
        bytes(12)  # version/flags + ctime + mtime
        + struct.pack(">II", 1000, 5500)  # timescale, duration
        + bytes(80),
    )
    tkhd = _box(
        b"tkhd",
        bytes(76) + struct.pack(">II", 320 << 16, 240 << 16),
    )
    stsd = _box(
        b"stsd",
        bytes(4) + struct.pack(">I", 1) + _box(b"avc1", bytes(70)),
    )
    trak = _box(
        b"trak",
        tkhd + _box(b"mdia", _box(b"minf", _box(b"stbl", stsd))),
    )
    moov = _box(b"moov", mvhd + trak)
    return _box(b"ftyp", b"isom" + bytes(8)) + moov


def test_mp4_box_walk():
    from conduit_spark.analytics.media_codecs import decode_mp4

    raw = make_mp4()
    assert sniff(raw) == "mp4"
    meta = decode_mp4(raw)
    assert meta == {
        "format": "mp4",
        "brand": "isom",
        "duration_sec": 5.5,
        "n_tracks": 1,
        "width": 320,
        "height": 240,
        "codecs": ["avc1"],
    }


def test_decode_any_covers_all_four_containers():
    png, _ = make_png()
    for raw, fmt in [
        (png, "png"),
        (make_wav(), "wav"),
        (encode_jpeg(_gradient_rgb(8, 8)), "jpeg"),
        (make_mp4(), "mp4"),
    ]:
        assert decode_any(raw)["format"] == fmt
    with pytest.raises(NotImplementedError):
        decode_any(b"\x00unknown-container")


def test_jpeg_roundtrip_property():
    """Property: arbitrary 8-bit images survive encode->decode within
    the flat-16 quantization error bound, across shapes that exercise
    MCU padding, both for grayscale and RGB."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from conduit_spark.analytics.media_codecs import decode_jpeg

    @settings(max_examples=12, deadline=None)
    @given(
        h=st.integers(4, 20),
        w=st.integers(4, 20),
        seed=st.integers(0, 2**31 - 1),
        color=st.booleans(),
        smooth=st.booleans(),
    )
    def check(h, w, seed, color, smooth):
        rng = np.random.default_rng(seed)
        shape = (h, w, 3) if color else (h, w)
        if smooth:
            base = rng.uniform(30, 220)
            img = np.clip(base + rng.normal(0, 4, shape), 0, 255)
        else:
            img = rng.uniform(0, 255, shape)
        raw = encode_jpeg(img)
        meta = decode_jpeg(raw)
        assert (meta["width"], meta["height"]) == (w, h)
        assert meta["channels"] == (3 if color else 1)
        err = np.abs(meta["pixels"].astype(float) - img)
        # smooth images stay within a few quant steps; white noise has
        # unbounded per-pixel DCT error in theory but tiny mean error
        if smooth:
            assert err.max() <= 24
        assert err.mean() <= (30 if not smooth else 4)

    check()


def test_synth_jpeg_is_lossless_constant_block_subspace():
    """The registry's deterministic JPEG corpus must round-trip
    EXACTLY through the real decoder (constant 8x8 blocks + DC quant
    step 8 make the lossy codec lossless by construction) — the
    property the m_decode_jpeg_real oracle depends on. The synth's
    entropy stream is produced independently of the test-side
    encode_jpeg above (different Huffman layout), so this also
    cross-checks the decoder against a second legal encoder."""
    import numpy as np

    from conduit_spark.analytics.media_codecs import decode_jpeg
    from conduit_spark.analytics.multimodal import _synth_jpeg_bytes

    for did in (0, 1, 5, 255, 256, 9999):
        meta = decode_jpeg(_synth_jpeg_bytes(did))
        w, h = meta["width"], meta["height"]
        assert (w, h) == (8 * (2 + did % 3), 8 * (1 + did % 2))
        exp = np.zeros((h, w), dtype=np.int64)
        for by in range(h // 8):
            for bx in range(w // 8):
                exp[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = (
                    did * 3 + 13 * by + 7 * bx
                ) % 256
        assert (meta["pixels"].astype(np.int64) == exp).all()
