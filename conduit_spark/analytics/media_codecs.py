"""Real media codecs, stdlib+numpy only: PNG (zlib inflate + scanline
unfilter), WAV (RIFF chunk walk), baseline JPEG (Huffman entropy
decode + dequantize + IDCT + chroma upsample + YCbCr→RGB), and MP4
container metadata (ISO BMFF box walk).

These back ``decode_media(real_codecs=True)`` for the formats that can
genuinely be decoded without native libraries — PNG's DEFLATE stream
via ``zlib`` with the five per-scanline filters reversed per the PNG
spec (RFC 2083 §6); WAV's RIFF/fmt/data chunks per the canonical WAVE
layout; baseline sequential JFIF per ITU-T T.81 (SOF0, 8-bit, any
h/v subsampling up to 2, restart markers) with the 2-D IDCT as an
orthonormal-matrix product; MP4's ftyp/moov/trak/tkhd/stsd boxes per
ISO 14496-12 for brand/duration/track geometry/codec fourccs.
Progressive JPEG (SOF2) and MP4 *frame decode* (H.264 entropy +
prediction) remain explicit unsupported seams.

Everything here is a pure ``bytes -> dict`` function so the Spark
side stays a thin ``mapInPandas`` wrapper and the decoders are
testable without a session.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
RIFF_MAGIC = b"RIFF"

# channels per PNG color type (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff(raw: bytes) -> str | None:
    """Best-effort container sniff from magic bytes."""
    if raw.startswith(PNG_MAGIC):
        return "png"
    if raw[:4] == RIFF_MAGIC and raw[8:12] == b"WAVE":
        return "wav"
    if raw[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if raw[4:8] == b"ftyp":
        return "mp4"
    return None


def decode_png(raw: bytes, *, return_pixels: bool = False) -> dict:
    """Full PNG decode: IHDR parse, IDAT inflate, per-scanline
    unfilter (None/Sub/Up/Average/Paeth). Returns geometry plus pixel
    statistics computed from the *decoded* samples — proof the pixels
    were actually reconstructed, not just the header read.
    ``return_pixels=True`` adds the raw interleaved sample bytes under
    ``"pixels"`` (row-major, ``channels`` bytes per pixel) for
    downstream operators (resize, feature extraction).

    Supports the non-interlaced 8-bit profiles (greyscale, RGB,
    palette-index, +alpha) that cover the overwhelming majority of
    training-corpus PNGs; anything else raises ValueError."""
    if not raw.startswith(PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(raw):
        (clen,) = struct.unpack_from(">I", raw, pos)
        ctype = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + clen]
        pos += 12 + clen  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG profile (bit_depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace})"
        )
    channels = _PNG_CHANNELS[color_type]
    stride = width * channels
    decompressed = zlib.decompress(bytes(idat))
    if len(decompressed) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")

    out = bytearray(stride * height)
    prev_start = -1
    at = 0
    for row in range(height):
        ftype = decompressed[at]
        at += 1
        line = decompressed[at : at + stride]
        at += stride
        start = row * stride
        if ftype == 0:  # None
            out[start : start + stride] = line
        elif ftype == 1:  # Sub
            for i in range(stride):
                left = out[start + i - channels] if i >= channels else 0
                out[start + i] = (line[i] + left) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                up = out[prev_start + i] if row > 0 else 0
                out[start + i] = (line[i] + up) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = out[start + i - channels] if i >= channels else 0
                up = out[prev_start + i] if row > 0 else 0
                out[start + i] = (line[i] + (left + up) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = out[start + i - channels] if i >= channels else 0
                up = out[prev_start + i] if row > 0 else 0
                ul = out[prev_start + i - channels] if (row > 0 and i >= channels) else 0
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                out[start + i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        prev_start = start
    n = len(out)
    meta = {
        "format": "png",
        "width": int(width),
        "height": int(height),
        "channels": channels,
        "bit_depth": int(bit_depth),
        "color_type": int(color_type),
        "pixel_mean": (sum(out) / n) if n else 0.0,
        "pixel_min": min(out) if n else 0,
        "pixel_max": max(out) if n else 0,
    }
    if return_pixels:
        meta["pixels"] = bytes(out)
    return meta


def decode_wav(raw: bytes, *, return_samples: bool = False) -> dict:
    """WAV decode via a RIFF chunk walk (fmt + data), returning the
    audio geometry and sample statistics for 16-bit PCM (the dominant
    capture format); other sample widths return geometry only.
    ``return_samples=True`` adds the decoded 16-bit sample tuple under
    ``"samples"`` (interleaved if multichannel) for downstream
    operators (frame windowing, resampling)."""
    if not (raw[:4] == RIFF_MAGIC and raw[8:12] == b"WAVE"):
        raise ValueError("not a WAV")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", raw, pos + 4)
        body = raw[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    _audio_fmt, n_channels, framerate, _byte_rate, block_align, bits = fmt
    n_frames = len(data) // block_align if block_align else 0
    out = {
        "format": "wav",
        "n_channels": int(n_channels),
        "framerate": int(framerate),
        "bits_per_sample": int(bits),
        "n_frames": int(n_frames),
        "duration_sec": (n_frames / framerate) if framerate else 0.0,
    }
    if bits == 16:
        samples = struct.unpack(f"<{len(data) // 2}h", data[: (len(data) // 2) * 2])
        if samples:
            out["sample_mean"] = sum(samples) / len(samples)
            out["sample_peak"] = max(abs(s) for s in samples)
        if return_samples:
            out["samples"] = samples
    return out


# --- baseline JPEG (ITU-T T.81) --------------------------------------

# zigzag scan order: stream index -> raster index in the 8x8 block
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_IDCT_M = None  # orthonormal DCT-II matrix, built lazily (needs numpy)


def _idct_matrix():
    global _IDCT_M
    if _IDCT_M is None:
        import math

        import numpy as np

        m = np.zeros((8, 8))
        for u in range(8):
            a = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
            for x in range(8):
                m[u, x] = a * math.cos((2 * x + 1) * u * math.pi / 16)
        _IDCT_M = m
    return _IDCT_M


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment."""

    __slots__ = ("d", "pos", "bit")

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.d):
            raise ValueError("JPEG: truncated entropy stream")
        b = (self.d[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _build_huffman(counts: bytes, symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman assignment per T.81 Annex C: codes of each
    length are consecutive, starting from 2x the previous length's
    end."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude decode (T.81 F.2.2.1): t-bit value v is negative
    when its top bit is 0."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _entropy_segments(raw: bytes, start: int) -> list[bytes]:
    """Scan data from ``start``: unstuff 0xFF00, split at RSTn (each
    restart segment gets fresh DC predictors), stop at any other
    marker."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(raw)
    while i < n:
        b = raw[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = raw[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed FF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or next header marker
            break
    segs.append(bytes(cur))
    return segs


def decode_jpeg(raw: bytes) -> dict:
    """Baseline sequential JPEG decode, pure Python + numpy: marker
    walk (DQT/DHT/SOF0/DRI/SOS), canonical Huffman entropy decode,
    dequantize + de-zigzag, orthonormal-matrix 2-D IDCT, nearest
    chroma upsample, BT.601 YCbCr→RGB. Returns geometry plus pixel
    statistics from the reconstructed samples — proof of real decode.

    Covers the baseline profile (SOF0, 8-bit, ≤4 components, h/v
    sampling ≤2, restart intervals). Progressive (SOF2), arithmetic
    coding, and 12-bit raise ValueError."""
    import numpy as np

    if raw[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG")
    qts: dict[int, list[int]] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    comps: list[dict] = []
    width = height = None
    restart_interval = 0
    scan_comps: list[dict] = []
    scan_start = None
    i = 2
    while i + 4 <= len(raw) and scan_start is None:
        if raw[i] != 0xFF:
            raise ValueError("JPEG: marker expected")
        marker = raw[i + 1]
        (seg_len,) = struct.unpack_from(">H", raw, i + 2)
        body = raw[i + 4 : i + 2 + seg_len]
        i += 2 + seg_len
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                p += 1
                if pq == 0:
                    qts[tq] = list(body[p : p + 64])
                    p += 64
                else:
                    qts[tq] = list(
                        struct.unpack_from(f">{64}H", body, p)
                    )
                    p += 128
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                counts = body[p + 1 : p + 17]
                nsym = sum(counts)
                symbols = body[p + 17 : p + 17 + nsym]
                (dc_tables if tc == 0 else ac_tables)[th] = _build_huffman(
                    counts, symbols
                )
                p += 17 + nsym
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            precision = body[0]
            if precision != 8:
                raise ValueError(f"JPEG: {precision}-bit unsupported")
            height, width = struct.unpack_from(">HH", body, 1)
            n_comp = body[5]
            for c in range(n_comp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                "JPEG: only baseline sequential (SOF0/1) is supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for c in range(ns):
                cid, tables = body[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in comps if x["id"] == cid)
                scan_comps.append(
                    dict(comp, td=tables >> 4, ta=tables & 15)
                )
            scan_start = i
        # APPn/COM and anything else: skipped
    if scan_start is None or width is None:
        raise ValueError("JPEG: missing SOS/SOF")

    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = {
        c["id"]: np.zeros(
            (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64
        )
        for c in scan_comps
    }
    m = _idct_matrix()
    segments = _entropy_segments(raw, scan_start)
    seg_idx = 0
    reader = _BitReader(segments[0])
    pred = {c["id"]: 0 for c in scan_comps}
    per_seg = restart_interval or (mcus_x * mcus_y)
    for mcu in range(mcus_x * mcus_y):
        if mcu and mcu % per_seg == 0 and seg_idx + 1 < len(segments):
            seg_idx += 1
            reader = _BitReader(segments[seg_idx])
            pred = {c["id"]: 0 for c in scan_comps}
        my, mx = divmod(mcu, mcus_x)
        for c in scan_comps:
            qt = qts[c["tq"]]
            dc_t, ac_t = dc_tables[c["td"]], ac_tables[c["ta"]]
            for v in range(c["v"]):
                for h in range(c["h"]):
                    coef = np.zeros(64)
                    t = _huff_decode(reader, dc_t)
                    pred[c["id"]] += _extend(reader.read_bits(t), t)
                    coef[0] = pred[c["id"]] * qt[0]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(reader, ac_t)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG: AC index overflow")
                        coef[_ZIGZAG[k]] = (
                            _extend(reader.read_bits(s), s) * qt[k]
                        )
                        k += 1
                    block = m.T @ coef.reshape(8, 8) @ m + 128.0
                    by = (my * c["v"] + v) * 8
                    bx = (mx * c["h"] + h) * 8
                    planes[c["id"]][by : by + 8, bx : bx + 8] = block
    # upsample each plane to full geometry and crop the MCU padding
    full = []
    for c in scan_comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], 0), hmax // c["h"], 1)
        full.append(p[:height, :width])
    if len(full) == 3:
        y, cb, cr = full
        rgb = np.stack(
            [
                y + 1.402 * (cr - 128.0),
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                y + 1.772 * (cb - 128.0),
            ],
            axis=-1,
        )
        pixels = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    else:
        pixels = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
    return {
        "format": "jpeg",
        "width": int(width),
        "height": int(height),
        "channels": len(full),
        "bit_depth": 8,
        "pixel_mean": float(pixels.mean()) if pixels.size else 0.0,
        "pixel_min": int(pixels.min()) if pixels.size else 0,
        "pixel_max": int(pixels.max()) if pixels.size else 0,
        "pixels": pixels,  # ndarray (h, w[, 3]); callers drop it for stats-only use
    }


# --- MP4 / ISO BMFF container metadata -------------------------------


def _walk_boxes(raw: bytes, start: int, end: int):
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack_from(">I", raw, i)
        btype = raw[i + 4 : i + 8]
        header = 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack_from(">Q", raw, i + 8)
            header = 16
        elif size == 0:  # to end of enclosing box
            size = end - i
        if size < header or i + size > end:
            raise ValueError("MP4: malformed box size")
        yield btype, i + header, i + size
        i += size


def decode_mp4(raw: bytes) -> dict:
    """ISO BMFF metadata decode: ftyp brand, mvhd duration/timescale,
    per-track tkhd geometry, stsd sample-entry fourccs. Container-level
    only — FRAME decode (H.264/H.265 entropy + prediction) needs a
    native codec and stays an explicit unsupported seam."""
    if raw[4:8] != b"ftyp":
        raise ValueError("not an MP4")
    out = {
        "format": "mp4",
        "brand": raw[8:12].decode("ascii", "replace"),
        "duration_sec": 0.0,
        "n_tracks": 0,
        "width": 0,
        "height": 0,
        "codecs": [],
    }

    def walk_moov(s: int, e: int) -> None:
        for btype, bs, be in _walk_boxes(raw, s, e):
            if btype == b"mvhd":
                ver = raw[bs]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", raw, bs + 20)
                else:
                    ts, dur = struct.unpack_from(">II", raw, bs + 12)
                out["duration_sec"] = dur / ts if ts else 0.0
            elif btype == b"trak":
                out["n_tracks"] += 1
                walk_trak(bs, be)

    def walk_trak(s: int, e: int) -> None:
        for btype, bs, be in _walk_boxes(raw, s, e):
            if btype == b"tkhd":
                # v0: ver/flags 4 + times 8 + id 4 + rsvd 4 + dur 4 +
                # rsvd 8 + layer/alt/vol/rsvd 8 + matrix 36 = 76
                ver = raw[bs]
                off = bs + (88 if ver == 1 else 76)
                w, h = struct.unpack_from(">II", raw, off)
                w, h = w >> 16, h >> 16  # 16.16 fixed point
                if w and h and not out["width"]:
                    out["width"], out["height"] = w, h
            elif btype in (b"mdia", b"minf", b"stbl"):
                walk_trak(bs, be)
            elif btype == b"stsd":
                (n,) = struct.unpack_from(">I", raw, bs + 4)
                p = bs + 8
                for _ in range(n):
                    (esize,) = struct.unpack_from(">I", raw, p)
                    out["codecs"].append(
                        raw[p + 4 : p + 8].decode("ascii", "replace")
                    )
                    p += esize

    for btype, bs, be in _walk_boxes(raw, 0, len(raw)):
        if btype == b"moov":
            walk_moov(bs, be)
    return out


def decode_any(raw: bytes) -> dict:
    """Dispatch on magic bytes; containers without a pure-Python
    decode path keep the honest NotImplementedError seam."""
    kind = sniff(raw)
    if kind == "png":
        return decode_png(raw)
    if kind == "wav":
        return decode_wav(raw)
    if kind == "jpeg":
        meta = decode_jpeg(raw)
        meta.pop("pixels", None)  # stats-only for the generic path
        return meta
    if kind == "mp4":
        return decode_mp4(raw)
    raise NotImplementedError(
        f"no pure-Python codec for container {kind or 'unknown'!r}; "
        "PNG, WAV, baseline JPEG, and MP4 metadata decode natively"
    )
