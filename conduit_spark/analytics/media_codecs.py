"""Real media codecs, stdlib-only: PNG (zlib inflate + scanline
unfilter) and WAV (RIFF chunk walk).

These back ``decode_media(real_codecs=True)`` for the formats a
Python stdlib can genuinely decode — PNG's DEFLATE stream via
``zlib`` with the five per-scanline filters reversed per the PNG
spec (RFC 2083 §6), and WAV's RIFF/fmt/data chunks per the canonical
WAVE layout. Formats that need native libraries (JPEG, MP4/ffmpeg)
remain explicit ``NotImplementedError`` integration seams.

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


def decode_png(raw: bytes) -> dict:
    """Full PNG decode: IHDR parse, IDAT inflate, per-scanline
    unfilter (None/Sub/Up/Average/Paeth). Returns geometry plus pixel
    statistics computed from the *decoded* samples — proof the pixels
    were actually reconstructed, not just the header read.

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
    return {
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


def decode_wav(raw: bytes) -> dict:
    """WAV decode via a RIFF chunk walk (fmt + data), returning the
    audio geometry and sample statistics for 16-bit PCM (the dominant
    capture format); other sample widths return geometry only."""
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
    return out


def decode_any(raw: bytes) -> dict:
    """Dispatch on magic bytes; unsupported containers keep the honest
    NotImplementedError seam (JPEG/MP4 need native codecs)."""
    kind = sniff(raw)
    if kind == "png":
        return decode_png(raw)
    if kind == "wav":
        return decode_wav(raw)
    raise NotImplementedError(
        f"no stdlib codec for container {kind or 'unknown'!r}; "
        "PNG and WAV decode natively — JPEG/MP4 need PIL/ffmpeg"
    )
