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
    with pytest.raises(NotImplementedError, match="JPEG/MP4"):
        decode_any(b"\xff\xd8\xff\xe0" + b"\x00" * 32)  # jpeg magic
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

    # a JPEG row fails the real decode inside the task (honest seam)
    jpg_df = spark.createDataFrame(
        [(3, bytearray(b"\xff\xd8\xff\xe0" + b"\x00" * 16))],
        "media_id long, content binary",
    )
    with pytest.raises(Exception, match="PIL/ffmpeg|NotImplementedError"):
        decode_media(
            as_media(jpg_df, "content", "media_id", "image"), real_codecs=True
        ).collect()
