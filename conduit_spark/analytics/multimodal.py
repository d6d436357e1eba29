"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct (modality, n_bytes, content digest, decoded
dimensions). The Spark-side machinery — schema, partition-preserving
mapInPandas over Arrow batches, batch shapes — is real and tested; the
actual media decode is stubbed (no image/audio libs in this container)
behind ``decode_media``, which raises ``NotImplementedError`` for real
codecs and provides a deterministic fake ("dimensions" derived from
the md5 digest) that the DuckDB oracle reproduces, so even the stub
path is correctness-gated.

At scale: binary payloads stay columnar in parquet, the metadata
struct supports predicate pushdown (filter by modality/size without
touching bytes), and decode parallelism is per-partition with Arrow
batch sizing bounding executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from conduit_spark.analytics import ordered_result
from conduit_spark.sources.tables import load_table

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("content", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def as_media(df: DataFrame, content_col: str, id_col: str, modality: str) -> DataFrame:
    """Wrap any binary/string column as a media table (pure projection)."""
    content = F.col(content_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(modality).alias("modality"),
        content.alias("content"),
        F.length(content).cast("long").alias("n_bytes"),
        F.md5(content).alias("digest"),
    )


def decode_media(df: DataFrame, *, real_codecs: bool = False) -> DataFrame:
    """Decode media content → metadata (mapInPandas, Arrow-batched).

    ``real_codecs=True`` decodes PNG, WAV, baseline JPEG, and MP4
    container metadata for real with the pure-Python codecs in
    ``media_codecs`` (zlib inflate + scanline unfilter for PNG; RIFF
    chunk walk for WAV; Huffman + IDCT + YCbCr→RGB for JPEG; ISO BMFF
    box walk for MP4): width/height are the true image/video
    dimensions, and for audio (n_frames, n_channels) fill the same
    slots. Progressive JPEG and MP4 *frame* decode raise inside the
    task — those need native codecs and remain documented seams. The
    default deterministic fake derives width/height from the content
    digest — stable, partition-parallel, and SQL-reproducible.
    """
    if real_codecs:
        from conduit_spark.analytics.media_codecs import decode_any

        def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows: dict[str, list] = {
                    k.name: [] for k in DECODED_SCHEMA.fields
                }
                for mid, mod, c, nb in zip(
                    pdf["media_id"], pdf["modality"], pdf["content"], pdf["n_bytes"]
                ):
                    if c is None:
                        # emit the row with null decode fields, exactly
                        # like the fake path — both modes must be
                        # row-count-preserving
                        rows["media_id"].append(mid)
                        rows["modality"].append(mod)
                        rows["n_bytes"].append(nb)
                        rows["digest"].append(None)
                        rows["width"].append(None)
                        rows["height"].append(None)
                        continue
                    raw = bytes(c)
                    meta = decode_any(raw)
                    if meta["format"] == "wav":
                        # audio geometry rides the same two int32
                        # slots; clamp n_frames (a >2^31-frame capture
                        # would overflow the Arrow conversion)
                        w = min(meta["n_frames"], 2**31 - 1)
                        h = meta["n_channels"]
                    else:  # png/jpeg/mp4: true pixel geometry
                        w, h = meta["width"], meta["height"]
                    rows["media_id"].append(mid)
                    rows["modality"].append(mod)
                    rows["n_bytes"].append(nb)
                    rows["digest"].append(hashlib.md5(raw).hexdigest())
                    rows["width"].append(w)
                    rows["height"].append(h)
                yield pd.DataFrame(rows)

        return df.mapInPandas(run_real, DECODED_SCHEMA)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = [
                hashlib.md5(bytes(c)).hexdigest() if c is not None else None
                for c in pdf["content"]
            ]
            pdf_out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "digest": digests,
                    "width": [
                        (int(d[0:2], 16) + 1) if d else None for d in digests
                    ],
                    "height": [
                        (int(d[2:4], 16) + 1) if d else None for d in digests
                    ],
                }
            )
            yield pdf_out

    return df.mapInPandas(run, DECODED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("offset", LongType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, *, n_frames: int = 4, real_codecs: bool = False
) -> DataFrame:
    """1→N frame sampling over binary media (the video keyframe-extract
    shape): each media row yields up to ``n_frames`` frames.

    ``real_codecs=True`` is the ffmpeg integration point (absent here →
    NotImplementedError). The deterministic stand-in slices the content
    into equal byte windows — the Spark-side plumbing (binary in,
    exploded binary rows out, partition-parallel, Arrow-batched) is
    exactly what a real decoder needs, and the slicing is
    SQL-reproducible so even the stub is oracle-gated.
    """
    if real_codecs:
        raise NotImplementedError(
            "video codecs (ffmpeg) are not available in this environment; "
            "plug a decoder into sample_frames.run when they are"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "offset": [], "frame_bytes": []
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                raw = bytes(content)
                width = max(1, len(raw) // n_frames)
                for k in range(n_frames):
                    off = k * width
                    if off >= len(raw):
                        break
                    out["media_id"].append(mid)
                    out["frame_idx"].append(k)
                    out["offset"].append(off)
                    out["frame_bytes"].append(raw[off : off + width])
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FRAME_SCHEMA)


RESIZE_TARGET = (32, 32)

RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("target_w", IntegerType()),
        StructField("target_h", IntegerType()),
        StructField("out_n_bytes", LongType()),
        StructField("resized_digest", StringType()),
    ]
)


def resize_media(
    df: DataFrame,
    *,
    target: tuple[int, int] = RESIZE_TARGET,
    real_codecs: bool = False,
) -> DataFrame:
    """Media → resized media (the thumbnail/downscale shape).

    ``real_codecs=True`` is the PIL/ffmpeg integration point (absent
    here → NotImplementedError). The deterministic stand-in scales the
    byte length by the pixel ratio target/(w×h) (dims from the decode
    fake) and crops — binary in, binary out, partition-parallel, and
    the crop rule is SQL-reproducible so the stub stays oracle-gated.
    """
    if real_codecs:
        raise NotImplementedError(
            "image codecs (PIL) are not available in this environment; "
            "plug a resizer into resize_media.run when they are"
        )
    tw, th = target
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out: dict[str, list] = {k.name: [] for k in RESIZED_SCHEMA.fields}
        for pdf in batches:
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                raw = bytes(content)
                d = hashlib.md5(raw).hexdigest()
                w, h = int(d[0:2], 16) + 1, int(d[2:4], 16) + 1
                ratio = min(1.0, float(tw * th) / float(w * h))
                out_n = max(1, math.floor(len(raw) * ratio))
                crop = raw[:out_n]
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["target_w"].append(tw)
                out["target_h"].append(th)
                out["out_n_bytes"].append(out_n)
                out["resized_digest"].append(hashlib.md5(crop).hexdigest())
        yield pd.DataFrame(out)

    return df.mapInPandas(run, RESIZED_SCHEMA)


FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


def extract_features(df: DataFrame, *, real_model: bool = False) -> DataFrame:
    """Media → embedding column (the CLIP/wav2vec feature-extract
    shape). ``real_model=True`` is the model integration point (no
    vision/audio models in this container → NotImplementedError); the
    deterministic stand-in derives ``FEATURE_DIM`` doubles from the
    content digest, so schema/batching/partitioning are real and the
    values oracle-checkable."""
    if real_model:
        raise NotImplementedError(
            "feature-extraction models are not available in this environment"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for content in pdf["content"]:
                if content is None:
                    embs.append(None)
                    continue
                d = hashlib.md5(bytes(content)).hexdigest()
                embs.append(
                    [int(d[j * 4 : (j + 1) * 4], 16) / 65535.0 for j in range(FEATURE_DIM)]
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "embedding": embs,
                }
            )

    return df.mapInPandas(run, FEATURES_SCHEMA)


def m_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as fake image bytes → decode metadata."""
    docs = load_table(spark, sf_dir, "documents")
    media = as_media(docs, "text", "doc_id", "image")
    return decode_media(media).orderBy("media_id")


def m_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as fake video bytes → sampled frames (1→N).

    Frames project as hex for the oracle compare (DuckDB 1.0 has no
    BLOB substring, so the oracle slices the hex string instead)."""
    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents")
    media = as_media(docs, "text", "doc_id", "video")
    frames = sample_frames(media)
    return frames.select(
        "media_id",
        "frame_idx",
        "offset",
        F.hex(F.col("frame_bytes")).alias("frame_hex"),
    ).orderBy("media_id", "frame_idx")


def m_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as fake audio bytes → digest-derived embedding."""
    docs = load_table(spark, sf_dir, "documents")
    media = as_media(docs, "text", "doc_id", "audio")
    return extract_features(media).orderBy("media_id")


def m_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as fake image bytes → proportional byte-crop
    resize (thumbnail shape)."""
    docs = load_table(spark, sf_dir, "documents")
    media = as_media(docs, "text", "doc_id", "image")
    return resize_media(media).orderBy("media_id")


PNG_W_BASE, PNG_W_MOD = 16, 17  # width  = 16 + doc_id % 17  (16..32)
PNG_H_BASE, PNG_H_MOD = 8, 13  # height =  8 + doc_id % 13  ( 8..20)


def m_decode_png_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec decode, driver-verifiable: each doc synthesizes a
    deterministic greyscale PNG (dimensions and every pixel are pure
    functions of ``doc_id``), the pure-Python codec inflates and
    unfilters the actual IDAT stream, and the emitted pixel statistics
    are checked against the generation formula computed ANALYTICALLY
    by the SQL oracle — if the zlib inflate or scanline unfilter were
    wrong, the stats could not match. In production the bytes come
    from storage instead of the generator; the decode path is
    identical (``media_codecs.decode_png``, also reachable via
    ``decode_media(real_codecs=True)``).

    Scale shape: one ``mapInPandas`` pass, zero shuffles beyond the
    presentation sort; per-row work is bounded by the (w·h ≤ 32×20)
    synthetic geometry here and by decoded image size in production.
    """
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def run(batches):
        import struct
        import zlib

        from conduit_spark.analytics.media_codecs import decode_png

        def chunk(ctype: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + ctype
                + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        for pdf in batches:
            rows = {
                "media_id": [], "width": [], "height": [], "channels": [],
                "n_pixels": [], "pixel_mean": [], "pixel_min": [],
                "pixel_max": [],
            }
            for did in pdf["doc_id"]:
                did = int(did)
                w = PNG_W_BASE + did % PNG_W_MOD
                h = PNG_H_BASE + did % PNG_H_MOD
                raw = bytearray()
                for r in range(h):
                    raw.append(0)  # filter type None
                    raw.extend(
                        (did + r * 31 + c * 7) % 256 for c in range(w)
                    )
                ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
                png = (
                    b"\x89PNG\r\n\x1a\n"
                    + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(bytes(raw)))
                    + chunk(b"IEND", b"")
                )
                meta = decode_png(png)  # the REAL inflate+unfilter path
                rows["media_id"].append(did)
                rows["width"].append(meta["width"])
                rows["height"].append(meta["height"])
                rows["channels"].append(meta["channels"])
                rows["n_pixels"].append(meta["width"] * meta["height"])
                rows["pixel_mean"].append(round(meta["pixel_mean"], 9))
                rows["pixel_min"].append(meta["pixel_min"])
                rows["pixel_max"].append(meta["pixel_max"])
            yield pd.DataFrame(rows)

    out = docs.mapInPandas(
        run,
        "media_id long, width int, height int, channels int, "
        "n_pixels long, pixel_mean double, pixel_min int, pixel_max int",
    )
    return ordered_result(out, "media_id")


WAV_FRAMES_BASE, WAV_FRAMES_MOD = 100, 97  # n_frames = 100 + doc_id % 97
WAV_RATE = 16000


def m_decode_wav_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WAV decode, same construction as :func:`m_decode_png_real`:
    deterministic 16-bit mono PCM per doc, the RIFF chunk walk + PCM
    sample scan runs for real, and the decoded sample statistics check
    against the generation formula in the SQL oracle. Sample ``i`` is
    ``((doc_id * 31 + i * 17) % 65536) - 32768``."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def run(batches):
        import struct

        from conduit_spark.analytics.media_codecs import decode_wav

        for pdf in batches:
            rows = {
                "media_id": [], "n_channels": [], "framerate": [],
                "n_frames": [], "sample_mean": [], "sample_peak": [],
            }
            for did in pdf["doc_id"]:
                did = int(did)
                n = WAV_FRAMES_BASE + did % WAV_FRAMES_MOD
                samples = [
                    ((did * 31 + i * 17) % 65536) - 32768 for i in range(n)
                ]
                data = struct.pack(f"<{n}h", *samples)
                fmt = struct.pack("<HHIIHH", 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16)
                body = (
                    b"WAVE"
                    + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", len(data)) + data
                )
                wav = b"RIFF" + struct.pack("<I", len(body)) + body
                meta = decode_wav(wav)  # the REAL RIFF walk + PCM scan
                rows["media_id"].append(did)
                rows["n_channels"].append(meta["n_channels"])
                rows["framerate"].append(meta["framerate"])
                rows["n_frames"].append(meta["n_frames"])
                rows["sample_mean"].append(round(meta["sample_mean"], 9))
                rows["sample_peak"].append(meta["sample_peak"])
            yield pd.DataFrame(rows)

    return ordered_result(
        docs.mapInPandas(
            run,
            "media_id long, n_channels int, framerate int, n_frames long, "
            "sample_mean double, sample_peak int",
        ),
        "media_id",
    )


QUERIES = {
    "m_decode_stub": m_decode_stub,
    "m_decode_png_real": m_decode_png_real,
    "m_decode_wav_real": m_decode_wav_real,
    "m_frame_sample": m_frame_sample,
    "m_features": m_features,
    "m_resize": m_resize,
}

ORACLES = {
    "m_decode_png_real": f"""
        WITH dims AS (
            SELECT doc_id,
                   {PNG_W_BASE} + doc_id % {PNG_W_MOD} AS w,
                   {PNG_H_BASE} + doc_id % {PNG_H_MOD} AS h
            FROM documents),
        px AS (
            -- lateral bounds unsupported in generate_series: cross the
            -- max grid and filter to each image's true extent
            SELECT doc_id, w, h,
                   (doc_id + r.r * 31 + c.c * 7) % 256 AS v
            FROM dims,
                 generate_series(0, {PNG_H_BASE + PNG_H_MOD - 2}) AS r(r),
                 generate_series(0, {PNG_W_BASE + PNG_W_MOD - 2}) AS c(c)
            WHERE r.r < h AND c.c < w)
        SELECT doc_id AS media_id,
               CAST(w AS INT) AS width,
               CAST(h AS INT) AS height,
               1 AS channels,
               CAST(w * h AS BIGINT) AS n_pixels,
               round(CAST(sum(v) AS DOUBLE) / (w * h), 9) AS pixel_mean,
               CAST(min(v) AS INT) AS pixel_min,
               CAST(max(v) AS INT) AS pixel_max
        FROM px
        GROUP BY doc_id, w, h
        ORDER BY media_id
    """,
    "m_decode_wav_real": f"""
        WITH dims AS (
            SELECT doc_id,
                   {WAV_FRAMES_BASE} + doc_id % {WAV_FRAMES_MOD} AS n
            FROM documents),
        s AS (
            SELECT doc_id, n,
                   ((doc_id * 31 + i.i * 17) % 65536) - 32768 AS v
            FROM dims,
                 generate_series(0, {WAV_FRAMES_BASE + WAV_FRAMES_MOD - 2}) AS i(i)
            WHERE i.i < n)
        SELECT doc_id AS media_id,
               1 AS n_channels,
               {WAV_RATE} AS framerate,
               CAST(n AS BIGINT) AS n_frames,
               round(CAST(sum(v) AS DOUBLE) / n, 9) AS sample_mean,
               CAST(max(abs(v)) AS INT) AS sample_peak
        FROM s
        GROUP BY doc_id, n
        ORDER BY media_id
    """,
    "m_decode_stub": """
        SELECT doc_id AS media_id,
               'image' AS modality,
               length(text) AS n_bytes,
               md5(text) AS digest,
               CAST(('0x' || substr(md5(text), 1, 2)) AS INT) + 1 AS width,
               CAST(('0x' || substr(md5(text), 3, 2)) AS INT) + 1 AS height
        FROM documents ORDER BY media_id
    """,
    "m_frame_sample": """
        WITH m AS (
            SELECT doc_id AS media_id, hex(text) AS hx,
                   strlen(text) AS n,
                   greatest(1, strlen(text) // 4) AS w
            FROM documents)
        SELECT media_id, CAST(k AS INT) AS frame_idx,
               CAST(k * w AS BIGINT) AS "offset",
               substr(hx, k * w * 2 + 1, w * 2) AS frame_hex
        FROM m, (SELECT unnest(generate_series(0, 3)) AS k)
        WHERE k * w < n
        ORDER BY media_id, frame_idx
    """,
    "m_features": f"""
        SELECT doc_id AS media_id, 'audio' AS modality,
               list_transform(generate_series(0, {FEATURE_DIM - 1}),
                   j -> CAST(('0x' || substr(md5(text), j * 4 + 1, 4)) AS INT)
                        / 65535.0) AS embedding
        FROM documents ORDER BY media_id
    """,
    "m_resize": f"""
        WITH m AS (
            SELECT doc_id AS media_id, text, strlen(text) AS n,
                   CAST(('0x' || substr(md5(text), 1, 2)) AS INT) + 1 AS width,
                   CAST(('0x' || substr(md5(text), 3, 2)) AS INT) + 1 AS height
            FROM documents),
        r AS (
            SELECT *, greatest(1, CAST(floor(n * least(1.0,
                       {float(RESIZE_TARGET[0] * RESIZE_TARGET[1])} / (width * height)))
                   AS BIGINT)) AS out_n
            FROM m)
        SELECT media_id, width, height,
               {RESIZE_TARGET[0]} AS target_w, {RESIZE_TARGET[1]} AS target_h,
               out_n AS out_n_bytes,
               md5(substr(text, 1, CAST(out_n AS INT))) AS resized_digest
        FROM r ORDER BY media_id
    """,
}
