"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata (north star, BASELINE.json).

The Spark-side plumbing is REAL and tested: schemas, Arrow batch shape,
``mapInPandas`` signatures, partitioning.  The codec step itself is
stubbed (this container has no image/audio libraries): decoders either
raise ``NotImplementedError`` (``codec='real'``) or run a deterministic
fake (``codec='fake'``) that derives pixel/sample statistics from the
bytes — so the distributed pipeline around the codec is exercised
end-to-end at any scale.

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.files.maxPartitionBytes`` sized so a partition of blobs
fits executor memory, and decode with ``mapInPandas`` (streaming
batches) rather than collect-style UDAFs.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterable, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conduino_spark.plans.core import Stage

IMAGE_META_SCHEMA = ("id long, width int, height int, channels int, "
                     "format string, n_bytes long")
AUDIO_META_SCHEMA = "id long, sample_rate int, n_samples long, format string"


def _fake_decode_image(data: bytes) -> tuple[int, int, int, str]:
    """Deterministic fake codec: derives (w, h, c, fmt) from a digest of
    the bytes.  Replace with PIL/opencv in a real deployment."""
    d = hashlib.md5(data or b"").digest()
    w = 64 + struct.unpack("<H", d[0:2])[0] % 1984
    h = 64 + struct.unpack("<H", d[2:4])[0] % 1984
    c = 1 + d[4] % 4
    fmt = ["jpeg", "png", "webp"][d[5] % 3]
    return w, h, c, fmt


def image_metadata(binary_col: str = "content", id_col: str = "id", *,
                   codec: str = "fake") -> Stage:
    """Decode image headers → typed metadata rows.  ``mapInPandas``
    streams Arrow batches of blobs; output schema is fixed/typed."""

    def fn(df: DataFrame) -> DataFrame:
        def run(batches: Iterable[pd.DataFrame]):
            for pdf in batches:
                if codec == "real":
                    raise NotImplementedError(
                        "real image codecs unavailable in this container; "
                        "wire PIL/turbojpeg here")
                rows = [(_fake_decode_image(b if b is not None else b""))
                        for b in pdf[binary_col]]
                yield pd.DataFrame({
                    "id": pdf[id_col],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "channels": [r[2] for r in rows],
                    "format": [r[3] for r in rows],
                    "n_bytes": [len(b) if b is not None else 0
                                for b in pdf[binary_col]],
                })

        return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(
            run, IMAGE_META_SCHEMA)

    return Stage(fn, name="image_metadata", seq_preserving=False)


def _fake_decode_audio(data: bytes) -> tuple[int, int, str]:
    """Deterministic fake audio header parse: (sample_rate, n_samples,
    fmt) from a digest of the bytes.  Replace with soundfile/ffprobe in
    a real deployment."""
    d = hashlib.md5(data or b"").digest()
    rate = [8000, 16000, 22050, 44100, 48000][d[6] % 5]
    n_samples = 1 + struct.unpack("<I", d[7:11])[0] % (rate * 30)
    fmt = ["wav", "flac", "mp3", "ogg"][d[11] % 4]
    return rate, n_samples, fmt


def audio_metadata(binary_col: str = "content", id_col: str = "id", *,
                   codec: str = "fake") -> Stage:
    """Decode audio headers → typed metadata rows (the
    :data:`AUDIO_META_SCHEMA` shape) — same ``mapInPandas`` Arrow
    plumbing as :func:`image_metadata`, with the duration derivable as
    ``n_samples / sample_rate`` downstream in pure column algebra."""

    def fn(df: DataFrame) -> DataFrame:
        def run(batches: Iterable[pd.DataFrame]):
            for pdf in batches:
                if codec == "real":
                    raise NotImplementedError(
                        "real audio codecs unavailable in this container; "
                        "wire soundfile/ffprobe here")
                rows = [_fake_decode_audio(b if b is not None else b"")
                        for b in pdf[binary_col]]
                yield pd.DataFrame({
                    "id": pdf[id_col],
                    "sample_rate": [r[0] for r in rows],
                    "n_samples": [r[1] for r in rows],
                    "format": [r[2] for r in rows],
                })

        return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(
            run, AUDIO_META_SCHEMA)

    return Stage(fn, name="audio_metadata", seq_preserving=False)


def image_resize(binary_col: str = "content", id_col: str = "id", *,
                 width: int = 224, height: int = 224, codec: str = "fake") -> Stage:
    """Resize stub: real Arrow plumbing, fake resample (content digest ⊕
    target dims).  Output keeps binary type so downstream stages are
    schema-stable when a real codec lands."""

    def fn(df: DataFrame) -> DataFrame:
        def run(batches: Iterable[pd.DataFrame]):
            for pdf in batches:
                if codec == "real":
                    raise NotImplementedError("wire a real resampler here")
                out = [hashlib.md5((b or b"") + struct.pack("<II", width, height)).digest()
                       for b in pdf[binary_col]]
                yield pd.DataFrame({"id": pdf[id_col], "content": out,
                                    "width": width, "height": height})

        return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(
            run, "id long, content binary, width int, height int")

    return Stage(fn, name="image_resize", seq_preserving=False)


def frame_sample(binary_col: str = "content", id_col: str = "id", *,
                 every_n: int = 30, max_frames: int = 8, codec: str = "fake") -> Stage:
    """Video frame sampling stub: 1 input row → ≤max_frames rows (the
    1:N fan-out shape real frame extraction has)."""

    def fn(df: DataFrame) -> DataFrame:
        def run(batches: Iterable[pd.DataFrame]):
            for pdf in batches:
                if codec == "real":
                    raise NotImplementedError("wire ffmpeg here")
                ids, fnos, frames = [], [], []
                for vid, b in zip(pdf[id_col], pdf[binary_col]):
                    b = b or b""
                    n = 1 + (hashlib.md5(b).digest()[0] % max_frames)
                    for i in range(n):
                        ids.append(vid)
                        fnos.append(i * every_n)
                        frames.append(hashlib.md5(b + struct.pack("<I", i)).digest())
                yield pd.DataFrame({"id": ids, "frame_no": fnos, "frame": frames})

        return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(
            run, "id long, frame_no int, frame binary")

    return Stage(fn, name="frame_sample", seq_preserving=False)


def feature_extract(binary_col: str = "content", id_col: str = "id", *,
                    dim: int = 16, codec: str = "fake") -> Stage:
    """Feature-extraction stub: blob → float vector (the embedding
    shape), deterministic from bytes."""

    def fn(df: DataFrame) -> DataFrame:
        def run(batches: Iterable[pd.DataFrame]):
            for pdf in batches:
                if codec == "real":
                    raise NotImplementedError("wire a vision/audio encoder here")
                vecs = []
                for b in pdf[binary_col]:
                    d = hashlib.sha256(b or b"").digest()
                    vecs.append([d[i] / 255.0 for i in range(dim)])
                yield pd.DataFrame({"id": pdf[id_col], "features": vecs})

        return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(
            run, f"id long, features array<double>")

    return Stage(fn, name="feature_extract", seq_preserving=False)


#: magic-byte signatures for format sniffing — (format, hex prefix,
#: byte offset).  Pure bytes comparison: no codec library involved,
#: so unlike the decode operators this is REAL (not stubbed) in any
#: environment.
MAGIC_SIGNATURES: "list[tuple[str, str, int]]" = [
    ("png",  "89504e47", 0),
    ("jpeg", "ffd8ff",   0),
    ("gif",  "474946",   0),
    ("riff", "52494646", 0),   # container: WAV/AVI/WebP — see refinement
    ("pdf",  "25504446", 0),
    ("zip",  "504b0304", 0),
    ("mp3",  "494433",   0),   # ID3-tagged
    ("flac", "664c6143", 0),
]


def sniff_format(binary_col: str = "content", *,
                 out: str = "format") -> Stage:
    """Detect a binary column's container format from magic bytes —
    the multimodal ingestion gate that needs NO codec library: a
    mislabeled blob (a PDF in the image column, truncated junk) is
    flagged before any decode UDF wastes a batch on it.

    Pure column algebra: ``hex(substring(content, ...))`` prefix
    comparisons, whole-stage codegen, no shuffle, NULL/short blobs →
    'unknown'.  RIFF containers are refined by their subtype tag
    (bytes 9-12: WAVE/AVI /WEBP)."""

    def fn(df: DataFrame) -> DataFrame:
        b = F.col(binary_col)
        head = F.lower(F.hex(F.substring(b, 1, 8)))
        expr = F.lit("unknown")
        for fmt, sig, off in reversed(MAGIC_SIGNATURES):
            cond = head.startswith(sig) if off == 0 else \
                F.lower(F.hex(F.substring(b, off + 1, len(sig) // 2))) \
                 .startswith(sig)
            expr = F.when(cond, F.lit(fmt)).otherwise(expr)
        # refine RIFF by subtype tag (ASCII at bytes 9-12)
        sub = F.decode(F.substring(b, 9, 4), "UTF-8")
        expr = (F.when(expr == "riff",
                       F.when(sub == "WAVE", F.lit("wav"))
                        .when(sub == F.lit("AVI "), F.lit("avi"))
                        .when(sub == "WEBP", F.lit("webp"))
                        .otherwise(F.lit("riff")))
                 .otherwise(expr))
        return df.withColumn(
            out, F.when(b.isNull(), F.lit("unknown")).otherwise(expr))

    return Stage(fn, name="sniff_format", seq_preserving=True)
