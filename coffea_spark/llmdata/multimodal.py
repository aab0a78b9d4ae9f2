"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real (schemas, Arrow batch shapes, partition
sizing, mapInPandas signatures); the actual codec calls are stubbed — the
container has no image/audio libraries — behind ``decoder=`` hooks with a
deterministic fake for tests. Swap ``fake_image_decoder`` for a real
PIL/ffmpeg call in production; nothing else changes.

Design for 100 TB of media:
- binary payloads stay in parquet; metadata (width/height/duration/codec)
  lives in sibling struct columns so planning predicates (e.g. width >=
  224) prune row groups WITHOUT touching bytes.
- decode/feature steps run in ``mapInPandas`` so one task streams Arrow
  record batches; batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` to cap executor memory
  (payloads of tens of MB => set it low).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("data", T.BinaryType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("data", T.BinaryType()),
        T.StructField("codec", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def real_image_decoder(data: bytes) -> np.ndarray:
    """Placeholder for a real decoder (PIL/libjpeg). Not available in this
    container."""
    raise NotImplementedError(
        "image codecs are not installed in this environment; pass "
        "decoder=fake_image_decoder or provide a PIL-backed callable"
    )


def fake_image_decoder(data: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: interprets the payload bytes as a
    square uint8 grayscale image (content-derived, reproducible)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    side = max(int(len(arr) ** 0.5), 1)
    return arr[: side * side].reshape(side, side)


def image_features(
    df: DataFrame,
    image_col: str = "image",
    decoder: Callable[[bytes], np.ndarray] = real_image_decoder,
) -> DataFrame:
    """Decode + per-image summary features via mapInPandas (Arrow batch
    iterator). Output keeps all input columns minus the payload, plus
    decoded stats."""
    out_fields = [f for f in df.schema.fields if f.name != image_col]
    schema = T.StructType(
        out_fields
        + [
            T.StructField("img_width", T.IntegerType()),
            T.StructField("img_height", T.IntegerType()),
            T.StructField("img_mean", T.DoubleType()),
            T.StructField("img_std", T.DoubleType()),
        ]
    )
    keep = [f.name for f in out_fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = pdf[image_col].map(lambda s: decoder(s["data"]))
            out = pdf[keep].copy()
            out["img_width"] = imgs.map(lambda a: int(a.shape[1]))
            out["img_height"] = imgs.map(lambda a: int(a.shape[0]))
            out["img_mean"] = imgs.map(lambda a: float(a.mean()))
            out["img_std"] = imgs.map(lambda a: float(a.std()))
            yield out

    return df.mapInPandas(run, schema)


def resize_images(
    df: DataFrame,
    target: int,
    image_col: str = "image",
    decoder: Callable[[bytes], np.ndarray] = real_image_decoder,
) -> DataFrame:
    """Nearest-neighbour resize to (target, target); payload replaced by
    the raw resized bytes. Demonstrates the write-back shape (binary out)."""
    schema = T.StructType(
        [f for f in df.schema.fields if f.name != image_col]
        + [T.StructField(image_col, IMAGE_SCHEMA)]
    )
    keep = [f.name for f in df.schema.fields if f.name != image_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def resize(s):
                a = decoder(s["data"])
                h, w = a.shape[:2]
                yi = (np.arange(target) * h // target).clip(0, h - 1)
                xi = (np.arange(target) * w // target).clip(0, w - 1)
                r = a[np.ix_(yi, xi)]
                return {
                    "data": r.astype(np.uint8).tobytes(),
                    "format": "raw8",
                    "width": target,
                    "height": target,
                }

            out = pdf[keep].copy()
            out[image_col] = pdf[image_col].map(resize)
            yield out

    return df.mapInPandas(run, schema)


def sample_frames(
    df: DataFrame,
    every_n: int,
    video_col: str = "video",
    frame_bytes: int = 64,
) -> DataFrame:
    """Frame sampling plumbing for video payloads: emits one row per
    sampled frame (UDTF shape — one row in, many out). The "frames" are
    fixed-size byte slices of the payload (a real implementation seeks
    keyframes via ffmpeg; the partition/batch mechanics are identical)."""
    schema = T.StructType(
        [f for f in df.schema.fields if f.name != video_col]
        + [
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    keep = [f.name for f in df.schema.fields if f.name != video_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = r[video_col]
                n_frames = max(len(payload) // frame_bytes, 0)
                for fno in range(0, n_frames, every_n):
                    base = {k: r[k] for k in keep}
                    base["frame_no"] = fno
                    base["frame"] = payload[fno * frame_bytes : (fno + 1) * frame_bytes]
                    rows.append(base)
            yield pd.DataFrame(rows, columns=keep + ["frame_no", "frame"]) if rows else pd.DataFrame(
                columns=keep + ["frame_no", "frame"]
            )

    return df.mapInPandas(run, schema)


def fake_audio_decoder(data: bytes, sample_rate: int) -> np.ndarray:
    """Deterministic stand-in PCM decoder: payload bytes as int16 mono
    samples (a real implementation calls ffmpeg/soundfile)."""
    return np.frombuffer(data[: (len(data) // 2) * 2], dtype=np.int16)


def audio_features(
    df: DataFrame,
    audio_col: str = "audio",
    decoder: Callable[[bytes, int], np.ndarray] = fake_audio_decoder,
) -> DataFrame:
    """Per-clip audio summary features (duration, RMS level, peak,
    zero-crossing rate) via the same mapInPandas Arrow-batch shape as
    image_features. Payload dropped from the output."""
    out_fields = [f for f in df.schema.fields if f.name != audio_col]
    schema = T.StructType(
        out_fields
        + [
            T.StructField("duration_s", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("peak", T.IntegerType()),
            T.StructField("zcr", T.DoubleType()),
        ]
    )
    keep = [f.name for f in out_fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def stats(s):
                pcm = decoder(s["data"], s["sample_rate"]).astype(np.float64)
                n = len(pcm)
                if n == 0:
                    return (0.0, 0.0, 0, 0.0)
                return (
                    n / float(s["sample_rate"]),
                    float(np.sqrt(np.mean(pcm**2))),
                    int(np.abs(pcm).max()),
                    float(np.mean(np.signbit(pcm[1:]) != np.signbit(pcm[:-1]))),
                )

            vals = pdf[audio_col].map(stats)
            out = pdf[keep].copy()
            out["duration_s"] = vals.map(lambda t: t[0])
            out["rms"] = vals.map(lambda t: t[1])
            out["peak"] = vals.map(lambda t: t[2])
            out["zcr"] = vals.map(lambda t: t[3])
            yield out

    return df.mapInPandas(run, schema)
