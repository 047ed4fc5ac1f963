"""Multimodal payload columns (training-data pipeline graft).

Media travel as opaque ``binary`` columns with typed metadata; every
transform is an Arrow-batched ``mapInPandas`` stage so the 100 TB path
is: parquet scan (binary column, no decode on scan) -> partition-local
decode/transform -> columnar write. Nothing here shuffles media bytes —
partitioning keys are always the small id/metadata columns.

Real codecs available in this container: the pure-Python PNG codec and
the deterministic lossy stand-in (operators/imagecodec). Audio/video
decodes need native libs that are NOT installed — those paths are
clearly-marked stubs: the Spark-side plumbing (schema, batch shape, UDF
signature, partitioning) is real and tested; the decode call raises
``NotImplementedError`` unless ``deterministic_fake=True``, which
substitutes a seeded fake so pipelines can be exercised end-to-end.

Media table schema (images extend the BASELINE.json landing shape):

    media(media_id string, kind string,      -- image|audio|video
          bytes binary,
          meta struct<w int, h int, fmt string,
                      duration_s double, sample_rate int, n_frames int>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, FloatType, IntegerType, StringType,
    StructField, StructType,
)

from web_scraper_spark.operators.imagecodec import (
    average_hash, decode_image, encode_png,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("bytes", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("w", IntegerType()),
                    StructField("h", IntegerType()),
                    StructField("fmt", StringType()),
                    StructField("duration_s", DoubleType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("phash", StringType()),
    ]
)

_FEATURE_DIM = 16


def _fake_signal(media_id: str, n: int) -> np.ndarray:
    """Deterministic stand-in signal derived from the media id."""
    seed = int.from_bytes(hashlib.sha1(media_id.encode()).digest()[:4], "big")
    return np.random.RandomState(seed).standard_normal(n).astype(np.float32)


def decode_audio(media_id: str, data: bytes, deterministic_fake: bool = False) -> np.ndarray:
    """STUB: real audio decode (mp3/flac/wav beyond PCM) needs a native
    lib (ffmpeg/soundfile) not present in this container."""
    if deterministic_fake:
        return _fake_signal(media_id, 4096)
    raise NotImplementedError(
        "audio decode requires ffmpeg/libsndfile — plug in here on a real cluster"
    )


def sample_video_frames(
    media_id: str, data: bytes, n_frames: int, deterministic_fake: bool = False
) -> list[np.ndarray]:
    """STUB: real frame sampling needs ffmpeg/opencv."""
    if deterministic_fake:
        return [
            _fake_signal(f"{media_id}:frame{i}", 8 * 8 * 3)
            .reshape(8, 8, 3)
            .astype(np.float32)
            for i in range(n_frames)
        ]
    raise NotImplementedError(
        "video frame sampling requires ffmpeg/opencv — plug in here on a real cluster"
    )


def resize_image_nn(pixels: np.ndarray, w: int, h: int) -> np.ndarray:
    """REAL nearest-neighbor resize (pure numpy)."""
    src_h, src_w = pixels.shape[:2]
    ys = (np.arange(h) * src_h // h).clip(0, src_h - 1)
    xs = (np.arange(w) * src_w // w).clip(0, src_w - 1)
    return pixels[ys][:, xs]


def extract_features(media: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """media table -> fixed-dim feature vectors, one ``mapInPandas``
    stage (no shuffle). Images decode for real; audio/video go through
    the stubs above."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["bytes"]):
                try:
                    if kind == "image":
                        pixels, _fmt = decode_image(bytes(data))
                        small = resize_image_nn(pixels, 4, 4)
                        gray = small.astype(np.float32).mean(axis=2).ravel()
                        feat = (gray / 255.0).astype(np.float32)
                        ph = f"{average_hash(pixels) & 0xFFFFFFFFFFFFFFFF:016x}"
                    elif kind == "audio":
                        sig = decode_audio(mid, bytes(data), deterministic_fake)
                        # 16 coarse spectral-band energies (real math on
                        # the (possibly fake) signal)
                        spec = np.abs(np.fft.rfft(sig))[: _FEATURE_DIM * 8]
                        feat = spec.reshape(_FEATURE_DIM, -1).mean(axis=1).astype(np.float32)
                        ph = hashlib.sha1(feat.tobytes()).hexdigest()[:16]
                    elif kind == "video":
                        frames = sample_video_frames(mid, bytes(data), 4, deterministic_fake)
                        stacked = np.stack([f.mean(axis=2).ravel() for f in frames])
                        feat = stacked.mean(axis=0)[: _FEATURE_DIM].astype(np.float32)
                        ph = hashlib.sha1(feat.tobytes()).hexdigest()[:16]
                    else:
                        feat, ph = None, None
                except NotImplementedError:
                    raise
                except Exception:
                    feat, ph = None, None
                out.append(
                    (mid, kind, list(feat) if feat is not None else None, ph)
                )
            yield pd.DataFrame(out, columns=["media_id", "kind", "feature", "phash"])

    return media.mapInPandas(run, FEATURES_SCHEMA)


def resize_images(media: DataFrame, w: int, h: int) -> DataFrame:
    """REAL image resize stage: decode -> nearest-neighbor resize ->
    re-encode PNG; non-image rows pass through untouched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, data, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["bytes"], pdf["meta"]
            ):
                if kind == "image":
                    try:
                        pixels, _fmt = decode_image(bytes(data))
                        resized = resize_image_nn(pixels, w, h)
                        meta = dict(meta or {})
                        meta.update({"w": w, "h": h, "fmt": "png"})
                        rows.append((mid, kind, encode_png(resized), meta))
                        continue
                    except Exception:
                        pass
                rows.append((mid, kind, data, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "bytes", "meta"])

    return media.mapInPandas(run, MEDIA_SCHEMA)
