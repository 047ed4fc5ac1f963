"""Image payload operators (graft, SURVEY.md Phase 3).

``decode_image_stats``: Arrow-batched decode of the fetched bytes into
(w, h, fmt, phash). The landing table matches BASELINE.json input_hint:
``(image_id, bytes, w, h, fmt, caption, phash)``.

``verify_images``: per-row invariant check (PNG bit-exact vs the
deterministically recomputed source pixels, PSNR >= 40 dB for lossy,
caption equality) — returns a DataFrame of failures (empty == pass).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from web_scraper_spark.operators.imagecodec import average_hash, decode_image, psnr

_STATS_SCHEMA = StructType(
    [
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("phash", LongType()),
    ]
)


@pandas_udf(_STATS_SCHEMA)
def decode_image_stats(body: pd.Series) -> pd.DataFrame:
    rows = []
    for b in body:
        try:
            pixels, fmt = decode_image(bytes(b))
            rows.append((pixels.shape[1], pixels.shape[0], fmt, average_hash(pixels)))
        except Exception:
            rows.append((None, None, None, None))
    return pd.DataFrame(rows, columns=["w", "h", "fmt", "phash"])


_VERIFY_SCHEMA = StructType(
    [
        StructField("ok", BooleanType()),
        StructField("psnr_db", DoubleType()),
    ]
)


@pandas_udf(_VERIFY_SCHEMA)
def _verify_pixels(image_id: pd.Series, body: pd.Series) -> pd.DataFrame:
    import numpy as np

    from web_scraper_spark.sources.synthetic_web import image_pixels

    rows = []
    for iid, b in zip(image_id, body):
        try:
            pixels, fmt = decode_image(bytes(b))
            expected = image_pixels(iid, pixels.shape[1], pixels.shape[0])
            db = psnr(expected, pixels)
            if fmt == "png":
                ok = bool(np.array_equal(expected, pixels))
            else:
                ok = bool(db >= 40.0)
            rows.append((ok, None if db == float("inf") else db))
        except Exception:
            rows.append((False, None))
    return pd.DataFrame(rows, columns=["ok", "psnr_db"])


def land_images(fetched_images: DataFrame) -> DataFrame:
    """Fetched image rows -> landing-table rows. Expects columns
    (url, caption, body); dedups by image_id (first occurrence)."""
    return (
        fetched_images.withColumn("image_id", F.sha1(F.col("url")))
        .dropDuplicates(["image_id"])
        .withColumn("s", decode_image_stats(F.col("body")))
        .select(
            "image_id",
            F.col("body").alias("bytes"),
            F.col("s.w").alias("w"),
            F.col("s.h").alias("h"),
            F.col("s.fmt").alias("fmt"),
            F.coalesce(F.col("caption"), F.lit("")).alias("caption"),
            F.col("s.phash").alias("phash"),
        )
    )


def verify_images(images: DataFrame, expected_captions: DataFrame) -> DataFrame:
    """Per-row invariant vs recomputed ground truth; returns failures."""
    checked = images.join(
        expected_captions.withColumnRenamed("caption", "expected_caption"),
        "image_id",
        "left",
    ).withColumn("v", _verify_pixels(F.col("image_id"), F.col("bytes")))
    return checked.where(
        (~F.col("v.ok"))
        | (F.col("caption") != F.coalesce(F.col("expected_caption"), F.lit("")))
    ).select("image_id", "fmt", "v.psnr_db", "caption", "expected_caption")
