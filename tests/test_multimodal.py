"""Multimodal column plumbing: schema, Arrow batch shape, real image
path, deterministic fakes for audio/video, stub gating."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from web_scraper_spark.operators.imagecodec import decode_png, encode_png
from web_scraper_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_audio,
    extract_features,
    resize_image_nn,
    resize_images,
    sample_video_frames,
)
from web_scraper_spark.sources.synthetic_web import image_pixels


@pytest.fixture(scope="module")
def media(spark):
    rows = []
    for i in range(6):
        px = image_pixels(f"m{i}", 20, 14)
        rows.append(
            (f"img-{i}", "image", bytearray(encode_png(px)),
             {"w": 20, "h": 14, "fmt": "png", "duration_s": None,
              "sample_rate": None, "n_frames": None})
        )
    rows.append(
        ("aud-0", "audio", bytearray(b"\x00" * 64),
         {"w": None, "h": None, "fmt": "wav", "duration_s": 1.5,
          "sample_rate": 16000, "n_frames": None})
    )
    rows.append(
        ("vid-0", "video", bytearray(b"\x00" * 64),
         {"w": None, "h": None, "fmt": "mp4", "duration_s": 2.0,
          "sample_rate": None, "n_frames": 48})
    )
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(3).cache()


def test_feature_extraction_shapes(spark, media):
    feats = extract_features(media, deterministic_fake=True).collect()
    by_id = {r.media_id: r for r in feats}
    assert len(by_id) == 8
    assert len(by_id["img-0"].feature) == 16
    assert len(by_id["aud-0"].feature) == 16
    assert len(by_id["vid-0"].feature) == 16
    assert by_id["img-0"].phash is not None


def test_feature_extraction_deterministic(spark, media):
    a = {r.media_id: r.feature for r in extract_features(media, True).collect()}
    b = {r.media_id: r.feature for r in extract_features(media, True).collect()}
    assert a == b


def test_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_audio("x", b"")
    with pytest.raises(NotImplementedError):
        sample_video_frames("x", b"", 4)


def test_resize_real_roundtrip(spark, media):
    resized = resize_images(media, 8, 6)
    img = [r for r in resized.collect() if r.kind == "image"][0]
    px = decode_png(bytes(img.bytes))
    assert px.shape == (6, 8, 3)
    assert img.meta["w"] == 8 and img.meta["h"] == 6
    # non-image rows pass through
    aud = [r for r in resized.collect() if r.kind == "audio"][0]
    assert bytes(aud.bytes) == b"\x00" * 64


def test_resize_nn_math():
    px = image_pixels("rz", 16, 16)
    out = resize_image_nn(px, 4, 4)
    assert out.shape == (4, 4, 3)
    # corner pixel maps to source corner
    assert np.array_equal(out[0, 0], px[0, 0])
