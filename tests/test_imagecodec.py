import numpy as np
import pytest

from web_scraper_spark.operators.imagecodec import (
    average_hash,
    decode_fjpg,
    decode_image,
    decode_png,
    encode_fjpg,
    encode_png,
    psnr,
)
from web_scraper_spark.sources.synthetic_web import image_pixels


def test_png_roundtrip_bit_exact():
    px = image_pixels("someid", 33, 21)
    out = decode_png(encode_png(px))
    assert np.array_equal(px, out)  # lossless invariant (BASELINE.json)


def test_png_dispatch():
    px = image_pixels("x", 8, 8)
    pixels, fmt = decode_image(encode_png(px))
    assert fmt == "png" and np.array_equal(px, pixels)


def test_fjpg_lossy_but_psnr_over_40():
    px = image_pixels("lossy", 48, 32)
    out = decode_fjpg(encode_fjpg(px))
    assert not np.array_equal(px, out)  # the loss is real
    assert psnr(px, out) >= 40.0  # BASELINE.json lossy invariant


def test_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 real jpeg would go here")


def test_average_hash_deterministic_and_discriminative():
    a = image_pixels("a", 32, 32)
    b = image_pixels("b", 32, 32)
    assert average_hash(a) == average_hash(a)
    assert average_hash(a) != average_hash(b)
    # int64 range for Spark LongType
    assert -(2**63) <= average_hash(a) < 2**63


def test_psnr_identical_is_inf():
    px = image_pixels("same", 16, 16)
    assert psnr(px, px) == float("inf")
