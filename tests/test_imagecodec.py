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


# ---------------------------------------------------------------------------
# Full-spec PNG decode: foreign encodings (all filters, color types,
# bit depths, Adam7) verified against an INDEPENDENT test-side encoder —
# the filters below are implemented from the PNG spec here, not imported
# from the codec under test.

import struct
import zlib


def _chunk(tag, payload):
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _ref_paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _ref_filter_rows(rows, bpp, ftype_for_row):
    """rows: list of bytearrays (raw scanlines). Returns filtered stream."""
    out = bytearray()
    prev = bytearray(len(rows[0]))
    for y, line in enumerate(rows):
        ft = ftype_for_row(y)
        enc = bytearray(len(line))
        for i in range(len(line)):
            left = line[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                enc[i] = line[i]
            elif ft == 1:
                enc[i] = (line[i] - left) & 0xFF
            elif ft == 2:
                enc[i] = (line[i] - up) & 0xFF
            elif ft == 3:
                enc[i] = (line[i] - ((left + up) >> 1)) & 0xFF
            else:
                enc[i] = (line[i] - _ref_paeth(left, up, ul)) & 0xFF
        out.append(ft)
        out += enc
        prev = line
    return bytes(out)


def _make_png(pixels_rows, w, h, depth, ctype, plte=None, interlace=0, ftype_for_row=None):
    """pixels_rows: list of raw (unfiltered, packed) scanline bytearrays."""
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    bpp = max(1, (channels * depth + 7) // 8)
    ftype_for_row = ftype_for_row or (lambda y: y % 5)
    body = _ref_filter_rows(pixels_rows, bpp, ftype_for_row)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    png = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        png += _chunk(b"PLTE", bytes(plte.flatten()))
    png += _chunk(b"IDAT", zlib.compress(body, 6)) + _chunk(b"IEND", b"")
    return png


def _rng_img(seed, h, w, channels, hi=256):
    rng = np.random.RandomState(seed)
    return rng.randint(0, hi, size=(h, w, channels)).astype(np.uint8)


def test_png_decode_rgb_all_filter_types():
    from web_scraper_spark.operators.imagecodec import decode_png

    px = _rng_img(1, 7, 5, 3)
    rows = [bytearray(px[y].tobytes()) for y in range(7)]
    for ft in range(5):
        png = _make_png(rows, 5, 7, 8, 2, ftype_for_row=lambda y, ft=ft: ft)
        assert np.array_equal(decode_png(png), px), f"filter {ft}"
    # mixed filters per row
    png = _make_png(rows, 5, 7, 8, 2)
    assert np.array_equal(decode_png(png), px)


def test_png_decode_rgba_drops_alpha():
    from web_scraper_spark.operators.imagecodec import decode_png

    px = _rng_img(2, 6, 4, 4)
    rows = [bytearray(px[y].tobytes()) for y in range(6)]
    png = _make_png(rows, 4, 6, 8, 6)
    assert np.array_equal(decode_png(png), px[:, :, :3])


def test_png_decode_gray_and_gray_alpha():
    from web_scraper_spark.operators.imagecodec import decode_png

    g = _rng_img(3, 5, 9, 1)
    rows = [bytearray(g[y].tobytes()) for y in range(5)]
    png = _make_png(rows, 9, 5, 8, 0)
    assert np.array_equal(decode_png(png), np.repeat(g, 3, axis=2))

    ga = _rng_img(4, 5, 9, 2)
    rows = [bytearray(ga[y].tobytes()) for y in range(5)]
    png = _make_png(rows, 9, 5, 8, 4)
    assert np.array_equal(decode_png(png), np.repeat(ga[:, :, :1], 3, axis=2))


def test_png_decode_palette_8bit_and_4bit():
    from web_scraper_spark.operators.imagecodec import decode_png

    plte = _rng_img(5, 1, 16, 3)[0]  # 16-color palette
    idx = np.random.RandomState(6).randint(0, 16, size=(4, 6)).astype(np.uint8)
    # 8-bit indices
    rows = [bytearray(idx[y].tobytes()) for y in range(4)]
    png = _make_png(rows, 6, 4, 8, 3, plte=plte)
    assert np.array_equal(decode_png(png), plte[idx])
    # 4-bit packed indices (two per byte, MSB first; odd width pads)
    w4 = 5
    idx4 = idx[:, :w4]
    packed_rows = []
    for y in range(4):
        row = bytearray()
        vals = list(idx4[y]) + [0]  # pad to even
        for i in range(0, len(vals) - 1, 2):
            row.append((vals[i] << 4) | vals[i + 1])
        packed_rows.append(row)
    png = _make_png(packed_rows, w4, 4, 4, 3, plte=plte)
    assert np.array_equal(decode_png(png), plte[idx4])


def test_png_decode_1bit_gray_scales_to_full_range():
    from web_scraper_spark.operators.imagecodec import decode_png

    bits = np.array([[1, 0, 1, 0, 1, 1, 0, 0, 1, 1]], dtype=np.uint8)
    packed = np.packbits(bits[0]).tobytes()
    png = _make_png([bytearray(packed)], 10, 1, 1, 0)
    out = decode_png(png)
    assert np.array_equal(out[0, :, 0], bits[0] * 255)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])


def test_png_decode_16bit_rgb_downshifts():
    from web_scraper_spark.operators.imagecodec import decode_png

    rng = np.random.RandomState(7)
    px16 = rng.randint(0, 65536, size=(3, 4, 3)).astype(">u2")
    rows = [bytearray(px16[y].tobytes()) for y in range(3)]
    png = _make_png(rows, 4, 3, 16, 2)
    assert np.array_equal(decode_png(png), (px16 >> 8).astype(np.uint8))


def test_png_decode_adam7_interlaced_rgb():
    from web_scraper_spark.operators.imagecodec import decode_png

    # dims chosen to exercise partial passes (not multiples of 8)
    h, w = 11, 13
    px = _rng_img(8, h, w, 3)
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    body = bytearray()
    for x0, y0, dx, dy in passes:
        sub = px[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        rows = [bytearray(sub[y].tobytes()) for y in range(ph)]
        body += _ref_filter_rows(rows, 3, lambda y: y % 5)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    png = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(bytes(body), 6)) + _chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png), px)


def test_png_decode_rejects_garbage():
    from web_scraper_spark.operators.imagecodec import decode_png

    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_png_decode_hypothesis_fuzz():
    """Property fuzz: random dims/color type/bit depth/filter choice/
    interlace, encoded by the independent test-side encoder, must decode
    to the exact expected pixels."""
    from hypothesis import given, settings, strategies as st

    from web_scraper_spark.operators.imagecodec import decode_png

    @settings(max_examples=60, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 14),
        ctype=st.sampled_from([0, 2, 4, 6]),
        seed=st.integers(0, 2**31 - 1),
        interlace=st.sampled_from([0, 1]),
        fseed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, ctype, seed, interlace, fseed):
        channels = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
        px = _rng_img(seed, h, w, channels)
        frng = np.random.RandomState(fseed)
        fmap = {}

        def ftype_for_row(y):
            return fmap.setdefault(y, int(frng.randint(0, 5)))

        if interlace == 0:
            rows = [bytearray(px[y].tobytes()) for y in range(h)]
            png = _make_png(rows, w, h, 8, ctype, ftype_for_row=ftype_for_row)
        else:
            passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
            body = bytearray()
            for x0, y0, dx, dy in passes:
                sub = px[y0::dy, x0::dx]
                ph, pw = sub.shape[:2]
                if ph == 0 or pw == 0:
                    continue
                rows = [bytearray(sub[y].tobytes()) for y in range(ph)]
                fmap.clear()
                body += _ref_filter_rows(rows, channels, ftype_for_row)
            ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1)
            png = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
                   + _chunk(b"IDAT", zlib.compress(bytes(body), 6))
                   + _chunk(b"IEND", b""))
        got = decode_png(png)
        if ctype in (0, 4):
            exp = np.repeat(px[:, :, :1], 3, axis=2)
        else:
            exp = px[:, :, :3]
        assert np.array_equal(got, exp)

    check()
