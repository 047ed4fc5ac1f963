"""Pure-Python image codecs for the graft's image payload.

The container has no PIL/opencv, so:

- **PNG**: a real, spec-conformant subset codec (8-bit RGB, filter 0,
  zlib/deflate IDAT) written from scratch on stdlib ``zlib``/``struct``.
  Decoding our own encodings is bit-exact — satisfying the lossless
  per-row invariant from BASELINE.json (decoded-pixel equality).
- **"JPEG"**: real JPEG entropy coding is out of scope without a native
  lib, so the lossy path is a clearly-marked deterministic stand-in
  (magic ``FJPG``): uniform quantization (step 4) + zlib. The *loss is
  real* — decoded pixels differ from the source and the PSNR >= 40 dB
  check is genuine math, not a mock. Swap in a real JPEG lib on a real
  cluster behind the same encode/decode signatures.

All functions operate on ``numpy`` arrays (h, w, 3) uint8 and are called
from Arrow-batched pandas UDFs only — never per-row Spark Python UDFs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_FJPG_MAGIC = b"FJPG"
_FJPG_STEP = 4  # quantization step -> MSE ~ step^2/12 -> PSNR ~ 47 dB


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """8-bit RGB PNG, filter type 0 on every scanline."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    raw = np.zeros((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 1:] = pixels.reshape(h, w * 3)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    raw = raw.reshape(h, w * 3 + 1)
    if not (raw[:, 0] == 0).all():
        raise ValueError("only filter type 0 supported")
    return raw[:, 1:].reshape(h, w, 3).copy()


def encode_fjpg(pixels: np.ndarray) -> bytes:
    """Deterministic lossy stand-in codec (see module docstring)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    q = (pixels.astype(np.int32) // _FJPG_STEP * _FJPG_STEP + _FJPG_STEP // 2).clip(
        0, 255
    ).astype(np.uint8)
    return (
        _FJPG_MAGIC
        + struct.pack(">HHB", w, h, _FJPG_STEP)
        + zlib.compress(q.tobytes(), 6)
    )


def decode_fjpg(data: bytes) -> np.ndarray:
    if data[:4] != _FJPG_MAGIC:
        raise ValueError("not an FJPG")
    w, h, _step = struct.unpack(">HHB", data[4:9])
    raw = np.frombuffer(zlib.decompress(data[9:]), dtype=np.uint8)
    return raw.reshape(h, w, 3).copy()


def decode_image(data: bytes) -> tuple[np.ndarray, str]:
    """Dispatch on magic -> (pixels, fmt)."""
    if data[:8] == _PNG_SIG:
        return decode_png(data), "png"
    if data[:4] == _FJPG_MAGIC:
        return decode_fjpg(data), "jpeg"
    raise NotImplementedError(
        "real JPEG/WebP decode requires a native imaging lib not present in "
        "this container; plug one in here"
    )


def average_hash(pixels: np.ndarray) -> int:
    """64-bit perceptual average-hash: grayscale -> 8x8 block means ->
    bit per cell above the global mean. Deterministic numpy; signed int64
    range for Spark LongType."""
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (blocks > blocks.mean()).flatten()
    value = 0
    for b in bits:
        value = (value << 1) | int(b)
    return value - (1 << 64) if value >= (1 << 63) else value


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float((diff * diff).mean())
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
