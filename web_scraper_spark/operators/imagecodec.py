"""Pure-Python image codecs for the graft's image payload.

The container has no PIL/opencv, so:

- **PNG**: a real, spec-conformant codec written from scratch on stdlib
  ``zlib``/``struct``. The encoder emits 8-bit RGB filter-0; the DECODER
  handles the full static-image spec surface: color types 0/2/3/4/6,
  bit depths 1/2/4/8/16, all five filter types (incl. Paeth), PLTE
  lookup, and Adam7 interlacing — every output normalized to (h, w, 3)
  uint8 (gray replicated, palette resolved, alpha dropped, 16-bit
  downshifted). Decoding our own encodings is bit-exact — satisfying the
  lossless per-row invariant from BASELINE.json (decoded-pixel
  equality); foreign PNGs are pinned by filter/interlace round-trip
  tests against an independent test-side filterer.
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


# samples per pixel by PNG color type (3 = palette: 1 index sample)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass grid: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, w: int, channels: int, depth: int) -> np.ndarray:
    """Undo per-scanline filtering -> (h, rowbytes) of raw (packed) bytes.
    bpp = the filter byte-offset unit (whole bytes per pixel, min 1).

    Throughput (ADVICE r4): Up and Sub are fully numpy-vectorized — Sub's
    left recurrence is a per-bpp-lane prefix sum, i.e. ``cumsum % 256``.
    Average/Paeth carry a genuine sequential left dependency (floor-avg /
    predictor choice are not associative), so they stay a Python scan,
    but over plain ints (prev row converted to a list once per scanline,
    predictor inlined) instead of per-byte numpy scalar indexing and a
    function call — ~5-10x on the foreign-PNG decode path."""
    rowbytes = (w * channels * depth + 7) // 8
    bpp = max(1, (channels * depth + 7) // 8)
    out = np.zeros((h, rowbytes), dtype=np.uint8)
    prev_np = np.zeros(rowbytes, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        chunk = raw[pos + 1 : pos + 1 + rowbytes]
        pos += 1 + rowbytes
        if ftype == 0:
            out[y] = np.frombuffer(chunk, dtype=np.uint8)
        elif ftype == 1:  # Sub: per-lane prefix sum (mod 256 == uint8 cumsum)
            arr = np.frombuffer(chunk, dtype=np.uint8).copy()
            n_units = rowbytes // bpp
            lanes = arr[: n_units * bpp].reshape(n_units, bpp)
            lanes_acc = lanes.cumsum(axis=0, dtype=np.uint64)
            arr[: n_units * bpp] = (lanes_acc & 0xFF).astype(np.uint8).ravel()
            for i in range(n_units * bpp, rowbytes):  # ragged tail (sub-byte depths)
                arr[i] = (arr[i] + arr[i - bpp]) & 0xFF
            out[y] = arr
        elif ftype == 2:  # Up
            out[y] = np.frombuffer(chunk, dtype=np.uint8) + prev_np
        elif ftype == 3:  # Average
            line = bytearray(chunk)
            prev = prev_np.tolist()
            for i in range(bpp):
                line[i] = (line[i] + (prev[i] >> 1)) & 0xFF
            for i in range(bpp, rowbytes):
                line[i] = (line[i] + ((line[i - bpp] + prev[i]) >> 1)) & 0xFF
            out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        elif ftype == 4:  # Paeth (predictor inlined; p - a = b - c etc.)
            line = bytearray(chunk)
            prev = prev_np.tolist()
            for i in range(bpp):
                # a = c = 0 -> p = b, so pb = 0 and pa = pc = |b|: the
                # predictor is b (prev[i]); pa wins only when b == 0,
                # where a == b anyway
                line[i] = (line[i] + prev[i]) & 0xFF
            for i in range(bpp, rowbytes):
                a = line[i - bpp]
                b = prev[i]
                c = prev[i - bpp]
                pa = b - c
                pb = a - c
                pc = pa + pb
                if pa < 0:
                    pa = -pa
                if pb < 0:
                    pb = -pb
                if pc < 0:
                    pc = -pc
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                line[i] = (line[i] + pred) & 0xFF
            out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        prev_np = out[y]
    return out


def _unpack_samples(rows: np.ndarray, w: int, channels: int, depth: int) -> np.ndarray:
    """(h, rowbytes) packed -> (h, w, channels) uint8 samples (16-bit
    downshifted, sub-byte depths expanded to full 0-255 range)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * channels].reshape(h, w, channels)
    if depth == 16:
        # big-endian pairs; keep the high byte (spec-sanctioned 8-bit view)
        return rows[:, : w * channels * 2].reshape(h, w * channels, 2)[:, :, 0].reshape(
            h, w, channels
        )
    # 1/2/4-bit: unpack bits MSB-first, regroup `depth` bits per sample
    bits = np.unpackbits(rows, axis=1)[:, : w * depth].reshape(h, w, depth)
    samples = np.zeros((h, w), dtype=np.uint8)
    for k in range(depth):
        samples = (samples << 1) | bits[:, :, k]
    return samples.reshape(h, w, 1)


def decode_png(data: bytes) -> np.ndarray:
    """Full static-PNG decode -> (h, w, 3) uint8 RGB. Color types 0/2/3/
    4/6, depths 1/2/4/8/16, filters 0-4, Adam7. Alpha channels dropped,
    grayscale replicated, palette resolved via PLTE, sub-byte grayscale
    scaled to 0-255."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = depth = ctype = interlace = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload[:13]
            )
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    channels = _PNG_CHANNELS.get(ctype)
    if channels is None:
        raise ValueError(f"bad PNG color type {ctype}")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    raw = zlib.decompress(bytes(idat))

    if interlace == 0:
        samples = _unpack_samples(_unfilter(raw, h, w, channels, depth), w, channels, depth)
    elif interlace == 1:
        samples = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            rowbytes = (pw * channels * depth + 7) // 8
            span = ph * (1 + rowbytes)
            sub = _unpack_samples(
                _unfilter(raw[off : off + span], ph, pw, channels, depth),
                pw, channels, depth,
            )
            samples[y0::dy, x0::dx] = sub
            off += span
    else:
        raise ValueError(f"bad PNG interlace method {interlace}")

    if ctype == 3:
        return plte[samples[:, :, 0]].copy()
    if ctype in (0, 4):
        g = samples[:, :, 0]
        if depth < 8:  # expand 1/2/4-bit gray to full range
            g = (g.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2).copy()
    return samples[:, :, :3].copy()


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
