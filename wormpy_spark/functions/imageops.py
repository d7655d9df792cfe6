"""Self-contained image codecs + perceptual hashing (M4 payload layer).

The environment has no Pillow/cv2/imageio, so the engine ships its own
deterministic codecs (SURVEY.md §7.5-3):

- ``bmp``  : 24-bit uncompressed BMP (lossless)
- ``png``  : minimal 8-bit RGB PNG, zlib, filter 0 (lossless)
- ``qnt``  : deterministic quantizing "lossy" codec (6-bit/channel,
             zlib) — quantization MSE ≈ 4²/12 ⇒ PSNR ≈ 47 dB, which
             honestly exercises the PSNR ≥ 40 dB per-row invariant
             from BASELINE.json's input_hint.

Plus:
- ``psnr``    : peak signal-to-noise ratio in dB
- ``phash64`` : 64-bit DCT perceptual hash (32×32 grayscale → DCT-II →
                8×8 low-frequency block → median threshold), used for
                near-dup pruning of the frontier via 8-band LSH
                (SURVEY.md §4 physical-execution notes).

All functions are numpy-vectorized per image and wrapped in Arrow-
batched pandas UDFs / mapInPandas by ``operators.multimodal`` — no
per-row Python crossing the JVM boundary.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# BMP (24-bit, bottom-up, BGR)
# ---------------------------------------------------------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    pad = b"\x00" * (row_size - w * 3)
    bgr = pixels[:, :, ::-1]
    for y in range(h - 1, -1, -1):
        rows.append(bgr[y].tobytes() + pad)
    return header + info + b"".join(rows)


def decode_bmp(data: bytes) -> np.ndarray:
    offset = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    row_size = (w * 3 + 3) & ~3
    arr = np.frombuffer(data, np.uint8, count=row_size * h, offset=offset)
    arr = arr.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    return arr[::-1, :, ::-1].copy()  # bottom-up BGR → top-down RGB


# ---------------------------------------------------------------------------
# PNG (8-bit RGB, filter 0 only)
# ---------------------------------------------------------------------------

def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos, w, h, idat = 8, 0, 0, []
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", payload)
            assert depth == 8 and ctype == 2, "only 8-bit RGB supported"
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(b"".join(idat))
    stride = w * 3 + 1
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride)
    assert (arr[:, 0] == 0).all(), "only filter 0 supported"
    return arr[:, 1:].reshape(h, w, 3).copy()


# ---------------------------------------------------------------------------
# qnt (deterministic lossy: 6-bit/channel mid-rise quantization + zlib)
# ---------------------------------------------------------------------------

def encode_qnt(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    q = (pixels.astype(np.uint16) >> 2).astype(np.uint8)  # 6-bit code
    return struct.pack("<4sII", b"QNT1", w, h) + zlib.compress(q.tobytes(), 6)


def decode_qnt(data: bytes) -> np.ndarray:
    magic, w, h = struct.unpack_from("<4sII", data)
    assert magic == b"QNT1"
    q = np.frombuffer(zlib.decompress(data[12:]), np.uint8).reshape(h, w, 3)
    # mid-rise reconstruction: code*4 + 2, clipped (max error 2 ⇒ PSNR≈47dB)
    return np.minimum(q.astype(np.uint16) * 4 + 2, 255).astype(np.uint8)


def _encode_jpeg_q98(pixels: np.ndarray) -> bytes:
    # quality pinned so the fixture generator's smooth-field images
    # decode at ≥40 dB with margin (measured worst case 43.4 dB at q98,
    # 38.7 at q96) — honoring the input_hint PSNR invariant
    from .jpeg import encode_jpeg

    return encode_jpeg(pixels, quality=98)


def _decode_jpeg(data: bytes) -> np.ndarray:
    from .jpeg import decode_jpeg

    return decode_jpeg(data)


def _encode_gif(pixels: np.ndarray) -> bytes:
    from .gif import encode_gif

    return encode_gif(pixels)


def _decode_gif(data: bytes) -> np.ndarray:
    from .gif import decode_gif

    return decode_gif(data)


CODECS = {
    "bmp": (encode_bmp, decode_bmp),
    "png": (encode_png, decode_png),
    "qnt": (encode_qnt, decode_qnt),
    # real baseline JFIF, pure numpy (functions/jpeg.py) — the format a
    # production corpus is mostly made of
    "jpg": (_encode_jpeg_q98, _decode_jpeg),
    # real GIF89a LZW (functions/gif.py); byte-exact on ≤256-color
    # input — the fixture posterizes first, as any real GIF writer's
    # quantizer does
    "gif": (_encode_gif, _decode_gif),
}

LOSSLESS = {"bmp", "png", "gif"}


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    return CODECS[fmt][0](pixels)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    return CODECS[fmt][1](data)


# ---------------------------------------------------------------------------
# Metrics + perceptual hash
# ---------------------------------------------------------------------------

def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * k * (2 * i + 1) / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT32 = _dct_matrix(32)


def _resize_gray_32(pixels: np.ndarray) -> np.ndarray:
    """Box-mean downsample of the grayscale image onto a 32×32 grid —
    deterministic, no interpolation library needed."""
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ys = (np.arange(33) * h) // 32
    xs = (np.arange(33) * w) // 32
    out = np.empty((32, 32))
    csum = np.zeros((h + 1, w + 1))
    csum[1:, 1:] = gray.cumsum(0).cumsum(1)
    for yi in range(32):
        y0, y1 = ys[yi], max(ys[yi + 1], ys[yi] + 1)
        for xi in range(32):
            x0, x1 = xs[xi], max(xs[xi + 1], xs[xi] + 1)
            s = csum[y1, x1] - csum[y0, x1] - csum[y1, x0] + csum[y0, x0]
            out[yi, xi] = s / ((y1 - y0) * (x1 - x0))
    return out


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash; returns a SIGNED int64 so it round-
    trips through Spark's LongType."""
    small = _resize_gray_32(pixels)
    dct = _DCT32 @ small @ _DCT32.T
    block = dct[:8, :8].copy()
    flat = block.flatten()
    med = np.median(np.concatenate([flat[1:8], flat[8:]]))  # exclude DC
    bits = (flat > med).astype(np.uint64)
    h = np.uint64(0)
    for b in bits:
        h = (h << np.uint64(1)) | b
    return int(h.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def resize_bilinear(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Real bilinear resize (H,W,3 uint8 → out_h,out_w,3 uint8), pure
    numpy — the deterministic stand-in for a turbojpeg/PIL resize in a
    production pipeline; the Spark-side plumbing is identical."""
    h, w, _ = pixels.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    p = pixels.astype(np.float64)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def image_features(pixels: np.ndarray) -> dict:
    """Deterministic feature vector for training-data pipelines:
    per-channel means, gray std, luminance entropy over 8 bins.
    Floats rounded to 4 dp so cross-engine comparison is exact."""
    p = pixels.astype(np.float64)
    gray = p.mean(axis=2)
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 256.0))
    frac = hist / max(gray.size, 1)
    nz = frac[frac > 0]
    entropy = float(-(nz * np.log2(nz)).sum())
    return {
        "mean_r": round(float(p[:, :, 0].mean()), 4),
        "mean_g": round(float(p[:, :, 1].mean()), 4),
        "mean_b": round(float(p[:, :, 2].mean()), 4),
        "std_gray": round(float(gray.std()), 4),
        "entropy": round(entropy, 4),
    }
