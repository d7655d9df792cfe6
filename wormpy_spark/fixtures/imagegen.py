"""Deterministic synthetic image corpus (FIXTURES.md §1).

Generates the ``images`` table exactly in BASELINE.json's input_hint
shape — (image_id, bytes, w, h, fmt, caption, phash) — plus the
test-only ``images_truth`` sidecar (pixels_sha256, psnr_floor_db,
caption). ~5% of images are near-duplicate perturbed copies (phash
hamming ≤ 6) to exercise LSH near-dup pruning.

Everything is seeded numpy PCG64; no external data, no network.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ..functions.imageops import LOSSLESS, decode_image, encode_image, phash64

FMTS = ("png", "bmp", "qnt", "jpg", "gif")

_CAPTION_VOCAB = (
    "red blue green small large striped plain bright dark soft "
    "cat dog bird boat house tree river mountain city cloud "
    "sitting running flying standing floating near under over beside within"
).split()


def _caption(rng: np.random.Generator, image_id: str) -> str:
    words = rng.choice(len(_CAPTION_VOCAB), size=6, replace=True)
    return " ".join(_CAPTION_VOCAB[w] for w in words) + f" [{image_id}]"


def _smooth_pixels(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Low-frequency random field → images whose phash is stable under
    tiny perturbations (required for the near-dup hamming≤6 property)."""
    small = rng.integers(0, 256, size=(4, 4, 3))
    ys = np.linspace(0, 3, h)
    xs = np.linspace(0, 3, w)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, 3)
    x1 = np.minimum(x0 + 1, 3)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    p = (
        small[y0][:, x0] * (1 - fy) * (1 - fx)
        + small[y0][:, x1] * (1 - fy) * fx
        + small[y1][:, x0] * fy * (1 - fx)
        + small[y1][:, x1] * fy * fx
    )
    noise = rng.integers(-6, 7, size=(h, w, 3))
    return np.clip(p + noise, 0, 255).astype(np.uint8)


def generate_images(
    n_images: int = 36,
    seed: int = 1234,
    near_dup_fraction: float = 0.15,
    id_prefix: str = "img",
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (images, images_truth) pandas DataFrames."""
    rng = np.random.Generator(np.random.PCG64(seed))
    rows, truth_rows = [], []
    originals: list[tuple[str, np.ndarray]] = []

    for k in range(n_images):
        image_id = f"{id_prefix}_{k:06d}"
        is_dup = k > 4 and rng.random() < near_dup_fraction and originals
        fmt = FMTS[int(rng.integers(0, len(FMTS)))]
        if is_dup:
            src_id, src_pixels = originals[int(rng.integers(0, len(originals)))]
            pixels = src_pixels.astype(np.int16)
            # perturb a handful of pixels by ±2 — visually identical
            for _ in range(8):
                y = int(rng.integers(0, pixels.shape[0]))
                x = int(rng.integers(0, pixels.shape[1]))
                pixels[y, x] += int(rng.integers(-2, 3))
            pixels = np.clip(pixels, 0, 255).astype(np.uint8)
        else:
            w = int(rng.integers(16, 129))
            h = int(rng.integers(16, 129))
            pixels = _smooth_pixels(rng, w, h)
            originals.append((image_id, pixels))

        if fmt == "gif":
            # a real GIF writer quantizes to <=256 colors before LZW;
            # the codec is then byte-exact on the posterized pixels
            from ..functions.gif import posterize252

            pixels = posterize252(pixels)
        h, w, _ = pixels.shape
        data = encode_image(pixels, fmt)
        # ground truth is what a reader will actually reconstruct
        decoded = decode_image(data, fmt)
        ref_pixels = pixels if fmt in LOSSLESS else decoded
        caption = _caption(rng, image_id)
        rows.append(
            {
                "image_id": image_id,
                "bytes": data,
                "w": np.int32(w),
                "h": np.int32(h),
                "fmt": fmt,
                "caption": caption,
                "phash": np.int64(phash64(decoded)),
            }
        )
        truth_rows.append(
            {
                "image_id": image_id,
                "pixels_sha256": hashlib.sha256(ref_pixels.tobytes()).hexdigest(),
                "psnr_floor_db": 40.0 if fmt not in LOSSLESS else float("inf"),
                "caption": caption,
            }
        )
    return pd.DataFrame(rows), pd.DataFrame(truth_rows)
