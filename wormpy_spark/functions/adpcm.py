"""IMA ADPCM (DVI4) mono codec, pure Python/numpy — the public
4-bit-per-sample standard (IMA Digital Audio Pack, 1992; same tables
as RFC 3551's DVI4). Gives the audio pipeline a REAL compressed format
beside raw pcm16 (mp3 stays a typed stub — no codec libs here).

Container: 8-byte header ``<i h B x`` (n_samples, initial predictor,
initial step index) + packed nibbles (low nibble first). The first
sample is the header predictor; each nibble advances the predictor by
the spec's quantized delta.
"""

from __future__ import annotations

import struct

import numpy as np

STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], dtype=np.int32)

INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _quantize(diff: int, step: int) -> tuple[int, int]:
    """diff (>=0) → (nibble magnitude bits, reconstructed delta)."""
    nib = 0
    delta = step >> 3
    if diff >= step:
        nib |= 4
        diff -= step
        delta += step
    if diff >= step >> 1:
        nib |= 2
        diff -= step >> 1
        delta += step >> 1
    if diff >= step >> 2:
        nib |= 1
        delta += step >> 2
    return nib, delta


def encode_adpcm(samples: np.ndarray) -> bytes:
    """samples: int16 mono."""
    s = np.asarray(samples, dtype=np.int64)
    n = len(s)
    if n == 0:
        return struct.pack("<ihBx", 0, 0, 0)
    pred = int(s[0])
    index = 0
    nibbles = []
    for v in s[1:]:
        step = int(STEP_TABLE[index])
        diff = int(v) - pred
        nib = 8 if diff < 0 else 0
        mag, delta = _quantize(abs(diff), step)
        nib |= mag
        pred = max(-32768, min(32767, pred + (-delta if nib & 8 else delta)))
        index = max(0, min(88, index + int(INDEX_TABLE[nib & 7])))
        nibbles.append(nib)
    if len(nibbles) % 2:
        nibbles.append(0)  # pad nibble (ignored: count in header)
    packed = bytes(
        (nibbles[i] & 0xF) | ((nibbles[i + 1] & 0xF) << 4)
        for i in range(0, len(nibbles), 2)
    )
    return struct.pack("<ihBx", n, int(s[0]), 0) + packed


def decode_adpcm(data: bytes) -> np.ndarray:
    """→ int16 mono samples."""
    n, pred, index = struct.unpack_from("<ihBx", data)
    if n == 0:
        return np.zeros(0, dtype=np.int16)
    out = np.empty(n, dtype=np.int16)
    out[0] = pred
    body = data[8:]
    k = 0
    for i in range(1, n):
        byte = body[k >> 1]
        nib = (byte >> 4) if (k & 1) else (byte & 0xF)
        k += 1
        step = int(STEP_TABLE[index])
        delta = step >> 3
        if nib & 4:
            delta += step
        if nib & 2:
            delta += step >> 1
        if nib & 1:
            delta += step >> 2
        pred = max(-32768, min(32767, pred + (-delta if nib & 8 else delta)))
        index = max(0, min(88, index + int(INDEX_TABLE[nib & 7])))
        out[i] = pred
    return out
