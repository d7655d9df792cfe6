"""YUV4MPEG2 (.y4m) container, C444 colorspace — the public
uncompressed video interchange format every ffmpeg/x264 pipeline
speaks. Plain-text stream header + per-frame FRAME markers + planar
YUV; RGB↔YUV is BT.601 full-range with deterministic integer
rounding (the roundtrip is lossy by ≤ ±2/channel, like any YUV
pipeline — tests compare against a local decode of the same bytes).
"""

from __future__ import annotations

import numpy as np


def rgb_to_yuv444(rgb: np.ndarray) -> np.ndarray:
    p = rgb.astype(np.float64)
    y = 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]
    u = (p[:, :, 2] - y) * 0.564 + 128.0
    v = (p[:, :, 0] - y) * 0.713 + 128.0
    return np.clip(np.rint(np.stack([y, u, v], axis=2)), 0, 255).astype(np.uint8)


def yuv444_to_rgb(yuv: np.ndarray) -> np.ndarray:
    p = yuv.astype(np.float64)
    y = p[:, :, 0]
    u = p[:, :, 1] - 128.0
    v = p[:, :, 2] - 128.0
    r = y + v / 0.713
    b = y + u / 0.564
    g = (y - 0.299 * r - 0.114 * b) / 0.587
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def encode_y4m(frames: list[np.ndarray], fps: int) -> bytes:
    h, w, _ = frames[0].shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C444\n".encode()]
    for f in frames:
        yuv = rgb_to_yuv444(f)
        out.append(b"FRAME\n")
        # planar: all Y, then all U, then all V
        out.append(np.ascontiguousarray(yuv.transpose(2, 0, 1)).tobytes())
    return b"".join(out)


def iter_y4m_frames(data: bytes):
    """Yields H×W×3 uint8 RGB frames."""
    nl = data.index(b"\n")
    header = data[:nl].decode()
    parts = header.split()
    assert parts[0] == "YUV4MPEG2", "not a y4m stream"
    w = h = None
    c = "420"
    for p in parts[1:]:
        if p.startswith("W"):
            w = int(p[1:])
        elif p.startswith("H"):
            h = int(p[1:])
        elif p.startswith("C"):
            c = p[1:]
    assert w and h, "y4m header missing W/H"
    assert c.startswith("444"), "only C444 supported"
    frame_len = w * h * 3
    pos = nl + 1
    while pos < len(data):
        nl2 = data.index(b"\n", pos)
        assert data[pos:nl2].split(b" ")[0] == b"FRAME", "bad frame marker"
        pos = nl2 + 1
        planar = np.frombuffer(data, np.uint8, frame_len, pos)
        yield yuv444_to_rgb(planar.reshape(3, h, w).transpose(1, 2, 0))
        pos += frame_len
