"""Deterministic synthetic audio/video fixtures (multimodal columns).

Both modalities follow the input_hint pattern: opaque ``binary``
payloads + typed metadata columns. Two container formats per modality:

- REAL raw formats the engine fully decodes (``pcm16``: little-endian
  int16 mono samples; ``rawrgb``: concatenated H×W×3 uint8 frames),
- REAL standard containers/codecs with in-repo pure-python
  implementations (``adpcm``: IMA ADPCM 4-bit, functions/adpcm.py;
  ``wav``: RIFF PCM16, functions/wav.py; ``mjpeg``: length-prefixed
  baseline-JFIF frames, functions/jpeg.py; ``y4m``: YUV4MPEG2 C444,
  functions/y4m.py), and
- an EXTERNAL one (``mp3`` / ``h264``) whose bytes are opaque here —
  the engine's decode step is stubbed for those (no codec libs in the
  container) and emits typed failure rows, which is exactly the
  plumbing a real deployment swaps a decoder into.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def generate_audio(n_clips: int = 24, seed: int = 777) -> pd.DataFrame:
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    for k in range(n_clips):
        sr = int(rng.choice([8000, 16000]))
        n = int(rng.integers(sr // 4, sr))  # 0.25-1.0 s
        t = np.arange(n) / sr
        freq = float(rng.uniform(80, 2000))
        amp = float(rng.uniform(0.1, 0.9))
        wave = amp * np.sin(2 * np.pi * freq * t)
        wave += rng.normal(0, 0.02, n)
        samples = np.clip(np.rint(wave * 32767), -32768, 32767).astype("<i2")
        if k % 6 == 5:
            fmt = "mp3"
        elif k % 3 == 1:
            fmt = "adpcm"
        elif k % 6 == 2:
            fmt = "wav"
        else:
            fmt = "pcm16"
        if fmt == "pcm16":
            body = samples.tobytes()
        elif fmt == "adpcm":
            from ..functions.adpcm import encode_adpcm

            body = encode_adpcm(samples)
        elif fmt == "wav":
            from ..functions.wav import encode_wav

            body = encode_wav(samples, sr)
        else:
            # structurally REAL mp3: valid MPEG-1 Layer III frame
            # headers with undecodable payload — header-metadata
            # extraction works (functions/mp3meta.py), decode stays the
            # typed stub
            from ..functions.mp3meta import build_mp3_frames

            body = build_mp3_frames(n_frames=4 + (k % 3), seed=k)
        rows.append(
            {
                "audio_id": f"aud_{k:06d}",
                "bytes": body,
                "sample_rate": np.int32(sr),
                "n_samples": np.int32(0 if fmt == "mp3" else n),
                "fmt": fmt,
                "caption": f"clip {k} tone {int(freq)}hz",
            }
        )
    return pd.DataFrame(rows)


def generate_video(n_videos: int = 8, seed: int = 888) -> pd.DataFrame:
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    for k in range(n_videos):
        w = int(rng.integers(8, 24))
        h = int(rng.integers(8, 24))
        n_frames = int(rng.integers(4, 12))
        base = rng.integers(0, 256, size=(h, w, 3)).astype(np.int16)
        frames = []
        for f in range(n_frames):
            drift = rng.integers(-3, 4, size=(h, w, 3))
            base = np.clip(base + drift, 0, 255)
            frames.append(base.astype(np.uint8))
        if k % 4 == 3:
            fmt = "h264"
        elif k % 4 == 2:
            fmt = "mjpeg"
        elif k % 4 == 1:
            fmt = "y4m"
        else:
            fmt = "rawrgb"
        if fmt == "rawrgb":
            body = b"".join(f.tobytes() for f in frames)
        elif fmt == "y4m":
            from ..functions.y4m import encode_y4m

            body = encode_y4m(frames, 10)
        elif fmt == "mjpeg":
            import struct

            from ..functions.jpeg import encode_jpeg

            jpegs = [encode_jpeg(f, quality=98) for f in frames]
            body = b"".join(struct.pack("<I", len(j)) + j for j in jpegs)
        else:
            body = rng.bytes(512)
        rows.append(
            {
                "video_id": f"vid_{k:06d}",
                "bytes": body,
                "w": np.int32(w),
                "h": np.int32(h),
                "n_frames": np.int32(0 if fmt == "h264" else n_frames),
                "fps": np.int32(10),
                "fmt": fmt,
                "caption": f"video {k}",
            }
        )
    return pd.DataFrame(rows)
