"""Audio/video multimodal operators: decode / feature-extract /
frame-sample as Arrow-batched mapInPandas passes.

Same contract as the image layer (operators/multimodal.py): payloads
are opaque ``binary`` columns with typed metadata; the Spark plumbing
(schemas, batching, partition behavior, failure rows) is real and
tested; the decode table carries REAL codecs per modality — raw
(pcm16 / rawrgb), standard containers (RIFF/WAV via functions/wav.py;
YUV4MPEG2 via functions/y4m.py) AND compressed (IMA ADPCM via
functions/adpcm.py; MJPEG via the pure-numpy baseline-JFIF decoder in
functions/jpeg.py) — and STUBS the remaining external formats
(mp3/h264 — no codec
libraries in this container): those rows come back decode_ok=false
with null features, never task failures. A deployment drops
ffmpeg/soundfile into ``_decode_audio`` / ``_iter_frames`` without
touching anything Spark-side.

Features are deterministic and rounded to 4 dp so the DuckDB sidecar
oracle can compare them exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.imageops import phash64

AUDIO_FEATURES_SCHEMA = (
    "audio_id string, fmt string, decode_ok boolean, duration_s double, "
    "rms double, peak double, zero_cross_rate double"
)


def _decode_audio(body: bytes, fmt: str, sample_rate: int) -> np.ndarray:
    """Real decoders for pcm16 + IMA ADPCM; external formats raise
    (the stub point a deployment fills with ffmpeg/soundfile)."""
    if fmt == "pcm16":
        return np.frombuffer(body, dtype="<i2").astype(np.float64) / 32768.0
    if fmt == "adpcm":
        from ..functions.adpcm import decode_adpcm

        return decode_adpcm(body).astype(np.float64) / 32768.0
    if fmt == "wav":
        from ..functions.wav import decode_wav

        return decode_wav(body)[0].astype(np.float64) / 32768.0
    raise NotImplementedError(f"no {fmt} decoder in this environment")


def audio_features(audio: DataFrame) -> DataFrame:
    """Per-clip decode + feature extraction (duration, RMS, peak,
    zero-crossing rate) in one Arrow pass."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):
                out = {
                    "audio_id": r["audio_id"], "fmt": r["fmt"],
                    "decode_ok": False, "duration_s": None, "rms": None,
                    "peak": None, "zero_cross_rate": None,
                }
                try:
                    x = _decode_audio(bytes(r["bytes"]), r["fmt"], int(r["sample_rate"]))
                    n = len(x)
                    out["decode_ok"] = n > 0
                    if n:
                        out["duration_s"] = round(n / int(r["sample_rate"]), 4)
                        out["rms"] = round(float(np.sqrt((x * x).mean())), 4)
                        out["peak"] = round(float(np.abs(x).max()), 4)
                        out["zero_cross_rate"] = round(
                            float((np.diff(np.signbit(x)) != 0).sum() / n), 4
                        )
                except NotImplementedError:
                    pass  # external codec absent → typed failure row
                rows.append(out)
            yield pd.DataFrame(rows, columns=[
                "audio_id", "fmt", "decode_ok", "duration_s", "rms",
                "peak", "zero_cross_rate",
            ])

    return audio.mapInPandas(fn, AUDIO_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = (
    "video_id string, fmt string, frame_ix int, decode_ok boolean, "
    "mean_lum double, frame_phash long"
)


def _iter_frames(body: bytes, fmt: str, w: int, h: int, n_frames: int):
    """Real frame iterators for rawrgb and MJPEG (length-prefixed JFIF
    stream, decoded by the in-repo baseline-JPEG decoder); external
    formats raise (the stub point for an ffmpeg-equipped deployment)."""
    if fmt == "rawrgb":
        sz = w * h * 3
        for f in range(n_frames):
            chunk = body[f * sz : (f + 1) * sz]
            yield np.frombuffer(chunk, np.uint8).reshape(h, w, 3)
        return
    if fmt == "mjpeg":
        import struct

        from ..functions.jpeg import decode_jpeg

        pos = 0
        while pos + 4 <= len(body):
            (ln,) = struct.unpack_from("<I", body, pos)
            yield decode_jpeg(body[pos + 4 : pos + 4 + ln])
            pos += 4 + ln
        return
    if fmt == "y4m":
        from ..functions.y4m import iter_y4m_frames

        yield from iter_y4m_frames(body)
        return
    raise NotImplementedError(f"no {fmt} demuxer in this environment")


def video_frame_sample(video: DataFrame, every_k: int = 2) -> DataFrame:
    """Sample every k-th frame, emit per-frame luminance + phash (the
    fan-out step of a video training pipeline: one input row → many
    frame rows, all inside one Arrow pass — no explode of binary)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):
                try:
                    for ix, frame in enumerate(
                        _iter_frames(bytes(r["bytes"]), r["fmt"], int(r["w"]),
                                     int(r["h"]), int(r["n_frames"]))
                    ):
                        if ix % every_k:
                            continue
                        rows.append({
                            "video_id": r["video_id"], "fmt": r["fmt"],
                            "frame_ix": ix, "decode_ok": True,
                            "mean_lum": round(float(frame.astype(np.float64).mean()), 4),
                            "frame_phash": phash64(frame),
                        })
                except NotImplementedError:
                    rows.append({
                        "video_id": r["video_id"], "fmt": r["fmt"],
                        "frame_ix": -1, "decode_ok": False,
                        "mean_lum": None, "frame_phash": None,
                    })
            out = pd.DataFrame(rows, columns=[
                "video_id", "fmt", "frame_ix", "decode_ok", "mean_lum",
                "frame_phash",
            ])
            # mixed int/None coerces to float64 and destroys the low
            # bits of 64-bit phashes — force nullable Int64 from the
            # raw python values
            out["frame_phash"] = pd.array(
                [r["frame_phash"] for r in rows], dtype="Int64"
            )
            yield out

    return video.mapInPandas(fn, FRAME_SAMPLE_SCHEMA)
