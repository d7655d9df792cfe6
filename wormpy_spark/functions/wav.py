"""RIFF/WAVE container, PCM 16-bit mono — the public Microsoft/IBM
spec. The most common uncompressed real-world audio container; parsing
it (rather than assuming bare samples) is what a production ingest
actually does.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """samples: int16 mono → canonical 44-byte-header WAVE file."""
    body = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * 2
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(body), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, byte_rate, 2, 16
        )
        + struct.pack("<4sI", b"data", len(body))
        + body
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """→ (int16 mono samples, sample_rate). Walks RIFF chunks, so
    files with extra chunks (LIST/fact/...) parse too."""
    riff, _size, wave = struct.unpack_from("<4sI4s", data, 0)
    assert riff == b"RIFF" and wave == b"WAVE", "not a WAVE file"
    pos = 12
    sample_rate = None
    samples = None
    while pos + 8 <= len(data):
        tag, ln = struct.unpack_from("<4sI", data, pos)
        pos += 8
        if tag == b"fmt ":
            fmt_code, channels, sr, _br, _align, bits = struct.unpack_from(
                "<HHIIHH", data, pos
            )
            assert fmt_code == 1, "only PCM wav supported"
            assert channels == 1 and bits == 16, "only 16-bit mono supported"
            sample_rate = sr
        elif tag == b"data":
            samples = np.frombuffer(data, "<i2", ln // 2, pos).copy()
        pos += ln + (ln & 1)  # chunks are word-aligned
    assert sample_rate is not None and samples is not None, "missing chunks"
    return samples, sample_rate
