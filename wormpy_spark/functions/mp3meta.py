"""MPEG-1 Layer III frame-header metadata (public ISO/IEC 11172-3
layout). Full mp3 DECODE stays a typed stub (no codec libs here), but
a real ingest pipeline extracts duration/bitrate from the frame
headers without decoding — that half is pure header arithmetic and is
implemented for real:

- ``parse_mp3_frames``: walk sync-aligned frame headers → frame count,
  bitrate profile, sample rate, estimated duration
  (frames × 1152 / sample_rate).
- ``build_mp3_frames``: fixture-side writer — emits VALID headers with
  deterministic pseudo-random payload bytes, so the parser is
  exercised against structurally-real mp3 streams while the payload
  stays undecodable (exactly the situation of a stub-codec engine).
"""

from __future__ import annotations

import numpy as np

# MPEG-1 Layer III tables (index 0 = "free", 15 = invalid)
BITRATE_KBPS = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
SAMPLE_RATES = [44100, 48000, 32000]
SAMPLES_PER_FRAME = 1152


def _frame_len(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    return (144 * bitrate_kbps * 1000) // sample_rate + padding


def build_mp3_frames(
    n_frames: int, bitrate_index: int = 9, sr_index: int = 0, seed: int = 0
) -> bytes:
    """Structurally valid MPEG-1 Layer III stream: n_frames frames of
    header + deterministic noise payload (alternating padding bit)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    out = bytearray()
    for i in range(n_frames):
        padding = i & 1
        hdr = (
            (0x7FF << 21)            # sync
            | (0b11 << 19)           # MPEG-1
            | (0b01 << 17)           # Layer III
            | (1 << 16)              # no CRC
            | (bitrate_index << 12)
            | (sr_index << 10)
            | (padding << 9)
            | (0b11 << 6)            # mono
        )
        out += hdr.to_bytes(4, "big")
        body = _frame_len(
            BITRATE_KBPS[bitrate_index], SAMPLE_RATES[sr_index], padding
        ) - 4
        out += rng.bytes(body)
    return bytes(out)


def parse_mp3_frames(data: bytes) -> dict | None:
    """→ {n_frames, bitrate_kbps (mean, 1dp), sample_rate,
    est_duration_s (4dp)} or None if no valid frame is found."""
    pos = 0
    n = 0
    sr = None
    kbps_sum = 0
    while pos + 4 <= len(data):
        hdr = int.from_bytes(data[pos : pos + 4], "big")
        if (hdr >> 21) != 0x7FF:
            break
        version = (hdr >> 19) & 0b11
        layer = (hdr >> 17) & 0b11
        bi = (hdr >> 12) & 0xF
        si = (hdr >> 10) & 0b11
        padding = (hdr >> 9) & 1
        if version != 0b11 or layer != 0b01 or bi in (0, 15) or si == 3:
            break  # only MPEG-1 Layer III with a definite bitrate
        sr = SAMPLE_RATES[si]
        kbps = BITRATE_KBPS[bi]
        kbps_sum += kbps
        n += 1
        pos += _frame_len(kbps, sr, padding)
    if n == 0:
        return None
    return {
        "n_frames": n,
        "bitrate_kbps": round(kbps_sum / n, 1),
        "sample_rate": sr,
        "est_duration_s": round(n * SAMPLES_PER_FRAME / sr, 4),
    }
