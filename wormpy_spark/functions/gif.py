"""GIF89a codec, pure Python/numpy — the public CompuServe spec
(variable-width LSB-first LZW over palette indices). Gives the image
pipeline a real palette-based format beside BMP/PNG/JPEG: GIF is
byte-exact on images with ≤256 distinct colors (which is the only kind
a real GIF encoder emits — quantization happens before the container),
so the fixture generator posterizes to a 252-color grid first and the
codec round-trips losslessly from there.

Single-frame, global color table, no interlace/transparency — the
subset every decoder must support.
"""

from __future__ import annotations

import struct

import numpy as np


def posterize252(pixels: np.ndarray) -> np.ndarray:
    """Quantize RGB to a 6×7×6-level grid (≤252 distinct colors) — the
    palette-quantization step a real GIF encoder performs before LZW.
    Levels are spread to preserve 0 and 255 exactly."""
    out = np.empty_like(pixels)
    for c, levels in ((0, 6), (1, 7), (2, 6)):
        q = np.rint(pixels[:, :, c].astype(np.float64) * (levels - 1) / 255.0)
        out[:, :, c] = np.rint(q * 255.0 / (levels - 1)).astype(np.uint8)
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-flavor LZW: variable code width, LSB-first bit packing,
    dictionary reset at 4096 codes via the clear code."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix: tuple = ()
    for sym in indices.tolist():
        cand = prefix + (sym,)
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = (sym,)
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                return eoi  # truncated stream → stop
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    out: list[int] = []
    table: list[list[int]] = []
    width = min_code_size + 1
    prev: list[int] | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + [entry[0]])
        else:  # the KwKwK case
            entry = prev + [prev[0]]
            table.append(entry)
        out.extend(entry)
        if prev is not None and len(table) >= (1 << width) and width < 12:
            width += 1
        prev = entry
    return out


def encode_gif(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    n = len(palette)
    assert n <= 256, f"GIF needs <=256 distinct colors, got {n} (posterize first)"
    # color table size: power of two >= max(n, 2); >= 4 entries so the
    # LZW min code size is >= 2 as the spec requires
    ct_bits = max(2, int(np.ceil(np.log2(max(n, 2)))))
    ct_size = 1 << ct_bits
    table = np.zeros((ct_size, 3), dtype=np.uint8)
    table[:n] = palette
    min_code_size = ct_bits
    lzw = _lzw_encode(indices.astype(np.int64), min_code_size)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    # logical screen descriptor flags: GCT present | 8-bit color res | GCT size
    flags = 0x80 | 0x70 | (ct_bits - 1)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, flags, 0, 0)
        + table.tobytes()
        + struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
        + bytes([min_code_size])
        + bytes(blocks)
        + b"\x3b"
    )


def decode_gif(data: bytes) -> np.ndarray:
    assert data[:6] in (b"GIF89a", b"GIF87a"), "not a GIF"
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    table = None
    if flags & 0x80:
        ct_size = 1 << ((flags & 0x07) + 1)
        table = np.frombuffer(data, np.uint8, ct_size * 3, pos).reshape(-1, 3)
        pos += ct_size * 3
    while pos < len(data):
        block = data[pos]
        if block == 0x2C:  # image descriptor
            _x, _y, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            assert not (iflags & 0x40), "interlaced GIF not supported"
            if iflags & 0x80:  # local color table
                ct_size = 1 << ((iflags & 0x07) + 1)
                table = np.frombuffer(
                    data, np.uint8, ct_size * 3, pos
                ).reshape(-1, 3)
                pos += ct_size * 3
            min_code_size = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            indices = _lzw_decode(bytes(lzw), min_code_size)
            assert table is not None, "GIF image without a color table"
            arr = table[np.asarray(indices[: iw * ih], dtype=np.int64)]
            return arr.reshape(ih, iw, 3).copy()
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")
