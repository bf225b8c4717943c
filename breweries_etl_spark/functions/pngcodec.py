"""Minimal pure-Python PNG codec (stdlib zlib/struct + numpy).

PNG is a public spec (RFC 2083 / W3C PNG); the container lacks
PIL/libvips, but nothing about 8-bit non-interlaced PNG needs them:
chunks are length-tagged, pixel data is zlib-deflated scanlines with
five per-row predictor filters. This codec supports the subset the
multimodal fixtures use — bit depth 8, color types 0 (gray), 2 (RGB),
6 (RGBA), no interlace — and decodes ALL five scanline filters so it
reads PNGs produced by standard encoders, not just its own output.

Deliberately deterministic: encode always emits filter 0 rows and a
fixed zlib level, so identical pixels → identical bytes (stable
fixtures, content-hashable outputs).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(tag + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", crc)


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 array (h, w) | (h, w, 1|3|4) → PNG bytes (filter 0 rows,
    zlib level 6 — deterministic)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch} (want 1, 3, or 4)")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w, channels). Supports bit depth 8,
    color types 0/2/6, non-interlaced, all five scanline filters."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color_type={color_type}, "
            f"interlace={interlace}); this codec handles 8-bit 0/2/6 non-interlaced"
        )
    ch = _CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has wrong length")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        base = y * (stride + 1)
        ftype = raw[base]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=base + 1).copy()
        if ftype == 0:
            row = line
        elif ftype == 1:  # Sub: sequential in x, vectorized across channels
            row = line
            for x in range(ch, stride):
                row[x] = (int(row[x]) + int(row[x - ch])) & 0xFF
        elif ftype == 2:  # Up
            row = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            row = line
            for x in range(stride):
                left = int(row[x - ch]) if x >= ch else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            row = line
            for x in range(stride):
                left = int(row[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                row[x] = (int(row[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = row
        prev = out[y]
    return out.reshape(h, w, ch)


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample: source index =
    floor(dst * src / dst_total) — pure integer arithmetic, so any
    engine (including a SQL oracle) reproduces pixel selection exactly."""
    arr = np.asarray(pixels)
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]
