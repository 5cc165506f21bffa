"""Minimal pure-Python PNG codec (stdlib ``zlib`` + ``struct`` only).

This container ships no image libraries, but PNG's baseline profile is
simple enough to implement honestly: 8-bit depth, color types 0 (gray),
2 (RGB), 4 (gray+alpha) and 6 (RGBA), no interlacing. That covers every PNG
the multimodal pipeline's fixtures produce and the overwhelming majority of
real-world training-data PNGs; anything outside the profile raises
``ValueError`` with the offending field named.

Decode implements all five baseline scanline filters (None/Sub/Up/Average/
Paeth). Encode writes either filter 0 (fast path) or a caller-chosen filter
type — the latter exists so tests can exercise every decode branch with
real, spec-conformant bytes.

Format reference: the public PNG specification (RFC 2083 / W3C PNG).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (a=left, b=up, c=upleft)."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8 array."""
    if buf[: len(PNG_MAGIC)] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_MAGIC)
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc (crc not verified)
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    nch = _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * nch
    if raw.size != height * (stride + 1):
        raise ValueError("PNG data size mismatch")
    raw = raw.reshape(height, stride + 1)
    filters = raw[:, 0]
    lines = raw[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        f = int(filters[y])
        cur = lines[y]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub: per-lane prefix sum (uint8 cumsum wraps mod 256)
            out[y] = np.cumsum(
                cur.reshape(width, nch), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif f == 2:  # Up
            out[y] = cur + prev
        elif f in (3, 4):  # Average / Paeth: sequential in x, vector per lane
            row = out[y]
            cur2 = cur.reshape(width, nch)
            prev2 = prev.reshape(width, nch)
            row2 = row.reshape(width, nch)
            left = np.zeros(nch, dtype=np.uint8)
            upleft = np.zeros(nch, dtype=np.uint8)
            for x in range(width):
                if f == 3:
                    row2[x] = cur2[x] + (
                        (left.astype(np.int32) + prev2[x].astype(np.int32)) // 2
                    ).astype(np.uint8)
                else:
                    row2[x] = cur2[x] + _paeth(left, prev2[x], upleft)
                left = row2[x]
                upleft = prev2[x]
        else:
            raise ValueError(f"bad PNG filter type {f}")
    return out.reshape(height, width, nch)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w[, channels]) uint8 array -> PNG bytes.

    ``filter_type`` selects the per-scanline filter (0=None default;
    1/2/3/4 = Sub/Up/Average/Paeth) — non-zero types exist to exercise the
    decoder's filter branches with conformant input."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _COLOR_TYPE:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w, nch = a.shape
    color_type = _COLOR_TYPE[nch]
    flat = a.reshape(h, w * nch)
    lines = bytearray()
    prev = np.zeros(w * nch, dtype=np.uint8)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:  # Sub
            left = np.zeros_like(cur)
            left[nch:] = cur[:-nch]
            filt = cur - left
        elif filter_type == 2:  # Up
            filt = cur - prev
        elif filter_type == 3:  # Average
            left = np.zeros_like(cur)
            left[nch:] = cur[:-nch]
            filt = cur - ((left.astype(np.int32) + prev.astype(np.int32)) // 2).astype(
                np.uint8
            )
        elif filter_type == 4:  # Paeth
            left = np.zeros_like(cur)
            left[nch:] = cur[:-nch]
            upleft = np.zeros_like(prev)
            upleft[nch:] = prev[:-nch]
            filt = cur - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"bad filter type {filter_type}")
        lines.append(filter_type)
        lines.extend(filt.tobytes())
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(bytes(lines), 6)
    return PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
