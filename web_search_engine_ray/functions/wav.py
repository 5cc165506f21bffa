"""Minimal pure-Python WAV (RIFF/PCM) codec — stdlib ``struct`` only.

Covers the baseline profile a training-data pipeline actually meets in the
wild: RIFF/WAVE containers with ``fmt `` + ``data`` chunks, PCM
(format tag 1) at 8/16/32-bit integer depth, any channel count / sample
rate. Anything outside the profile (float PCM, ADPCM, extensible headers
beyond tag 1) raises ``ValueError`` naming the field.

Format reference: the public RIFF/WAVE specification (Microsoft/IBM 1991,
widely mirrored; also RFC 2361 for format tags).
"""

from __future__ import annotations

import struct

import numpy as np

_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n_samples, n_channels) int array, sample_rate)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, n_ch, rate, _byte_rate, _align, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag != 1:
        raise ValueError(f"unsupported WAV format tag {tag} (only PCM=1)")
    if bits not in _DTYPES:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    if n_ch == 0:
        raise ValueError("invalid WAV channel count 0")
    samples = np.frombuffer(data, dtype=_DTYPES[bits])
    n = samples.size // n_ch
    return samples[: n * n_ch].reshape(n, n_ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n_samples[, n_channels]) int8/int16/int32 array -> WAV bytes."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.dtype == np.uint8:
        bits = 8
    elif a.dtype == np.int16:
        bits = 16
    elif a.dtype == np.int32:
        bits = 32
    else:
        raise ValueError(f"unsupported sample dtype {a.dtype}")
    n_ch = a.shape[1]
    data = np.ascontiguousarray(a).tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, rate, rate * n_ch * bits // 8, n_ch * bits // 8, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
