"""Lossless float64 block codec: byte-stream split over the int32 ladder.

The float32 module (``codec/floats.py``) covers embeddings; relational
measure columns (``events.value``) are float64. Same public technique —
BYTE_STREAM_SPLIT (the Parquet encoding, which supports DOUBLE): the
eight byte planes of the IEEE-754 bits separate, and each plane runs
through the integer auto-selector independently. Exponent/sign planes of
real measures are low-cardinality (DICT/RLE), low mantissa planes cost
~8 bits through bit-pack, and any bit pattern (NaN, Inf, -0.0) survives
verbatim — the round-trip is bit identity on the uint64 view.

An F64_RAW fallback stores the bits unsplit; selection is exact-size
minimization with the deterministic lowest-id tie-break, mirroring the
other selectors (``codec/select.py``, ``codec/floats.py``).
"""

from __future__ import annotations

import struct

import numpy as np

from .blocks import decode_block
from .select import encode_auto

F64_RAW = 0
F64_BSS = 1

FLOAT64_MODE_NAMES = {F64_RAW: "f64_raw", F64_BSS: "f64_bss"}

_HDR = struct.Struct("<BI")  # mode, n
_LEN = struct.Struct("<I")


def encode_float64_auto(a: np.ndarray) -> tuple[bytes, int]:
    """Encode a float64 array; returns ``(payload, mode_id)``."""
    a = np.ascontiguousarray(a, dtype=np.float64)
    bits = a.view(np.uint64)
    raw = bits.tobytes()
    frames = []
    for k in range(8):
        plane = ((bits >> np.uint64(8 * k)) & np.uint64(0xFF)).astype(
            np.int32
        )
        f, _ = encode_auto(plane)
        frames.append(f)
    bss = b"".join(_LEN.pack(len(f)) + f for f in frames)
    if len(bss) < len(raw):
        return _HDR.pack(F64_BSS, a.size) + bss, F64_BSS
    return _HDR.pack(F64_RAW, a.size) + raw, F64_RAW


def decode_float64(buf: bytes | memoryview) -> np.ndarray:
    mv = memoryview(buf)
    mode, n = _HDR.unpack_from(mv)
    body = mv[_HDR.size :]
    if mode == F64_RAW:
        return np.frombuffer(body, np.uint64, count=n).view(np.float64).copy()
    if mode != F64_BSS:
        raise ValueError(f"unknown float64 mode {mode}")
    bits = np.zeros(n, np.uint64)
    off = 0
    for k in range(8):
        (flen,) = _LEN.unpack_from(body, off)
        off += _LEN.size
        plane = decode_block(body[off : off + flen])
        off += flen
        bits |= plane.astype(np.uint64) << np.uint64(8 * k)
    return bits.view(np.float64)
