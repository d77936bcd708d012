"""Lossless float64 block codec: byte-stream split over the int32 ladder.

The float32 module (``codec/floats.py``) covers embeddings; relational
measure columns (``events.value``) are float64. Same public technique —
BYTE_STREAM_SPLIT (the Parquet encoding, which supports DOUBLE): the
eight byte planes of the IEEE-754 bits separate, and each plane runs
through the integer auto-selector independently. Exponent/sign planes of
real measures are low-cardinality (DICT/RLE), low mantissa planes cost
~8 bits through bit-pack, and any bit pattern (NaN, Inf, -0.0) survives
verbatim — the round-trip is bit identity on the uint64 view.

F64_ALP adds the decimal-scaling path (same construction as the float32
``codec/floats.py``, after Afroozeh & Boncz, SIGMOD 2024 — public paper):
when every value is exactly ``rint(v * 10^e) / 10^e`` for one shared
exponent, the int64 image runs through the int64 transforms instead —
cents-exact measure columns collapse to a couple of bytes per value.
An F64_RAW fallback stores the bits unsplit; selection is exact-size
minimization with the deterministic lowest-id tie-break, mirroring the
other selectors (``codec/select.py``, ``codec/floats.py``).
"""

from __future__ import annotations

import struct

import numpy as np

from .blocks import decode_block
from .int64 import decode_int64, encode_int64_auto
from .select import encode_auto

F64_RAW = 0
F64_BSS = 1
F64_ALP = 2

FLOAT64_MODE_NAMES = {F64_RAW: "f64_raw", F64_BSS: "f64_bss", F64_ALP: "f64_alp"}

_HDR = struct.Struct("<BI")  # mode, n
_ALP_HDR = struct.Struct("<B")  # decimal exponent
_LEN = struct.Struct("<I")
_MAX_ALP_EXP = 14  # 10^14 nears float64's decimal precision


def _alp_candidate(a: np.ndarray) -> tuple[int, np.ndarray] | None:
    """Smallest decimal exponent ``e`` with ``rint(v * 10^e) / 10^e``
    bit-exact for every value AND the integer image in int64 range —
    lossless or not taken (same contract as the float32 path,
    ``codec/floats.py``). Non-finite values and -0.0 fail the bit compare
    and fall through to BSS."""
    if a.size == 0 or not np.isfinite(a).all():
        return None
    bits = a.view(np.uint64)
    for e in range(_MAX_ALP_EXP + 1):
        m = float(10.0**e)
        x = np.rint(a * m)
        if (np.abs(x) >= 2.0**62).any():
            return None  # image overflows; larger e only grows it
        # verify through the EXACT decode arithmetic (int64 image, not the
        # float rint result): astype(int64) maps -0.0 to 0, so checking
        # `x / m` alone would accept -0.0 and then lose its sign bit
        image = x.astype(np.int64)
        back = image.astype(np.float64) / m
        if np.array_equal(back.view(np.uint64), bits):
            return e, image
    return None


def encode_float64_auto(a: np.ndarray) -> tuple[bytes, int]:
    """Encode a float64 array; returns ``(payload, mode_id)``.
    Exact-size min over RAW / BSS / ALP with the lowest-id tie-break."""
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
    candidates = [(len(raw), F64_RAW, raw), (len(bss), F64_BSS, bss)]
    alp = _alp_candidate(a)
    if alp is not None:
        e, image = alp
        inner, _ = encode_int64_auto(image)
        candidates.append(
            (_ALP_HDR.size + len(inner), F64_ALP, _ALP_HDR.pack(e) + inner)
        )
    candidates.sort(key=lambda c: (c[0], c[1]))
    _, mode, body = candidates[0]
    return _HDR.pack(mode, a.size) + body, mode


def decode_float64(buf: bytes | memoryview) -> np.ndarray:
    mv = memoryview(buf)
    mode, n = _HDR.unpack_from(mv)
    body = mv[_HDR.size :]
    if mode == F64_RAW:
        return np.frombuffer(body, np.uint64, count=n).view(np.float64).copy()
    if mode == F64_ALP:
        (e,) = _ALP_HDR.unpack_from(body)
        image = decode_int64(body[_ALP_HDR.size :])
        return image.astype(np.float64) / float(10.0**e)
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
