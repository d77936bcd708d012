"""Lossless int64 block codecs: timestamps and wide-id columns.

The integer codec suite (``codec/blocks.py`` / ``codec/select.py``) is
int32-native — the right width for token ids, but table columns like
event timestamps (epoch micros) and 64-bit surrogate keys don't fit. This
module closes the gap with three outer transforms that each REDUCE the
int64 stream to int32 streams and reuse the existing auto-selector, so
every inner stream still gets the full dict/RLE/FOR/varint/bit-pack
ladder:

- ``I64_DELTA32`` — consecutive deltas all fit int32 (dense logs,
  auto-increment ids): one inner frame over the int32 deltas. The
  classic timestamp path (Gorilla's delta-of-delta insight — Pelkonen
  et al., "Gorilla: A Fast, Scalable, In-Memory Time Series Database",
  VLDB 2015, public paper — realized here as delta + the existing
  selector, which applies the second delta itself when it wins).
- ``I64_DELTA_PLANES`` — deltas exceed int32: zigzag64 the deltas and
  split into hi/lo 32-bit planes, each through the selector. For
  near-sorted micros the hi plane is almost constant (RLE/CONSTANT ≈
  free) and only the lo plane pays real bits.
- ``I64_PLANES`` — no useful ordering: zigzag64 of the absolute values,
  hi/lo planes. Narrow-band ids collapse the hi plane the same way.

Selection is exact-size minimization over the representable candidates
with a deterministic tie-break (lowest mode id), mirroring the float
selector (``codec/floats.py``). Decode is the exact inverse; int64
cumsum wraparound matches two's-complement, so the round-trip is
bit-exact for every int64 pattern including extremes.

Reference parity: the reference's command stream is exactly this shape
one level down — zigzag deltas varint-packed
(/root/reference/mapbox_vector_tile/encoder.py:198-214); this lifts the
same transform to 64-bit columns.
"""

from __future__ import annotations

import struct

import numpy as np

from .blocks import decode_block
from .select import encode_auto

I64_DELTA32 = 0
I64_DELTA_PLANES = 1
I64_PLANES = 2

INT64_MODE_NAMES = {
    I64_DELTA32: "i64_delta32",
    I64_DELTA_PLANES: "i64_delta_planes",
    I64_PLANES: "i64_planes",
}

_HDR = struct.Struct("<BIq")  # mode, n, base (first value; 0 for PLANES)
_LEN = struct.Struct("<I")

_U1 = np.uint64(1)
_U32 = np.uint64(32)
_MASK32 = np.uint64(0xFFFFFFFF)
_I32_MIN = -(2**31)
_I32_MAX = 2**31 - 1


def _zigzag64(x: np.ndarray) -> np.ndarray:
    """Map int64 -> uint64 so sign bits don't poison the hi plane."""
    ux = x.astype(np.int64, copy=False).view(np.uint64)
    sign = (x >> np.int64(63)).view(np.uint64)  # 0 or all-ones
    return ((ux << _U1) & np.uint64(0xFFFFFFFFFFFFFFFF)) ^ sign


def _unzigzag64(u: np.ndarray) -> np.ndarray:
    return ((u >> _U1) ^ (np.uint64(0) - (u & _U1))).view(np.int64)


def _planes(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 -> (hi, lo) int32 views of the two 32-bit planes."""
    hi = (u >> _U32).astype(np.uint32).view(np.int32)
    lo = (u & _MASK32).astype(np.uint32).view(np.int32)
    return hi, lo


def _unplanes(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    return (
        (hi.view(np.uint32).astype(np.uint64) << _U32)
        | lo.view(np.uint32).astype(np.uint64)
    )


def _two_frames(a: np.ndarray, b: np.ndarray) -> bytes:
    fa, _ = encode_auto(a)
    fb, _ = encode_auto(b)
    return _LEN.pack(len(fa)) + fa + fb


def encode_int64_auto(a: np.ndarray) -> tuple[bytes, int]:
    """Encode an int64 array into a self-describing frame; returns
    ``(payload, mode_id)``. Exact-size min over representable modes."""
    a = np.ascontiguousarray(a, dtype=np.int64)
    n = a.size
    if n == 0:
        return _HDR.pack(I64_PLANES, 0, 0) + _two_frames(
            np.empty(0, np.int32), np.empty(0, np.int32)
        ), I64_PLANES

    candidates: list[tuple[int, int, bytes]] = []  # (size, mode, body)

    d = np.diff(a)
    if n == 1 or (
        (d >= _I32_MIN).all() and (d <= _I32_MAX).all()
    ):
        inner, _ = encode_auto(d.astype(np.int32))
        candidates.append((len(inner), I64_DELTA32, inner))
    hi, lo = _planes(_zigzag64(d))
    body = _two_frames(hi, lo)
    candidates.append((len(body), I64_DELTA_PLANES, body))
    hi, lo = _planes(_zigzag64(a))
    body = _two_frames(hi, lo)
    candidates.append((len(body), I64_PLANES, body))

    candidates.sort(key=lambda c: (c[0], c[1]))
    size, mode, body = candidates[0]
    base = int(a[0]) if mode != I64_PLANES else 0
    return _HDR.pack(mode, n, base) + body, mode


def decode_int64(buf: bytes | memoryview) -> np.ndarray:
    """Exact inverse of :func:`encode_int64_auto`."""
    mv = memoryview(buf)
    mode, n, base = _HDR.unpack_from(mv)
    body = mv[_HDR.size :]
    if n == 0:
        return np.empty(0, np.int64)
    if mode == I64_DELTA32:
        d = decode_block(body).astype(np.int64)
        out = np.empty(n, np.int64)
        out[0] = base
        if n > 1:
            np.cumsum(d, out=out[1:])
            out[1:] += base
        return out
    (flen,) = _LEN.unpack_from(body)
    off = _LEN.size
    hi = decode_block(body[off : off + flen])
    lo = decode_block(body[off + flen :])
    vals = _unzigzag64(_unplanes(hi, lo))
    if mode == I64_PLANES:
        return vals
    if mode != I64_DELTA_PLANES:
        raise ValueError(f"unknown int64 mode {mode}")
    out = np.empty(n, np.int64)
    out[0] = base
    if n > 1:
        np.cumsum(vals, out=out[1:])
        out[1:] += base
    return out
