"""Lossless float32 block codecs for embedding columns.

Extends the integer codec suite (dict / RLE / FSST / bit-pack / FOR —
``codec/blocks.py``) to the ``array<float>`` embedding tables a training
pipeline stores next to its token sequences. Two public techniques, both
fully vectorized and both reusing the existing int32 machinery:

- ``F_ALP`` — adaptive lossless decimal scaling in the style of ALP
  (Afroozeh & Boncz, "ALP: Adaptive Lossless floating-Point compression",
  SIGMOD 2024; public paper, no code consulted): when every value in the
  block is exactly representable as ``round(v * 10^e) / 10^e`` for one
  shared decimal exponent ``e``, the block is stored as int32 through the
  auto-selected integer codec suite (quantized / decimal data collapses
  to a few bits per value). Exactness is verified bit-for-bit, so the
  path is lossless or not taken at all.
- ``F_BSS`` — byte-stream split (the technique behind Parquet's
  BYTE_STREAM_SPLIT encoding): the four byte planes of the IEEE-754
  bits are separated and each plane runs through the integer codec
  auto-selector independently. Sign/exponent planes of real-world
  embeddings are low-cardinality (DICT / RLE win); mantissa planes fall
  back to bit-pack or RAW. Works for any bit pattern (NaN, Inf, -0.0).

``F_RAW`` stores verbatim bits. Selection is exact-size minimization with
a deterministic tie-break (lowest codec id), mirroring the int selector
(``codec/select.py``). The reference precedent for per-block re-selection
is the usage-count optimizer pass
(/root/reference/mapbox_vector_tile/optimise.py:20-57).
"""

from __future__ import annotations

import struct

import numpy as np

from . import blocks as B
from . import select as S

F_RAW = 0
F_BSS = 1
F_ALP = 2

FLOAT_CODEC_NAMES = {F_RAW: "f_raw", F_BSS: "f_bss", F_ALP: "f_alp"}

_HDR = struct.Struct("<BI")  # codec id, n values
_LEN = struct.Struct("<I")
_MAX_ALP_EXP = 7  # 10^7 already exceeds float32's decimal precision


def _alp_candidate(a: np.ndarray) -> tuple[int, np.ndarray] | None:
    """Smallest decimal exponent ``e`` such that every value round-trips
    ``(rint(v * 10^e)) / 10^e`` bit-exactly, with the int32 image — or
    None. All checks are whole-array vectorized; non-finite values and
    -0.0 fail the bit comparison and fall through to BSS."""
    if a.size == 0 or not np.isfinite(a).all():
        return None
    x = a.astype(np.float64)
    bits = a.view(np.uint32)
    for e in range(_MAX_ALP_EXP + 1):
        m = float(10.0**e)
        v = np.rint(x * m)
        if np.abs(v).max() > np.iinfo(np.int32).max:
            return None  # |v| grows with e; larger exponents only worsen
        # verify through the EXACT decode arithmetic (int32 image, not the
        # float rint result): astype(int32) maps -0.0 to 0, so checking
        # `v / m` alone would accept -0.0 and then lose its sign bit
        image = v.astype(np.int32)
        back = (image.astype(np.float64) / m).astype(np.float32)
        if np.array_equal(back.view(np.uint32), bits):
            return e, image
    return None


def encode_float_block(a: np.ndarray) -> bytes:
    """Encode one float32 block; exact-size minimum of RAW / BSS / ALP."""
    a = np.ascontiguousarray(a, dtype=np.float32)
    n = int(a.size)
    candidates: dict[int, bytes] = {F_RAW: a.tobytes()}
    if n:
        alp = _alp_candidate(a)
        if alp is not None:
            e, ints = alp
            blob, _ = S.encode_auto(ints)
            candidates[F_ALP] = struct.pack("<B", e) + blob
        u = a.view(np.uint32)
        planes = [((u >> (8 * k)) & 0xFF).astype(np.int32) for k in range(4)]
        bss = b"".join(
            _LEN.pack(len(blob)) + blob
            for blob in (S.encode_auto(p)[0] for p in planes)
        )
        candidates[F_BSS] = bss
    cid = min(candidates, key=lambda c: (len(candidates[c]), c))
    return _HDR.pack(cid, n) + candidates[cid]


def decode_float_block(blob: bytes) -> np.ndarray:
    """Inverse of :func:`encode_float_block`; returns float32, bit-exact."""
    cid, n = _HDR.unpack_from(blob, 0)
    off = _HDR.size
    if cid == F_RAW:
        return np.frombuffer(blob, dtype=np.float32, count=n, offset=off)
    if cid == F_ALP:
        e = blob[off]
        ints = B.decode_block(blob[off + 1 :])
        if ints.size != n:
            raise ValueError(f"ALP length mismatch: {ints.size} != {n}")
        return (
            (ints.astype(np.float64) / float(10.0**e)).astype(np.float32)
        )
    if cid == F_BSS:
        u = np.zeros(n, dtype=np.uint32)
        for k in range(4):
            (ln,) = _LEN.unpack_from(blob, off)
            off += _LEN.size
            plane = B.decode_block(blob[off : off + ln])
            if plane.size != n:
                raise ValueError(
                    f"BSS plane {k} length mismatch: {plane.size} != {n}"
                )
            off += ln
            u |= (plane.astype(np.uint32) & 0xFF) << (8 * k)
        return u.view(np.float32)
    raise ValueError(f"unknown float codec id {cid}")


def float_block_codec(blob: bytes) -> str:
    """Codec name stored in a float block's header (for metrics rows)."""
    return FLOAT_CODEC_NAMES[_HDR.unpack_from(blob, 0)[0]]
