"""Per-chunk token Bloom filters: membership pruning for codecs whose
parameters carry no value bound.

:mod:`.search` prunes dict/FOR/zigzag/RLE chunks from their own codec
metadata, but ``DELTA_*`` / ``RAW`` chunks are opaque — a probe must decode
them. A small Bloom filter built once per chunk (the Parquet column-index
bloom analog, applied to this engine's blocks) closes that gap: no false
negatives ever (correctness stays exact), ~1% false positives at the
default 10 bits per distinct value, and chunks whose distinct count would
saturate the size cap simply store no filter (``None``) rather than a
useless always-maybe one — the same store-only-when-selective rule Parquet
writers apply.

Blob layout: 1 header byte (k = number of probes) + the bit array. All
hashing is vectorized uint64 multiply-xor-shift (splitmix64-style mixing,
public-domain construction) with double hashing for the k probes — one
``np.unique`` + O(k · distinct) work per chunk at build, O(k) per chunk at
query.
"""

from __future__ import annotations

import numpy as np

_M1 = np.uint64(0x9E3779B97F4A7C15)
_M2 = np.uint64(0xFF51AFD7ED558CCD)
_M3 = np.uint64(0xC2B2AE3D27D4EB4F)
DEFAULT_K = 4
DEFAULT_BITS_PER_VALUE = 10
DEFAULT_MAX_BYTES = 8192


def _mix(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 hash pair per value; h2 forced odd for double
    hashing so the k probe positions never degenerate."""
    h1 = u * _M1
    h1 ^= h1 >> np.uint64(33)
    h1 *= _M2
    h1 ^= h1 >> np.uint64(29)
    h2 = (u * _M3) | np.uint64(1)
    return h1, h2


def _as_u64(values: np.ndarray, wide: bool = False) -> np.ndarray:
    """uint64 image of the values; ``wide`` treats them as int64 (table-
    store zone-map domains: int64 ids, epoch micros, unscaled decimals,
    float sort keys) instead of the token path's int32."""
    if wide:
        return np.ascontiguousarray(values, np.int64).view(np.uint64)
    return np.ascontiguousarray(values, np.int32).view(np.uint32).astype(np.uint64)


def build_bloom(
    values: np.ndarray,
    bits_per_value: int = DEFAULT_BITS_PER_VALUE,
    max_bytes: int = DEFAULT_MAX_BYTES,
    k: int = DEFAULT_K,
    wide: bool = False,
) -> bytes | None:
    """Bloom blob over the distinct values of one chunk, or ``None`` when
    the distinct count would need more than ``max_bytes`` to stay at
    ``bits_per_value`` (a saturated filter answers "maybe" always — storing
    it would be pure overhead)."""
    uniq = np.unique(
        np.ascontiguousarray(values, np.int64 if wide else np.int32)
    )
    if uniq.size == 0:
        return None
    need = uniq.size * bits_per_value
    if need > max_bytes * 8:
        return None
    n_bits = 256
    while n_bits < need:
        n_bits <<= 1
    buf = np.zeros(n_bits >> 3, dtype=np.uint8)
    h1, h2 = _mix(_as_u64(uniq, wide))
    nb = np.uint64(n_bits)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % nb
        np.bitwise_or.at(buf, (idx >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1), (idx & np.uint64(7)).astype(np.uint8)))
    return bytes([k]) + buf.tobytes()


def might_contain(blob, x: int, wide: bool = False) -> bool:
    """False -> ``x`` is definitely absent from the chunk (no false
    negatives); True -> must check the payload."""
    if blob is None:
        return True
    view = memoryview(blob)
    k = view[0]
    bits = np.frombuffer(view, dtype=np.uint8, offset=1)
    n_bits = bits.size << 3
    h1, h2 = _mix(_as_u64(np.array([x]), wide))
    h1i, h2i = int(h1[0]), int(h2[0])
    for i in range(k):
        # python-int arithmetic masked to 64 bits: must wrap exactly like
        # the vectorized uint64 build path
        idx = ((h1i + i * h2i) & 0xFFFFFFFFFFFFFFFF) % n_bits
        if not (bits[idx >> 3] >> (idx & 7)) & 1:
            return False
    return True
