"""Vectorized codec kernels (pure numpy, no Spark).

These generalize the reference's per-row Python encoders into array kernels:

- zigzag:    /root/reference/mapbox_vector_tile/utils.py:23-32
             ``(n << 1) ^ (n >> 31)`` with hardcoded 32-bit arithmetic shift;
             we reproduce the exact 32-bit wraparound semantics on arrays.
- delta:     /root/reference/mapbox_vector_tile/geom_encoder.py:40-68 keeps a
             running cursor and stores differences; decode is the prefix sum
             (/root/reference/mapbox_vector_tile/decoder.py:126-141).
- varint:    protobuf LEB128 packing of the command stream
             (/root/reference/mapbox_vector_tile/Mapbox/vector_tile.proto:64,
             ``packed=true``); here implemented as a vectorized byte-expansion.
- rle:       the MVT command header ``(length << 3) | cmd`` fuses an opcode
             with a run length (/root/reference/mapbox_vector_tile/
             geom_encoder.py:13-15) — i.e. run-length encoding of the command
             column; here generalized to (value, run_length) streams.
- dict:      per-layer key/value dictionaries + integer index streams
             (/root/reference/mapbox_vector_tile/encoder.py:241-266), with the
             frequency-ordered index optimization of
             /root/reference/mapbox_vector_tile/optimise.py:26-57.
- frame-of-reference: the reference's quantize step subtracts an origin so
             magnitudes shrink (/root/reference/mapbox_vector_tile/
             encoder.py:100-111); FOR stores ``min`` and packs ``v - min``.
- bitpack:   fixed-width packing — the vectorizable alternative to varint.

All kernels are exact inverses (bit-identical round trip) including int32
overflow wraparound at the boundaries.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "zigzag_encode",
    "zigzag_decode",
    "delta_encode",
    "delta_decode",
    "bit_width",
    "bitpack",
    "bitunpack",
    "varint_encode",
    "varint_decode",
    "varint_size",
    "rle_runs",
    "rle_inflate",
    "dict_encode",
    "dict_decode",
]

_U1 = np.uint32(1)
_U32 = np.uint32


# ---------------------------------------------------------------------------
# zigzag (int32 <-> uint32)
# ---------------------------------------------------------------------------

def zigzag_encode(a: np.ndarray) -> np.ndarray:
    """Map int32 -> uint32 so small-magnitude values stay small.

    Exact array analog of ``zig_zag_encode`` (reference utils.py:26):
    ``(n << 1) ^ (n >> 31)`` with 32-bit arithmetic shift.
    """
    a = np.ascontiguousarray(a, dtype=np.int32)
    u = a.view(np.uint32)
    sign = (a >> np.int32(31)).view(np.uint32)  # 0 or 0xFFFFFFFF
    return ((u << _U1) ^ sign).astype(np.uint32, copy=False)


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    """Inverse of :func:`zigzag_encode` (reference utils.py:31-32)."""
    u = np.ascontiguousarray(u, dtype=np.uint32)
    return ((u >> _U1) ^ (np.uint32(0) - (u & _U1))).view(np.int32).copy()


# ---------------------------------------------------------------------------
# delta chaining (int32, wraparound)
# ---------------------------------------------------------------------------

def delta_encode(a: np.ndarray) -> tuple[int, np.ndarray]:
    """Return ``(first_value, deltas)`` with modular int32 differences.

    The reference keeps a running ``(_last_x, _last_y)`` cursor and emits
    differences (geom_encoder.py:40-44,53-68). Wraparound subtraction keeps
    the kernel an exact bijection even across int32 boundaries.
    """
    a = np.ascontiguousarray(a, dtype=np.int32)
    if a.size == 0:
        return 0, a
    u = a.view(np.uint32)
    d = np.empty(a.size - 1, dtype=np.uint32)
    np.subtract(u[1:], u[:-1], out=d)
    return int(a[0]), d.view(np.int32)


def delta_decode(first: int, deltas: np.ndarray) -> np.ndarray:
    """Prefix-sum inverse of :func:`delta_encode` (decoder.py:126-141)."""
    deltas = np.ascontiguousarray(deltas, dtype=np.int32)
    out = np.empty(deltas.size + 1, dtype=np.uint32)
    out[0] = np.uint32(np.int64(first) & 0xFFFFFFFF)
    np.cumsum(deltas.view(np.uint32), dtype=np.uint32, out=out[1:])
    out[1:] += out[0]
    return out.view(np.int32)


# ---------------------------------------------------------------------------
# fixed-width bit packing (uint32 <-> bytes)
# ---------------------------------------------------------------------------

def bit_width(u: np.ndarray | int) -> int:
    """Minimum width in bits needed to represent max(u); 0 for empty/all-zero."""
    if isinstance(u, (int, np.integer)):
        m = int(u)
    else:
        u = np.asarray(u)
        if u.size == 0:
            return 0
        m = int(u.max())
    return m.bit_length()


def bitpack(u: np.ndarray, width: int) -> bytes:
    """Pack uint32 values at ``width`` bits each (MSB-first within a value).

    Lane scheme: 8 consecutive values always occupy exactly ``width`` output
    bytes, and lane ``j``'s bit offset within its group is ``j*width`` —
    byte ``(j*width)//8`` plus ``(j*width)%8`` bits. Each lane is therefore
    one vectorized uint64 shift + byteswap OR-ed into a byte window, an
    8-iteration loop independent of width. (The previous form materialized a
    byte-per-BIT matrix + ``packbits``: ~13 B/value of memory traffic at
    width 12 — measured as 62% of total encode time, and the dominant
    first-touch allocator load on the scaling path.)
    """
    if width == 0 or np.asarray(u).size == 0:
        return b""
    if width > 32:
        raise ValueError(f"width {width} > 32")
    if u.dtype == np.int32:  # same-size reinterpret, no copy
        u = u.view(np.uint32)
    u = np.ascontiguousarray(u, dtype=np.uint32)
    if width == 8:
        return u.astype(np.uint8).tobytes()
    if width == 16:
        return u.astype(">u2").tobytes()
    if width == 32:
        return u.astype(">u4").tobytes()
    n = u.size
    m = (n + 7) // 8
    lanes = np.zeros((m, 8), dtype=np.uint64)
    lanes.reshape(-1)[:n] = u
    if width < 32:
        lanes &= np.uint64((1 << width) - 1)  # match old low-bits truncation
    # accumulate each group's width*8 bits in big-endian uint64 words: lane
    # j's bits sit at [j*width, (j+1)*width), straddling at most two words
    n_words = (8 * width + 63) // 64
    acc = np.zeros((m, n_words), dtype=np.uint64)
    for j in range(8):
        lo_bit = j * width
        w1, r = divmod(lo_bit, 64)
        if r + width <= 64:
            acc[:, w1] |= lanes[:, j] << np.uint64(64 - width - r)
        else:
            acc[:, w1] |= lanes[:, j] >> np.uint64(r + width - 64)
            acc[:, w1 + 1] |= lanes[:, j] << np.uint64(128 - r - width)
    total = (n * width + 7) // 8
    if width % 8 == 0:
        return acc.byteswap().tobytes()[:total]
    return (
        np.ascontiguousarray(acc.byteswap().view(np.uint8)[:, :width])
        .tobytes()[:total]
    )


def bitunpack(buf: bytes | np.ndarray, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`bitpack`; returns uint32 array of length ``n``.

    Same lane scheme as :func:`bitpack`: each lane reads its 8-byte window
    per group as one big-endian uint64, shifts and masks — 8 iterations
    total instead of one fold pass per bit of width.
    """
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint32)
    raw = np.frombuffer(buf, dtype=np.uint8)
    if width == 8:
        return raw[:n].astype(np.uint32)
    if width == 16:
        return raw[: 2 * n].view(">u2").astype(np.uint32)
    if width == 32:
        return raw[: 4 * n].view(">u4").astype(np.uint32)
    m = (n + 7) // 8
    total = (n * width + 7) // 8
    n_words = (8 * width + 63) // 64
    padded = np.zeros(m * width + 8 * n_words, dtype=np.uint8)
    padded[:total] = raw[:total]
    # one strided gather of each group's word window, then pure uint64 math
    win = np.lib.stride_tricks.as_strided(
        padded, shape=(m, 8 * n_words), strides=(width, 1)
    )
    words = (
        np.ascontiguousarray(win).view(np.uint64).reshape(m, n_words).byteswap()
    )
    out = np.empty((m, 8), dtype=np.uint64)
    mask = np.uint64((1 << width) - 1)
    for j in range(8):
        w1, r = divmod(j * width, 64)
        if r + width <= 64:
            out[:, j] = (words[:, w1] >> np.uint64(64 - width - r)) & mask
        else:
            hi = words[:, w1] << np.uint64(r + width - 64)
            lo = words[:, w1 + 1] >> np.uint64(128 - r - width)
            out[:, j] = (hi | lo) & mask
    return out.reshape(-1)[:n].astype(np.uint32)


# ---------------------------------------------------------------------------
# LEB128 varint (uint32/uint64 <-> bytes), vectorized
# ---------------------------------------------------------------------------

_VARINT_BOUNDS = np.array(
    [1 << 7, 1 << 14, 1 << 21, 1 << 28, 1 << 35, 1 << 42, 1 << 49, 1 << 56, 1 << 63],
    dtype=np.uint64,
)


def varint_size(u: np.ndarray) -> int:
    """Total encoded size in bytes (used by the codec selector).

    Computed as n + sum of threshold exceedances — no per-value byte-count
    array is materialized (bandwidth matters: this runs on every chunk)."""
    u = np.asarray(u)
    if u.size == 0:
        return 0
    total = u.size
    hi = int(u.max())
    for b in _VARINT_BOUNDS:
        if hi < int(b):
            break
        total += int(np.count_nonzero(u >= u.dtype.type(b)))
    return total


def varint_encode(u: np.ndarray) -> bytes:
    """LEB128-encode an array of unsigned ints (protobuf ``packed`` format).

    Traffic-minimizing layout: values < 128 emit verbatim low bytes (one
    uint8 pass, the common case for clustered small deltas); otherwise the
    byte planes are laid out as an ``(n, max_b)`` row-major matrix via
    sequential column writes and compacted with ONE boolean take. uint32
    input is encoded natively (the flagship delta+zigzag stream) — no
    uint64 upcast, so shifts read 4 B/value, not 8. Per-value byte counts
    come from ``max_b - 1`` threshold comparisons written straight into the
    keep matrix (a per-value binary search over the bounds table measured
    ~2x the cost of the whole plane loop). The previous per-plane fancy
    scatter (``out[offsets[mask] + j] = ...``) random-wrote the output and
    materialized ~3x more temp bytes per value; the matrix form measured
    ~5x faster at identical output."""
    u = np.asarray(u)
    if u.dtype != np.uint32:
        u = np.ascontiguousarray(u, dtype=np.uint64)
    if u.size == 0:
        return b""
    hi = int(u.max())
    if hi < 0x80:
        return u.astype(np.uint8).tobytes()
    n = u.size
    max_b = int(hi.bit_length() + 6) // 7
    # keep[i, j] == 1 iff value i emits a byte at plane j (j < nbytes_i);
    # plane j carries a continuation bit iff a byte follows: keep[i, j+1].
    # C order so the final compaction is a FLAT 1-D boolean take — 3.5x
    # faster than 2-D mask indexing (measured 52 ms vs 183 ms at 10M
    # values); each plane is built in a contiguous uint8 scratch and
    # stored into its strided column exactly once.
    keep = np.empty((n, max_b), dtype=np.uint8)
    keep[:, 0] = 1
    for j in range(1, max_b):
        np.greater_equal(u, u.dtype.type(1 << (7 * j)), out=keep[:, j])
    mat = np.empty((n, max_b), dtype=np.uint8)
    scratch = np.empty_like(u)
    p8 = np.empty(n, dtype=np.uint8)
    for j in range(max_b):
        if j:
            np.right_shift(u, u.dtype.type(7 * j), out=scratch)
            p8[:] = scratch  # truncating cast keeps the low byte
        else:
            p8[:] = u
        if j < max_b - 1:
            p8 &= np.uint8(0x7F)
            p8 |= keep[:, j + 1] << np.uint8(7)
        mat[:, j] = p8
    return mat.reshape(-1)[keep.reshape(-1).view(bool)].tobytes()


def varint_decode(
    buf: bytes | np.ndarray, n: int, dtype=np.uint64
) -> np.ndarray:
    """Decode ``n`` LEB128 varints; returns an array of ``dtype`` (callers
    that know the values fit 32 bits pass ``np.uint32`` and skip a
    full-width downcast copy). The low-bits stream stays uint8 — only the
    per-plane gathers (which shrink with each plane) are upcast, instead
    of an 8-byte-per-stream-byte copy of the whole buffer."""
    if n == 0:
        return np.zeros(0, dtype=dtype)
    raw = np.frombuffer(buf, dtype=np.uint8)
    ends = np.flatnonzero(raw < 0x80)
    if ends.size < n:
        raise ValueError("truncated varint stream")
    # chunk-sized streams fit int32 offsets: the index arrays are the
    # dominant decode traffic (3 x 8 B/value as int64)
    idx_t = np.int32 if raw.size < (1 << 31) else np.int64
    ends = ends[:n].astype(idx_t, copy=False)
    starts = np.empty(n, dtype=idx_t)
    starts[0] = 0
    np.add(ends[:-1], 1, out=starts[1:])
    nbytes = (ends - starts).astype(np.uint8)  # <= 9 always
    low = raw & np.uint8(0x7F)
    out = low[starts].astype(dtype)
    for j in range(1, int(nbytes.max()) + 1):
        m = nbytes >= j
        out[m] |= low[starts[m] + j].astype(dtype) << dtype(7 * j)
    return out


# ---------------------------------------------------------------------------
# run-length encoding
# ---------------------------------------------------------------------------

def rle_runs(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split ``a`` into ``(run_values, run_lengths)``.

    Generalizes the MVT command header ``(length << 3) | cmd``
    (geom_encoder.py:13-15): one header token per run of equal opcodes.
    """
    a = np.asarray(a)
    if a.size == 0:
        return a[:0], np.zeros(0, dtype=np.int64)
    change = np.flatnonzero(a[1:] != a[:-1]) + 1
    starts = np.concatenate(([0], change))
    lengths = np.diff(np.concatenate((starts, [a.size])))
    return a[starts], lengths


def rle_inflate(values: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Inverse of :func:`rle_runs`."""
    return np.repeat(values, lengths)


# ---------------------------------------------------------------------------
# dictionary encoding (frequency-ordered)
# ---------------------------------------------------------------------------

def dict_encode(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Return ``(table, indices)`` with the dictionary ordered by descending
    frequency (ties broken by ascending value, deterministic).

    Mirrors the reference's per-layer key/value dictionaries
    (encoder.py:241-266) refined by the frequency sort of
    ``StringTableOptimiser._update_table`` (optimise.py:26-48) so hot values
    get small indices.
    """
    a = np.asarray(a)
    vals, inverse, counts = np.unique(a, return_inverse=True, return_counts=True)
    order = np.argsort(-counts, kind="stable")  # vals sorted asc -> stable ties
    table = vals[order]
    rank = np.empty(vals.size, dtype=np.int64)
    rank[order] = np.arange(vals.size)
    return table, rank[inverse]


def dict_decode(table: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Index-gather inverse (decoder.py:33-41): ``table[indices]``."""
    return np.take(table, np.asarray(indices, dtype=np.int64))
