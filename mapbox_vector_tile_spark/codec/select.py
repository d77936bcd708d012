"""Per-chunk codec auto-selection.

Samples the value distribution of a chunk — cardinality, run-length count,
delta-width and value-width stats (the north rule's exact list) — then picks
the codec with the minimum *exactly computed* encoded size, with a
deterministic tie-break. The reference precedent is the usage-count +
frequency-sort optimizer pass (/root/reference/mapbox_vector_tile/
optimise.py:20-57), which rewrites the encoded form to the smaller variant;
here the decision happens inside the encode kernel, so no second pass over
stored data is needed (SURVEY.md §3.3).

A bounded fallback ladder (try chosen codec, validate, fall back to RAW) is
the analog of the reference's bounded geometry-repair retry loop
(/root/reference/mapbox_vector_tile/encoder.py:113-129).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import blocks as B
from . import kernels as K

# Skip the O(n log n) full-uniq dictionary evaluation when a cheap sample says
# cardinality is too high for DICT to win.
_CARD_SAMPLE = 65536
_CARD_SKIP_THRESHOLD = 4096


@dataclass(frozen=True)
class ChunkStats:
    """Distribution stats for one chunk (the codec-selection features)."""

    n: int
    card_estimate: int
    n_runs: int
    width_zz: int        # bit-width of zigzag(values)
    width_range: int     # bit-width of (max - min)
    width_delta_zz: int  # bit-width of zigzag(deltas)
    vmin: int
    vmax: int


def chunk_stats(a: np.ndarray) -> ChunkStats:
    a = np.ascontiguousarray(a, dtype=np.int32)
    n = a.size
    if n == 0:
        return ChunkStats(0, 0, 0, 0, 0, 0, 0, 0)
    vmin = int(a.min())
    vmax = int(a.max())
    zz = K.zigzag_encode(a)
    _, deltas = K.delta_encode(a)
    zzd = K.zigzag_encode(deltas) if deltas.size else np.zeros(0, dtype=np.uint32)
    run_values, _ = K.rle_runs(a)
    sample = a if n <= _CARD_SAMPLE else a[:: max(1, n // _CARD_SAMPLE)]
    card = int(np.unique(sample).size)
    return ChunkStats(
        n=n,
        card_estimate=card,
        n_runs=int(run_values.size),
        width_zz=K.bit_width(zz),
        width_range=K.bit_width(vmax - vmin),
        width_delta_zz=K.bit_width(zzd),
        vmin=vmin,
        vmax=vmax,
    )


def _nbits_bytes(n: int, w: int) -> int:
    return (n * w + 7) // 8


def candidate_sizes(a: np.ndarray, stats: ChunkStats | None = None) -> dict[int, int]:
    """Exact params+payload size per applicable codec (no encoding performed
    except the cheap width/run scans)."""
    a = np.ascontiguousarray(a, dtype=np.int32)
    s = stats or chunk_stats(a)
    n = s.n
    sizes: dict[int, int] = {B.RAW: 4 * n}
    if n == 0:
        return sizes
    if s.vmin == s.vmax:
        sizes[B.CONSTANT] = 4
    sizes[B.BITPACK_ZZ] = 1 + _nbits_bytes(n, s.width_zz)
    sizes[B.FOR_BITPACK] = 9 + _nbits_bytes(n, s.width_range)
    sizes[B.DELTA_ZZ_BITPACK] = 5 + _nbits_bytes(n - 1, s.width_delta_zz)
    sizes[B.DELTA_ZZ_VARINT] = K.varint_size(B._mvt_stream(a).astype(np.uint64))
    # RLE: exact run stream sizes
    vals, lens = K.rle_runs(a)
    lw = K.bit_width((lens - 1).astype(np.uint32))
    vw = K.bit_width((vals.astype(np.int64) - int(vals.min())).astype(np.uint32))
    sizes[B.RLE] = 18 + _nbits_bytes(vals.size, lw) + _nbits_bytes(vals.size, vw)
    # DICT: only evaluate when sampled cardinality is plausibly winning
    if s.card_estimate <= _CARD_SKIP_THRESHOLD:
        table = np.unique(a)
        c = table.size
        tw = K.bit_width((table.astype(np.int64) - int(table[0])).astype(np.uint32))
        iw = K.bit_width(max(c - 1, 0))
        sizes[B.DICT_BITPACK] = 18 + _nbits_bytes(c, tw) + _nbits_bytes(n, iw)
    return sizes


# Deterministic tie-break: cheaper-to-decode codecs first.
_TIE_ORDER = [
    B.CONSTANT,
    B.RAW,
    B.FOR_BITPACK,
    B.BITPACK_ZZ,
    B.DELTA_ZZ_BITPACK,
    B.RLE,
    B.DICT_BITPACK,
    B.DELTA_ZZ_VARINT,
]
_TIE_RANK = {c: i for i, c in enumerate(_TIE_ORDER)}


def choose_codec(a: np.ndarray, stats: ChunkStats | None = None) -> int:
    """Minimum predicted size; ties broken by :data:`_TIE_ORDER`."""
    sizes = candidate_sizes(a, stats)
    return min(sizes, key=lambda c: (sizes[c], _TIE_RANK[c]))


def encode_auto(
    a: np.ndarray, codec: int | str | None = None, validate: bool = False
) -> tuple[bytes, int]:
    """Encode with the chosen (or forced) codec; fall back to RAW on any
    kernel failure or (when ``validate``) round-trip mismatch.

    Returns ``(block_bytes, codec_id_used)``.
    """
    a = np.ascontiguousarray(a, dtype=np.int32)
    if isinstance(codec, str):
        codec = B.CODEC_IDS[codec]
    cid = choose_codec(a) if codec is None else codec
    try:
        blk = B.encode_block(a, cid)
        if validate and not np.array_equal(B.decode_block(blk), a):
            raise ValueError("round-trip mismatch")
        return blk, cid
    except Exception:
        if cid == B.RAW:
            raise
        return B.encode_block(a, B.RAW), B.RAW
