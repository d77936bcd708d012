"""Codec-aware aggregate pushdown: count/sum/min/max INSIDE encoded blocks.

The aggregation sibling of :mod:`.search`: a stats scan over the blocks
table should touch O(codec metadata) bytes wherever the codec already
carries the answer, never inflating the value stream just to reduce it —
the same economics as Parquet column statistics, except these are computed
*from the payload's own parameters* so they need no extra storage:

- ``CONSTANT``   — closed form: ``(n, n·v, v, v)``; zero bytes decoded.
- ``RLE``        — O(runs): ``sum = Σ value·len`` over the run-value
  stream; min/max over run values. ``decoded`` stays 0 (runs ≪ n by the
  codec-selection contract).
- ``DICT_BITPACK`` — min/max from the value table alone, O(table); the
  sum needs the code histogram, a ``bincount`` over the O(n) index stream
  (skipped entirely when the caller doesn't ask for sums).
- ``DICT_ESCAPE``  — min/max from table + escape stream, O(table+escapes);
  sum decodes the code stream.
- ``FOR_BITPACK`` / ``BITPACK_ZZ`` — sums/extrema over the relative or
  zigzag stream (O(n), but never reconstructing the absolute array when
  only the relative reduction is needed: ``sum = n·lo + Σ rel``).
- ``DELTA_*`` / ``RAW`` — full decode (params carry no value content).
- ``PAGED``      — recurse per self-describing page; pruned pages
  contribute their closed forms.

Every function returns ``(n, sum|None, min|None, max|None, decoded)``;
``decoded`` counts O(n_values)-proportional materializations — the number
a 100 TB stats scan minimizes and the tests assert on. All arithmetic is
int64-exact (token values are int32; 2^31·n fits int64 far beyond any
single chunk's size).
"""

from __future__ import annotations

import numpy as np

from . import kernels as K
from .blocks import (
    BITPACK_ZZ,
    CONSTANT,
    DELTA_ZZ_BITPACK,
    DELTA_ZZ_VARINT,
    DICT_BITPACK,
    DICT_ESCAPE,
    FOR_BITPACK,
    FOR_PATCH,
    MAGIC,
    PAGED,
    RAW,
    RLE,
    VERSION,
    _BPZZ,
    _CONST,
    _DESC,
    _DICT,
    _FOR,
    _HDR,
    _PFOR,
    _PGD,
    _RLE,
    _DECODERS,
    _nbytes,
)

Stats = tuple[int, int | None, int | None, int | None, int]

_EMPTY: Stats = (0, 0, None, None, 0)


def value_stats(buf: bytes | memoryview, need_sum: bool = True) -> Stats:
    """``(n, sum, min, max, values_decoded)`` of one framed block."""
    mv = memoryview(buf)
    magic, version, codec_id, n = _HDR.unpack_from(mv)
    if magic != MAGIC:
        raise ValueError(f"bad block magic {magic!r}")
    if version != VERSION:
        raise ValueError(f"unsupported block version {version}")
    if n == 0:
        return _EMPTY
    return _STATS_BODY[codec_id](mv[_HDR.size :], n, need_sum)


def _from_array(a: np.ndarray, n: int) -> Stats:
    a64 = a.astype(np.int64)
    return n, int(a64.sum()), int(a64.min()), int(a64.max()), n


def _stats_decode(codec_id: int):
    def fn(body: memoryview, n: int, need_sum: bool) -> Stats:
        return _from_array(_DECODERS[codec_id](body, n), n)

    return fn


def _stats_const(body: memoryview, n: int, need_sum: bool) -> Stats:
    (v,) = _CONST.unpack_from(body)
    return n, n * v, v, v, 0


def _stats_bitpack_zz(body: memoryview, n: int, need_sum: bool) -> Stats:
    (w,) = _BPZZ.unpack_from(body)
    zz = K.bitunpack(body[_BPZZ.size :], w, n)
    vals = K.zigzag_decode(zz).astype(np.int64)
    return n, int(vals.sum()), int(vals.min()), int(vals.max()), n


def _stats_for_bitpack(body: memoryview, n: int, need_sum: bool) -> Stats:
    lo, w = _FOR.unpack_from(body)
    rel = K.bitunpack(body[_FOR.size :], w, n).astype(np.int64)
    # absolute array never built: reductions over the relative stream + lo
    return (
        n,
        n * lo + int(rel.sum()),
        lo + int(rel.min()),
        lo + int(rel.max()),
        n,
    )


def _stats_rle(body: memoryview, n: int, need_sum: bool) -> Stats:
    r, lw, vmin, vw = _RLE.unpack_from(body)
    off = _RLE.size
    lens_end = off + _nbytes(r, lw)
    lens = K.bitunpack(body[off:lens_end], lw, r).astype(np.int64) + 1
    vals = vmin + K.bitunpack(body[lens_end:], vw, r).astype(np.int64)
    return (
        n,
        int((vals * lens).sum()),
        int(vals.min()),
        int(vals.max()),
        0,
    )


def _stats_dict_bitpack(body: memoryview, n: int, need_sum: bool) -> Stats:
    c, tmin, tw, iw = _DICT.unpack_from(body)
    off = _DICT.size
    table = tmin + K.bitunpack(body[off : off + _nbytes(c, tw)], tw, c).astype(
        np.int64
    )
    mn, mx = int(table.min()), int(table.max())
    if not need_sum:
        return n, None, mn, mx, 0
    idx = K.bitunpack(body[off + _nbytes(c, tw) :], iw, n)
    counts = np.bincount(idx.astype(np.int64), minlength=c)[:c]
    return n, int((table * counts).sum()), mn, mx, n


def _stats_dict_escape(body: memoryview, n: int, need_sum: bool) -> Stats:
    k, c, n_esc, hmin, hw, emin, ew = _DESC.unpack_from(body)
    off = _DESC.size
    head_end = off + _nbytes(c, hw)
    codes_end = head_end + _nbytes(n, k)
    table = hmin + K.bitunpack(body[off:head_end], hw, c).astype(np.int64)
    mn, mx = int(table.min()), int(table.max())
    esc = None
    if n_esc:
        esc = emin + K.bitunpack(body[codes_end:], ew, n_esc).astype(np.int64)
        mn, mx = min(mn, int(esc.min())), max(mx, int(esc.max()))
    if not need_sum:
        return n, None, mn, mx, 0
    codes = K.bitunpack(body[head_end:codes_end], k, n).astype(np.int64)
    esc_code = (1 << k) - 1
    counts = np.bincount(codes, minlength=esc_code + 1)
    s = int((table * counts[:c]).sum())
    if esc is not None:
        s += int(esc.sum())
    return n, s, mn, mx, n


def _stats_for_patch(body: memoryview, n: int, need_sum: bool) -> Stats:
    lo, w, n_exc, pos_w, ew = _PFOR.unpack_from(body)
    off = _PFOR.size
    rel = K.bitunpack(body[off : off + _nbytes(n, w)], w, n).astype(np.int64)
    if n_exc:
        off += _nbytes(n, w)
        pos = K.bitunpack(
            body[off : off + _nbytes(n_exc, pos_w)], pos_w, n_exc
        ).astype(np.int64)
        off += _nbytes(n_exc, pos_w)
        exc = K.bitunpack(body[off:], ew, n_exc).astype(np.int64) + (1 << w)
        rel[pos] = exc
    # reductions over the patched relative stream; absolute array never built
    return (
        n,
        n * lo + int(rel.sum()),
        lo + int(rel.min()),
        lo + int(rel.max()),
        n,
    )


def _stats_paged(body: memoryview, n: int, need_sum: bool) -> Stats:
    _, n_pages = _PGD.unpack_from(body)
    off = _PGD.size
    lens = np.frombuffer(body, dtype="<u4", count=n_pages, offset=off)
    off += 4 * n_pages
    total = s = decoded = 0
    mn = mx = None
    have_sum = True
    for ln in lens:
        frame = body[off : off + int(ln)]
        off += int(ln)
        pn, ps, pmn, pmx, pd = value_stats(frame, need_sum)
        total += pn
        decoded += pd
        if ps is None:
            have_sum = False
        elif have_sum:
            s += ps
        if pmn is not None:
            mn = pmn if mn is None else min(mn, pmn)
            mx = pmx if mx is None else max(mx, pmx)
    return total, (s if have_sum and need_sum else None), mn, mx, decoded


_STATS_BODY = {
    RAW: _stats_decode(RAW),
    CONSTANT: _stats_const,
    BITPACK_ZZ: _stats_bitpack_zz,
    FOR_BITPACK: _stats_for_bitpack,
    DELTA_ZZ_BITPACK: _stats_decode(DELTA_ZZ_BITPACK),
    DELTA_ZZ_VARINT: _stats_decode(DELTA_ZZ_VARINT),
    RLE: _stats_rle,
    DICT_BITPACK: _stats_dict_bitpack,
    DICT_ESCAPE: _stats_dict_escape,
    PAGED: _stats_paged,
    FOR_PATCH: _stats_for_patch,
}


def distinct_values(buf: bytes | memoryview) -> tuple[np.ndarray, int]:
    """Sorted distinct int32 values of one framed block + values decoded.

    The COUNT(DISTINCT) pushdown primitive: dictionary chunks return their
    value table (O(table), zero stream decode), RLE returns unique run
    values, CONSTANT its single value — only param-opaque codecs inflate.
    """
    mv = memoryview(buf)
    magic, version, codec_id, n = _HDR.unpack_from(mv)
    if magic != MAGIC:
        raise ValueError(f"bad block magic {magic!r}")
    if version != VERSION:
        raise ValueError(f"unsupported block version {version}")
    if n == 0:
        return np.empty(0, np.int32), 0
    body = mv[_HDR.size :]
    if codec_id == CONSTANT:
        (v,) = _CONST.unpack_from(body)
        return np.array([v], np.int32), 0
    if codec_id == RLE:
        r, lw, vmin, vw = _RLE.unpack_from(body)
        off = _RLE.size
        lens_end = off + _nbytes(r, lw)
        vals = vmin + K.bitunpack(body[lens_end:], vw, r).astype(np.int64)
        return np.unique(vals).astype(np.int32), 0
    if codec_id == DICT_BITPACK:
        c, tmin, tw, _iw = _DICT.unpack_from(body)
        off = _DICT.size
        table = tmin + K.bitunpack(
            body[off : off + _nbytes(c, tw)], tw, c
        ).astype(np.int64)
        # every table entry occurs (frequency-ordered build contract)
        return np.sort(table).astype(np.int32), 0
    if codec_id == DICT_ESCAPE:
        k, c, n_esc, hmin, hw, emin, ew = _DESC.unpack_from(body)
        off = _DESC.size
        head_end = off + _nbytes(c, hw)
        codes_end = head_end + _nbytes(n, k)
        table = hmin + K.bitunpack(body[off:head_end], hw, c).astype(np.int64)
        if n_esc:
            esc = emin + K.bitunpack(body[codes_end:], ew, n_esc).astype(
                np.int64
            )
            table = np.concatenate([table, esc])
        return np.unique(table).astype(np.int32), (n_esc if n_esc else 0)
    if codec_id == PAGED:
        _, n_pages = _PGD.unpack_from(body)
        off = _PGD.size
        lens = np.frombuffer(body, dtype="<u4", count=n_pages, offset=off)
        off += 4 * n_pages
        parts = []
        decoded = 0
        for ln in lens:
            frame = body[off : off + int(ln)]
            off += int(ln)
            vals, dec = distinct_values(frame)
            parts.append(vals)
            decoded += dec
        return np.unique(np.concatenate(parts)), decoded
    return np.unique(_DECODERS[codec_id](body, n)), n


def range_histogram(
    buf: bytes | memoryview, lo: int, hi: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """``(values, counts, values_decoded)`` for ``lo <= value <= hi``.

    The GROUP-BY-value pushdown primitive (vocabulary-distribution audits):
    RLE aggregates run lengths by run value (O(runs)), CONSTANT is closed
    form, dictionaries bincount their code stream against an in-range code
    mask without rebuilding values, FOR histograms the relative stream.
    ``values`` is sorted ascending; counts are exact.
    """
    lo, hi = int(lo), int(hi)
    mv = memoryview(buf)
    magic, version, codec_id, n = _HDR.unpack_from(mv)
    if magic != MAGIC:
        raise ValueError(f"bad block magic {magic!r}")
    if version != VERSION:
        raise ValueError(f"unsupported block version {version}")
    empty = (np.empty(0, np.int64), np.empty(0, np.int64), 0)
    if n == 0 or hi < lo:
        return empty
    body = mv[_HDR.size :]
    if codec_id == CONSTANT:
        (v,) = _CONST.unpack_from(body)
        if lo <= v <= hi:
            return np.array([v], np.int64), np.array([n], np.int64), 0
        return empty
    if codec_id == RLE:
        r, lw, vmin, vw = _RLE.unpack_from(body)
        off = _RLE.size
        lens_end = off + _nbytes(r, lw)
        vals = vmin + K.bitunpack(body[lens_end:], vw, r).astype(np.int64)
        m = (vals >= lo) & (vals <= hi)
        if not m.any():
            return empty
        lens = K.bitunpack(body[off:lens_end], lw, r).astype(np.int64) + 1
        uv, inv = np.unique(vals[m], return_inverse=True)
        counts = np.zeros(uv.size, np.int64)
        np.add.at(counts, inv, lens[m])
        return uv, counts, 0
    if codec_id == DICT_BITPACK:
        c, tmin, tw, iw = _DICT.unpack_from(body)
        off = _DICT.size
        table = tmin + K.bitunpack(
            body[off : off + _nbytes(c, tw)], tw, c
        ).astype(np.int64)
        in_range = (table >= lo) & (table <= hi)
        if not in_range.any():
            return empty
        idx = K.bitunpack(body[off + _nbytes(c, tw) :], iw, n)
        code_counts = np.bincount(idx.astype(np.int64), minlength=c)[:c]
        keep = in_range & (code_counts > 0)
        order = np.argsort(table[keep], kind="stable")
        return table[keep][order], code_counts[keep][order], n
    if codec_id == PAGED:
        _, n_pages = _PGD.unpack_from(body)
        off = _PGD.size
        lens = np.frombuffer(body, dtype="<u4", count=n_pages, offset=off)
        off += 4 * n_pages
        acc: dict[int, int] = {}
        decoded = 0
        for ln in lens:
            frame = body[off : off + int(ln)]
            off += int(ln)
            uv, cnt, dec = range_histogram(frame, lo, hi)
            decoded += dec
            for v, c_ in zip(uv.tolist(), cnt.tolist()):
                acc[v] = acc.get(v, 0) + c_
        if not acc:
            return np.empty(0, np.int64), np.empty(0, np.int64), decoded
        keys = np.array(sorted(acc), np.int64)
        return keys, np.array([acc[int(k)] for k in keys], np.int64), decoded
    # generic: any codec with a registered decoder (incl. DICT_ESCAPE,
    # FOR/zigzag — exact, O(n))
    a = _DECODERS[codec_id](body, n).astype(np.int64)
    m = (a >= lo) & (a <= hi)
    if not m.any():
        return np.empty(0, np.int64), np.empty(0, np.int64), n
    uv, cnt = np.unique(a[m], return_counts=True)
    return uv, cnt.astype(np.int64), n
