"""Per-chunk analysis cache: each derived array (zigzag form, deltas, runs,
MVT stream) is computed at most once per chunk and shared between the codec
selector's size estimates and the winning codec's encoder. Memory bandwidth —
not compute — is the binding constraint at full parallelism, so eliminating
redundant full-array passes is the main scale lever.
"""

from __future__ import annotations

import numpy as np

from . import kernels as K

_CARD_SAMPLE = 65536


class ChunkAnalysis:
    """Lazily-cached derived views of one int32 chunk."""

    __slots__ = (
        "a", "_zz", "_first", "_deltas", "_zzd", "_mvt", "_runs",
        "_vmin", "_vmax", "_dmin", "_dmax", "_n_runs", "_card_sample",
        "_sample_uc", "_heavy", "_paged_plan", "_card_cap", "seg_bounds",
        "_varint_mvt", "_pfor",
    )

    def __init__(
        self,
        a: np.ndarray,
        card_sample_cap: int = _CARD_SAMPLE,
        seg_bounds: np.ndarray | None = None,
    ):
        self.a = np.ascontiguousarray(a, dtype=np.int32)
        self._card_cap = max(1, min(card_sample_cap, _CARD_SAMPLE))
        # known internal distribution boundaries (value offsets, exclusive of
        # 0 and n) — e.g. cluster-bucket transitions inside a merged chunk.
        # PAGED aligns its self-describing sub-frames to these instead of a
        # fixed stride, so a multi-regime chunk compresses like the
        # per-segment chunks it replaced (codec/select.paged_plan).
        self.seg_bounds = seg_bounds
        self._zz = None
        self._first = None
        self._deltas = None
        self._zzd = None
        self._mvt = None
        self._runs = None
        self._vmin = None
        self._vmax = None
        self._dmin = None
        self._dmax = None
        self._n_runs = None
        self._card_sample = None
        self._sample_uc = None
        self._heavy = None
        self._paged_plan = None  # (page_size, [(sub_analysis, cid, size)])
        self._varint_mvt = None
        self._pfor = None  # (base_width, n_exc, pos_width, exc_width)

    @property
    def n(self) -> int:
        return self.a.size

    @property
    def vmin(self) -> int:
        if self._vmin is None:
            self._vmin = int(self.a.min()) if self.n else 0
        return self._vmin

    @property
    def vmax(self) -> int:
        if self._vmax is None:
            self._vmax = int(self.a.max()) if self.n else 0
        return self._vmax

    @property
    def zz(self) -> np.ndarray:
        if self._zz is None:
            self._zz = K.zigzag_encode(self.a)
        return self._zz

    @property
    def first(self) -> int:
        if self._first is None:
            self._first, self._deltas = K.delta_encode(self.a)
        return self._first

    @property
    def deltas(self) -> np.ndarray:
        if self._deltas is None:
            self._first, self._deltas = K.delta_encode(self.a)
        return self._deltas

    @property
    def zzd(self) -> np.ndarray:
        if self._zzd is None:
            d = self.deltas
            self._zzd = (
                K.zigzag_encode(d) if d.size else np.zeros(0, dtype=np.uint32)
            )
        return self._zzd

    @property
    def mvt_zz(self) -> np.ndarray:
        """zigzag(delta-from-0): the reference MVT stream (first value is a
        delta from the implicit origin, geom_encoder.py:40-44)."""
        if self._mvt is None:
            u = self.a.view(np.uint32)
            d = np.empty_like(u)
            d[0:1] = u[0:1]
            np.subtract(u[1:], u[:-1], out=d[1:])
            # zigzag in place on d: one sign temp, zero extra copies (the
            # generic kernel allocates three temporaries per call)
            sign = (d.view(np.int32) >> np.int32(31)).view(np.uint32)
            np.left_shift(d, np.uint32(1), out=d)
            np.bitwise_xor(d, sign, out=d)
            self._mvt = d
        return self._mvt

    @property
    def runs(self) -> tuple[np.ndarray, np.ndarray]:
        if self._runs is None:
            self._runs = K.rle_runs(self.a)
        return self._runs

    @property
    def dmin(self) -> int:
        if self._dmin is None:
            d = self.deltas
            self._dmin = int(d.min()) if d.size else 0
            self._dmax = int(d.max()) if d.size else 0
        return self._dmin

    @property
    def dmax(self) -> int:
        self.dmin  # populate both
        return self._dmax

    @property
    def n_runs(self) -> int:
        """Run count from one boolean reduction (no starts/values arrays)."""
        if self._n_runs is None:
            if self._runs is not None:
                self._n_runs = int(self._runs[0].size)
            elif self.n == 0:
                self._n_runs = 0
            else:
                self._n_runs = 1 + int(
                    np.count_nonzero(self.a[1:] != self.a[:-1])
                )
        return self._n_runs

    def varint_size_mvt(self) -> int:
        """Exact byte size of the reference delta+zigzag+varint stream,
        computed from threshold reductions over the deltas — the zigzag/MVT
        arrays are never materialized (equality with
        ``kernels.varint_size(mvt_zz)`` is kernel-tested). Cached: both the
        codec selector and the manifest's ``bytes_ref`` consume it.
        zz(d) >= 2^k iff d >= 2^(k-1) or d <= -2^(k-1)-1."""
        if self._varint_mvt is not None:
            return self._varint_mvt
        n = self.n
        if n == 0:
            return 0
        d = self.deltas
        total = n
        # first value is its own delta-from-0
        first_zz = (self.first << 1) ^ (self.first >> 31)
        for k in (7, 14, 21, 28):
            t = 1 << (k - 1)
            # cached dmin/dmax prove the count is zero for clustered chunks
            # (deltas within +-2^(k-1)): skip the full-array pass entirely
            if d.size and (self.dmax >= t or self.dmin <= -t - 1):
                extra = int(np.count_nonzero((d >= t) | (d <= -t - 1)))
            else:
                extra = 0
            if first_zz >= (1 << k):
                extra += 1
            total += extra
            if extra == 0:
                break
        self._varint_mvt = total
        return total

    @property
    def sample_uc(self) -> tuple[np.ndarray, np.ndarray]:
        """(values, counts) of a strided sample, for cardinality and
        heavy-hitter screening."""
        if self._sample_uc is None:
            n = self.n
            cap = self._card_cap
            sample = self.a if n <= cap else self.a[:: max(1, n // cap)]
            self._sample_uc = np.unique(sample, return_counts=True)
        return self._sample_uc

    @property
    def card_sample(self) -> int:
        """Cardinality of a strided sample (cheap DICT-viability screen)."""
        if self._card_sample is None:
            self._card_sample = int(self.sample_uc[0].size)
        return self._card_sample

    def heavy(self, max_head: int = 255):
        """Heavy-hitter decomposition for DICT_ESCAPE: head values chosen by
        sampled frequency (deterministic: count desc, value asc), exact
        membership mask over the full chunk. Cached.

        Returns ``(head_values, codes_valid_mask, codes, n_escapes)`` where
        ``codes[i]`` is the head index for matched positions."""
        if self._heavy is None:
            vals, counts = self.sample_uc
            order = np.argsort(-counts, kind="stable")[:max_head]
            head = vals[order]  # frequency order
            c = head.size
            sort_idx = np.argsort(head, kind="stable")
            sh = head[sort_idx]
            pos = np.searchsorted(sh, self.a)
            posc = np.minimum(pos, max(c - 1, 0))
            valid = (sh[posc] == self.a) if c else np.zeros(self.n, bool)
            codes = np.zeros(self.n, dtype=np.uint32)
            if c:
                codes[valid] = sort_idx[posc[valid]].astype(np.uint32)
            self._heavy = (head, valid, codes, int(self.n - np.count_nonzero(valid)))
        return self._heavy

    # widths — from min/max reductions only; the zigzag arrays themselves
    # are materialized lazily and only when the winning encoder needs them
    @staticmethod
    def _zz_width_from_range(lo: int, hi: int) -> int:
        m = 0
        if hi > 0:
            m = 2 * hi
        if lo < 0:
            m = max(m, -2 * lo - 1)
        return m.bit_length()

    @property
    def width_zz(self) -> int:
        if self.n == 0:
            return 0
        return self._zz_width_from_range(self.vmin, self.vmax)

    @property
    def width_range(self) -> int:
        return (self.vmax - self.vmin).bit_length()

    @property
    def width_delta_zz(self) -> int:
        if self.n <= 1:
            return 0
        return self._zz_width_from_range(self.dmin, self.dmax)
