"""PAGED codec: per-page codec re-selection inside one chunk — the
granularity analog of the reference re-choosing the encoding per feature
(/root/reference/mapbox_vector_tile/optimise.py:193-202). The VERDICT bar:
a mixed-regime chunk (no cluster key) must compress close to what the same
data achieves when clustered into homogeneous chunks."""

import numpy as np
import pytest

from mapbox_vector_tile_spark.codec import blocks as B
from mapbox_vector_tile_spark.codec import select as S
from mapbox_vector_tile_spark.codec.analysis import ChunkAnalysis


def _mixed_segments(rng, seg_len):
    """Four wildly different distributions, one per segment."""
    return [
        rng.integers(0, 16, seg_len).astype(np.int32),              # tiny
        np.repeat(rng.integers(0, 1000, seg_len // 50 + 1), 50)[
            :seg_len
        ].astype(np.int32),                                          # runs
        rng.integers(-(2**30), 2**30, seg_len).astype(np.int32),     # wide
        (rng.zipf(1.5, seg_len) % 50000).astype(np.int32),           # zipf
    ]


def test_paged_roundtrip_forced_small():
    rng = np.random.default_rng(3)
    for a in [
        np.zeros(0, np.int32),
        np.array([7], np.int32),
        rng.integers(-100, 100, 1000).astype(np.int32),
    ]:
        blk = B.encode_block(a, B.PAGED if a.size else B.RAW)
        assert np.array_equal(B.decode_block(blk), a)


def test_paged_roundtrip_multipage(monkeypatch):
    monkeypatch.setattr(S, "PAGE_SIZE", 1024)
    rng = np.random.default_rng(5)
    a = np.concatenate(_mixed_segments(rng, 1500))
    blk = B.encode_block(a, B.PAGED, ChunkAnalysis(a))
    assert np.array_equal(B.decode_block(blk), a)
    info = B.block_info(blk)
    assert info.codec == "paged" and info.n_values == a.size


def test_paged_predicted_size_is_exact(monkeypatch):
    monkeypatch.setattr(S, "PAGE_SIZE", 1024)
    rng = np.random.default_rng(9)
    a = np.concatenate(_mixed_segments(rng, 2048))
    an = ChunkAnalysis(a)
    sizes = S.candidate_sizes(a, an)
    assert B.PAGED in sizes
    blk = B.encode_block(a, B.PAGED, an)
    assert len(blk) - B.header_size() == sizes[B.PAGED]


def test_paged_wins_on_mixed_chunk_and_matches_clustered(monkeypatch):
    monkeypatch.setattr(S, "PAGE_SIZE", 4096)
    rng = np.random.default_rng(11)
    segs = _mixed_segments(rng, 8192)
    mixed = np.concatenate(segs)

    # auto-selection must pick PAGED for the mixed chunk
    an = ChunkAnalysis(mixed)
    assert S.choose_codec(mixed, an) == B.PAGED

    mixed_blk = B.encode_block(mixed, B.PAGED, an)
    # clustered baseline: each segment encoded as its own homogeneous chunk
    clustered = sum(
        len(B.encode_block(s, S.choose_codec(s))) for s in segs
    )
    # within 5% of the clustered run (VERDICT round-2 criterion #3)
    assert len(mixed_blk) <= 1.05 * clustered
    # and far better than the best single whole-chunk codec
    single_sizes = {
        c: sz for c, sz in S.candidate_sizes(mixed, an).items() if c != B.PAGED
    }
    assert len(mixed_blk) - B.header_size() < 0.9 * min(single_sizes.values())


def test_paged_not_picked_for_homogeneous_chunk(monkeypatch):
    monkeypatch.setattr(S, "PAGE_SIZE", 1024)
    rng = np.random.default_rng(13)
    a = rng.integers(0, 64, 8192).astype(np.int32)  # uniform narrow
    # homogeneous data: page overhead can only lose; selector must not pick it
    assert S.choose_codec(a) != B.PAGED


def test_paged_pages_never_nest(monkeypatch):
    monkeypatch.setattr(S, "PAGE_SIZE", 1024)
    rng = np.random.default_rng(17)
    a = np.concatenate(_mixed_segments(rng, 4096))
    for sub, cid, _ in S.paged_plan(ChunkAnalysis(a)):
        assert cid != B.PAGED
        assert sub.n <= 1024
