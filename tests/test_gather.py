"""Codec-aware positional gather + truncation (prefix) decode.

The gather must equal full-decode-then-take for EVERY codec on EVERY
adversarial corpus, and the per-codec pruning must be real (telemetry
counts, not trust): CONSTANT decodes 0 payload values, RLE only its run
arrays, PAGED skips untouched pages outright.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.codec import blocks as B
from mapbox_vector_tile_spark.codec.gather import decode_block_gather
from tests.test_blocks import ALL_CODECS, CORPORA

rng = np.random.default_rng(7)


def _random_sorted_idx(n: int) -> np.ndarray:
    # duplicates + both endpoints on purpose
    m = min(n, 257)
    idx = np.sort(rng.integers(0, n, m))
    return np.concatenate(([0], idx, [n - 1])).astype(np.int64)


@pytest.mark.parametrize("name", [k for k, v in CORPORA.items() if v.size])
@pytest.mark.parametrize("codec", ALL_CODECS, ids=lambda c: B.CODEC_NAMES[c])
def test_gather_matches_full_decode(name, codec):
    a = CORPORA[name]
    blk = B.encode_block(a, codec)
    for idx in (_random_sorted_idx(a.size), np.arange(min(a.size, 64))):
        got, decoded = decode_block_gather(blk, idx)
        np.testing.assert_array_equal(got, a[idx])
        assert 0 <= decoded <= a.size + 2 * a.size  # sanity bound


def test_gather_constant_decodes_zero_payload_values():
    a = np.full(10_000, -42, dtype=np.int32)
    blk = B.encode_block(a, B.CONSTANT)
    got, decoded = decode_block_gather(blk, np.array([0, 5000, 9999]))
    np.testing.assert_array_equal(got, a[[0, 5000, 9999]])
    assert decoded == 0


def test_gather_rle_decodes_runs_not_values():
    a = CORPORA["long_runs"]
    blk = B.encode_block(a, B.RLE)
    idx = _random_sorted_idx(a.size)
    got, decoded = decode_block_gather(blk, idx)
    np.testing.assert_array_equal(got, a[idx])
    n_runs = int(np.count_nonzero(np.diff(a)) + 1)
    assert decoded == 2 * n_runs
    assert decoded < a.size  # the run bodies were never inflated


def test_gather_raw_touches_only_requested():
    a = CORPORA["uniform"]
    blk = B.encode_block(a, B.RAW)
    idx = np.array([1, 1, 4999], dtype=np.int64)
    got, decoded = decode_block_gather(blk, idx)
    np.testing.assert_array_equal(got, a[idx])
    assert decoded == idx.size


def test_gather_paged_skips_untouched_pages():
    from mapbox_vector_tile_spark.codec import select as S

    n = S.PAGE_SIZE * 3 + 100  # four pages
    a = np.repeat(
        rng.integers(0, 50, n // 10 + 1), 10
    )[:n].astype(np.int32)
    blk = B.encode_block(a, B.PAGED)
    # positions entirely inside page 0: pages 1..3 must never be parsed
    idx = np.sort(rng.integers(0, S.PAGE_SIZE, 100)).astype(np.int64)
    got, decoded = decode_block_gather(blk, idx)
    np.testing.assert_array_equal(got, a[idx])
    assert decoded <= S.PAGE_SIZE  # bounded by ONE page, not the chunk
    # full-span positions still correct
    idx2 = _random_sorted_idx(n)
    got2, _ = decode_block_gather(blk, idx2)
    np.testing.assert_array_equal(got2, a[idx2])


def test_gather_rejects_out_of_range():
    blk = B.encode_block(np.arange(10, dtype=np.int32), B.RAW)
    with pytest.raises(IndexError):
        decode_block_gather(blk, np.array([10]))
    with pytest.raises(IndexError):
        decode_block_gather(blk, np.array([-1]))


def test_gather_empty_idx():
    blk = B.encode_block(np.arange(10, dtype=np.int32), B.RAW)
    got, decoded = decode_block_gather(blk, np.zeros(0, dtype=np.int64))
    assert got.size == 0 and decoded == 0


# ---------------------------------------------------------------------------
# Spark truncation decode
# ---------------------------------------------------------------------------

K_PREFIX = 64


@pytest.fixture(scope="module")
def prefix_frames(spark):
    from mapbox_vector_tile_spark.engine import generator as G
    from mapbox_vector_tile_spark.engine.decode import (
        decode_dataframe,
        decode_prefix_dataframe,
    )
    from mapbox_vector_tile_spark.engine.encode import encode_dataframe

    tokens = G.corpus_dataframe(spark, 400, num_partitions=4)
    blocks = encode_dataframe(tokens)
    full = decode_dataframe(blocks).withColumnRenamed("tokens", "full_tokens")
    pref = decode_prefix_dataframe(blocks, K_PREFIX)
    return full, pref


def test_prefix_decode_equals_slice_of_full(prefix_frames):
    full, pref = prefix_frames
    j = pref.join(full.select("doc_id", "full_tokens"), "doc_id")
    bad = j.filter(
        F.col("tokens") != F.slice("full_tokens", 1, K_PREFIX)
    ).count()
    assert bad == 0
    assert pref.count() == 400


def test_prefix_decode_keeps_original_n_tok(prefix_frames):
    _, pref = prefix_frames
    # n_tok is the ORIGINAL length; emitted arrays are min(k, n_tok) long
    bad = pref.filter(
        F.size("tokens") != F.least(F.col("n_tok"), F.lit(K_PREFIX))
    ).count()
    assert bad == 0
    # the corpus has docs strictly longer than k (outliers are 8192)
    assert pref.filter(F.col("n_tok") > K_PREFIX).count() > 0
    # and docs at the edge cases
    assert pref.filter(F.col("n_tok") == 0).count() > 0
