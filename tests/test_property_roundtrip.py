"""Property-based round-trip tests (hypothesis): any int32 array, any codec,
bit-identical decode — the randomized generalization of the reference's
assertRoundTrip matrix (/root/reference/tests/test_encoder.py:20-50)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from mapbox_vector_tile_spark.codec import blocks as B
from mapbox_vector_tile_spark.codec import fsst
from mapbox_vector_tile_spark.codec import select as S
from mapbox_vector_tile_spark.codec.strings import (
    decode_string_chunk,
    encode_string_chunk,
)

int32s = st.integers(min_value=-(2**31), max_value=2**31 - 1)
arrays = st.lists(int32s, min_size=0, max_size=300).map(
    lambda xs: np.array(xs, dtype=np.int32)
)
# adversarial shapes: long runs, tiny alphabets, sorted
runs = st.lists(
    st.tuples(int32s, st.integers(1, 50)), min_size=0, max_size=30
).map(lambda rs: np.repeat([v for v, _ in rs], [n for _, n in rs]).astype(np.int32))
small_alpha = st.lists(st.integers(-3, 3), min_size=0, max_size=300).map(
    lambda xs: np.array(xs, dtype=np.int32)
)


@settings(max_examples=200, deadline=None)
@given(st.one_of(arrays, runs, small_alpha))
def test_auto_roundtrip_any_array(a):
    blk, cid = S.encode_auto(a)
    np.testing.assert_array_equal(B.decode_block(blk), a)
    # never worse than raw + header slack
    assert len(blk) <= B.header_size() + 4 * a.size + 4


@settings(max_examples=100, deadline=None)
@given(st.one_of(arrays, runs, small_alpha))
def test_every_codec_roundtrip_any_array(a):
    for cid in B.CODEC_NAMES:
        if cid == B.CONSTANT and (a.size == 0 or not (a == a[0]).all()):
            continue
        np.testing.assert_array_equal(B.decode_block(B.encode_block(a, cid)), a)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=2000))
def test_fsst_roundtrip_any_bytes(data):
    assert fsst.decompress(fsst.compress(data)) == data
    assert len(fsst.compress(data)) <= len(data) + 1


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=30), min_size=0, max_size=100))
def test_string_chunk_roundtrip_any_strings(vals):
    assert decode_string_chunk(encode_string_chunk(vals)) == vals


@settings(max_examples=150, deadline=None)
@given(arrays)
def test_candidate_sizes_exact_any_array(a):
    sizes = S.candidate_sizes(a)
    for cid, predicted in sizes.items():
        assert len(B.encode_block(a, cid)) - B.header_size() == predicted, (
            B.CODEC_NAMES[cid]
        )
