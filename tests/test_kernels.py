"""Golden-vector + round-trip tests for the numpy codec kernels.

Golden vectors follow FIXTURES.md §2 (the analog of the MVT spec worked
examples in /root/reference/tests/test_encoder.py:858-991).
"""

import numpy as np
import pytest

from mapbox_vector_tile_spark.codec import kernels as K

I32 = np.int32
U32 = np.uint32

EDGE32 = np.array([2147483647, -2147483648, 0, -1, 1], dtype=I32)


# ---------------------------------------------------------------- zigzag ---

def test_zigzag_golden():
    a = np.array([0, -1, 1, -2, 2], dtype=I32)
    np.testing.assert_array_equal(K.zigzag_encode(a), np.array([0, 1, 2, 3, 4], dtype=U32))
    np.testing.assert_array_equal(K.zigzag_decode(K.zigzag_encode(a)), a)


def test_zigzag_matches_reference_scalar():
    # reference utils.py:26 / :31-32 semantics at 32-bit edges
    def ref_enc(n):
        return ((n << 1) ^ (n >> 31)) & 0xFFFFFFFF

    for n in [0, 1, -1, 2**31 - 1, -(2**31), 12345, -54321]:
        got = int(K.zigzag_encode(np.array([n], dtype=I32))[0])
        assert got == ref_enc(n), n
    np.testing.assert_array_equal(K.zigzag_decode(K.zigzag_encode(EDGE32)), EDGE32)


def test_zigzag_roundtrip_random():
    rng = np.random.default_rng(42)
    a = rng.integers(-(2**31), 2**31, size=10000, dtype=np.int64).astype(I32)
    np.testing.assert_array_equal(K.zigzag_decode(K.zigzag_encode(a)), a)


# ----------------------------------------------------------------- delta ---

def test_delta_golden():
    first, d = K.delta_encode(np.array([3, 8, 20], dtype=I32))
    assert first == 3
    np.testing.assert_array_equal(d, np.array([5, 12], dtype=I32))
    np.testing.assert_array_equal(K.delta_decode(first, d), np.array([3, 8, 20], dtype=I32))


def test_delta_wraparound_edges():
    a = EDGE32
    first, d = K.delta_encode(a)
    np.testing.assert_array_equal(K.delta_decode(first, d), a)


@pytest.mark.parametrize("n", [0, 1, 2, 1000])
def test_delta_roundtrip_sizes(n):
    rng = np.random.default_rng(n)
    a = rng.integers(-(2**31), 2**31, size=n, dtype=np.int64).astype(I32)
    first, d = K.delta_decode, None
    f, d = K.delta_encode(a)
    out = K.delta_decode(f, d) if n else np.zeros(0, dtype=I32)
    if n:
        np.testing.assert_array_equal(out, a)


# --------------------------------------------------------------- bitpack ---

def test_bitpack_golden_width3():
    # [1,5,2,7] @ width 3 -> bits 001 101 010 111 -> bytes 0b00110101 0b0111_0000
    out = K.bitpack(np.array([1, 5, 2, 7], dtype=U32), 3)
    assert out == bytes([0b00110101, 0b01110000])
    np.testing.assert_array_equal(
        K.bitunpack(out, 3, 4), np.array([1, 5, 2, 7], dtype=U32)
    )


@pytest.mark.parametrize("width", [0, 1, 3, 7, 8, 13, 16, 31, 32])
def test_bitpack_roundtrip_widths(width):
    rng = np.random.default_rng(width)
    hi = 1 if width == 0 else (1 << width)
    a = rng.integers(0, hi, size=777, dtype=np.uint64).astype(U32)
    if width == 0:
        a = np.zeros(777, dtype=U32)
    np.testing.assert_array_equal(K.bitunpack(K.bitpack(a, width), width, 777), a)


def test_bit_width():
    assert K.bit_width(np.array([], dtype=U32)) == 0
    assert K.bit_width(np.array([0], dtype=U32)) == 0
    assert K.bit_width(np.array([1], dtype=U32)) == 1
    assert K.bit_width(np.array([7, 3], dtype=U32)) == 3
    assert K.bit_width(np.array([2**32 - 1], dtype=U32)) == 32


# ---------------------------------------------------------------- varint ---

def test_varint_golden():
    a = np.array([0, 127, 128, 300], dtype=np.uint64)
    assert K.varint_encode(a) == bytes([0x00, 0x7F, 0x80, 0x01, 0xAC, 0x02])
    np.testing.assert_array_equal(K.varint_decode(K.varint_encode(a), 4), a)
    assert K.varint_size(a) == 6


def test_varint_roundtrip_random():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    buf = K.varint_encode(a)
    assert len(buf) == K.varint_size(a)
    np.testing.assert_array_equal(K.varint_decode(buf, a.size), a)


def test_varint_empty():
    assert K.varint_encode(np.zeros(0, dtype=np.uint64)) == b""
    assert K.varint_decode(b"", 0).size == 0


# ------------------------------------------------------------------- rle ---

def test_rle_golden():
    v, l = K.rle_runs(np.array([7, 7, 7, 5, 5], dtype=I32))
    np.testing.assert_array_equal(v, np.array([7, 5], dtype=I32))
    np.testing.assert_array_equal(l, np.array([3, 2]))
    np.testing.assert_array_equal(
        K.rle_inflate(v, l), np.array([7, 7, 7, 5, 5], dtype=I32)
    )


def test_rle_single_and_empty():
    v, l = K.rle_runs(np.array([], dtype=I32))
    assert v.size == 0 and l.size == 0
    v, l = K.rle_runs(np.array([9], dtype=I32))
    np.testing.assert_array_equal(v, [9])
    np.testing.assert_array_equal(l, [1])


# ------------------------------------------------------------------ dict ---

def test_dict_golden_frequency_order():
    # values [b,a,b,b,c] -> table [b,a,c] (freq desc, ties by value asc)
    a = np.array([2, 1, 2, 2, 3], dtype=I32)  # b=2, a=1, c=3
    table, idx = K.dict_encode(a)
    np.testing.assert_array_equal(table, np.array([2, 1, 3], dtype=I32))
    np.testing.assert_array_equal(idx, np.array([0, 1, 0, 0, 2]))
    np.testing.assert_array_equal(K.dict_decode(table, idx), a)


def test_dict_tie_break_deterministic():
    a = np.array([5, 4, 5, 4], dtype=I32)  # equal counts -> ascending value
    table, _ = K.dict_encode(a)
    np.testing.assert_array_equal(table, np.array([4, 5], dtype=I32))


def test_dict_roundtrip_random():
    rng = np.random.default_rng(3)
    a = rng.integers(-50, 50, size=4000, dtype=np.int64).astype(I32)
    table, idx = K.dict_encode(a)
    np.testing.assert_array_equal(K.dict_decode(table, idx), a)


# -------------------------------------------------------------- pipeline ---

def test_mvt_composite_scheme():
    """delta -> zigzag -> varint on [17,23,35]: the literal MVT geometry
    scheme (geom_encoder.py:47-76) re-expressed through our kernels."""
    a = np.array([17, 23, 35], dtype=I32)
    first, d = K.delta_encode(a)
    zz = K.zigzag_encode(d)
    buf = K.varint_encode(zz.astype(np.uint64))
    # deltas [6,12] -> zigzag [12,24] -> varint single bytes
    assert buf == bytes([12, 24])
    back = K.delta_decode(first, K.zigzag_decode(K.varint_decode(buf, 2).astype(U32)))
    np.testing.assert_array_equal(back, a)


def test_varint_size_mvt_equals_materialized_stream():
    """bytes_ref uses the count-reduction form; it must equal the varint
    size of the materialized reference stream on every distribution."""
    import numpy as np

    from mapbox_vector_tile_spark.codec import kernels as K
    from mapbox_vector_tile_spark.codec.analysis import ChunkAnalysis

    rng = np.random.default_rng(0)
    cases = [
        rng.integers(-2**31, 2**31, 65536).astype(np.int32),
        rng.integers(0, 128, 5000).astype(np.int32),
        np.sort(rng.integers(0, 50000, 30000)).astype(np.int32),
        np.array([0], np.int32),
        np.array([-1, 2**31 - 1, -(2**31), 0, 1], np.int32),
        np.zeros(100, np.int32),
    ]
    for a in cases:
        an = ChunkAnalysis(a)
        assert K.varint_size(an.mvt_zz) == an.varint_size_mvt()
