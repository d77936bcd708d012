"""Kernel tests for the lossless float32 block codecs (codec/floats.py).

Pure numpy — no SparkSession. Bit-exactness is the contract (the analog of
the reference's round-trip geometry equality,
/root/reference/tests/test_decoder.py): every decode must reproduce the
input's IEEE-754 bit pattern, including NaN payloads, infinities and -0.0.
"""

import numpy as np
import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from mapbox_vector_tile_spark.codec import floats as FC


def _bits_equal(a: np.ndarray, b: np.ndarray) -> bool:
    return a.shape == b.shape and np.array_equal(
        a.view(np.uint32), b.view(np.uint32)
    )


def _roundtrip(a: np.ndarray) -> np.ndarray:
    blob = FC.encode_float_block(a)
    out = FC.decode_float_block(blob)
    assert _bits_equal(np.ascontiguousarray(a, np.float32), out)
    return blob


def test_empty_and_single():
    assert FC.decode_float_block(FC.encode_float_block(np.array([], np.float32))).size == 0
    _roundtrip(np.array([3.25], np.float32))


def test_random_floats_roundtrip():
    rng = np.random.default_rng(7)
    a = rng.standard_normal(4096).astype(np.float32)
    _roundtrip(a)


def test_special_values_bit_exact():
    a = np.array(
        [0.0, -0.0, np.inf, -np.inf, np.nan, 1.5, -2.75, 3.4e38, 1e-44],
        dtype=np.float32,
    )
    # add a non-default NaN payload: decode must preserve it bit-for-bit
    a = np.concatenate([a, np.array([0x7FC12345], np.uint32).view(np.float32)])
    _roundtrip(a)


def test_alp_wins_on_decimal_data():
    rng = np.random.default_rng(11)
    a = (rng.integers(-5000, 5000, 8192) / 100.0).astype(np.float32)
    blob = _roundtrip(a)
    assert FC.float_block_codec(blob) == "f_alp"
    assert len(blob) < 2 * a.size  # << 4 bytes/value


def test_alp_exponent_zero_integers():
    a = np.arange(-100, 100, dtype=np.float32)
    blob = _roundtrip(a)
    assert FC.float_block_codec(blob) == "f_alp"


def test_bss_on_random_mantissas():
    # full-precision uniform floats in [1, 2): constant exponent byte, the
    # BSS high plane collapses (RLE/DICT) while mantissa planes stay RAW
    rng = np.random.default_rng(13)
    a = (1.0 + rng.random(8192)).astype(np.float32)
    blob = _roundtrip(a)
    assert FC.float_block_codec(blob) in ("f_bss", "f_alp")
    assert len(blob) < 4 * a.size  # strictly beats RAW


def test_constant_block():
    a = np.full(1000, np.float32(0.125), dtype=np.float32)
    blob = _roundtrip(a)
    assert len(blob) < 100


def test_minus_zero_not_alp():
    # -0.0 cannot survive the decimal int round-trip; must take a bit-level
    # path and still decode to the exact -0.0 pattern
    a = np.array([-0.0, 1.0, 2.0], dtype=np.float32)
    blob = _roundtrip(a)
    assert FC.float_block_codec(blob) != "f_alp"
    # regression (r6): a long all-zero block with one -0.0 — here ALP's
    # tiny int image would win on size, so the exactness check itself must
    # reject it (astype(int32) maps -0.0 to 0, losing the sign bit)
    b = np.zeros(64, dtype=np.float32)
    b[-1] = np.float32(-0.0)
    blob = _roundtrip(b)
    assert FC.float_block_codec(blob) != "f_alp"


def test_bad_codec_id_raises():
    with pytest.raises(ValueError):
        FC.decode_float_block(b"\x09\x01\x00\x00\x00....")


@settings(max_examples=200, deadline=None)
# regression: 0x80000000 is -0.0 — see test_minus_zero_not_alp
@example(bit_list=[0, 0, 0, 0x80000000])
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**32 - 1), min_size=0, max_size=300
    )
)
def test_roundtrip_hypothesis_bit_patterns(bit_list):
    a = np.array(bit_list, dtype=np.uint32).view(np.float32)
    _roundtrip(a)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(10**6), max_value=10**6),
        min_size=1,
        max_size=200,
    ),
    st.integers(min_value=0, max_value=3),
)
def test_roundtrip_hypothesis_decimals(ints, e):
    a = (np.array(ints, dtype=np.float64) / (10.0**e)).astype(np.float32)
    _roundtrip(a)
