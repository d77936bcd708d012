"""Property-based round-trips (hypothesis) for the media codecs added in
round 5: PNG (zlib/filters), G.711 mu-law, GIF/LZW — any input shape,
bit-identical (PNG/GIF) or transfer-function-exact (mu-law) decode."""

import numpy as np
from hypothesis import example, given, settings, strategies as st

from mapbox_vector_tile_spark.functions.g711 import (
    decode_wav_mulaw,
    encode_wav_mulaw,
    quantize_mulaw,
)
from mapbox_vector_tile_spark.functions.gif import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)
from mapbox_vector_tile_spark.functions.png import decode_png, encode_png

dims = st.integers(min_value=1, max_value=40)


@settings(max_examples=60, deadline=None)
@given(
    h=dims, w=dims,
    ch=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_any_image(h, w, ch, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    out = decode_png(encode_png(px))
    want = px[:, :, 0] if ch == 1 else px
    assert np.array_equal(out, want)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=0, max_size=2000))
def test_mulaw_wav_roundtrip_any_samples(xs):
    s = np.array(xs, dtype=np.int16)
    dec, rate = decode_wav_mulaw(encode_wav_mulaw(s))
    assert rate == 8000
    assert np.array_equal(dec, quantize_mulaw(s))


@settings(max_examples=80, deadline=None)
@given(
    mcs=st.integers(2, 8),
    data=st.binary(min_size=0, max_size=5000),
)
# Regression: encoder/decoder width desync at the stream tail — the final
# flushed data code causes a decoder table append that can land exactly on
# the width capacity, widening the decoder before END (hypothesis-found in
# round 5; the local .hypothesis DB is not in git, so replay it explicitly).
@example(mcs=2, data=b"\x00\x00\x02\x02\x00\x01\x00\x00\x02\x01\x01\x02")
def test_lzw_roundtrip_any_bytes(mcs, data):
    # clamp symbols into the alphabet for this code size
    arr = (np.frombuffer(data, np.uint8) % (1 << mcs)).tobytes()
    assert lzw_decode(lzw_encode(arr, mcs), mcs) == arr


@settings(max_examples=40, deadline=None)
@given(
    t=st.integers(1, 5), h=dims, w=dims,
    p=st.integers(2, 256),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_any_animation(t, h, w, p, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (p, 3), dtype=np.uint8)
    fr = rng.integers(0, p, (t, h, w), dtype=np.uint8)
    dec, _ = decode_gif(encode_gif(fr, pal))
    assert np.array_equal(dec, pal[fr])
