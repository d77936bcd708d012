"""G.711 mu-law codec (functions/g711.py) — exhaustive transfer-function
tests plus the WAV fmt-7 container and the SQL-mirror equivalence.

Reference parity note: the reference engine treats attached media as
opaque payload columns (SURVEY.md multimodal addendum); this codec is an
original implementation of the PUBLIC ITU-T G.711 spec.
"""

import duckdb
import numpy as np
import pytest

from mapbox_vector_tile_spark.functions import multimodal as MM
from mapbox_vector_tile_spark.functions.g711 import (
    decode_mulaw,
    decode_wav_mulaw,
    encode_mulaw,
    encode_wav_mulaw,
    mulaw_quantize_sql,
    quantize_mulaw,
    wav_format_tag,
)

ALL_INT16 = np.arange(-32768, 32768, dtype=np.int32).astype(np.int16)


def test_known_codepoints():
    # spec anchors: 0 -> 0xFF, and the all-zeros code decodes to the
    # maximum magnitude 8031*4+... = 32124? No: decode(0x00) = -8031*4?
    # Anchor on the canonical table values instead:
    assert encode_mulaw(np.array([0], dtype=np.int16))[0] == 0xFF
    assert decode_mulaw(np.array([0xFF], dtype=np.uint8))[0] == 0
    # code 0x00 is the most-negative segment endpoint: -32124
    assert decode_mulaw(np.array([0x00], dtype=np.uint8))[0] == -32124
    assert decode_mulaw(np.array([0x80], dtype=np.uint8))[0] == 32124
    # clip: +/-32767 encodes to the extreme codes
    assert encode_mulaw(np.array([32767], dtype=np.int16))[0] == 0x80
    assert encode_mulaw(np.array([-32768], dtype=np.int16))[0] == 0x00


def test_exhaustive_idempotence_all_int16():
    """decode(encode(s)) is a fixed point at the VALUE level for every
    one of the 65536 inputs (codes themselves have the spec's two zero
    representations 0x7F/0xFF, so code-level idempotence only holds up
    to the negative-zero merge)."""
    codes = encode_mulaw(ALL_INT16)
    dec = decode_mulaw(codes)
    assert np.array_equal(decode_mulaw(encode_mulaw(dec)), dec)
    # code-level: stable except the 0x7F -> 0xFF negative-zero merge
    codes2 = encode_mulaw(dec)
    diff = codes != codes2
    assert np.all(codes[diff] == 0x7F) and np.all(codes2[diff] == 0xFF)
    # and the decoded value is within the segment's quantization step of
    # the (clipped) input everywhere
    clipped = np.clip(ALL_INT16.astype(np.int32), -32635, 32635)
    err = np.abs(dec.astype(np.int32) - clipped)
    exp = ((~codes.astype(np.int32)) >> 4) & 7
    assert np.all(err <= (np.int32(8) << exp))


def test_quantizer_monotone_nondecreasing():
    dec = quantize_mulaw(ALL_INT16)
    assert np.all(np.diff(dec.astype(np.int32)) >= 0)


def test_decode_table_symmetry():
    """mu-law is sign-symmetric: decode(code with sign bit flipped)
    negates (0 maps to codes 0xFF/0x7F, both decode to 0)."""
    c = np.arange(256, dtype=np.uint8)
    assert np.array_equal(
        decode_mulaw(c).astype(np.int32),
        -decode_mulaw(c ^ 0x80).astype(np.int32),
    )


def test_sql_mirror_matches_numpy_exhaustively():
    """mulaw_quantize_sql IS quantize_mulaw: equality over all int16."""
    con = duckdb.connect()
    expr = mulaw_quantize_sql("(range - 32768)")
    got = con.sql(
        f"SELECT CAST({expr} AS INT) AS q FROM range(65536) ORDER BY range"
    ).fetchnumpy()["q"]
    assert np.array_equal(got.astype(np.int32),
                          quantize_mulaw(ALL_INT16).astype(np.int32))


def test_wav_container_roundtrip_and_size():
    for i in (3, 7, 11, 12):
        s = MM.synthetic_samples(i)
        n = len(s)
        blob = encode_wav_mulaw(s, rate=8000)
        assert len(blob) == 58 + n + (n % 2)
        assert wav_format_tag(blob) == 7
        dec, rate = decode_wav_mulaw(blob)
        assert rate == 8000
        assert np.array_equal(dec, quantize_mulaw(s))


def test_decode_wav_sniffs_both_formats():
    s = MM.synthetic_samples(5)
    pcm, rate_p = MM.decode_wav(MM.encode_wav(s))
    assert np.array_equal(pcm, s) and rate_p == 16000
    mu, rate_m = MM.decode_wav(encode_wav_mulaw(s))
    assert np.array_equal(mu, quantize_mulaw(s)) and rate_m == 8000


def test_rejections():
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav_mulaw(b"nope")
    with pytest.raises(ValueError, match="not a mu-law"):
        decode_wav_mulaw(MM.encode_wav(np.zeros(4, dtype=np.int16)))
    with pytest.raises(ValueError, match="fmt chunk"):
        wav_format_tag(b"RIFF\x00\x00\x00\x00WAVE")


def test_synthetic_mulaw_assets_content_stats(spark):
    """End-to-end: mu-law WAV assets through the codec-agnostic
    content_stats path match numpy-side quantized stats exactly."""
    n = 18
    df = MM.content_stats(MM.synthetic_mulaw_assets(spark, n))
    rows = {r["asset_id"]: r for r in df.collect()}
    assert len(rows) == n
    for i in range(n):
        s = quantize_mulaw(MM.synthetic_samples(i)).astype(np.int64)
        r = rows[f"asset-{i:06d}"]
        assert r["n_bytes"] == 58 + len(s) + (len(s) % 2)
        assert r["sum1"] == int(s.sum())
        assert r["sum2"] == int((s * s).sum())
        assert r["vmin"] == int(s.min()) and r["vmax"] == int(s.max())
        neg = s < 0
        assert r["zcross"] == int(np.count_nonzero(neg[1:] != neg[:-1]))
