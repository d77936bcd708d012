"""Generator parity: numpy corpus == DuckDB SQL corpus, bit for bit.

This is the foundation of the oracle gate — if these match, a later match of
*decoded* checksums against the SQL proves codec round-trip correctness.
"""

import duckdb
import numpy as np
import pytest

from mapbox_vector_tile_spark import corpus as C
from mapbox_vector_tile_spark.codec import blocks as B
from mapbox_vector_tile_spark.codec import select as S

DOC_IDS = np.arange(600, dtype=np.int64)
DOC_SOURCE = "(SELECT UNNEST(range(600)) AS doc_id)"


def test_lengths_and_regimes_edge_cases():
    n = C.n_tok_of(DOC_IDS)
    assert n[0] == 0  # 0 % 101 == 0 -> empty
    assert n[101] == 0
    assert n[7] == 1  # 7 % 103 == 7 -> single
    assert n[11] == 8192  # 11 % 127 == 11 -> outlier
    assert C.regime_of(np.array([13]))[0] == 8  # boundary override
    assert (n >= 0).all() and (n <= 8192).all()
    # every regime represented
    assert set(C.regime_of(DOC_IDS)) == set(range(9))


def test_numpy_matches_duckdb_per_doc():
    lengths, values = C.tokens_flat(DOC_IDS)
    cks = C.doc_checksums(DOC_IDS, lengths, values)
    sql = C.per_doc_checksum_sql(DOC_SOURCE)
    con = duckdb.connect()
    rows = con.sql(sql).fetchall()
    assert len(rows) == DOC_IDS.size
    for i, (doc_id, regime, n_tok, tok_cks, tok_wcks, tok_min, tok_max) in enumerate(rows):
        assert doc_id == DOC_IDS[i]
        assert n_tok == lengths[i], doc_id
        assert tok_cks == cks["tok_cks"][i], doc_id
        assert tok_wcks == cks["tok_wcks"][i], doc_id
        if lengths[i] == 0:
            assert tok_min is None and tok_max is None
        else:
            assert tok_min == cks["tok_min"][i], doc_id
            assert tok_max == cks["tok_max"][i], doc_id


def test_tokens_fit_int32():
    lengths, values = C.tokens_flat(DOC_IDS)
    v64 = values.astype(np.int64)
    assert v64.min() >= -(2**31) and v64.max() < 2**31


def test_roundtrip_every_doc_every_codec():
    """Per-doc arrays survive every codec bit-identically (the per-row
    invariant of BASELINE.json input_hint)."""
    lengths, values = C.tokens_flat(DOC_IDS[:300])
    starts = np.concatenate(([0], np.cumsum(lengths)))
    for i in range(300):
        a = values[starts[i] : starts[i + 1]]
        blk, _ = S.encode_auto(a)
        np.testing.assert_array_equal(B.decode_block(blk), a)


def test_sorted_regime_strictly_increasing():
    ids = DOC_IDS[C.regime_of(DOC_IDS) == 3][:5]
    lengths, values = C.tokens_flat(ids)
    starts = np.concatenate(([0], np.cumsum(lengths)))
    for i in range(ids.size):
        a = values[starts[i] : starts[i + 1]]
        if a.size > 1:
            assert (np.diff(a.astype(np.int64)) >= 1).all()


def test_doc_id_cap_enforced():
    with pytest.raises(ValueError):
        C.tokens_flat(np.array([C.MAX_DOC_ID + 1]))
