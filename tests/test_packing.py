"""Materialized sequence packing: bit-exact reassembly of the concatenated
token stream into fixed-length training rows."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark import corpus as C
from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.functions.packing import (
    pack_sequences,
    packed_sequence_checksums,
)

N_DOCS = 500
SEQ_LEN = 256


@pytest.fixture(scope="module")
def packed(spark):
    tokens = G.corpus_dataframe(spark, N_DOCS, num_partitions=4)
    return pack_sequences(tokens, seq_len=SEQ_LEN).persist()


def _expected_stream() -> np.ndarray:
    _, values = C.tokens_flat(np.arange(N_DOCS, dtype=np.int64))
    return values


def test_pack_conserves_and_fills(spark, packed):
    total = int(_expected_stream().size)
    rows = packed.select("seq_id", "n_filled").collect()
    assert sum(r.n_filled for r in rows) == total
    n_seqs = -(-total // SEQ_LEN)
    assert sorted(r.seq_id for r in rows) == list(range(n_seqs))
    for r in rows:
        if r.seq_id < n_seqs - 1:
            assert r.n_filled == SEQ_LEN
    last = next(r for r in rows if r.seq_id == n_seqs - 1)
    assert last.n_filled == total - (n_seqs - 1) * SEQ_LEN


def test_pack_bit_exact_stream(spark, packed):
    """Concatenating the packed sequences in seq_id order must reproduce the
    doc-order token stream byte for byte — docs split across sequences and
    fragments re-sorted inside each sequence included."""
    stream = _expected_stream()
    got = np.concatenate(
        [
            np.asarray(r.tokens, dtype=np.int32)
            for r in packed.orderBy("seq_id").collect()
        ]
    )
    assert np.array_equal(got, stream)


def test_packed_checksums_match_numpy(spark, packed):
    stream = _expected_stream().astype(np.int64)
    want = {}
    for s in range(-(-stream.size // SEQ_LEN)):
        seg = stream[s * SEQ_LEN : (s + 1) * SEQ_LEN]
        i = np.arange(1, seg.size + 1, dtype=np.int64)
        want[s] = (
            seg.size,
            int(seg.sum() % C.MOD),
            int((seg * i).sum() % C.MOD),
        )
    got = {
        r.seq_id: (r.n_filled, r.seq_cks, r.seq_wcks)
        for r in packed_sequence_checksums(packed).collect()
    }
    assert got == want


def test_pack_plan_stays_distributed(spark):
    """No single-partition exchange over the DATA in the packing plan: the
    only window over the full table is partitioned by the range key; the one
    allowed SinglePartition exchange feeds the window over the tiny
    per-range aggregate (the two-level prefix-sum offsets)."""
    # different (n_docs, seq_len) from the module fixture: Spark's cache
    # manager would otherwise substitute the persisted fixture's plan (which
    # embeds its own SinglePartition exchange) into this logical subtree
    tokens = G.corpus_dataframe(spark, 300, num_partitions=4)
    plan = (
        pack_sequences(tokens, seq_len=128)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange SinglePartition") <= 1
