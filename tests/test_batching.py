"""Length-grouped batch assembly: deterministic assignment, ROW_NUMBER
parity via DuckDB, padding accounting, epoch mixing."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.functions.batching import (
    batch_padding_rollup,
    length_grouped_batches,
    length_grouped_sql,
)

N_DOCS = 500
B = 32


@pytest.fixture(scope="module")
def tokens(spark):
    df = G.corpus_dataframe(spark, N_DOCS, num_partitions=4)
    df.cache().count()
    return df


def _oracle_rollup(epoch):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT UNNEST(range({N_DOCS})) AS doc_id")
    return con.execute(length_grouped_sql(B, epoch=epoch)).fetchall()


def test_assignment_is_total_and_dense(tokens):
    a = length_grouped_batches(tokens, B, epoch=1)
    rows = a.collect()
    assert len(rows) == N_DOCS
    assert len({r.doc_id for r in rows}) == N_DOCS
    pos = sorted(r.batch_id * B + r.slot for r in rows)
    assert pos == list(range(N_DOCS))  # dense global permutation
    assert all(0 <= r.slot < B for r in rows)


def test_batches_group_by_length(tokens):
    a = length_grouped_batches(tokens, B, epoch=1).collect()
    # global order is by n_tok first: batch i's max <= batch i+1's min
    by_batch = {}
    for r in a:
        by_batch.setdefault(r.batch_id, []).append(r.n_tok)
    bids = sorted(by_batch)
    for lo_b, hi_b in zip(bids, bids[1:]):
        assert max(by_batch[lo_b]) <= min(by_batch[hi_b])


def test_rollup_matches_duckdb_oracle(tokens):
    got = [
        (r.batch_id, r.n_docs, r.max_len, r.sum_len, r.pad_tokens)
        for r in batch_padding_rollup(
            length_grouped_batches(tokens, B, epoch=1)
        ).collect()
    ]
    assert got == _oracle_rollup(1)


def test_epochs_mix_same_length_docs(tokens):
    a1 = {
        r.doc_id: (r.batch_id, r.slot)
        for r in length_grouped_batches(tokens, B, epoch=1).collect()
    }
    a2 = {
        r.doc_id: (r.batch_id, r.slot)
        for r in length_grouped_batches(tokens, B, epoch=2).collect()
    }
    assert a1 != a2  # same-length groups reshuffle across epochs


def test_padding_beats_unsorted_baseline(tokens):
    # the whole point: length grouping wastes less padding than identity order
    grouped = (
        batch_padding_rollup(length_grouped_batches(tokens, B, epoch=1))
        .agg(F.sum("pad_tokens"))
        .first()[0]
    )
    # identity-order baseline computed driver-side from the same lengths
    lens = [
        r.n_tok
        for r in tokens.select("doc_id", "n_tok").orderBy("doc_id").collect()
    ]
    base = sum(
        len(chunk) * max(chunk) - sum(chunk)
        for chunk in (lens[i : i + B] for i in range(0, len(lens), B))
    )
    assert grouped < base


def test_rejects_bad_batch_size(tokens):
    with pytest.raises(ValueError):
        length_grouped_batches(tokens, 0)
