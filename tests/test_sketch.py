"""KMV distinct sketch: exactness below k, estimate accuracy above k,
partition invariance, DuckDB mirror."""

import duckdb
import pytest

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.functions.sketch import (
    kmv_distinct_ngrams,
    kmv_distinct_ngrams_sql,
)

N_DOCS = 300


@pytest.fixture(scope="module")
def tokens(spark):
    df = G.corpus_dataframe(spark, N_DOCS, num_partitions=4)
    df.cache().count()
    return df


def _exact_distinct(full, n):
    grams = set()
    for seq in full.values():
        for i in range(len(seq) - n + 1):
            grams.add(tuple(seq[i : i + n]))
    return len(grams)


def test_exact_below_k(tokens):
    # k larger than the distinct-bigram domain of a few docs: the sketch
    # IS the distinct set and the estimate is exact
    few = tokens.filter("doc_id <= 'doc-00000020'")
    full = {r.doc_id: r.tokens for r in few.collect()}
    want = _exact_distinct(full, 2)
    row = kmv_distinct_ngrams(few, n=2, k=100000).first()
    assert row.n_seen == want
    assert row.est_distinct == want


def test_estimate_accuracy_above_k(tokens):
    full = {r.doc_id: r.tokens for r in tokens.collect()}
    want = _exact_distinct(full, 3)
    row = kmv_distinct_ngrams(tokens, n=3, k=1024).first()
    assert row.n_seen == 1024  # sketch saturated: estimate path exercised
    assert want > 1024
    # KMV relative error ~1/sqrt(k-2) ~ 3% at k=1024; allow 10%
    assert abs(row.est_distinct - want) <= want * 0.10, (
        row.est_distinct,
        want,
    )


def test_partition_invariance(spark):
    a = kmv_distinct_ngrams(
        G.corpus_dataframe(spark, N_DOCS, num_partitions=2), n=3, k=512
    ).first()
    b = kmv_distinct_ngrams(
        G.corpus_dataframe(spark, N_DOCS, num_partitions=13), n=3, k=512
    ).first()
    assert a == b


def test_matches_duckdb(tokens):
    row = kmv_distinct_ngrams(tokens, n=3, k=1024).first()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT UNNEST(range({N_DOCS})) AS doc_id"
    )
    want = con.execute(kmv_distinct_ngrams_sql(3, 1024)).fetchone()
    assert tuple(row) == want
