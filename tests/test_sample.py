"""Stratified sampling + doc-length quantiles: deterministic, oracle-mirrored."""

import pytest

from pyspark.sql import functions as F

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.functions.sample import (
    _SAMPLE_MULT,
    stratified_keep_expr,
    stratified_sample,
    stratified_sample_pred_sql,
)

RATES = {"web": 300, "books": 650, "forum": 0}


def test_rate_bounds_validated():
    with pytest.raises(ValueError, match="rate"):
        stratified_keep_expr({"web": 1001})
    with pytest.raises(ValueError, match="rate"):
        stratified_keep_expr({"web": -1})


def test_membership_is_partitioning_invariant(spark):
    docs = G.corpus_dataframe(spark, 400, num_partitions=1)
    a = sorted(
        r.doc_id for r in stratified_sample(docs, RATES).select("doc_id").collect()
    )
    b = sorted(
        r.doc_id
        for r in stratified_sample(docs.repartition(13), RATES)
        .select("doc_id")
        .collect()
    )
    assert a == b
    assert 0 < len(a) < 400


def test_zero_rate_drops_stratum_and_default_keeps_all(spark):
    docs = G.corpus_dataframe(spark, 500, num_partitions=3)
    kept = stratified_sample(docs, RATES).select("source").distinct().collect()
    kept_sources = {r.source for r in kept}
    assert "forum" not in kept_sources  # rate 0: stratum fully dropped
    # unlisted sources default to rate 1000: every code/wiki doc survives
    total = docs.filter(F.col("source").isin("code", "wiki")).count()
    sampled = (
        stratified_sample(docs, RATES)
        .filter(F.col("source").isin("code", "wiki"))
        .count()
    )
    assert sampled == total


def test_sql_mirror_matches_catalyst(spark):
    import duckdb

    docs = G.corpus_dataframe(spark, 300, num_partitions=3)
    got = sorted(
        r.doc_id for r in stratified_sample(docs, RATES).select("doc_id").collect()
    )
    con = duckdb.connect()
    pred = stratified_sample_pred_sql(RATES, doc_expr="d")
    rows = con.sql(
        f"SELECT d FROM (SELECT unnest(range(300)) AS d) WHERE {pred}"
    ).fetchall()
    want = sorted(f"doc-{d:08d}" for (d,) in rows)
    assert got == want


def test_sample_hash_independent_of_split_hash():
    from mapbox_vector_tile_spark.functions.split import _HASH_MULT

    assert _SAMPLE_MULT != _HASH_MULT


def test_doc_length_quantiles_exact(spark):
    from mapbox_vector_tile_spark.engine.encode import (
        EncodeOptions,
        encode_dataframe,
    )
    from mapbox_vector_tile_spark.engine.stats import doc_length_quantiles

    n = 400
    tokens = G.corpus_dataframe(spark, n, num_partitions=4)
    lengths = sorted(r.n_tok for r in tokens.select("n_tok").collect())
    blocks = encode_dataframe(tokens, EncodeOptions())
    got = {r.pct: r.n_tok for r in doc_length_quantiles(blocks, (50, 90, 99)).collect()}

    def disc_quantile(pct):
        # smallest value whose cumulative count covers pct percent
        import math

        target = math.ceil(n * pct / 100)
        return lengths[target - 1]

    assert got == {p: disc_quantile(p) for p in (50, 90, 99)}


def test_doc_length_quantiles_rejects_bad_pct(spark):
    from mapbox_vector_tile_spark.engine.stats import doc_length_quantiles

    with pytest.raises(ValueError, match="pct"):
        doc_length_quantiles(None, (0,))
    with pytest.raises(ValueError, match="pct"):
        doc_length_quantiles(None, (101,))
