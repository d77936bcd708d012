"""Cross-engine parity tests for text/dedup operators: the Spark DataFrame
result must equal the DuckDB oracle SQL result exactly (integer/fixed-point
math + deterministic tie-breaks make this possible)."""

import duckdb
import pandas as pd
import pytest

from mapbox_vector_tile_spark.functions import text as T

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    return c


def assert_parity(spark_df, con, sql):
    got = spark_df.toPandas()
    want = con.sql(sql).df()
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    assert list(got.columns) == list(want.columns)
    got = got.sort_values(by=list(got.columns), ignore_index=True)
    want = want.sort_values(by=list(want.columns), ignore_index=True)
    assert len(got) == len(want)
    for c in got.columns:
        a = got[c]
        b = want[c]
        if a.dtype != b.dtype:
            a = a.astype("object")
            b = b.astype("object")
        pd.testing.assert_series_equal(a, b, check_names=False, check_dtype=False)


def test_h48_parity(spark, con):
    from pyspark.sql import functions as F

    words = ["abc", "hello world", "", "ünïcode", "a b c d"]
    got = {
        r.w: r.h
        for r in spark.createDataFrame([(w,) for w in words], "w string")
        .select("w", T.h48(F.col("w")).alias("h"))
        .collect()
    }
    for w in words:
        want = con.sql(f"SELECT {T.h48_sql(repr(w))}").fetchone()[0]
        assert got[w] == want, w


def test_dedup_exact(docs, con):
    assert_parity(T.dedup_exact(docs), con, T.DEDUP_EXACT_SQL)


def test_minhash_signatures(docs, con):
    assert_parity(T.minhash_signatures(docs), con, T.minhash_signatures_sql())


def test_lsh_candidate_pairs(docs, con):
    assert_parity(T.lsh_candidate_pairs(docs), con, T.lsh_candidate_pairs_sql())


def test_near_dup_jaccard(docs, con):
    assert_parity(T.near_dup_jaccard(docs), con, T.near_dup_jaccard_sql())


def test_near_dup_jaccard_plan_has_no_unbounded_join(docs):
    # every join must carry a band/bucket or doc-id equi-key; the old
    # all-pairs-per-lang blocking must not reappear (scale contract)
    plan = T.near_dup_jaccard(docs)._jdf.queryExecution().optimizedPlan().toString()
    # no join condition on lang anywhere (relation column lists are fine)
    assert "(lang#" not in plan and "= lang#" not in plan
    # the candidate join is keyed on the band/bucket hash
    assert "bh#" in plan


def test_simhash32(docs, con):
    assert_parity(T.simhash32(docs), con, T.simhash32_sql())


def test_lang_id(docs, con):
    assert_parity(T.lang_id(docs), con, T.lang_id_sql())


def test_quality_scores(docs, con):
    assert_parity(T.quality_scores(docs), con, T.QUALITY_SQL)


def test_doc_fingerprint(docs, con):
    assert_parity(T.doc_fingerprint(docs), con, T.doc_fingerprint_sql())


def test_token_count_bpe(docs, con):
    assert_parity(T.token_count_bpe(docs), con, T.token_count_bpe_sql())


def test_dedup_clusters_parity(docs, con):
    assert_parity(T.dedup_clusters(docs), con, T.dedup_clusters_sql())


def test_dedup_clusters_invariants(docs):
    rows = T.dedup_clusters(docs).collect()
    by_doc = {r.doc_id: r for r in rows}
    # every doc labeled exactly once; labels are component minima
    assert len(by_doc) == len(rows)
    for r in rows:
        assert r.cluster_id <= r.doc_id
        assert by_doc[r.cluster_id].cluster_id == r.cluster_id  # head is own head
        assert r.is_canonical == (r.doc_id == r.cluster_id)
    # exactly one canonical member per cluster
    heads = [r for r in rows if r.is_canonical]
    assert len(heads) == len({r.cluster_id for r in rows})
    # cluster_size agrees with membership counts
    from collections import Counter

    counts = Counter(r.cluster_id for r in rows)
    for r in rows:
        assert r.cluster_size == counts[r.cluster_id]
