"""Cross-engine parity for similarity search (fixed-point exactness)."""

import duckdb
import pytest

from mapbox_vector_tile_spark.functions import similarity as SIM
from tests.test_functions_text import assert_parity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    return c


def test_knn_bruteforce(emb, con):
    assert_parity(SIM.knn_bruteforce(emb), con, SIM.knn_bruteforce_sql())


def test_lsh_buckets(emb, con):
    assert_parity(SIM.lsh_buckets(emb), con, SIM.lsh_buckets_sql())


def test_ann_lsh_top1(emb, con):
    assert_parity(SIM.ann_lsh_top1(emb), con, SIM.ann_lsh_top1_sql())


def test_ann_agrees_with_exact_when_in_bucket(emb, con):
    """ANN's answer must be the exact-NN whenever the true NN shares the
    query's bucket (sanity of the approximation, not parity)."""
    exact = {r.query_id: r.neighbor_id for r in SIM.knn_bruteforce(emb, k=1).collect()}
    buckets = {r.vec_id: r.bucket for r in SIM.lsh_buckets(emb).collect()}
    ann = {r.query_id: r.neighbor_id for r in SIM.ann_lsh_top1(emb).collect()}
    for qid, nn in exact.items():
        if buckets[nn] == buckets[qid]:
            assert ann[qid] == nn, (qid, nn, ann[qid])


def test_ivf_assignments(emb, con):
    assert_parity(SIM.ivf_assignments(emb), con, SIM.ivf_assignments_sql())


def test_ann_ivf_top1(emb, con):
    assert_parity(SIM.ann_ivf_top1(emb), con, SIM.ann_ivf_top1_sql())


def test_ivf_lists_bound_pair_space(emb):
    # every vector lands in exactly one of N_IVF_LISTS inverted lists
    rows = SIM.ivf_assignments(emb).collect()
    lists = {r.list_id for r in rows}
    assert lists.issubset(set(range(SIM.N_IVF_LISTS)))
    assert len(rows) == emb.count()


def test_near_dup_embedding(emb, con):
    assert_parity(SIM.near_dup_embedding(emb), con, SIM.near_dup_embedding_sql())


def test_embedding_quantize_semantics(spark):
    """absmax int8: the max-magnitude element always codes to exactly 127;
    all codes within [-127, 127]; stats integer-exact vs local recompute."""
    import numpy as np

    from mapbox_vector_tile_spark.functions import similarity as SIM

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = SIM.embedding_quantize_stats(emb).collect()
    assert rows
    local = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    for r in rows:
        xi = np.floor(local[r.vec_id] * SIM.SCALE).astype(np.int64)
        amax = int(np.abs(xi).max())
        assert r.amax_fixed == amax
        if amax:
            q = np.sign(xi) * ((np.abs(xi) * 127 + amax // 2) // amax)
            assert r.max_abs_q == 127 == int(np.abs(q).max())
            assert r.sum_q == int(q.sum()) and r.sum_qq == int((q * q).sum())
