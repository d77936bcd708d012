"""Product quantization: brute-force parity, code range/error properties,
ADC-vs-exact sanity, DuckDB mirrors, plan shape."""

import duckdb
import numpy as np
import pytest

from mapbox_vector_tile_spark.functions.similarity import (
    PQ_K,
    PQ_M,
    SCALE,
    pq_adc_top1,
    pq_adc_top1_sql,
    pq_codes,
    pq_codes_sql,
)

N_VEC, DIM = 120, 64


def _vectors():
    # deterministic unit vectors, same recipe family as the testdata
    rng = np.random.RandomState(7)
    v = rng.randn(N_VEC, DIM).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


@pytest.fixture(scope="module")
def emb(spark):
    v = _vectors()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v[i]]) for i in range(N_VEC)],
        "vec_id long, embedding array<float>",
    ).repartition(4)
    df.cache().count()
    return df


def _fixed(v):
    return np.floor(v.astype(np.float64) * SCALE).astype(np.int64)


def _brute_codes(v, m=PQ_M, k=PQ_K):
    xi = _fixed(v)
    sub = DIM // m
    codes = np.zeros((len(v), m), dtype=np.int64)
    errs = np.zeros(len(v), dtype=np.int64)
    for j in range(m):
        x = xi[:, j * sub : (j + 1) * sub]
        c = xi[:k, j * sub : (j + 1) * sub]
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d.argmin(axis=1)  # argmin ties -> smallest index
        errs += d.min(axis=1)
    return codes, errs


def test_codes_match_brute_force(emb):
    v = _vectors()
    codes, errs = _brute_codes(v)
    rows = pq_codes(emb).collect()
    assert len(rows) == N_VEC
    for r in rows:
        i = r.vec_id
        assert tuple(r[f"code_{j}"] for j in range(PQ_M)) == tuple(codes[i]), i
        assert r.sq_err_fixed == errs[i], i


def test_centroid_self_assignment(emb):
    # each codebook vector's sub-vector is distance 0 from itself
    rows = {r.vec_id: r for r in pq_codes(emb).collect()}
    for c in range(PQ_K):
        assert rows[c].sq_err_fixed == 0
        assert all(rows[c][f"code_{j}"] == c for j in range(PQ_M))


def test_adc_top1_matches_brute_force(emb):
    v = _vectors()
    codes, _ = _brute_codes(v)
    xi = _fixed(v)
    sub = DIM // PQ_M
    n_q = 10
    got = {r.query_id: (r.neighbor_id, r.adc_fixed) for r in pq_adc_top1(emb).collect()}
    assert len(got) == n_q
    for q in range(n_q):
        best = None
        for n in range(N_VEC):
            if n == q:
                continue
            adc = 0
            for j in range(PQ_M):
                c = codes[n, j]
                dq = xi[q, j * sub : (j + 1) * sub] - xi[c, j * sub : (j + 1) * sub]
                adc += int((dq * dq).sum())
            cand = (adc, n)
            if best is None or cand < best:
                best = cand
        assert got[q] == (best[1], best[0]), q


def test_matches_duckdb(emb):
    con = duckdb.connect()
    v = _vectors()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[])")
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?)",
        [(i, [float(x) for x in v[i]]) for i in range(N_VEC)],
    )
    got = [tuple(r) for r in pq_codes(emb).collect()]
    want = con.execute(pq_codes_sql()).fetchall()
    assert got == want
    got1 = [tuple(r) for r in pq_adc_top1(emb).collect()]
    want1 = con.execute(pq_adc_top1_sql()).fetchall()
    assert got1 == want1


def test_plan_shape(emb):
    plan = pq_adc_top1(emb)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    # corpus side never shuffle-joins: LUT and centroids broadcast
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
