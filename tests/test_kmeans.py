"""K-means Lloyd trainer: monotone inertia, brute-force assignment parity,
empty-cluster handling, broadcast plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.functions.kmeans import (
    K_CLUSTERS,
    kmeans_cluster_stats,
    kmeans_train,
)
from mapbox_vector_tile_spark.functions.similarity import SCALE

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    df.cache().count()
    return df


def _fx(vectors):
    return np.floor(np.asarray(vectors, dtype=np.float64) * SCALE).astype(
        np.int64
    )


def _lloyd_numpy(X, k, iters):
    cents = X[:k].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin takes first (smallest cid) on tie
        for c in range(k):
            members = X[assign == c]
            if len(members):
                cents[c] = np.floor(
                    members.sum(axis=0) / len(members)
                ).astype(np.int64)
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), d.min(axis=1)


def test_assignments_match_numpy_lloyd(emb):
    rows = emb.orderBy("vec_id").collect()
    X = _fx([r.embedding for r in rows])
    want_cid, want_d2 = _lloyd_numpy(X, K_CLUSTERS, 2)
    got = kmeans_train(emb, k=K_CLUSTERS, iters=2).collect()
    assert len(got) == len(rows)
    for g, wc, wd in zip(got, want_cid, want_d2):
        assert g.cid == wc and g.dist2 == wd, g.vec_id


def test_inertia_never_increases(emb):
    inertias = []
    for iters in (0, 1, 2, 3):
        stats = kmeans_cluster_stats(emb, iters=iters).collect()
        inertias.append(sum(r.inertia for r in stats))
    assert all(a >= b for a, b in zip(inertias, inertias[1:])), inertias
    assert inertias[-1] < inertias[0]  # training actually moved something


def test_empty_cluster_keeps_centroid(spark):
    # vec 0 and 1 are the init centroids; every point sits on vec 0, so
    # cluster 1 goes empty after the first update and must survive
    rows = [(0, [0.5, 0.5]), (1, [0.9, -0.9])] + [
        (i, [0.5, 0.5]) for i in range(2, 6)
    ]
    emb2 = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    got = kmeans_train(emb2, k=2, iters=2).collect()
    # everyone (including vec 1's point at the old centroid 1 position)
    # gets a deterministic cluster; no crash, both clusters resolvable
    assert {r.vec_id for r in got} == set(range(6))
    assert {r.cid for r in got} <= {0, 1}
    # the point AT centroid 1's position still belongs to cluster 1
    by_id = {r.vec_id: r for r in got}
    assert by_id[1].cid == 1 and by_id[1].dist2 == 0


def test_assignment_plan_broadcasts_centroids(emb):
    plan = (
        kmeans_train(emb)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_trained_ivf_top1_bruteforce(emb):
    from mapbox_vector_tile_spark.functions.kmeans import (
        ann_ivf_trained_top1,
        kmeans_train,
    )
    from mapbox_vector_tile_spark.functions.similarity import SCALE as S

    assign = {r.vec_id: r.cid for r in kmeans_train(emb).collect()}
    vecs = {
        r.vec_id: _fx([r.embedding])[0] for r in emb.collect()
    }
    got = ann_ivf_trained_top1(emb, n_queries=10).collect()
    assert len(got) == 10
    for g in got:
        assert g.cid == assign[g.query_id]
        cands = [
            v for v in vecs if v != g.query_id and assign[v] == g.cid
        ]
        if not cands:
            assert g.neighbor_id is None
            continue
        dots = {
            v: int(np.dot(vecs[g.query_id], vecs[v])) for v in cands
        }
        best = max(dots.values())
        winners = sorted(v for v, d in dots.items() if d == best)
        assert g.neighbor_id == winners[0]
        assert g.dot_fixed == best
