"""embedding_gram (functions/similarity.py) — exact sufficient
statistics vs numpy, and the driver-side PCA consumption path."""

import numpy as np
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.functions.similarity import (
    GRAM_SCALE,
    embedding_gram,
)


def _emb_df(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )


def test_gram_matches_numpy_exactly(spark):
    rng = np.random.default_rng(13)
    X = rng.normal(0, 0.4, (257, 7)).astype(np.float32)
    rows = embedding_gram(_emb_df(spark, X).repartition(5)).collect()
    E = np.floor(X.astype(np.float64) * GRAM_SCALE).astype(np.int64)
    G = E.T @ E
    S = E.sum(axis=0)
    assert len(rows) == 7 * 8 // 2
    for r in rows:
        i, j = r["i"], r["j"]
        assert i <= j
        assert r["n"] == 257
        assert r["sum_i"] == S[i] and r["sum_j"] == S[j]
        assert r["sum_ij"] == G[i, j], (i, j)


def test_partition_count_invariance(spark):
    rng = np.random.default_rng(5)
    X = rng.normal(0, 0.3, (100, 5)).astype(np.float32)
    a = embedding_gram(_emb_df(spark, X).repartition(1)).collect()
    b = embedding_gram(_emb_df(spark, X).repartition(13)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pca_from_gram_recovers_principal_axis(spark):
    """Driver-side consumption: covariance from the sufficient stats ->
    eigendecomposition recovers a planted dominant direction."""
    rng = np.random.default_rng(7)
    d = 6
    axis = np.zeros(d)
    axis[2] = 1.0
    X = (rng.normal(0, 1.0, (400, 1)) * axis[None, :]
         + rng.normal(0, 0.05, (400, d))).astype(np.float32)
    rows = embedding_gram(_emb_df(spark, X)).collect()
    n = rows[0]["n"]
    cov = np.zeros((d, d))
    for r in rows:
        i, j = r["i"], r["j"]
        c = (r["sum_ij"] / n - (r["sum_i"] / n) * (r["sum_j"] / n))
        cov[i, j] = cov[j, i] = c / (GRAM_SCALE ** 2)
    w, v = np.linalg.eigh(cov)
    top = v[:, np.argmax(w)]
    assert abs(top[2]) > 0.99  # dominant axis recovered
    assert w.max() > 10 * np.partition(w, -2)[-2]
