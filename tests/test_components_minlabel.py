"""min_label_components (functions/components.py) — the shared
connected-components primitive behind text and embedding dedup clusters."""

import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.functions.components import (
    min_label_components,
)


def _ids(spark, n):
    return spark.range(n).select(F.col("id").alias("vid"))


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "a long, b long")


def test_chain_star_singleton(spark):
    # chain 0-1-2-3, star 5-{6,7,8}, singletons 4 and 9
    pairs = _pairs(spark, [(0, 1), (1, 2), (2, 3), (5, 6), (5, 7), (5, 8)])
    got = {
        r["vid"]: r["cluster_id"]
        for r in min_label_components(
            _ids(spark, 10), pairs, "vid", "a", "b"
        ).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4,
                   5: 5, 6: 5, 7: 5, 8: 5, 9: 9}


def test_direction_and_duplicates_irrelevant(spark):
    base = min_label_components(
        _ids(spark, 4), _pairs(spark, [(0, 1), (2, 3)]), "vid", "a", "b"
    ).collect()
    flipped = min_label_components(
        _ids(spark, 4),
        _pairs(spark, [(1, 0), (3, 2), (1, 0), (0, 1)]),
        "vid", "a", "b",
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, flipped))


def test_two_merging_chains(spark):
    # two chains that meet: needs label flow across the bridge
    edges = [(i, i + 1) for i in range(0, 5)] + [(10, 11), (11, 5)]
    got = {
        r["vid"]: r["cluster_id"]
        for r in min_label_components(
            spark.createDataFrame(
                [(i,) for i in list(range(6)) + [10, 11]], "vid long"
            ),
            _pairs(spark, edges), "vid", "a", "b", max_iters=12,
        ).collect()
    }
    assert set(got.values()) == {0}


def test_nonconvergence_fails_fast(spark):
    # a path of length 8 with max_iters=1 cannot converge
    edges = [(i, i + 1) for i in range(8)]
    with pytest.raises(ValueError, match="did not converge"):
        min_label_components(
            _ids(spark, 9), _pairs(spark, edges), "vid", "a", "b",
            max_iters=1,
        )
