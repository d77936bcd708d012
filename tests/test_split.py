"""Deterministic splits: pure function of doc identity, no shuffle."""

import pytest

from pyspark.sql import functions as F

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.functions.split import (
    split_expr,
    split_sql,
    with_split,
)

SPLITS = {"train": 900, "val": 50, "test": 50}


def test_shares_must_sum_to_space():
    with pytest.raises(ValueError, match="sum"):
        split_expr({"a": 500, "b": 400})
    with pytest.raises(ValueError, match="sum"):
        split_sql({"a": 1, "b": 2})


def test_assignment_is_partitioning_invariant(spark):
    docs = G.corpus_dataframe(spark, 400, num_partitions=1).select("doc_id")
    a = {
        r.doc_id: r.split
        for r in with_split(docs, SPLITS).collect()
    }
    b = {
        r.doc_id: r.split
        for r in with_split(docs.repartition(13), SPLITS).collect()
    }
    assert a == b
    assert set(a.values()) == {"train", "val", "test"}
    # shares land near their targets (hash uniformity, not exactness)
    n = len(a)
    train = sum(1 for v in a.values() if v == "train")
    assert 0.8 * 0.9 * n < train < 1.1 * n


def test_sql_mirror_matches_catalyst(spark):
    import duckdb

    docs = G.corpus_dataframe(spark, 300, num_partitions=3).select("doc_id")
    got = {r.doc_id: r.split for r in with_split(docs, SPLITS).collect()}
    con = duckdb.connect()
    case = split_sql(SPLITS, "d")
    rows = con.sql(
        "SELECT d, " + case + " AS s FROM (SELECT unnest(range(300)) AS d)"
    ).fetchall()
    want = {f"doc-{d:08d}": s for d, s in rows}
    assert got == want


def test_no_shuffle_no_python(spark):
    docs = G.corpus_dataframe(spark, 50, num_partitions=2).select("doc_id")
    plan = (
        with_split(docs, SPLITS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan
