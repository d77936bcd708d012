"""Epoch shuffle (deterministic permutation) + intra-doc repetition screen."""

import pytest

from pyspark.sql import functions as F

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.functions.ngrams import (
    ngram_repetition,
    repetition_flag_expr,
)
from mapbox_vector_tile_spark.functions.shuffle import (
    epoch_key_expr,
    epoch_shuffle,
    epoch_shuffle_sql,
)


def test_epoch_shuffle_is_a_permutation(spark):
    docs = G.corpus_dataframe(spark, 300, num_partitions=5).select("doc_id")
    out = epoch_shuffle(docs, epoch=0).collect()
    assert sorted(r.pos for r in out) == list(range(300))
    assert len({r.doc_id for r in out}) == 300


def test_epoch_shuffle_partitioning_invariant(spark):
    docs = G.corpus_dataframe(spark, 200, num_partitions=1).select("doc_id")
    a = {r.doc_id: r.pos for r in epoch_shuffle(docs, 2).collect()}
    b = {
        r.doc_id: r.pos
        for r in epoch_shuffle(docs.repartition(17), 2, n_blocks=7).collect()
    }
    assert a == b


def test_epochs_give_different_orders(spark):
    docs = G.corpus_dataframe(spark, 200, num_partitions=3).select("doc_id")
    a = [r.doc_id for r in epoch_shuffle(docs, 0).orderBy("pos").collect()]
    b = [r.doc_id for r in epoch_shuffle(docs, 1).orderBy("pos").collect()]
    assert a != b
    assert sorted(a) == sorted(b)


def test_epoch_shuffle_sql_mirror(spark):
    import duckdb

    docs = G.corpus_dataframe(spark, 150, num_partitions=4).select("doc_id")
    got = [
        (r.pos, r.doc_id)
        for r in epoch_shuffle(docs, 5).orderBy("pos").collect()
    ]
    con = duckdb.connect()
    con.sql("CREATE TABLE documents AS SELECT unnest(range(150)) AS doc_id")
    want = con.sql(epoch_shuffle_sql(5)).fetchall()
    assert got == [(p, d) for p, d in want]


def test_epoch_shuffle_rejects_negative_epoch():
    with pytest.raises(ValueError, match="epoch"):
        epoch_key_expr(-1)


def test_repetition_counts_exact(spark):
    rows = [
        # 5x constant token: 3 windows, every trigram identical -> all rep
        ("doc-00000001", [7, 7, 7, 7, 7], 5),
        # strictly increasing: 0 repeated windows
        ("doc-00000002", [1, 2, 3, 4, 5, 6], 6),
        # ABABAB: windows ABA,BAB,ABA,BAB -> all 4 repeated
        ("doc-00000003", [1, 2, 1, 2, 1, 2], 6),
        # one repeat among distinct: [9,1,2,9,1,2,5] -> windows 912,129,
        # 291,912,125: 912 twice -> 2 repeated of 5
        ("doc-00000004", [9, 1, 2, 9, 1, 2, 5], 7),
        # shorter than n: 0 windows
        ("doc-00000005", [4, 4], 2),
        ("doc-00000006", [], 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int"
    )
    got = {
        r.doc_id: (r.n_windows, r.n_rep_windows)
        for r in ngram_repetition(df, 3).collect()
    }
    assert got == {
        "doc-00000001": (3, 3),
        "doc-00000002": (4, 0),
        "doc-00000003": (4, 4),
        "doc-00000004": (5, 2),
        "doc-00000005": (0, 0),
        "doc-00000006": (0, 0),
    }


def test_repetition_flag_zero_windows_never_flags(spark):
    df = spark.createDataFrame(
        [("doc-00000001", 0, 0), ("doc-00000002", 10, 2)],
        "doc_id string, n_windows long, n_rep_windows long",
    )
    flagged = df.filter(repetition_flag_expr(20)).collect()
    assert [r.doc_id for r in flagged] == ["doc-00000002"]


def test_repetition_matches_explode_oracle(spark):
    """Per-row sorted-neighbor count == explode + per-(doc,gram) counts."""
    decoded = G.corpus_dataframe(spark, 120, num_partitions=3)
    got = {
        r.doc_id: (r.n_windows, r.n_rep_windows)
        for r in ngram_repetition(decoded, 3).collect()
    }
    n = 3
    fields = ", ".join(f"tokens[i+{d}] AS t{d}" for d in range(n))
    grams = (
        decoded.filter(F.col("n_tok") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, n_tok - {n}),"
                    f" i -> struct({fields}))"
                )
            ).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("w"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
                "rep"
            ),
        )
        .collect()
    )
    want = {r.doc_id: (r.w, r.rep) for r in grams}
    for doc_id, (w, rep) in want.items():
        assert got[doc_id] == (w, rep), doc_id
    for doc_id, (w, rep) in got.items():
        if doc_id not in want:  # short docs: no windows
            assert (w, rep) == (0, 0)


def test_repetition_plan_has_no_shuffle_or_python(spark):
    decoded = spark.createDataFrame(
        [("doc-00000001", [1, 2, 3, 1, 2, 3], 6)],
        "doc_id string, tokens array<int>, n_tok int",
    )
    plan = (
        ngram_repetition(decoded, 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
