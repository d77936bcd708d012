"""Cross-document duplicate span detection: exact semantics + scale shape."""

import pytest

from pyspark.sql import functions as F

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.functions.dedup_spans import duplicate_spans


def _df(spark, rows):
    return spark.createDataFrame(
        [(d, t, len(t)) for d, t in rows],
        "doc_id string, tokens array<int>, n_tok int",
    )


def test_shared_span_counts_all_positions_in_both_docs(spark):
    # docs A and B share the span [1,2,3]; A carries it twice
    rows = [
        ("doc-00000001", [1, 2, 3, 9, 1, 2, 3]),
        ("doc-00000002", [5, 1, 2, 3, 6]),
        ("doc-00000003", [7, 7, 7, 7]),
    ]
    got = {
        r.doc_id: (r.n_windows, r.n_dup_windows)
        for r in duplicate_spans(_df(spark, rows), 3).collect()
    }
    assert got == {
        "doc-00000001": (5, 2),  # positions 0 and 4 carry [1,2,3]
        "doc-00000002": (3, 1),
        "doc-00000003": (2, 0),  # [7,7,7] repeats only within one doc
    }


def test_within_doc_repeats_do_not_count(spark):
    rows = [("doc-00000001", [4, 4, 4, 4, 4]), ("doc-00000002", [1, 2, 3])]
    got = {
        r.doc_id: r.n_dup_windows
        for r in duplicate_spans(_df(spark, rows), 3).collect()
    }
    assert got == {"doc-00000001": 0, "doc-00000002": 0}


def test_short_docs_report_zero_windows(spark):
    rows = [("doc-00000001", [1, 2]), ("doc-00000002", [1, 2, 3])]
    got = {
        r.doc_id: (r.n_windows, r.n_dup_windows)
        for r in duplicate_spans(_df(spark, rows), 3).collect()
    }
    assert got["doc-00000001"] == (0, 0)
    assert got["doc-00000002"] == (1, 0)


def test_rejects_bad_w(spark):
    with pytest.raises(ValueError, match="w"):
        duplicate_spans(_df(spark, [("doc-00000001", [1])]), 0)


def test_matches_bruteforce_on_corpus(spark):
    """Hash-candidate + exact-verify pipeline == single-pass exact tuple
    count over the generator corpus (includes regime-0 constant docs that
    share every window across docs)."""
    w = 4
    decoded = G.corpus_dataframe(spark, 150, num_partitions=3)
    got = {
        r.doc_id: (r.n_windows, r.n_dup_windows)
        for r in duplicate_spans(decoded, w).collect()
    }
    fields = ", ".join(f"tokens[i+{d}] AS t{d}" for d in range(w))
    cols = [f"t{d}" for d in range(w)]
    grams = (
        decoded.filter(F.col("n_tok") >= w)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, n_tok - {w}),"
                    f" i -> struct({fields}))"
                )
            ).alias("g"),
        )
        .select("doc_id", "g.*")
    )
    dup = (
        grams.groupBy(*cols)
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select(*cols)
    )
    want = {
        r.doc_id: r.n
        for r in grams.join(dup, cols, "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for doc_id, (n_w, n_dup) in got.items():
        assert n_dup == want.get(doc_id, 0), doc_id
    # the audit must actually fire on this corpus
    assert sum(v for _, v in got.values()) > 0
