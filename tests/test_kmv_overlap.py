"""KMV set operations (kmv_source_overlap) — exactness below k,
degenerate overlaps, and the estimate's behavior above k."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.functions.sketch import kmv_source_overlap


def _df(spark, rows):
    # rows: (doc_id, tokens, source)
    return spark.createDataFrame(
        [(d, t, len(t), s) for d, t, s in rows],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )


def test_identical_sources_full_overlap(spark):
    toks = list(range(30))
    rows = [("a1", toks, "A"), ("b1", toks, "B")]
    r = kmv_source_overlap(_df(spark, rows), n=3, k=64).collect()
    assert len(r) == 1
    row = r[0]
    n_grams = 30 - 3 + 1
    assert (row["source_a"], row["source_b"]) == ("A", "B")
    # below k: union_seen is the exact distinct union, estimates exact
    assert row["union_seen"] == n_grams
    assert row["est_union"] == n_grams
    assert row["inter_window"] == n_grams
    assert row["est_intersection"] == n_grams
    assert row["jaccard_pct"] == 100


def test_disjoint_sources_zero_overlap(spark):
    rows = [("a1", list(range(0, 20)), "A"),
            ("b1", list(range(100, 120)), "B")]
    row = kmv_source_overlap(_df(spark, rows), n=3, k=64).first()
    assert row["inter_window"] == 0
    assert row["est_intersection"] == 0
    assert row["jaccard_pct"] == 0
    assert row["union_seen"] == row["est_union"] == 2 * (20 - 3 + 1)


def test_partial_overlap_exact_below_k(spark):
    # A: grams of 0..40, B: grams of 20..60 -> shared grams are windows
    # fully inside 20..40
    a, b = list(range(0, 41)), list(range(20, 61))
    row = kmv_source_overlap(_df(spark, [("a", a, "A"), ("b", b, "B")]),
                             n=3, k=512).first()
    shared = 41 - 20 - 3 + 1  # windows starting at 20..38
    total_a = total_b = 41 - 3 + 1
    union = total_a + total_b - shared
    assert row["union_seen"] == union
    assert row["inter_window"] == shared
    assert row["est_intersection"] == shared
    assert row["jaccard_pct"] == (100 * shared) // union


def test_three_sources_all_pairs_ordered(spark):
    rows = [("a", list(range(10)), "A"), ("b", list(range(10)), "B"),
            ("c", list(range(5, 15)), "C")]
    out = kmv_source_overlap(_df(spark, rows), n=2, k=32).collect()
    assert [(r["source_a"], r["source_b"]) for r in out] == [
        ("A", "B"), ("A", "C"), ("B", "C")]


def test_estimation_above_k_tracks_truth(spark):
    """k much smaller than the domain: union estimate within 25% of the
    exact distinct union, jaccard within 15 points (k=256 -> ~6% rel
    stderr; deterministic hashes, so this is a fixed property)."""
    rng = np.random.default_rng(7)
    docs = []
    for d in range(40):
        base = int(rng.integers(0, 5000))
        docs.append((f"a{d}", [base + j for j in range(60)], "A"))
        docs.append((f"b{d}", [base + 30 + j for j in range(60)], "B"))
    df = _df(spark, docs)
    row = kmv_source_overlap(df, n=3, k=256).first()
    # exact truth, driver-side
    def grams(tokens):
        return {tuple(tokens[i:i + 3]) for i in range(len(tokens) - 2)}
    ga, gb = set(), set()
    for _, t, s in docs:
        (ga if s == "A" else gb).update(grams(t))
    union, inter = len(ga | gb), len(ga & gb)
    assert row["union_seen"] == 256
    assert abs(row["est_union"] - union) <= union // 4
    true_j = 100 * inter // union
    assert abs(row["jaccard_pct"] - true_j) <= 15


def test_rejects_bad_params(spark):
    df = _df(spark, [("a", [1, 2, 3], "A")])
    with pytest.raises(ValueError):
        kmv_source_overlap(df, n=0)
    with pytest.raises(ValueError):
        kmv_source_overlap(df, k=1)
