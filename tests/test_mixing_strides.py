"""Source upsampling (fractional repetition) and sliding-window chunking:
brute-force parity, explode semantics, plan shape."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark import corpus as C
from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.functions.sample import (
    _SPACE,
    _UPSAMPLE_MULT,
    source_upsample,
    source_upsample_rollup_sql,
)
from mapbox_vector_tile_spark.functions.strides import (
    sliding_window_chunks,
    window_checksums,
    window_checksums_sql,
)

N_DOCS = 400
WEIGHTS = {"web": 2500, "books": 1300, "forum": 0}


@pytest.fixture(scope="module")
def tokens(spark):
    df = G.corpus_dataframe(spark, N_DOCS, num_partitions=4)
    df.cache().count()
    return df


def _expected_reps(doc_num: int, source: str) -> int:
    w = WEIGHTS.get(source, 1000)
    return w // _SPACE + (1 if (doc_num * _UPSAMPLE_MULT) % _SPACE < w % _SPACE else 0)


def test_upsample_rep_enumeration(tokens):
    rows = source_upsample(tokens, WEIGHTS).select("doc_id", "source", "rep").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault((r.doc_id, r.source), []).append(r.rep)
    for (d, s), reps in by_doc.items():
        want = _expected_reps(int(d.split("-")[1]), s)
        assert sorted(reps) == list(range(1, want + 1)), (d, s)
    # every doc with expected reps > 0 is present
    srcs = {r.doc_id: r.source for r in tokens.select("doc_id", "source").collect()}
    for d, s in srcs.items():
        want = _expected_reps(int(d.split("-")[1]), s)
        assert ((d, s) in by_doc) == (want > 0), d


def test_upsample_weight_zero_source_absent(tokens):
    up = source_upsample(tokens, WEIGHTS)
    assert up.filter(F.col("source") == "forum").count() == 0


def test_upsample_has_no_shuffle(tokens):
    plan = (
        source_upsample(tokens, WEIGHTS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_upsample_rollup_sql_matches(tokens, spark):
    got = [
        tuple(r)
        for r in source_upsample(tokens, WEIGHTS)
        .groupBy("source")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("rep").cast("long").alias("rep_sum"),
            F.sum("n_tok").cast("long").alias("sum_tokens"),
        )
        .orderBy("source")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT UNNEST(range({N_DOCS})) AS doc_id"
    )
    want = con.execute(source_upsample_rollup_sql(WEIGHTS)).fetchall()
    assert got == want


def test_windows_cover_exactly(tokens):
    win, stride = 96, 64
    chunks = sliding_window_chunks(tokens, win, stride).collect()
    full = {r.doc_id: r.tokens for r in tokens.collect()}
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, {})[r.win_idx] = r.tokens
    for d, toks in full.items():
        n = len(toks)
        wins = by_doc.get(d, {})
        want_n = (n + stride - 1) // stride if n else 0
        assert len(wins) == want_n, d
        for w, seg in wins.items():
            s = w * stride
            assert seg == toks[s : s + win], (d, w)
            assert len(seg) >= 1


def test_window_gap_stride_larger_than_window(tokens):
    # stride > window samples spaced snippets; still exact slices
    chunks = sliding_window_chunks(tokens, 8, 300).collect()
    full = {r.doc_id: r.tokens for r in tokens.collect()}
    for r in chunks:
        s = r.win_idx * 300
        assert r.tokens == full[r.doc_id][s : s + 8]


def test_window_checksums_match_duckdb(tokens):
    got = [
        tuple(r)
        for r in window_checksums(
            sliding_window_chunks(tokens, 96, 64)
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT UNNEST(range({N_DOCS})) AS doc_id"
    )
    want = con.execute(window_checksums_sql(96, 64)).fetchall()
    assert got == want


def test_windows_no_shuffle(tokens):
    plan = (
        sliding_window_chunks(tokens, 96, 64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_rejects_bad_params(tokens):
    with pytest.raises(ValueError):
        sliding_window_chunks(tokens, 0, 64)
    with pytest.raises(ValueError):
        sliding_window_chunks(tokens, 64, 0)
    with pytest.raises(ValueError):
        source_upsample(tokens, {"web": -1})


def test_quota_sample_exact_k_and_determinism(tokens):
    from mapbox_vector_tile_spark.functions.sample import quota_sample

    got = quota_sample(tokens, k=15).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.source, []).append(r)
    sizes = {
        r.source: r.n
        for r in tokens.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for src, rows in by_src.items():
        assert len(rows) == min(15, sizes[src])
        assert sorted(r.pick_rank for r in rows) == list(
            range(1, len(rows) + 1)
        )
    # deterministic under repartition
    again = quota_sample(tokens.repartition(7), k=15).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    # independent of the stratified-sample hash: quota picks are not a
    # prefix/suffix of per-mille keep decisions (different multiplier)
    plan = quota_sample(tokens, 15)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
