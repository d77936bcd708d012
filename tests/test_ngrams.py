"""Token n-gram statistics: exact counts, JVM-side expansion.

Hand-corpus exactness, brute-force parity on the generator corpus, edge
cases (n=1, docs shorter than n), and a plan assertion that no Python
eval node touches the window expansion (pure Catalyst)."""

from collections import Counter

from pyspark.sql import functions as F

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.engine.decode import decode_dataframe
from mapbox_vector_tile_spark.engine.encode import (
    EncodeOptions,
    encode_dataframe,
)
from mapbox_vector_tile_spark.functions.ngrams import (
    ngram_counts,
    top_k_ngrams,
)


def _df(spark, arrays):
    rows = [(f"doc-{i:08d}", list(a), len(a)) for i, a in enumerate(arrays)]
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int"
    )


def test_bigram_counts_hand_corpus(spark):
    df = _df(spark, [[1, 2, 1, 2, 3], [2, 3], [7], []])
    got = {
        (r.t0, r.t1): r.n for r in ngram_counts(df, 2).collect()
    }
    assert got == {(1, 2): 2, (2, 1): 1, (2, 3): 2}


def test_ngram_edges(spark):
    df = _df(spark, [[5, 5, 5], [9]])
    # n=1 == plain token counts
    got = {(r.t0,): r.n for r in ngram_counts(df, 1).collect()}
    assert got == {(5,): 3, (9,): 1}
    # n longer than every doc -> empty
    assert ngram_counts(df, 4).count() == 0


def test_trigram_brute_force_parity(spark):
    corpus = G.corpus_dataframe(spark, 120, num_partitions=3).cache()
    decoded = decode_dataframe(encode_dataframe(corpus, EncodeOptions()))
    want = Counter()
    for row in decoded.select("tokens").collect():
        t = row.tokens
        for i in range(len(t) - 2):
            want[(t[i], t[i + 1], t[i + 2])] += 1
    got = {
        (r.t0, r.t1, r.t2): r.n for r in ngram_counts(decoded, 3).collect()
    }
    assert got == dict(want) and len(got) > 0


def test_contamination_screen(spark):
    from mapbox_vector_tile_spark.functions.ngrams import ngram_contamination

    train = _df(spark, [[1, 2, 3, 4], [9, 9, 9]])
    evals = spark.createDataFrame(
        [
            ("doc-e1", [2, 3, 4, 9], 4),    # shares (2,3),(3,4); (4,9) no
            ("doc-e2", [7, 8], 2),          # clean
            ("doc-e3", [9, 9, 9, 9, 9], 5), # (9,9) counted once (distinct)
        ],
        "doc_id string, tokens array<int>, n_tok int",
    )
    got = {
        r.doc_id: r.n_shared
        for r in ngram_contamination(train, evals, 2).collect()
    }
    assert got == {"doc-e1": 2, "doc-e3": 1}


def test_top_k_deterministic_and_jvm_side(spark):
    df = _df(spark, [[1, 2, 1, 2], [3, 4, 3, 4], [1, 2]])
    top = top_k_ngrams(df, 2, 2)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure Catalyst expansion
    assert "TakeOrderedAndProject" in plan
    rows = [(r.t0, r.t1, r.n) for r in top.collect()]
    assert rows == [(1, 2, 3), (3, 4, 2)]
