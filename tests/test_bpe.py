"""BPE trainer: greedy merge semantics, brute-force parity, Spark loop."""

import numpy as np

from mapbox_vector_tile_spark.functions import bpe as BPE


def _brute_merge(seq: list[int], a: int, b: int, new_id: int) -> list[int]:
    """Sequential left-to-right greedy merge — the semantics oracle."""
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(new_id)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _apply_docs(docs: list[list[int]], a: int, b: int, new_id: int):
    flat = np.array([t for d in docs for t in d], dtype=np.int32)
    lens = np.array([len(d) for d in docs], dtype=np.int64)
    nf, nl = BPE._apply_merge_flat(flat, lens, a, b, new_id)
    out, p = [], 0
    for ln in nl:
        out.append(nf[p:p + ln].tolist())
        p += ln
    return out


def test_greedy_run_semantics():
    # overlapping self-pair runs: aaa -> Xa, aaaa -> XX, aaaaa -> XXa
    assert _apply_docs([[7, 7, 7]], 7, 7, 99) == [[99, 7]]
    assert _apply_docs([[7, 7, 7, 7]], 7, 7, 99) == [[99, 99]]
    assert _apply_docs([[7, 7, 7, 7, 7]], 7, 7, 99) == [[99, 99, 7]]
    # distinct pair, non-overlapping matches both apply
    assert _apply_docs([[1, 2, 1, 2]], 1, 2, 99) == [[99, 99]]
    # no cross-doc merge: ...1 | 2... stays split
    assert _apply_docs([[3, 1], [2, 3]], 1, 2, 99) == [[3, 1], [2, 3]]
    # empty and length-1 docs survive untouched
    assert _apply_docs([[], [5], [1, 2]], 1, 2, 99) == [[], [5], [99]]


def test_vectorized_matches_brute_force():
    rng = np.random.default_rng(3)
    for trial in range(50):
        docs = [
            rng.integers(0, 4, rng.integers(0, 12)).tolist()
            for _ in range(rng.integers(1, 6))
        ]
        a, b = int(rng.integers(0, 4)), int(rng.integers(0, 4))
        got = _apply_docs(docs, a, b, 99)
        want = [_brute_merge(d, a, b, 99) for d in docs]
        assert got == want, (docs, a, b)


def test_bpe_train_spark(spark):
    import pandas as pd

    docs = [
        ("doc-0", [1, 2, 1, 2, 1, 2, 3]),
        ("doc-1", [1, 2, 5, 1, 2]),
        ("doc-2", [4, 4, 4, 4]),
        ("doc-3", []),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [d for d, _ in docs],
                "tokens": [t for _, t in docs],
                "n_tok": [len(t) for _, t in docs],
            }
        ),
        "doc_id string, tokens array<int>, n_tok int",
    )
    merges, merged = BPE.bpe_train(df, n_merges=2, base_vocab=100)
    # iter 0: (1,2) occurs 5 times -> id 100; iter 1 corpus is
    # [100,100,100,3], [100,5,100], [4,4,4,4], [] -> best pair (100,100) x3
    # (overlap-counted: positions 0,1 in doc-0 + none... actually doc-0 has
    # pairs (100,100),(100,100),(100,3) and doc-2 (4,4)x3) -> tie broken to
    # smallest (a,b) = (4,4)? counts: (100,100)=2, (4,4)=3 -> (4,4) wins.
    assert merges[0][:4] == (0, 1, 2, 100) and merges[0][4] == 5
    assert merges[1][1:4] == (4, 4, 101) and merges[1][4] == 3
    rows = {r.doc_id: list(r.tokens) for r in merged.collect()}
    assert rows["doc-0"] == [100, 100, 100, 3]
    assert rows["doc-1"] == [100, 5, 100]
    assert rows["doc-2"] == [101, 101]
    assert rows["doc-3"] == []


def test_bpe_train_persists_per_iteration(spark):
    """Iteration k must read the previous merged corpus from cache, not
    re-execute all k prior merge passes: the final merged plan's lineage
    reaches an InMemoryTableScan (the persisted previous iteration) and
    the trainer leaves at most the sliding window of caches behind."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [f"doc-{i}" for i in range(8)],
                "tokens": [[1, 2, 1, 2, 3, 4, 3, 4]] * 8,
                "n_tok": [8] * 8,
            }
        ),
        "doc_id string, tokens array<int>, n_tok int",
    )
    merges, merged = BPE.bpe_train(df, n_merges=3, base_vocab=100)
    assert len(merges) == 3
    plan = merged._jdf.queryExecution().optimizedPlan().toString()
    # the last apply_merge must sit on the cached iteration-2 corpus
    assert "InMemoryRelation" in plan
    # ... and produce the right arrays (cache does not change results)
    rows = {r.doc_id: list(r.tokens) for r in merged.collect()}
    # iter0: (1,2)->100; iter1: (3,4)->101; iter2: (100,100)->102
    assert rows["doc-0"] == [102, 101, 101]
