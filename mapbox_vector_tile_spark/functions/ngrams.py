"""Token n-gram statistics over decoded sequences — pure Catalyst.

The n-gram audit a training pipeline runs for LM statistics and
contamination screens: every length-``n`` window of every document,
counted exactly. The window expansion is a JVM-side ``transform(sequence(
0, n_tok - n), i -> struct(tokens[i], ...))`` + ``explode`` — no Python
touches token data — and the count is a hash aggregate with map-side
partials, so the shuffle carries (gram, partial-count) pairs. Expansion
is O(total tokens · n) rows, the floor for exact n-gram counting; the
top-k finisher compiles to TakeOrderedAndProject (per-partition heaps).

Analog surface: the reference's per-feature command-stream windows
(/root/reference/mapbox_vector_tile/geom_encoder.py iterates consecutive
coordinate pairs); here windows run over token streams for corpus
analytics instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def ngram_counts(decoded_df: DataFrame, n: int = 2) -> DataFrame:
    """Exact counts of every token ``n``-gram: columns ``t0..t{n-1}, n``.

    ``decoded_df`` needs ``tokens`` (array<int32>) and ``n_tok`` columns —
    the decode output shape. Documents shorter than ``n`` contribute
    nothing (the filter also keeps ``sequence()`` ascending)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    fields = ", ".join(
        f"CAST(tokens[i+{d}] AS BIGINT) AS t{d}" for d in range(n)
    )
    windows = f"transform(sequence(0, n_tok - {n}), i -> struct({fields}))"
    grams = (
        decoded_df.filter(F.col("n_tok") >= n)
        .select(F.explode(F.expr(windows)).alias("g"))
        .select("g.*")
    )
    return grams.groupBy(*[f"t{d}" for d in range(n)]).agg(
        F.count("*").alias("n")
    )


def top_k_ngrams(decoded_df: DataFrame, n: int, k: int) -> DataFrame:
    """``k`` most frequent ``n``-grams, ties broken by the gram itself
    (deterministic across parallelism levels)."""
    counts = ngram_counts(decoded_df, n)
    order = [F.desc("n")] + [F.asc(f"t{d}") for d in range(n)]
    return counts.orderBy(*order).limit(int(k))
