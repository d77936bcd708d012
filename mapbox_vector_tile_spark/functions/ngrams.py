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


def _distinct_grams(decoded_df: DataFrame, n: int) -> DataFrame:
    """Per-document distinct ``n``-gram set: ``doc_id, t0..t{n-1}``."""
    fields = ", ".join(
        f"CAST(tokens[i+{d}] AS BIGINT) AS t{d}" for d in range(n)
    )
    windows = f"transform(sequence(0, n_tok - {n}), i -> struct({fields}))"
    return (
        decoded_df.filter(F.col("n_tok") >= n)
        .select("doc_id", F.explode(F.expr(windows)).alias("g"))
        .select("doc_id", "g.*")
        .distinct()
    )


def ngram_contamination(
    train_df: DataFrame, eval_df: DataFrame, n: int = 8
) -> DataFrame:
    """Decontamination screen: for each eval document, how many of its
    distinct ``n``-grams also occur anywhere in the training corpus —
    ``(doc_id, n_shared)``, hit documents only.

    The standard eval-contamination audit (verbatim n-gram overlap). Scale
    shape: the TRAIN side reduces to its distinct gram set (hash aggregate
    with map-side partials — the big-side scan happens once and shrinks
    before any join); the EVAL side is typically orders of magnitude
    smaller, so AQE broadcast-joins its gram set against the reduced train
    grams; the final per-doc count is a tiny aggregate over join hits.
    Exact (no hashing collisions): grams join on their literal token
    tuples."""
    train_grams = _distinct_grams(train_df, n).drop("doc_id").distinct()
    eval_grams = _distinct_grams(eval_df, n)
    keys = [f"t{d}" for d in range(n)]
    hits = eval_grams.join(train_grams, keys)
    return (
        hits.groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .orderBy("doc_id")
    )
