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

from pyspark.sql import Column, DataFrame, functions as F


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


def ngram_repetition(decoded_df: DataFrame, n: int = 3) -> DataFrame:
    """Intra-document repetition audit: per doc, how many of its ``n``-gram
    window positions carry a gram that occurs **more than once inside the
    same document** — the Gopher-style "repeated n-gram fraction" quality
    signal, kept as exact integers ``(doc_id, n_windows, n_rep_windows)``
    so thresholding stays float-free.

    Scale shape: entirely per-row — ``array_sort`` over the row's gram
    structs, then one pass counting positions with an equal sorted
    neighbor (a position's gram repeats iff it equals a neighbor after
    sorting). O(w log w) per doc inside whole-stage codegen, ZERO shuffle,
    no explode — the cross-doc n-gram machinery above is the wrong tool
    here because repetition is a within-row property. Documents shorter
    than ``n`` report ``(0, 0)`` windows.

    Analog surface: the reference's per-feature command-run detection
    (/root/reference/mapbox_vector_tile/geom_encoder.py collapses repeated
    MoveTo/LineTo runs per feature); here repeated windows are *measured*
    per document for corpus curation instead of collapsed.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    fields = ", ".join(f"tokens[i+{d}] AS t{d}" for d in range(n))
    sorted_grams = (
        f"array_sort(transform(sequence(0, n_tok - {n}), "
        f"i -> struct({fields})))"
    )
    rep_count = (
        "size(filter(sequence(0, size(s) - 1), j -> "
        "(j > 0 AND s[j] = s[j-1]) OR "
        "(j < size(s) - 1 AND s[j] = s[j+1])))"
    )
    staged = decoded_df.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.when(F.col("n_tok") >= n, F.expr(sorted_grams)).alias("s"),
    )
    return staged.select(
        "doc_id",
        F.when(F.col("n_tok") >= n, F.col("n_tok") - n + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_windows"),
        F.when(F.col("n_tok") >= n, F.expr(rep_count))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_rep_windows"),
    )


def repetition_flag_expr(thresh_pct: int) -> Column:
    """Boolean: doc fails the repetition screen. Integer compare
    (``100*rep >= pct*windows``) over :func:`ngram_repetition` columns;
    zero-window docs never flag."""
    return (F.col("n_windows") > 0) & (
        F.col("n_rep_windows") * 100
        >= F.col("n_windows") * F.lit(int(thresh_pct))
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
