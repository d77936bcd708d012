"""Cross-document duplicate span detection — token-level dedup audit.

Doc-level dedup (exact hash, MinHash, SimHash — functions/text.py) misses
the dominant duplication mode in web corpora: long verbatim *spans* shared
across otherwise-different documents (boilerplate, quotes, mirrored
passages). The public method family (suffix-array substring dedup,
"Deduplicating Training Data Makes Language Models Better", Lee et al.
2021, arXiv:2107.06499) reduces on Spark to: every ``w``-token window,
find windows whose exact token tuple occurs in >= 2 distinct documents.

Scale shape (two-phase, exact):

1. **Candidate pass** — one projection computes ``xxhash64`` of each
   window's tokens (JVM-side, inside the same WholeStageCodegen as the
   window expansion), so the exploded stream that reaches the first
   shuffle is ``(doc_id, h)`` — O(total tokens) narrow rows, never
   O(tokens x w) materialized token columns. A hash aggregate keeps the
   hashes seen in >= 2 distinct docs (map-side partial dedup first).
2. **Verify pass** — windows are re-expanded and semi-joined on ``h``
   (only candidate positions carry their token tuples through the second
   shuffle — on real corpora a small fraction), then exact duplication is
   decided on the literal token tuples, so hash collisions cannot create
   false positives and the result is reproducible by any SQL engine.

Both passes are pure Catalyst. The per-doc output is exact integers
``(doc_id, n_windows, n_dup_windows)`` — threshold/scrub decisions stay
float-free downstream.

Analog surface: the reference detects repeated command runs *within* one
feature's command stream (/root/reference/mapbox_vector_tile/
geom_encoder.py run collapsing); here repeated token runs are detected
*across* documents for corpus curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _window_grams(decoded_df: DataFrame, w: int) -> DataFrame:
    """Exploded ``(doc_id, t0..t{w-1})`` windows of every document."""
    fields = ", ".join(
        f"CAST(tokens[i+{d}] AS BIGINT) AS t{d}" for d in range(w)
    )
    windows = f"transform(sequence(0, n_tok - {w}), i -> struct({fields}))"
    return (
        decoded_df.filter(F.col("n_tok") >= w)
        .select("doc_id", F.explode(F.expr(windows)).alias("g"))
        .select("doc_id", "g.*")
    )


def duplicate_spans(decoded_df: DataFrame, w: int = 8) -> DataFrame:
    """Per-doc cross-document duplicate-span audit:
    ``(doc_id, n_windows, n_dup_windows)``.

    ``n_dup_windows`` counts window positions whose exact ``w``-token
    tuple occurs in at least 2 distinct documents (all its positions
    count, in every document carrying it). Docs shorter than ``w``
    report ``(0, 0)``.
    """
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    cols = [f"t{d}" for d in range(w)]

    # Phase 1: candidate hashes — narrow (doc_id, h) rows only.
    grams = _window_grams(decoded_df, w)
    hashed = grams.select("doc_id", F.xxhash64(*cols).alias("h"))
    cand = (
        hashed.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )

    # Phase 2: exact verify — only candidate positions keep their tuples.
    cand_grams = grams.withColumn("h", F.xxhash64(*cols)).join(
        cand, "h", "left_semi"
    )
    dup_tuples = (
        cand_grams.groupBy(*cols)
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select(*cols)
    )
    dup_positions = cand_grams.join(dup_tuples, cols, "left_semi")
    per_doc_dup = dup_positions.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_windows")
    )

    totals = decoded_df.select(
        "doc_id",
        F.when(F.col("n_tok") >= w, F.col("n_tok") - w + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_windows"),
    )
    return totals.join(per_doc_dup, "doc_id", "left").select(
        "doc_id",
        "n_windows",
        F.coalesce(F.col("n_dup_windows"), F.lit(0))
        .cast("long")
        .alias("n_dup_windows"),
    )
