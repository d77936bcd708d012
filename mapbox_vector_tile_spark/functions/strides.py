"""Sliding-window context chunking: split long documents into overlapping
fixed-size windows (the standard LM preprocessing for docs longer than the
model context — window ``k``, stride ``s < k`` keeps ``k - s`` tokens of
overlap so no next-token prediction loses its left context).

Entirely per-row Catalyst: each doc projects its window starts
(``sequence`` over ``ceil(n_tok / stride)`` values), ``posexplode`` fans out
one row per window, and ``slice`` carves the token array — no shuffle, no
Python, fan-out happens map-side exactly like the reference cutting one
geometry into per-tile fragments stays inside the tile loop
(/root/reference/mapbox_vector_tile/encoder.py, per-feature quantize/clip).

The oracle contract is ORDER-SENSITIVE per window: each window row carries
position-weighted checksums of its content, and DuckDB recomputes them from
the closed-form generator via a range join of token positions against
window spans — a hash match proves membership AND in-window order for every
window (same contract style as the reference's round-trip equality,
/root/reference/tests/test_encoder.py:20-50).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..corpus import MOD, params_cte_sql, tokens_cte_sql


def sliding_window_chunks(
    tokens_df: DataFrame, window: int, stride: int
) -> DataFrame:
    """``(doc_id, tokens, n_tok)`` -> one row per window:
    ``(doc_id, win_idx, n_fill, tokens)``.

    Windows start at ``0, stride, 2*stride, ...`` while the start is inside
    the doc; the tail window may be short (``n_fill < window``). Empty docs
    produce no windows. ``stride > window`` (gaps) is allowed — sampling
    spaced snippets is the same operation.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    n_win = F.ceil(F.col("n_tok") / F.lit(stride)).cast("int")
    starts = F.when(
        F.col("n_tok") > 0,
        F.transform(
            F.sequence(F.lit(0), n_win - 1), lambda w: w * F.lit(stride)
        ),
    ).otherwise(F.array().cast("array<int>"))
    exploded = tokens_df.select(
        "doc_id",
        "tokens",
        F.posexplode(starts).alias("win_idx", "start"),
    )
    return exploded.select(
        "doc_id",
        "win_idx",
        F.slice("tokens", F.col("start") + 1, window).alias("tokens"),
    ).withColumn("n_fill", F.size("tokens"))


def window_checksums(chunks: DataFrame) -> DataFrame:
    """Per-window order-sensitive checksums over :func:`sliding_window_chunks`
    output: ``(doc_id, win_idx, n_fill, w_cks, w_wcks)`` — plain sum and
    in-window position-weighted sum, both pmod ``MOD``."""
    zero = F.lit(0).cast("long")
    cks = F.aggregate(
        "tokens", zero, lambda a, x: a + x.cast("long")
    )
    wcks = F.aggregate(
        F.zip_with(
            "tokens",
            F.sequence(F.lit(1), F.greatest(F.lit(1), F.col("n_fill"))),
            lambda t, i: i.cast("long") * t.cast("long"),
        ),
        zero,
        lambda a, x: a + x,
    )
    return chunks.select(
        "doc_id",
        "win_idx",
        F.col("n_fill").cast("long").alias("n_fill"),
        F.pmod(cks, F.lit(MOD)).cast("long").alias("w_cks"),
        F.pmod(wcks, F.lit(MOD)).cast("long").alias("w_wcks"),
    ).orderBy("doc_id", "win_idx")


def window_checksums_sql(
    window: int, stride: int, doc_source: str = "documents"
) -> str:
    """DuckDB mirror of ``sliding_window_chunks`` + :func:`window_checksums`
    straight from the generator formula (range join of token positions
    against window spans)."""
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    return f"""
WITH{params_cte_sql(doc_source)},{tokens_cte_sql()},
  wins AS (
    SELECT doc_id, u.w AS win_idx, u.w * {int(stride)} AS s
    FROM p LEFT JOIN LATERAL
      unnest(range((n_tok + {int(stride)} - 1) // {int(stride)})) u(w)
      ON true
    WHERE n_tok > 0
  )
SELECT printf('doc-%08d', w.doc_id) AS doc_id,
       CAST(w.win_idx AS BIGINT) AS win_idx,
       CAST(COUNT(t.tok) AS BIGINT) AS n_fill,
       CAST(((COALESCE(SUM(t.tok), 0) % {MOD}) + {MOD}) % {MOD} AS BIGINT)
         AS w_cks,
       CAST(((COALESCE(SUM((t.j - w.s + 1) * t.tok), 0) % {MOD}) + {MOD})
         % {MOD} AS BIGINT) AS w_wcks
FROM wins w JOIN t ON t.doc_id = w.doc_id
  AND t.j >= w.s AND t.j < w.s + {int(window)}
GROUP BY w.doc_id, w.win_idx
ORDER BY doc_id, win_idx
"""
