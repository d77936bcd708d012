"""Content-defined chunking: rolling-hash boundaries inside token streams.

Fixed-stride chunking breaks under insertion/deletion (every downstream
chunk shifts); content-defined chunking (CDC — the rsync/LBFS family) cuts
where a rolling hash of the last ``w`` tokens hits a target residue, so
boundaries realign after an edit. In a training-data pipeline this is the
shift-robust unit for near-dup detection and delta storage of re-crawled
documents.

Everything is per-row Catalyst over the token array — boundary positions
via ``filter(sequence(...))`` with a degree-``w`` polynomial of
``element_at`` terms, chunk lengths via one ``zip_with`` over the shifted
boundary array — zero shuffle, zero Python (plan-asserted in tests). The
hash is defined over ``tok + 1`` so an all-zero run does not degenerate to
"every position is a boundary".

All outputs are exact integers, so the DuckDB oracle reproduces them from
the generator formula with LAG windows — membership AND position, not just
counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..corpus import MOD

W = 4  # rolling window (tokens)
B = 31  # polynomial base (public classic)
D = 512  # boundary divisor: expected chunk length ~D


def _poly(tokens: Column, j: Column) -> Column:
    """Degree-(W-1) polynomial of the window ending at 0-based position
    ``j``: ``((t[j-3]*B + t[j-2])*B + t[j-1])*B + t[j]`` over ``tok + 1``."""
    h = F.element_at(tokens, j - (W - 2)).cast("long") + 1
    for d in range(W - 2, -1, -1):
        h = h * B + F.element_at(tokens, j + 1 - d).cast("long") + 1
    return h

def cdc_boundaries(df: DataFrame) -> DataFrame:
    """Per-doc CDC summary: ``(doc_id, n_tok, n_chunks, cut_cks,
    max_chunk)``.

    A cut falls AFTER 0-based position ``j`` (``j >= W-1``) when the
    window hash ``% D == 0``; the tail segment is always a chunk, so a
    non-empty doc has ``cuts + 1`` chunks. ``cut_cks`` is the
    order-insensitive pmod sum of ``j + 1`` over cut positions (position
    evidence, not just counts); ``max_chunk`` is the longest chunk —
    the number a delta-storage layer sizes its buffers from.
    """
    toks = F.col("tokens")
    idx = F.when(
        F.col("n_tok") >= W,
        F.sequence(F.lit(W - 1), F.col("n_tok") - 1),
    ).otherwise(F.array().cast("array<int>"))
    cuts = F.filter(idx, lambda j: _poly(toks, j) % D == F.lit(0))
    # chunk lengths from the shifted boundary array: [-1, cuts..] zipped
    # against [cuts.., n_tok-1] (cut at j ends its chunk at j)
    lo = F.concat(F.array(F.lit(-1)), cuts)
    hi = F.concat(cuts, F.array(F.col("n_tok") - 1))
    lens = F.zip_with(lo, hi, lambda a, b: b - a)
    cut_cks = F.aggregate(
        cuts,
        F.lit(0).cast("long"),
        lambda acc, j: acc + j.cast("long") + 1,
    )
    return df.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.when(F.col("n_tok") > 0, F.size(cuts) + 1)
        .otherwise(0)
        .cast("long")
        .alias("n_chunks"),
        F.pmod(cut_cks, F.lit(MOD)).cast("long").alias("cut_cks"),
        F.when(F.col("n_tok") > 0, F.array_max(lens))
        .otherwise(0)
        .cast("long")
        .alias("max_chunk"),
    ).orderBy("doc_id")


def cdc_boundaries_sql(doc_source: str = "documents") -> str:
    """DuckDB mirror of :func:`cdc_boundaries` from the generator formula
    (LAG windows rebuild each position's W-token rolling hash)."""
    from ..corpus import params_cte_sql, tokens_cte_sql

    lags = ", ".join(
        f"LAG(tok + 1, {d}) OVER (PARTITION BY doc_id ORDER BY j) AS t{d}"
        for d in range(1, W)
    )
    h = f"t{W - 1}"
    for d in range(W - 2, 0, -1):
        h = f"({h}) * {B} + t{d}"
    h = f"(({h}) * {B} + tok + 1)"
    return f"""
WITH{params_cte_sql(doc_source)},{tokens_cte_sql()},
  s AS (
    SELECT doc_id, j, tok, {lags}
    FROM t WHERE tok IS NOT NULL
  ),
  b AS (
    SELECT doc_id, j FROM s
    WHERE j >= {W - 1} AND {h} % {D} = 0
  ),
  lens AS (
    SELECT doc_id,
           j - COALESCE(LAG(j) OVER (PARTITION BY doc_id ORDER BY j), -1)
             AS len
    FROM b
  ),
  cut AS (
    SELECT doc_id, COUNT(*) AS m, MAX(j) AS mx,
           SUM(j + 1) AS cks
    FROM b GROUP BY doc_id
  ),
  mlen AS (
    SELECT doc_id, MAX(len) AS ml FROM lens GROUP BY doc_id
  )
SELECT printf('doc-%08d', p.doc_id) AS doc_id,
       CAST(p.n_tok AS BIGINT) AS n_tok,
       CAST(CASE WHEN p.n_tok > 0 THEN COALESCE(cut.m, 0) + 1 ELSE 0 END
            AS BIGINT) AS n_chunks,
       CAST(((COALESCE(cut.cks, 0) % {MOD}) + {MOD}) % {MOD} AS BIGINT)
         AS cut_cks,
       CAST(CASE WHEN p.n_tok > 0 THEN
              GREATEST(COALESCE(mlen.ml, 0),
                       p.n_tok - 1 - COALESCE(cut.mx, -1))
            ELSE 0 END AS BIGINT) AS max_chunk
FROM p
LEFT JOIN cut ON cut.doc_id = p.doc_id
LEFT JOIN mlen ON mlen.doc_id = p.doc_id
ORDER BY doc_id
"""
