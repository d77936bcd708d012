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


_CHUNK_STRUCT = "array<struct<len:int,cks:bigint>>"


def _chunk_structs(tokens: Column, n_tok: Column) -> Column:
    """Per-doc CDC chunk multiset as ``array<struct<len,cks>>``.

    ``cks`` is the order-sensitive position-weighted content checksum of
    the chunk (``sum (tok+1) * within-chunk-position mod MOD``) — the
    identity a delta-storage layer keys chunk reuse on. Pure Catalyst:
    the per-chunk sum is one ``aggregate`` over ``sequence(lo+1, hi)``.
    """
    idx = F.when(
        n_tok >= W, F.sequence(F.lit(W - 1), n_tok - 1)
    ).otherwise(F.array().cast("array<int>"))
    cuts = F.filter(idx, lambda j: _poly(tokens, j) % D == F.lit(0))
    lo = F.concat(F.array(F.lit(-1)), cuts)
    hi = F.concat(cuts, F.array(n_tok - 1))
    chunks = F.zip_with(
        lo,
        hi,
        lambda a, b: F.struct(
            (b - a).cast("int").alias("len"),
            # guard: when the LAST position is itself a cut the tail
            # "chunk" is empty (a == b) and sequence(a+1, b) would run
            # DESCENDING past the array — emit 0 and filter it below
            F.when(
                b > a,
                F.pmod(
                    F.aggregate(
                        F.sequence(a + 1, b),
                        F.lit(0).cast("long"),
                        lambda acc, j: acc
                        + (F.element_at(tokens, j + 1).cast("long") + 1)
                        * (j - a).cast("long"),
                    ),
                    F.lit(MOD),
                ),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("cks"),
        ),
    )
    # an empty tail chunk is not a chunk (and the SQL mirror's grouped
    # token rows can never produce one)
    chunks = F.filter(chunks, lambda c: c["len"] > 0)
    return F.when(n_tok > 0, chunks).otherwise(F.array().cast(_CHUNK_STRUCT))


def recrawl_delta_stats(df: DataFrame) -> DataFrame:
    """Delta-storage screen for re-crawled documents: how much of each
    doc's NEW version is reusable as existing CDC chunks of the OLD one.

    The "recrawl" is the deterministic worst case for fixed-stride
    chunking — the first token dropped, shifting every later position by
    one — so any reuse measured here exists only because content-defined
    boundaries realign after the edit (the rsync/LBFS property; with
    fixed-stride chunks reuse would be ~0). Per doc:

    ``chunks_reused`` / ``tokens_reused`` — the multiset intersection of
    the two versions' chunk sets keyed on ``(len, cks)``, i.e. the bytes a
    delta store would NOT re-store, plus both sides' chunk/token totals.

    Everything is computed IN THE ROW: both versions' chunk arrays come
    from the same token array and the multiset intersection is a nested
    higher-order aggregate over ``array_distinct`` — zero shuffle, zero
    Python, no self-join (plan-asserted). At 100 TB this is a map-only
    pass; chunk counts per row are ~n_tok/D so the O(chunks²) row-local
    intersection is bounded (~16² at the 8192-token outlier).
    """
    co = _chunk_structs(F.col("tokens"), F.col("n_tok"))
    n_new = F.greatest(F.col("n_tok") - 1, F.lit(0))
    toks_new = F.when(
        F.col("n_tok") > 1,
        F.slice(F.col("tokens"), F.lit(2), F.col("n_tok") - 1),
    ).otherwise(F.array().cast("array<int>"))
    # LET-BIND the sliced new-version array through a one-element
    # ``transform`` before chunking it: the chunker's nested lambdas read
    # the token array via ``element_at`` once per window position, and a
    # non-attribute input (the ``slice`` above) is RE-EVALUATED on every
    # such read — an O(n_tok) array copy per element access, O(n_tok^2)
    # per row (measured 93 s for 500 docs at sf0.01; 0.7 s bound). The
    # lambda variable makes the slice evaluate once per row.
    cn = F.transform(
        F.array(toks_new), lambda ts: _chunk_structs(ts, F.size(ts))
    )[0]

    def _cnt(arr: Column, ch: Column) -> Column:
        return F.size(F.filter(arr, lambda c: c == ch))

    base = df.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok_old"),
        n_new.cast("long").alias("n_tok_new"),
        co.alias("co"),
        cn.alias("cn"),
    )
    uniq = F.array_distinct(F.col("cn"))
    return (
        base.select(
            "doc_id",
            "n_tok_old",
            "n_tok_new",
            F.size("co").cast("long").alias("n_chunks_old"),
            F.size("cn").cast("long").alias("n_chunks_new"),
            F.aggregate(
                uniq,
                F.lit(0).cast("long"),
                lambda acc, ch: acc
                + F.least(_cnt(F.col("co"), ch), _cnt(F.col("cn"), ch)).cast(
                    "long"
                ),
            ).alias("chunks_reused"),
            F.aggregate(
                uniq,
                F.lit(0).cast("long"),
                lambda acc, ch: acc
                + ch["len"].cast("long")
                * F.least(_cnt(F.col("co"), ch), _cnt(F.col("cn"), ch)).cast(
                    "long"
                ),
            ).alias("tokens_reused"),
        )
        .orderBy("doc_id")
    )


def _chunk_group_sql(side: str, src: str) -> str:
    """CTE chain rebuilding one version's chunk multiset ``u_<side>
    (doc_id, len, cks, cnt)`` plus totals ``tot_<side>`` from a
    ``(doc_id, j, tok)`` source — the SQL mirror of :func:`_chunk_structs`
    (LAG windows for the rolling hash, a running cut count for chunk
    assignment, and ``swj - (start-1)*sw`` for the position-weighted
    checksum)."""
    lags = ", ".join(
        f"LAG(tok + 1, {d}) OVER (PARTITION BY doc_id ORDER BY j) AS t{d}"
        for d in range(1, W)
    )
    h = f"t{W - 1}"
    for d in range(W - 2, 0, -1):
        h = f"({h}) * {B} + t{d}"
    h = f"(({h}) * {B} + tok + 1)"
    return f"""
  s_{side} AS (
    SELECT doc_id, j, tok, {lags} FROM {src}
  ),
  m_{side} AS (
    SELECT doc_id, j, tok,
           CASE WHEN j >= {W - 1} AND {h} % {D} = 0 THEN 1 ELSE 0 END
             AS is_cut
    FROM s_{side}
  ),
  c_{side} AS (
    SELECT doc_id, j, tok,
           SUM(is_cut) OVER (PARTITION BY doc_id ORDER BY j) - is_cut
             AS chunk
    FROM m_{side}
  ),
  g_{side} AS (
    SELECT doc_id, chunk, COUNT(*) AS len, MIN(j) AS start,
           SUM((tok + 1) * j) AS swj, SUM(tok + 1) AS sw
    FROM c_{side} GROUP BY doc_id, chunk
  ),
  h_{side} AS (
    SELECT doc_id, CAST(len AS BIGINT) AS len,
           CAST((((swj - (start - 1) * sw) % {MOD}) + {MOD}) % {MOD}
                AS BIGINT) AS cks
    FROM g_{side}
  ),
  u_{side} AS (
    SELECT doc_id, len, cks, COUNT(*) AS cnt
    FROM h_{side} GROUP BY doc_id, len, cks
  ),
  tot_{side} AS (
    SELECT doc_id, SUM(cnt) AS n_chunks FROM u_{side} GROUP BY doc_id
  )"""


def recrawl_delta_sql(doc_source: str = "documents") -> str:
    """DuckDB mirror of :func:`recrawl_delta_stats` — both versions'
    chunk multisets rebuilt from the generator formula, reuse via a
    grouped equi-join on ``(doc_id, len, cks)`` with ``LEAST`` counts."""
    from ..corpus import params_cte_sql, tokens_cte_sql

    return f"""
WITH{params_cte_sql(doc_source)},{tokens_cte_sql()},
  t_old AS (
    SELECT doc_id, j, tok FROM t WHERE tok IS NOT NULL
  ),
  t_new AS (
    SELECT doc_id, j - 1 AS j, tok FROM t WHERE tok IS NOT NULL AND j >= 1
  ),{_chunk_group_sql("old", "t_old")},{_chunk_group_sql("new", "t_new")},
  r AS (
    SELECT o.doc_id,
           SUM(LEAST(o.cnt, n.cnt)) AS chunks_reused,
           SUM(o.len * LEAST(o.cnt, n.cnt)) AS tokens_reused
    FROM u_old o
    JOIN u_new n
      ON o.doc_id = n.doc_id AND o.len = n.len AND o.cks = n.cks
    GROUP BY o.doc_id
  )
SELECT printf('doc-%08d', p.doc_id) AS doc_id,
       CAST(p.n_tok AS BIGINT) AS n_tok_old,
       CAST(GREATEST(p.n_tok - 1, 0) AS BIGINT) AS n_tok_new,
       CAST(COALESCE(to_o.n_chunks, 0) AS BIGINT) AS n_chunks_old,
       CAST(COALESCE(to_n.n_chunks, 0) AS BIGINT) AS n_chunks_new,
       CAST(COALESCE(r.chunks_reused, 0) AS BIGINT) AS chunks_reused,
       CAST(COALESCE(r.tokens_reused, 0) AS BIGINT) AS tokens_reused
FROM p
LEFT JOIN tot_old to_o ON to_o.doc_id = p.doc_id
LEFT JOIN tot_new to_n ON to_n.doc_id = p.doc_id
LEFT JOIN r ON r.doc_id = p.doc_id
ORDER BY doc_id
"""


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
