"""KMV (bottom-k) distinct sketch over token n-grams.

The exact n-gram machinery (:mod:`.ngrams`) shuffles (gram, partial-count)
pairs — exact, but at 10^12-sequence scale the distinct-gram domain itself
can exceed cluster memory. The KMV / bottom-k sketch (Bar-Yossef et al.
2002, the classic distinct-value estimator) answers "how many distinct
n-grams does the corpus contain" from a fixed k-value state: keep the k
smallest DISTINCT hash values of the grams; if the kth smallest is ``h_k``
over a hash domain ``[0, 2^48)``, the distinct count is ~``(k-1) * 2^48 /
h_k`` (relative error ~1/sqrt(k-2), ~3% at k=1024).

Determinism is total — the estimate is a pure function of the corpus, not
of parallelism or row order, because the global bottom-k of a union is the
bottom-k of the union of per-row (and per-partition) bottom-ks:

1. per ROW: gram hashes via the portable 48-bit-md5 (`text.h48` family),
   row-local ``slice(array_sort(array_distinct(...)), 1, k)`` — pure
   Catalyst, bounds every row's contribution to k values;
2. per PARTITION: an Arrow-batched running ``np.unique`` merge trimmed to
   k — the sketch-combine shape; emits <= k values per partition;
3. global: distinct + orderBy + limit(k) over <= k * n_partitions rows
   (driver-side tiny), then one closed-form projection for the estimate.

The estimate uses integer division only, so a SQL engine reproduces it
bit-for-bit; when fewer than k distinct hashes exist the sketch IS the
exact distinct set and the estimate degrades to the exact count.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from ..corpus import MOD

H_DOMAIN = 1 << 48  # h48 hash domain


def _gram_hash_expr(n: int) -> str:
    """SQL expression: array of h48 hashes of every ``n``-gram window.

    Self-guarding on short docs (``n_tok < n`` -> empty array) because
    Catalyst's InferFiltersFromGenerate can evaluate this expression
    BEFORE any caller-side ``n_tok >= n`` filter in the same combined
    predicate — the guard must live inside the expression.
    """
    parts = " || ',' || ".join(
        f"CAST(tokens[i+{d}] AS BIGINT)" for d in range(n)
    )
    return (
        f"IF(n_tok >= {n}, transform(sequence(0, n_tok - {n}), "
        f"i -> CAST(conv(substring(md5(CAST({parts} AS STRING)), 1, 12), "
        f"16, 10) AS BIGINT)), CAST(array() AS array<bigint>))"
    )


def kmv_distinct_ngrams(
    decoded_df: DataFrame, n: int = 3, k: int = 1024
) -> DataFrame:
    """One-row distinct-``n``-gram sketch: ``(k_used, n_seen, kth_h,
    bottomk_cks, est_distinct)``.

    ``n_seen`` is the sketch occupancy (== k when the corpus has >= k
    distinct grams), ``kth_h`` the largest retained hash, ``bottomk_cks``
    the pmod-sum of the retained set (membership evidence — a fake that
    only gets the estimate right fails the gate), ``est_distinct`` the
    KMV estimate (exact count when occupancy < k).
    """
    if n < 1 or k < 2:
        raise ValueError(f"need n >= 1 and k >= 2, got n={n} k={k}")
    row_local = (
        decoded_df.filter(F.col("n_tok") >= n)
        .select(
            F.slice(
                F.array_sort(F.array_distinct(F.expr(_gram_hash_expr(n)))),
                1,
                k,
            ).alias("hs")
        )
        .select(F.explode("hs").alias("h"))
    )

    def partial(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        state = np.empty(0, dtype=np.int64)
        for batch in batches:
            h = batch.column("h").to_numpy(zero_copy_only=False)
            state = np.unique(np.concatenate([state, h]))[:k]
        if state.size:
            yield pa.RecordBatch.from_arrays(
                [pa.array(state, pa.int64())], names=["h"]
            )

    merged = (
        row_local.mapInArrow(partial, "h long")
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    agg = merged.agg(
        F.count("*").alias("n_seen"),
        F.max("h").alias("kth_h"),
        F.pmod(F.sum("h"), F.lit(MOD)).alias("bottomk_cks"),
    )
    # integer DIV, not float /: the numerator is ~2^58, past double's
    # 53-bit mantissa, and the SQL mirror uses integer division
    est = F.when(
        F.col("n_seen") >= k,
        F.expr(f"({int(k - 1)}L * {H_DOMAIN}L) DIV kth_h"),
    ).otherwise(F.col("n_seen"))
    return agg.select(
        F.lit(int(k)).cast("long").alias("k_used"),
        F.col("n_seen").cast("long"),
        F.col("kth_h").cast("long"),
        F.col("bottomk_cks").cast("long"),
        est.cast("long").alias("est_distinct"),
    )


def kmv_distinct_ngrams_sql(
    n: int = 3, k: int = 1024, doc_source: str = "documents"
) -> str:
    """DuckDB mirror: exact distinct gram hashes -> bottom-k -> the same
    closed-form estimate (integer division)."""
    from ..corpus import params_cte_sql, tokens_cte_sql

    toks = ", ".join(
        f"LEAD(tok, {d}) OVER (PARTITION BY doc_id ORDER BY j) AS t{d}"
        for d in range(1, n)
    )
    lead_cols = (", " + toks) if n > 1 else ""
    parts = " || ',' || ".join(
        ["CAST(tok AS BIGINT)"] + [f"CAST(t{d} AS BIGINT)" for d in range(1, n)]
    )
    not_null = " AND ".join(
        ["tok IS NOT NULL"] + [f"t{d} IS NOT NULL" for d in range(1, n)]
    )
    return f"""
WITH{params_cte_sql(doc_source)},{tokens_cte_sql()},
  w AS (
    SELECT doc_id, j, tok{lead_cols} FROM t
  ),
  g AS (
    SELECT DISTINCT
      CAST('0x' || substr(md5(CAST({parts} AS VARCHAR)), 1, 12) AS BIGINT)
        AS h
    FROM w WHERE {not_null}
  ),
  b AS (
    SELECT h FROM g ORDER BY h LIMIT {int(k)}
  ),
  a AS (
    SELECT COUNT(*) AS n_seen, MAX(h) AS kth_h,
           ((SUM(h) % {MOD}) + {MOD}) % {MOD} AS cks
    FROM b
  )
SELECT CAST({int(k)} AS BIGINT) AS k_used,
       CAST(n_seen AS BIGINT) AS n_seen,
       CAST(kth_h AS BIGINT) AS kth_h,
       CAST(cks AS BIGINT) AS bottomk_cks,
       CAST(CASE WHEN n_seen >= {int(k)}
                 THEN ({int(k - 1)} * {H_DOMAIN}) // kth_h
                 ELSE n_seen END AS BIGINT) AS est_distinct
FROM a
"""
