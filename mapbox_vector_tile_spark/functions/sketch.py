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
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, Window, functions as F

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


def kmv_source_overlap(
    decoded_df: DataFrame, n: int = 3, k: int = 1024
) -> DataFrame:
    """Cross-source n-gram overlap from per-source KMV sketches — the
    set-operation face of KMV (Beyer et al., SIGMOD 2007 "On synopses
    for distinct-value estimation under multiset operations", public
    paper): one row per source pair with union / intersection / Jaccard
    estimates computed ONLY from the two k-value sketches.

    Why this shape at 100 TB: exact cross-source overlap is a shuffle of
    the whole distinct gram domain; here each source is reduced to its
    k smallest gram hashes (per-doc bottom-k slice -> distinct ->
    per-source rank window, all bounded), and every pairwise estimate is
    arithmetic over 2k-row inputs. The per-doc slice is lossless for the
    source-level bottom-k: if a hash is among a source's k smallest, at
    most k-1 hashes of its own doc are smaller, so it is in the doc's
    bottom-k too.

    All math is integer-exact (DIV, not float), so the DuckDB mirror
    reproduces every row hash-exact.
    """
    if n < 1 or k < 2:
        raise ValueError(f"need n >= 1 and k >= 2, got n={n} k={k}")
    grams = decoded_df.filter(F.col("n_tok") >= n).select(
        "source",
        F.explode(
            F.slice(
                F.array_sort(
                    F.array_distinct(F.expr(_gram_hash_expr(n)))
                ),
                1,
                k,
            )
        ).alias("h"),
    )

    # partition-local bottom-k per source BEFORE any shuffle: the rank
    # window then sees <= partitions x k rows per source, never the
    # source's whole distinct gram vocabulary (same partial+finisher
    # shape as the corpus-wide sketch above)
    reduce_at = max(65536, 8 * k)

    def _reduce(dfs: list) -> "pd.DataFrame":
        cur = pd.concat(dfs, ignore_index=True)
        cur = cur.drop_duplicates().sort_values("h", kind="stable")
        return cur.groupby("source", sort=False).head(k)

    def partial(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        bufs: list = []
        total = 0
        for batch in batches:
            bufs.append(batch.to_pandas())
            total += batch.num_rows
            if total >= reduce_at:  # amortized: O(log) reduces per task
                red = _reduce(bufs)
                bufs, total = [red], len(red)
        if bufs:
            out = _reduce(bufs)
            if len(out):
                yield pa.RecordBatch.from_pandas(
                    out.reset_index(drop=True), preserve_index=False
                )

    sk = grams.mapInArrow(partial, "source string, h long").distinct()
    rank_w = Window.partitionBy("source").orderBy("h")
    sk = (
        sk.withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    srcs = sk.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("sa"))
        .crossJoin(srcs.select(F.col("source").alias("sb")))
        .filter(F.col("sa") < F.col("sb"))
    )
    side_a = pairs.join(
        F.broadcast(sk), F.col("sa") == F.col("source")
    ).select("sa", "sb", "h", F.lit(1).alias("ina"), F.lit(0).alias("inb"))
    side_b = pairs.join(
        F.broadcast(sk), F.col("sb") == F.col("source")
    ).select("sa", "sb", "h", F.lit(0).alias("ina"), F.lit(1).alias("inb"))
    merged = (
        side_a.unionByName(side_b)
        .groupBy("sa", "sb", "h")
        .agg(F.max("ina").alias("ina"), F.max("inb").alias("inb"))
    )
    pair_w = Window.partitionBy("sa", "sb").orderBy("h")
    win = (
        merged.withColumn("rn", F.row_number().over(pair_w))
        .filter(F.col("rn") <= k)
    )
    agg = win.groupBy("sa", "sb").agg(
        F.count("*").alias("union_seen"),
        F.max("h").alias("union_kth"),
        F.sum(F.col("ina") * F.col("inb")).alias("inter_window"),
    )
    est_union = F.when(
        F.col("union_seen") >= k,
        F.expr(f"({int(k - 1)}L * {H_DOMAIN}L) DIV union_kth"),
    ).otherwise(F.col("union_seen"))
    return (
        agg.select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            F.lit(int(k)).cast("long").alias("k_used"),
            F.col("union_seen").cast("long"),
            F.col("union_kth").cast("long"),
            F.col("inter_window").cast("long"),
            est_union.cast("long").alias("est_union"),
        )
        .withColumn(
            "est_intersection",
            F.expr("(inter_window * est_union) DIV union_seen").cast("long"),
        )
        .withColumn(
            "jaccard_pct",
            F.expr("(100 * inter_window) DIV union_seen").cast("long"),
        )
        .orderBy("source_a", "source_b")
    )


def kmv_source_overlap_sql(
    n: int = 3, k: int = 1024, doc_source: str = "documents"
) -> str:
    """DuckDB mirror of :func:`kmv_source_overlap`: exact per-source
    distinct gram hashes -> identical rank windows and integer
    arithmetic (the per-doc slice in the Spark plan is lossless, so the
    oracle skips it)."""
    from ..corpus import params_cte_sql, source_case_sql, tokens_cte_sql

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
    SELECT DISTINCT {source_case_sql("doc_id")} AS source,
      CAST('0x' || substr(md5(CAST({parts} AS VARCHAR)), 1, 12) AS BIGINT)
        AS h
    FROM w WHERE {not_null}
  ),
  sk AS (
    SELECT source, h FROM (
      SELECT source, h,
             row_number() OVER (PARTITION BY source ORDER BY h) AS rn
      FROM g
    ) WHERE rn <= {int(k)}
  ),
  pr AS (
    SELECT a.source AS sa, b.source AS sb
    FROM (SELECT DISTINCT source FROM sk) a,
         (SELECT DISTINCT source FROM sk) b
    WHERE a.source < b.source
  ),
  m AS (
    SELECT sa, sb, h, MAX(ina) AS ina, MAX(inb) AS inb FROM (
      SELECT pr.sa, pr.sb, sk.h, 1 AS ina, 0 AS inb
      FROM pr JOIN sk ON sk.source = pr.sa
      UNION ALL
      SELECT pr.sa, pr.sb, sk.h, 0 AS ina, 1 AS inb
      FROM pr JOIN sk ON sk.source = pr.sb
    ) GROUP BY sa, sb, h
  ),
  win AS (
    SELECT * FROM (
      SELECT m.*, row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
      FROM m
    ) WHERE rn <= {int(k)}
  ),
  a AS (
    SELECT sa, sb, COUNT(*) AS union_seen, MAX(h) AS union_kth,
           SUM(ina * inb) AS inter_window
    FROM win GROUP BY sa, sb
  )
SELECT sa AS source_a, sb AS source_b,
       CAST({int(k)} AS BIGINT) AS k_used,
       CAST(union_seen AS BIGINT) AS union_seen,
       CAST(union_kth AS BIGINT) AS union_kth,
       CAST(inter_window AS BIGINT) AS inter_window,
       CAST(CASE WHEN union_seen >= {int(k)}
                 THEN ({int(k - 1)} * {H_DOMAIN}) // union_kth
                 ELSE union_seen END AS BIGINT) AS est_union,
       CAST((inter_window * (CASE WHEN union_seen >= {int(k)}
                 THEN ({int(k - 1)} * {H_DOMAIN}) // union_kth
                 ELSE union_seen END)) // union_seen AS BIGINT)
           AS est_intersection,
       CAST((100 * inter_window) // union_seen AS BIGINT) AS jaccard_pct
FROM a ORDER BY source_a, source_b
"""


# ---------------------------------------------------------------------------
# count-min frequency sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

CM_W = 512  # buckets per hash row
CM_D = 3  # hash rows


def _gram_str_expr(n: int) -> str:
    """SQL expression: per-doc array of ``n``-gram strings ("t0,t1,...").

    Same short-doc self-guard as :func:`_gram_hash_expr`."""
    parts = " || ',' || ".join(
        f"CAST(tokens[i+{d}] AS BIGINT)" for d in range(n)
    )
    return (
        f"IF(n_tok >= {n}, transform(sequence(0, n_tok - {n}), "
        f"i -> CAST({parts} AS STRING)), CAST(array() AS array<string>))"
    )


def _cm_bucket_sql_spark(r: int, g: str, w: int) -> str:
    """Row-``r`` CM bucket of gram-string column ``g`` (Spark dialect)."""
    return (
        f"CAST(conv(substring(md5('{r};' || {g}), 1, 12), 16, 10) AS BIGINT)"
        f" % {w}"
    )


def cm_bucket_counts(
    decoded_df: DataFrame, n: int = 2, w: int = CM_W, d: int = CM_D
) -> DataFrame:
    """(r, bucket, cnt): the full count-min state over token ``n``-grams.

    The counts are EXACT sums per (hash row, bucket) — the CM sketch is a
    pure function of the corpus (no sampling), so any SQL engine rebuilds
    it bit-for-bit. Plan shape at 100 TB: the gram explode is a map-side
    row blowup that never shuffles — partial (map-side) aggregation
    collapses every partition to <= w*d rows before the exchange, which is
    exactly the sketch-merge (CM states merge by addition). Total state
    w*d regardless of the distinct-gram domain; the exact n-gram path
    (:mod:`.ngrams`) shuffles the domain itself.
    """
    if n < 1 or w < 2 or d < 1:
        raise ValueError(f"need n>=1, w>=2, d>=1: n={n} w={w} d={d}")
    g = decoded_df.select(
        F.explode(F.expr(_gram_str_expr(n))).alias("g")
    )
    stacked = g.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("long").alias("r"),
                        F.expr(_cm_bucket_sql_spark(r, "g", w)).alias(
                            "bucket"
                        ),
                    )
                    for r in range(d)
                ]
            )
        ).alias("rb")
    )
    return stacked.groupBy(
        F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def cm_sketch_ngrams(
    decoded_df: DataFrame, n: int = 2, w: int = CM_W, d: int = CM_D
) -> DataFrame:
    """One row per hash row of the CM state: ``(r, nonzero_buckets,
    sum_counts, max_count, state_cks)``.

    ``sum_counts`` is the total gram count (identical across rows — a
    consistency invariant the gate checks d times over); ``state_cks``
    binds every count to its bucket (``sum (bucket+1)*cnt mod MOD``), so a
    fake that only gets totals right fails."""
    counts = cm_bucket_counts(decoded_df, n, w, d)
    return (
        counts.groupBy("r")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nonzero_buckets"),
            F.sum("cnt").alias("sum_counts"),
            F.max("cnt").alias("max_count"),
            F.pmod(
                F.sum((F.col("bucket") + 1) * F.col("cnt")), F.lit(MOD)
            ).alias("state_cks"),
        )
        .orderBy("r")
    )


def cm_estimate_top_ngrams(
    decoded_df: DataFrame,
    n: int = 2,
    w: int = CM_W,
    d: int = CM_D,
    k: int = 5,
) -> DataFrame:
    """(gram, exact_count, est_count): CM estimates for the ``k`` most
    frequent exact ``n``-grams, side by side with their true counts —
    demonstrates the estimator (``est = min over rows of state[bucket]``)
    and its one-sided error (``est >= exact`` always; equality unless the
    gram collides in every row).

    The exact side exists for the gate; the serving path at scale is the
    sketch state alone (w*d ints) answering point frequency queries
    without touching the corpus."""
    g = decoded_df.select(
        F.explode(F.expr(_gram_str_expr(n))).alias("g")
    )
    top = (
        g.groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), F.col("g").asc())
        .limit(k)
    )
    counts = cm_bucket_counts(decoded_df, n, w, d)
    probes = top.select(
        "g",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("long").alias("r"),
                        F.expr(_cm_bucket_sql_spark(r, "g", w)).alias(
                            "bucket"
                        ),
                    )
                    for r in range(d)
                ]
            )
        ).alias("rb"),
    ).select("g", "exact_count", "rb.r", "rb.bucket")
    return (
        probes.join(F.broadcast(counts), ["r", "bucket"])
        .groupBy("g", "exact_count")
        .agg(F.min("cnt").alias("est_count"))
        .orderBy(F.col("exact_count").desc(), F.col("g").asc())
    )


def _cm_grams_cte(n: int, doc_source: str) -> str:
    from ..corpus import params_cte_sql, tokens_cte_sql

    toks = ", ".join(
        f"LEAD(tok, {dd}) OVER (PARTITION BY doc_id ORDER BY j) AS t{dd}"
        for dd in range(1, n)
    )
    lead_cols = (", " + toks) if n > 1 else ""
    parts = " || ',' || ".join(
        ["CAST(tok AS BIGINT)"] + [f"CAST(t{dd} AS BIGINT)" for dd in range(1, n)]
    )
    not_null = " AND ".join(
        ["tok IS NOT NULL"] + [f"t{dd} IS NOT NULL" for dd in range(1, n)]
    )
    return f"""{params_cte_sql(doc_source)},{tokens_cte_sql()},
  wg AS (SELECT doc_id, j, tok{lead_cols} FROM t),
  g AS (SELECT CAST({parts} AS VARCHAR) AS g FROM wg WHERE {not_null})"""


def _cm_bucket_sql_duck(r_expr: str, g: str, w: int) -> str:
    return (
        f"CAST('0x' || substr(md5(CAST({r_expr} AS VARCHAR) || ';' || {g}),"
        f" 1, 12) AS BIGINT) % {w}"
    )


def _cm_counts_cte(w: int, d: int) -> str:
    return f"""
  rb AS (
    SELECT u.r AS r, {_cm_bucket_sql_duck('u.r', 'g.g', w)} AS bucket
    FROM g, unnest(range({d})) u(r)
  ),
  cm AS (
    SELECT r, bucket, COUNT(*) AS cnt FROM rb GROUP BY r, bucket
  )"""


def cm_sketch_ngrams_sql(
    n: int = 2, w: int = CM_W, d: int = CM_D, doc_source: str = "documents"
) -> str:
    return f"""
WITH{_cm_grams_cte(n, doc_source)},{_cm_counts_cte(w, d)}
SELECT CAST(r AS BIGINT) AS r,
       CAST(COUNT(*) AS BIGINT) AS nonzero_buckets,
       CAST(SUM(cnt) AS BIGINT) AS sum_counts,
       CAST(MAX(cnt) AS BIGINT) AS max_count,
       CAST(((SUM((bucket + 1) * cnt) % {MOD}) + {MOD}) % {MOD} AS BIGINT)
         AS state_cks
FROM cm GROUP BY r ORDER BY r
"""


def cm_estimate_top_ngrams_sql(
    n: int = 2,
    w: int = CM_W,
    d: int = CM_D,
    k: int = 5,
    doc_source: str = "documents",
) -> str:
    return f"""
WITH{_cm_grams_cte(n, doc_source)},{_cm_counts_cte(w, d)},
  top AS (
    SELECT g, COUNT(*) AS exact_count FROM g GROUP BY g
    ORDER BY exact_count DESC, g ASC LIMIT {k}
  ),
  pr AS (
    SELECT top.g, top.exact_count, u.r AS r,
           {_cm_bucket_sql_duck('u.r', 'top.g', w)} AS bucket
    FROM top, unnest(range({d})) u(r)
  )
SELECT pr.g AS g,
       CAST(pr.exact_count AS BIGINT) AS exact_count,
       CAST(MIN(cm.cnt) AS BIGINT) AS est_count
FROM pr JOIN cm ON cm.r = pr.r AND cm.bucket = pr.bucket
GROUP BY pr.g, pr.exact_count
ORDER BY exact_count DESC, g ASC
"""


# ---------------------------------------------------------------------------
# HyperLogLog: per-source vocabulary cardinality from 256 registers
# ---------------------------------------------------------------------------

HLL_P = 8  # register-index bits
HLL_M = 1 << HLL_P  # 256 registers
_HLL_REM_BITS = 48 - HLL_P  # 40 rank bits per hash
# alpha_256 = 0.7213 / (1 + 1.079/256), fixed-point parts-per-million —
# a shared CONSTANT, so the estimate is pure integer arithmetic end-to-end
HLL_ALPHA_PPM = 718_273
# (alpha * m^2 scaled) * 2^40: decimal literal because it exceeds int64;
# est_raw = _HLL_EST_NUM // (S * 10^6) with S = sum_j 2^(40 - M_j)
_HLL_EST_NUM = HLL_ALPHA_PPM * HLL_M * HLL_M * (1 << _HLL_REM_BITS)


def hll_register_table(tokens: DataFrame) -> DataFrame:
    """Per-source HLL registers over distinct TOKEN VALUES (the vocabulary).

    The industry-standard mergeable distinct sketch (Flajolet et al. 2007)
    beside the exact ``distinct_token_pushdown`` and the KMV bottom-k:
    fixed 2^p-register state per group, one map-side-combinable aggregate.
    ``bucket`` = top ``p`` bits of the portable 48-bit md5 hash; ``rho`` =
    leading-zero count of the remaining 40 bits + 1, via
    ``41 - length(bin(rem))`` — ``bin`` drops leading zeros identically in
    Spark and DuckDB, so the registers are hash-gated exactly.

    Scale shape: explode -> groupBy(source, bucket) max(rho). The partial
    aggregate bounds every partition's shuffle contribution at
    ``n_sources * 256`` rows regardless of token count — the whole point
    of the sketch at 100 TB.
    """
    from .text import h48

    h = h48(F.col("tok").cast("string"))
    return (
        tokens.select("source", F.explode("tokens").alias("tok"))
        .select(
            "source",
            F.shiftright(h, _HLL_REM_BITS).alias("bucket"),
            h.bitwiseAND(F.lit((1 << _HLL_REM_BITS) - 1)).alias("rem"),
        )
        .select(
            "source",
            "bucket",
            F.when(F.col("rem") == 0, F.lit(_HLL_REM_BITS + 1))
            .otherwise(F.lit(_HLL_REM_BITS + 1) - F.length(F.bin("rem")))
            .cast("long")
            .alias("rho"),
        )
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("rho_max"))
        .orderBy("source", "bucket")
    )


def hll_vocab_estimate(tokens: DataFrame) -> DataFrame:
    """Per-source raw HLL estimate as exact integer arithmetic, with the
    exact distinct count beside it (the accuracy is part of the gated
    result)::

        (source, n_occupied, v_zero, s_sum, est_raw, exact_distinct)

    ``s_sum`` = sum over ALL m registers of ``2^(40 - M_j)`` (absent
    register -> ``2^40``), so ``est_raw = alpha_ppm*m^2*2^40 //
    (s_sum * 10^6)`` is the textbook harmonic-mean estimator with the
    float folded into one fixed-point constant. The numerator exceeds
    int64, so both engines divide in wide decimal (decimal(38,0) /
    HUGEINT) and floor — bit-identical. Small-range (linear-counting)
    correction needs ``ln`` and is deliberately left to the caller:
    everything gated here is integer-exact.
    """
    regs = hll_register_table(tokens)
    per_src = regs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_occupied"),
        F.sum(
            F.expr(f"shiftleft(1L, int({_HLL_REM_BITS} - rho_max))")
        ).alias("s_occupied"),
    )
    s_sum = (
        F.col("s_occupied")
        + (F.lit(HLL_M) - F.col("n_occupied")) * F.lit(1 << _HLL_REM_BITS)
    ).alias("s_sum")
    exact = (
        tokens.select("source", F.explode("tokens").alias("tok"))
        .groupBy("source")
        .agg(F.count_distinct("tok").cast("long").alias("exact_distinct"))
    )
    est = F.floor(
        F.lit(str(_HLL_EST_NUM)).cast("decimal(38,0)")
        / (F.col("s_sum").cast("decimal(38,0)") * F.lit(1_000_000))
    ).cast("long")
    return (
        per_src.select(
            "source",
            "n_occupied",
            (F.lit(HLL_M) - F.col("n_occupied")).alias("v_zero"),
            s_sum,
        )
        .withColumn("est_raw", est)
        .join(exact, "source")
        .orderBy("source")
    )


def _hll_regs_cte(doc_source: str = "documents") -> str:
    from ..corpus import params_cte_sql, source_case_sql, tokens_cte_sql

    rem_mask = (1 << _HLL_REM_BITS) - 1
    h = "CAST('0x' || substr(md5(CAST(t.tok AS VARCHAR)), 1, 12) AS BIGINT)"
    return f"""{params_cte_sql(doc_source)},{tokens_cte_sql()},
  tok AS (
    SELECT {source_case_sql('t.doc_id')} AS source, t.tok,
           {h} AS h
    FROM t WHERE t.j IS NOT NULL
  ),
  hr AS (
    SELECT source, (h >> {_HLL_REM_BITS}) AS bucket,
           (h & {rem_mask}) AS rem
    FROM tok
  ),
  regs AS (
    SELECT source, bucket,
           MAX(CASE WHEN rem = 0 THEN {_HLL_REM_BITS + 1}
               ELSE {_HLL_REM_BITS + 1} - length(bin(rem)) END) AS rho_max
    FROM hr GROUP BY source, bucket
  )"""


def hll_register_table_sql(doc_source: str = "documents") -> str:
    return f"""
WITH {_hll_regs_cte(doc_source)}
SELECT source, CAST(bucket AS BIGINT) AS bucket,
       CAST(rho_max AS BIGINT) AS rho_max
FROM regs ORDER BY source, bucket
"""


def hll_vocab_estimate_sql(doc_source: str = "documents") -> str:
    return f"""
WITH {_hll_regs_cte(doc_source)},
per_src AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_occupied,
         CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_REM_BITS} - rho_max))
              AS BIGINT) AS s_occupied
  FROM regs GROUP BY source),
exact AS (
  SELECT source, CAST(COUNT(DISTINCT tok) AS BIGINT) AS exact_distinct
  FROM tok GROUP BY source)
SELECT p.source, p.n_occupied,
       CAST({HLL_M} - p.n_occupied AS BIGINT) AS v_zero,
       CAST(p.s_occupied
            + ({HLL_M} - p.n_occupied) * (CAST(1 AS BIGINT) << {_HLL_REM_BITS})
            AS BIGINT) AS s_sum,
       CAST(CAST({_HLL_EST_NUM} AS HUGEINT)
            // (CAST(p.s_occupied
                 + ({HLL_M} - p.n_occupied)
                   * (CAST(1 AS BIGINT) << {_HLL_REM_BITS}) AS HUGEINT)
                * 1000000) AS BIGINT) AS est_raw,
       e.exact_distinct
FROM per_src p JOIN exact e USING (source)
ORDER BY p.source
"""


# ---------------------------------------------------------------------------
# bottom-k order sample -> mergeable quantile sketch
# ---------------------------------------------------------------------------

SAMPLE_K = 1024


def bottomk_sample_quantiles(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int = SAMPLE_K,
    pcts: tuple = (50, 90, 99),
) -> DataFrame:
    """Mergeable quantile sketch from a DETERMINISTIC hash-ordered
    bottom-k row sample (order sampling, Rosén 1997; priority sampling,
    Duffield-Lund-Thorup 2007): keep the k rows whose ``h48(id)`` is
    smallest under the total order ``(hk, v)``. The bottom-k of a union
    is the bottom-k of the union of bottom-ks, so per-partition partials
    merge exactly (the KMV combine shape) and the sample — hence every
    quantile estimate — is a pure function of the data, independent of
    parallelism and row order. Quantile deviation follows the uniform-
    sample bound (~1/sqrt(k) in rank). Unlike KLL-style compactors this
    needs no internal randomness, which is exactly what lets the DuckDB
    oracle reproduce the sketch BIT-EXACTLY (same hash, same order, same
    integer rank rule); when the table has <= k rows the sample IS the
    table and the quantiles are exact.

    Returns ``(pct, v, n_sample)``: per requested percentile, the
    smallest sample value with ``100 * rank >= n * pct`` (the repo's
    integer quantile rule — any SQL engine reproduces it).
    """
    from pyspark.sql import Window

    from .text import h48

    rows = df.select(
        h48(F.col(id_col).cast("string")).alias("hk"),
        F.col(value_col).cast("long").alias("v"),
    )

    def partial(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        hk = np.empty(0, np.int64)
        v = np.empty(0, np.int64)
        for b in batches:
            hk = np.concatenate(
                [hk, b.column("hk").to_numpy(zero_copy_only=False)]
            )
            v = np.concatenate(
                [v, b.column("v").to_numpy(zero_copy_only=False)]
            )
            if hk.size > 4 * k:  # running trim keeps state O(k)
                keep = np.lexsort((v, hk))[:k]
                hk, v = hk[keep], v[keep]
        if hk.size:
            keep = np.lexsort((v, hk))[:k]
            yield pa.RecordBatch.from_pydict(
                {"hk": hk[keep], "v": v[keep]},
                schema=pa.schema([("hk", pa.int64()), ("v", pa.int64())]),
            )

    # <= k rows per partition reach the global trim
    sample = (
        rows.mapInArrow(partial, "hk long, v long")
        .orderBy("hk", "v")
        .limit(k)
    )
    # the rank rule runs over the k-row sample: the window is bounded by
    # the sketch size, never the data (same pattern as the tiny
    # distinct-length histogram in doc_length_quantiles)
    ranked = (
        sample.select("v")
        .withColumn("rk", F.row_number().over(Window.orderBy("v")))
        .withColumn("n", F.count(F.lit(1)).over(
            Window.partitionBy(F.lit(1))
        ))
    )
    pcts_df = ranked.sparkSession.createDataFrame(
        [(int(p),) for p in pcts], "pct int"
    )
    return (
        ranked.crossJoin(F.broadcast(pcts_df))
        .filter(100 * F.col("rk") >= F.col("n") * F.col("pct"))
        .groupBy("pct")
        .agg(
            F.min("v").cast("long").alias("v"),
            F.max("n").cast("long").alias("n_sample"),
        )
        .orderBy("pct")
    )


def bottomk_sample_quantiles_sql(
    value_expr: str,
    id_expr: str,
    source: str = "events",
    k: int = SAMPLE_K,
    pcts: tuple = (50, 90, 99),
) -> str:
    """DuckDB mirror: identical hash, identical (hk, v) order, identical
    integer rank rule."""
    from .text import h48_sql

    vals = ", ".join(f"({int(p)})" for p in pcts)
    return f"""
WITH s AS (
  SELECT CAST({value_expr} AS BIGINT) AS v,
         {h48_sql(f"CAST({id_expr} AS VARCHAR)")} AS hk
  FROM {source}
  ORDER BY hk, v
  LIMIT {int(k)}
), r AS (
  SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rk,
         (SELECT COUNT(*) FROM s) AS n
  FROM s
)
SELECT pct, CAST(MIN(v) AS BIGINT) AS v, CAST(MAX(n) AS BIGINT) AS n_sample
FROM r CROSS JOIN (VALUES {vals}) p(pct)
WHERE 100 * rk >= n * pct
GROUP BY pct
ORDER BY pct
"""
