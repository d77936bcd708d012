"""Similarity search over an embedding column (``array<float>``).

- :func:`knn_bruteforce` — exact top-k cosine neighbors (the baseline).
- :func:`ann_lsh` — random-hyperplane LSH buckets; search within bucket only
  (the scale path: the cross product shrinks from O(n²) to O(n²/2^bits)).

Cross-engine determinism: dot products are computed in **fixed point** —
``sum(floor(x*2^20) * floor(y*2^20))`` over int64 — which is exact, order-
independent, and bit-identical in Spark and DuckDB (float sums would drift
with summation order). Embeddings are unit-normalized in the test data, so
fixed-point dot order == cosine order.

At 100 TB scale the brute-force variant broadcast-joins the (small) query set
against the corpus — no shuffle of the corpus side; the LSH variant
hash-partitions by bucket.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, Window, functions as F

SCALE = 1 << 20  # fixed-point scale for exact cross-engine dot products
N_PLANES = 8
_LCG_A, _LCG_C = 1103515245, 12345


def plane_sign(k: int, d: int) -> int:
    """Deterministic ±1 hyperplane component (closed form, SQL-replicable)."""
    return 1 if ((_LCG_A * (k * 64 + d) + _LCG_C) // 65536) % 2 == 0 else -1


def _fixed(col):
    return F.floor(col.cast("double") * SCALE).cast("long")


def _dot_fixed(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _fixed(x) * _fixed(y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def knn_bruteforce(emb: DataFrame, n_queries: int = 10, k: int = 3) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    Broadcast the small query side; corpus side streams (no shuffle of the
    big table until the final per-query top-k, which is a tiny sort).
    """
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _dot_fixed(F.col("qv"), F.col("cv")).alias("dot_fixed"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_fixed").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("rank").cast("long").alias("rank"),
            F.col("neighbor_id").cast("long").alias("neighbor_id"),
            "dot_fixed",
        )
        .orderBy("query_id", "rank")
    )


def knn_bruteforce_sql(n_queries: int = 10, k: int = 3) -> str:
    dot = (
        "CAST((SELECT SUM(CAST(floor(CAST(q.embedding[u.i+1] AS DOUBLE) * {s}) AS BIGINT)"
        " * CAST(floor(CAST(c.embedding[u.i+1] AS DOUBLE) * {s}) AS BIGINT))"
        " FROM unnest(range(len(q.embedding))) u(i)) AS BIGINT)"
    ).format(s=SCALE)
    return f"""
WITH scored AS (
  SELECT CAST(q.vec_id AS BIGINT) AS query_id,
         CAST(c.vec_id AS BIGINT) AS neighbor_id,
         {dot} AS dot_fixed
  FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
  WHERE q.vec_id < {n_queries}),
ranked AS (
  SELECT query_id, neighbor_id, dot_fixed,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY dot_fixed DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, dot_fixed
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
"""


def _bucket_col():
    """The LSH bucket as a Catalyst column over ``embedding`` — computed
    inline wherever a consumer needs it, so attaching buckets to a corpus
    is a projection, never a self-join (r6: ``emb.join(lsh_buckets(emb))``
    put a shuffle join + the helper's global sort under every LSH
    consumer; a bucket is a per-row function of the embedding)."""
    bucket = None
    for kp in range(N_PLANES):
        signs = F.array(
            *[F.lit(plane_sign(kp, d)).cast("long") for d in range(64)]
        )
        proj = F.aggregate(
            F.zip_with(
                F.col("embedding"), signs, lambda x, s: _fixed(x) * s
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        term = F.when(proj >= 0, F.lit(2**kp).cast("long")).otherwise(0)
        bucket = term if bucket is None else bucket + term
    return bucket


def _with_buckets(emb: DataFrame) -> DataFrame:
    """(vid, bucket, embedding) — one narrow projection, zero exchanges."""
    return emb.select(
        F.col("vec_id").cast("long").alias("vid"),
        _bucket_col().alias("bucket"),
        "embedding",
    )


def lsh_buckets(emb: DataFrame) -> DataFrame:
    """(vec_id, bucket): sign pattern under N_PLANES fixed hyperplanes."""
    return emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _bucket_col().alias("bucket"),
    ).orderBy("vec_id")


def _bucket_sql(alias: str) -> str:
    terms = []
    for kp in range(N_PLANES):
        prods = " + ".join(
            f"CAST(floor(CAST({alias}.embedding[{d+1}] AS DOUBLE) * {SCALE}) AS BIGINT)"
            f" * {plane_sign(kp, d)}"
            for d in range(64)
        )
        terms.append(f"CASE WHEN ({prods}) >= 0 THEN CAST({2**kp} AS BIGINT) ELSE 0 END")
    return " + ".join(terms)


def lsh_buckets_sql() -> str:
    return f"""
SELECT CAST(e.vec_id AS BIGINT) AS vec_id, ({_bucket_sql('e')}) AS bucket
FROM embeddings e ORDER BY vec_id
"""


def ann_lsh_top1(emb: DataFrame, n_queries: int = 10) -> DataFrame:
    """Approximate nearest neighbor: best same-bucket match per query
    (NULL neighbor when the query is alone in its bucket)."""
    withb = _with_buckets(emb)
    q = withb.filter(F.col("vid") < n_queries).select(
        F.col("vid").alias("query_id"), F.col("bucket"), F.col("embedding").alias("qv")
    )
    c = withb.select(
        F.col("vid").alias("neighbor_id"),
        F.col("bucket").alias("cbucket"),
        F.col("embedding").alias("cv"),
    )
    scored = (
        q.join(c, (F.col("bucket") == F.col("cbucket")) & (F.col("neighbor_id") != F.col("query_id")), "left")
        .select(
            "query_id",
            "bucket",
            "neighbor_id",
            F.when(
                F.col("neighbor_id").isNotNull(), _dot_fixed(F.col("qv"), F.col("cv"))
            ).alias("dot_fixed"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_fixed").desc_nulls_last(), F.col("neighbor_id").asc_nulls_last()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "bucket", "neighbor_id", "dot_fixed")
        .orderBy("query_id")
    )


def near_dup_embedding(
    emb: DataFrame, min_dot_pct: int = 90
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: same-LSH-bucket candidates
    whose fixed-point dot is >= ``min_dot_pct``% of the unit norm (SCALE²).

    The bucket key bounds the pair space (no all-pairs join); the exact dot
    then confirms — the candidate->verify shape every near-dup family here
    follows (minhash->jaccard, simhash, and this one for embeddings)."""
    withb = _with_buckets(emb)
    a = withb.select(
        F.col("vid").alias("vec_a"), "bucket", F.col("embedding").alias("va")
    )
    c = withb.select(
        F.col("vid").alias("vec_b"),
        F.col("bucket").alias("cbucket"),
        F.col("embedding").alias("vb"),
    )
    threshold = SCALE * SCALE * min_dot_pct
    return (
        a.join(
            c,
            (F.col("bucket") == F.col("cbucket"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select(
            "vec_a",
            "vec_b",
            _dot_fixed(F.col("va"), F.col("vb")).alias("dot_fixed"),
        )
        .filter(F.col("dot_fixed") * 100 >= F.lit(threshold))
        .orderBy("vec_a", "vec_b")
    )


def near_dup_embedding_sql(min_dot_pct: int = 90) -> str:
    dot = (
        "CAST((SELECT SUM(CAST(floor(CAST(a.embedding[u.i+1] AS DOUBLE) * {s}) AS BIGINT)"
        " * CAST(floor(CAST(b.embedding[u.i+1] AS DOUBLE) * {s}) AS BIGINT))"
        " FROM unnest(range(len(a.embedding))) u(i)) AS BIGINT)"
    ).format(s=SCALE)
    return f"""
WITH wb AS (
  SELECT CAST(e.vec_id AS BIGINT) AS vec_id, ({_bucket_sql('e')}) AS bucket,
         e.embedding
  FROM embeddings e)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {dot} AS dot_fixed
FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {dot} * 100 >= CAST({SCALE} AS BIGINT) * {SCALE} * {min_dot_pct}
ORDER BY vec_a, vec_b
"""


N_IVF_LISTS = 16


def ivf_assignments(emb: DataFrame, n_lists: int = N_IVF_LISTS) -> DataFrame:
    """(vec_id, list_id): IVF coarse quantization — each vector joins the
    inverted list of its nearest centroid (max fixed-point dot; ties to the
    smallest centroid id).

    Centroids here are the first ``n_lists`` vectors (deterministic and
    oracle-replicable); production IVF would k-means them, which changes the
    centroid table, not this plan: broadcast the (tiny) centroid set against
    the streaming corpus, per-row argmax — no shuffle of the big side.
    """
    cent = emb.filter(F.col("vec_id") < n_lists).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    scored = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"), "embedding"
    ).crossJoin(F.broadcast(cent)).select(
        "vec_id",
        F.col("cid").cast("long").alias("cid"),
        _dot_fixed(F.col("embedding"), F.col("cv")).alias("dot_fixed"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dot_fixed").desc(), F.col("cid").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("list_id"))
        .orderBy("vec_id")
    )


_DOT_QC_SQL = (
    "CAST((SELECT SUM(CAST(floor(CAST(q.embedding[u.i+1] AS DOUBLE) * {s}) AS BIGINT)"
    " * CAST(floor(CAST(c.embedding[u.i+1] AS DOUBLE) * {s}) AS BIGINT))"
    " FROM unnest(range(len(q.embedding))) u(i)) AS BIGINT)"
).format(s=SCALE)


def _ivf_assign_sql(n_lists: int) -> str:
    return f"""
  SELECT CAST(q.vec_id AS BIGINT) AS vec_id,
         CAST(c.vec_id AS BIGINT) AS cid, {_DOT_QC_SQL} AS dot_fixed
  FROM embeddings q JOIN embeddings c ON c.vec_id < {n_lists}
"""


def ivf_assignments_sql(n_lists: int = N_IVF_LISTS) -> str:
    return f"""
WITH scored AS ({_ivf_assign_sql(n_lists)}),
ranked AS (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY dot_fixed DESC, cid ASC) AS rn
  FROM scored)
SELECT vec_id, cid AS list_id FROM ranked WHERE rn = 1 ORDER BY vec_id
"""


def ann_ivf_top1(
    emb: DataFrame, n_queries: int = 10, n_lists: int = N_IVF_LISTS
) -> DataFrame:
    """IVF ANN (nprobe=1): best match within the query's own inverted list
    (NULL neighbor when the query is alone in its list). The candidate join
    carries the list id — pair space shrinks from O(n²) to O(n²/n_lists)."""
    a = ivf_assignments(emb, n_lists)
    withl = emb.join(a, "vec_id").select(
        F.col("vec_id").cast("long").alias("vid"), "list_id", "embedding"
    )
    q = withl.filter(F.col("vid") < n_queries).select(
        F.col("vid").alias("query_id"), "list_id", F.col("embedding").alias("qv")
    )
    c = withl.select(
        F.col("vid").alias("neighbor_id"),
        F.col("list_id").alias("clist"),
        F.col("embedding").alias("cv"),
    )
    scored = q.join(
        c,
        (F.col("list_id") == F.col("clist"))
        & (F.col("neighbor_id") != F.col("query_id")),
        "left",
    ).select(
        "query_id",
        "list_id",
        "neighbor_id",
        F.when(
            F.col("neighbor_id").isNotNull(), _dot_fixed(F.col("qv"), F.col("cv"))
        ).alias("dot_fixed"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_fixed").desc_nulls_last(), F.col("neighbor_id").asc_nulls_last()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "list_id", "neighbor_id", "dot_fixed")
        .orderBy("query_id")
    )


def ann_ivf_top1_sql(
    n_queries: int = 10, n_lists: int = N_IVF_LISTS
) -> str:
    return f"""
WITH ascored AS ({_ivf_assign_sql(n_lists)}),
assign AS (
  SELECT vec_id, cid AS list_id FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dot_fixed DESC, cid ASC) AS rn
    FROM ascored) t WHERE rn = 1),
wl AS (
  SELECT a.vec_id, a.list_id, e.embedding
  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id),
scored AS (
  SELECT q.vec_id AS query_id, q.list_id,
         c.vec_id AS neighbor_id,
         CASE WHEN c.vec_id IS NULL THEN NULL ELSE {_DOT_QC_SQL} END AS dot_fixed
  FROM wl q LEFT JOIN wl c ON q.list_id = c.list_id AND c.vec_id != q.vec_id
  WHERE q.vec_id < {n_queries}),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY dot_fixed DESC NULLS LAST, neighbor_id ASC NULLS LAST) AS rn
  FROM scored)
SELECT query_id, list_id, neighbor_id, dot_fixed FROM ranked
WHERE rn = 1 ORDER BY query_id
"""


def ann_lsh_top1_sql(n_queries: int = 10) -> str:
    dot = (
        "CAST((SELECT SUM(CAST(floor(CAST(q.embedding[u.i+1] AS DOUBLE) * {s}) AS BIGINT)"
        " * CAST(floor(CAST(c.embedding[u.i+1] AS DOUBLE) * {s}) AS BIGINT))"
        " FROM unnest(range(len(q.embedding))) u(i)) AS BIGINT)"
    ).format(s=SCALE)
    return f"""
WITH b AS (
  SELECT CAST(e.vec_id AS BIGINT) AS vec_id, ({_bucket_sql('e')}) AS bucket, e.embedding
  FROM embeddings e),
scored AS (
  SELECT q.vec_id AS query_id, q.bucket,
         c.vec_id AS neighbor_id,
         CASE WHEN c.vec_id IS NULL THEN NULL ELSE {dot} END AS dot_fixed
  FROM b q LEFT JOIN b c ON q.bucket = c.bucket AND c.vec_id != q.vec_id
  WHERE q.vec_id < {n_queries}),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY dot_fixed DESC NULLS LAST, neighbor_id ASC NULLS LAST) AS rn
  FROM scored)
SELECT query_id, bucket, neighbor_id, dot_fixed FROM ranked
WHERE rn = 1 ORDER BY query_id
"""


def embedding_quantize_stats(emb: DataFrame) -> DataFrame:
    """Per-vector int8 absmax quantization (the training-pipeline embedding
    compression step), with integer-exact summary stats so DuckDB can gate
    the quantizer bit-for-bit.

    All arithmetic happens on the fixed-point form ``xi = floor(x * 2^20)``
    (exact and identical cross-engine); codes are
    ``sign(xi) * ((|xi| * 127 + amax/2) / amax)`` with integer division —
    round-half-up of ``|xi| * 127 / amax``, no float rounding anywhere.
    Emits per vector: the fixed-point absmax (the dequant scale), code sum,
    code energy, and code absmax (must be 127 for the max element).
    """
    # `div` (exact integral division) everywhere — float `/` + floor would
    # risk one-ulp disagreements with DuckDB's `//` at exact multiples
    xi = F.transform(F.col("embedding"), lambda x: _fixed(x))
    base = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"), xi.alias("xi")
    ).withColumn(
        "amax", F.expr("array_max(transform(xi, v -> abs(v)))")
    )
    q = base.withColumn(
        "q",
        F.expr(
            "transform(xi, v -> CASE WHEN amax = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(sign(v) AS BIGINT)"
            " * ((abs(v) * 127 + amax div 2) div amax) END)"
        ),
    )
    return (
        q.select(
            "vec_id",
            F.col("amax").alias("amax_fixed"),
            F.expr(
                "aggregate(q, CAST(0 AS BIGINT), (a, v) -> a + v)"
            ).alias("sum_q"),
            F.expr(
                "aggregate(q, CAST(0 AS BIGINT), (a, v) -> a + v * v)"
            ).alias("sum_qq"),
            F.expr("array_max(transform(q, v -> abs(v)))").alias("max_abs_q"),
        )
        .orderBy("vec_id")
    )


def embedding_quantize_stats_sql() -> str:
    return f"""
WITH x AS (
  SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
         u.i AS i,
         CAST(floor(CAST(e.embedding[u.i+1] AS DOUBLE) * {SCALE}) AS BIGINT) AS xi
  FROM embeddings e, unnest(range(len(e.embedding))) u(i)),
a AS (
  SELECT vec_id, MAX(ABS(xi)) AS amax FROM x GROUP BY vec_id),
q AS (
  SELECT x.vec_id, a.amax,
         CASE WHEN a.amax = 0 OR xi = 0 THEN 0
              WHEN xi > 0 THEN (ABS(xi) * 127 + a.amax // 2) // a.amax
              ELSE -((ABS(xi) * 127 + a.amax // 2) // a.amax) END AS qv
  FROM x JOIN a ON x.vec_id = a.vec_id)
SELECT vec_id, CAST(amax AS BIGINT) AS amax_fixed,
       CAST(SUM(qv) AS BIGINT) AS sum_q,
       CAST(SUM(qv * qv) AS BIGINT) AS sum_qq,
       CAST(MAX(ABS(qv)) AS BIGINT) AS max_abs_q
FROM q GROUP BY vec_id, amax ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# product quantization (PQ): sub-vector codebooks + ADC search over codes
# ---------------------------------------------------------------------------

PQ_M = 4  # subspaces
PQ_K = 16  # centroids per subspace codebook


def _pq_scored(emb: DataFrame, m: int, k: int, dim: int) -> DataFrame:
    """(vec_id, cid, d0..d{m-1}): fixed-point squared distance of every
    vector's m sub-vectors to centroid ``cid``'s sub-vectors.

    Codebooks are the first ``k`` vectors' sub-slices (deterministic and
    oracle-replicable, same convention as :func:`ivf_assignments`;
    production PQ k-means the codebooks, which changes the centroid table,
    not this plan). Centroids broadcast; the corpus side streams — the
    only shuffle in the whole PQ pipeline is the final per-vector argmin
    aggregate.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    sub = dim // m
    xi = F.transform(F.col("embedding"), lambda x: _fixed(x))
    cent = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("long").alias("cid"), xi.alias("ci")
    )
    base = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"), xi.alias("xi")
    )
    dist = lambda j: F.aggregate(  # noqa: E731
        F.zip_with(
            F.slice(F.col("xi"), j * sub + 1, sub),
            F.slice(F.col("ci"), j * sub + 1, sub),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return base.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cid", *[dist(j).alias(f"d{j}") for j in range(m)]
    )


def pq_codes(
    emb: DataFrame, m: int = PQ_M, k: int = PQ_K, dim: int = 64
) -> DataFrame:
    """(vec_id, code_0..code_{m-1}, sq_err_fixed): PQ assignment — each
    sub-vector joins its nearest codebook centroid (min fixed-point squared
    distance, ties to the smallest centroid id); ``sq_err_fixed`` is the
    total quantization error, integer-exact.

    A PQ code is m small ints (m bytes at k<=256) per vector — the 100 TB
    story is the corpus shrinking from ``dim * 4`` bytes to ``m`` bytes per
    row for the search path. Struct-min gives argmin-with-tiebreak in one
    aggregate; one shuffle total (the per-vector groupBy).
    """
    scored = _pq_scored(emb, m, k, dim)
    mins = scored.groupBy("vec_id").agg(
        *[
            F.min(
                F.struct(F.col(f"d{j}").alias("d"), F.col("cid").alias("c"))
            ).alias(f"s{j}")
            for j in range(m)
        ]
    )
    err = None
    for j in range(m):
        t = F.col(f"s{j}")["d"]
        err = t if err is None else err + t
    return mins.select(
        "vec_id",
        *[F.col(f"s{j}")["c"].alias(f"code_{j}") for j in range(m)],
        err.alias("sq_err_fixed"),
    ).orderBy("vec_id")


def pq_adc_top1(
    emb: DataFrame,
    n_queries: int = 10,
    m: int = PQ_M,
    k: int = PQ_K,
    dim: int = 64,
) -> DataFrame:
    """(query_id, neighbor_id, adc_fixed): asymmetric-distance top-1 over
    PQ codes — the query side precomputes its distance to every codebook
    centroid (an m*k lookup table), the corpus side is scored from its
    m-int code alone, never touching the original vectors.

    Plan shape for 100 TB: the LUT (n_queries * m * k rows) broadcasts; the
    corpus side does m broadcast-hash-joins plus a map-side-combining min
    aggregate — the big table is scanned once, shuffles nothing, and only
    its CODES are read (in a PQ-at-rest layout, dim*4 bytes/row never move).
    """
    scored = _pq_scored(emb, m, k, dim)
    codes = pq_codes(emb, m, k, dim).drop("sq_err_fixed")
    lut = scored.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("cid"),
        *[F.col(f"d{j}") for j in range(m)],
    )
    out = codes.withColumnRenamed("vec_id", "neighbor_id").crossJoin(
        F.broadcast(lut.select("query_id").distinct())
    )
    adc = None
    for j in range(m):
        lj = lut.select(
            F.col("query_id").alias(f"_q{j}"),
            F.col("cid").alias(f"_c{j}"),
            F.col(f"d{j}").alias(f"_a{j}"),
        )
        out = out.join(
            F.broadcast(lj),
            (F.col("query_id") == F.col(f"_q{j}"))
            & (F.col(f"code_{j}") == F.col(f"_c{j}")),
        )
        t = F.col(f"_a{j}")
        adc = t if adc is None else adc + t
    return (
        out.withColumn("adc", adc)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id")
        .agg(
            F.min(
                F.struct(
                    F.col("adc").alias("a"), F.col("neighbor_id").alias("n")
                )
            ).alias("s")
        )
        .select(
            "query_id",
            F.col("s")["n"].alias("neighbor_id"),
            F.col("s")["a"].alias("adc_fixed"),
        )
        .orderBy("query_id")
    )


def _pq_dist_cte(m: int, k: int, dim: int) -> str:
    """CTE fragment: per (vec_id, cid, j) fixed-point subspace distances."""
    sub = dim // m
    return f"""
x AS (
  SELECT CAST(e.vec_id AS BIGINT) AS vec_id, u.i AS i,
         CAST(floor(CAST(e.embedding[u.i+1] AS DOUBLE) * {SCALE}) AS BIGINT) AS xi
  FROM embeddings e, unnest(range(len(e.embedding))) u(i)),
dists AS (
  SELECT a.vec_id, c.vec_id AS cid, a.i // {sub} AS j,
         SUM((a.xi - c.xi) * (a.xi - c.xi)) AS d
  FROM x a JOIN x c ON a.i = c.i AND c.vec_id < {k}
  GROUP BY 1, 2, 3),
ranked AS (
  SELECT vec_id, cid, j, d,
         ROW_NUMBER() OVER (PARTITION BY vec_id, j
                            ORDER BY d ASC, cid ASC) AS rn
  FROM dists)"""


def pq_codes_sql(m: int = PQ_M, k: int = PQ_K, dim: int = 64) -> str:
    code_cols = ", ".join(
        f"CAST(MAX(CASE WHEN j = {j} THEN cid END) AS BIGINT) AS code_{j}"
        for j in range(m)
    )
    return f"""
WITH{_pq_dist_cte(m, k, dim)}
SELECT vec_id, {code_cols},
       CAST(SUM(d) AS BIGINT) AS sq_err_fixed
FROM ranked WHERE rn = 1
GROUP BY vec_id ORDER BY vec_id
"""


def pq_adc_top1_sql(
    n_queries: int = 10, m: int = PQ_M, k: int = PQ_K, dim: int = 64
) -> str:
    return f"""
WITH{_pq_dist_cte(m, k, dim)},
codes AS (
  SELECT vec_id, j, cid AS code FROM ranked WHERE rn = 1),
lut AS (
  SELECT vec_id AS query_id, cid, j, d FROM dists
  WHERE vec_id < {n_queries}),
adc AS (
  SELECT l.query_id, cds.vec_id AS neighbor_id, SUM(l.d) AS adc
  FROM codes cds JOIN lut l ON l.j = cds.j AND l.cid = cds.code
  WHERE cds.vec_id != l.query_id
  GROUP BY 1, 2),
best AS (
  SELECT query_id, neighbor_id, adc,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc ASC, neighbor_id ASC) AS rn
  FROM adc)
SELECT query_id, CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(adc AS BIGINT) AS adc_fixed
FROM best WHERE rn = 1 ORDER BY query_id
"""


def embedding_dedup_clusters(
    emb: DataFrame, min_dot_pct: int = 90, max_iters: int = 12
) -> DataFrame:
    """Cluster-level embedding dedup: connected components over the
    confirmed cosine near-dup pairs (:func:`near_dup_embedding`), one
    canonical vector per cluster — the embedding-space twin of
    ``text.dedup_clusters`` (pairwise keep-first is inconsistent across
    transitive near-dup chains; cluster heads are not). The propagation
    loop is the shared :func:`.components.min_label_components` (edge
    list LSH-bounded, per-iteration equi-join + groupBy-min).

    Returns ``(vec_id, cluster_id, cluster_size, is_canonical)`` for
    every vector, singletons included, ordered by ``vec_id``."""
    from .components import min_label_components

    pairs = near_dup_embedding(emb, min_dot_pct).select("vec_a", "vec_b")
    labels = min_label_components(
        emb.select("vec_id"), pairs, "vec_id", "vec_a", "vec_b", max_iters
    )
    sizes = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return (
        labels.join(sizes, "cluster_id")
        .select(
            "vec_id",
            "cluster_id",
            "cluster_size",
            (F.col("vec_id") == F.col("cluster_id")).alias("is_canonical"),
        )
        .orderBy("vec_id")
    )


def embedding_dedup_clusters_sql(min_dot_pct: int = 90) -> str:
    """DuckDB oracle: recursive-CTE transitive closure over the SAME
    confirmed pair SQL, label = min reachable vec_id — the exact
    fixpoint the propagation loop reaches."""
    pairs = near_dup_embedding_sql(min_dot_pct).replace(
        "ORDER BY vec_a, vec_b", ""
    )
    return f"""
WITH RECURSIVE p AS ({pairs}),
edges AS (SELECT vec_a AS a, vec_b AS b FROM p
          UNION ALL SELECT vec_b, vec_a FROM p),
reach(n, m) AS (
  SELECT CAST(vec_id AS BIGINT), CAST(vec_id AS BIGINT) FROM embeddings
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
),
labels AS (SELECT n AS vec_id, MIN(m) AS cluster_id FROM reach GROUP BY n),
sizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
          FROM labels GROUP BY cluster_id)
SELECT l.vec_id, l.cluster_id, s.cluster_size,
       l.vec_id = l.cluster_id AS is_canonical
FROM labels l JOIN sizes s USING (cluster_id)
ORDER BY l.vec_id
"""


GRAM_SCALE = 1 << 10  # coarser than SCALE: products*rows must fit int64
# Range analysis: |e| <= ~1 so |fixed| <= 2^10; a product is <= 2^20 and
# the (i, j) accumulator after N rows is <= N * 2^20 — int64-safe to
# N ~ 8e12 rows, i.e. the full 10^12-sequence corpus in one pass. The
# 2^-10 quantization is ample for covariance/PCA preprocessing; the
# point of fixing the point is that the oracle reproduces every sum
# bit-exactly (float matmul would be association-order-dependent).


def embedding_gram(emb: DataFrame) -> DataFrame:
    """Exact second-moment sufficient statistics of the embedding corpus:
    one row per dimension pair ``i <= j`` with ``(n, sum_i, sum_j,
    sum_ij)`` in fixed point — everything PCA / whitening / covariance
    needs, after which the driver-side eigendecomposition is a D x D
    problem (D ~ 64), not a data problem.

    Scale shape: each Arrow batch contributes one int64 ``E^T E``
    matmul partial (numpy, zero-copy from the Arrow list buffer) — the
    map-side combine leaves only ``partitions x D^2`` tiny rows for the
    final groupBy; the corpus itself never shuffles."""

    def partial(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        g = None
        s = None
        n = 0
        for batch in batches:
            col = batch.column("embedding")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False)
            d = len(col[0]) if len(col) else 0
            if not d:
                continue
            e = np.floor(
                flat.astype(np.float64).reshape(-1, d) * GRAM_SCALE
            ).astype(np.int64)
            if g is None:
                g = np.zeros((d, d), dtype=np.int64)
                s = np.zeros(d, dtype=np.int64)
            g += e.T @ e
            s += e.sum(axis=0)
            n += e.shape[0]
        if g is None:
            return
        d = g.shape[0]
        iu, ju = np.triu_indices(d)
        rows_i = np.concatenate([iu, np.arange(d), [-1]]).astype(np.int32)
        rows_j = np.concatenate([ju, np.full(d, -1), [-1]]).astype(np.int32)
        rows_v = np.concatenate([g[iu, ju], s, [n]]).astype(np.int64)
        yield pa.RecordBatch.from_arrays(
            [pa.array(rows_i), pa.array(rows_j), pa.array(rows_v)],
            names=["i", "j", "v"],
        )

    agg = (
        emb.select("embedding")
        .mapInArrow(partial, "i int, j int, v long")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
    )
    gram = agg.filter(F.col("j") >= 0).select("i", "j", F.col("v").alias("sum_ij"))
    dims = agg.filter((F.col("j") == -1) & (F.col("i") >= 0)).select(
        F.col("i").alias("di"), F.col("v").alias("dsum")
    )
    n_row = agg.filter(F.col("i") == -1).select(F.col("v").alias("n"))
    return (
        gram.join(F.broadcast(n_row))
        .join(
            F.broadcast(dims.select(F.col("di").alias("i"),
                                    F.col("dsum").alias("sum_i"))), "i"
        )
        .join(
            F.broadcast(dims.select(F.col("di").alias("j"),
                                    F.col("dsum").alias("sum_j"))), "j"
        )
        .select(
            F.col("i").cast("long"), F.col("j").cast("long"),
            "n", "sum_i", "sum_j", "sum_ij",
        )
        .orderBy("i", "j")
    )


def embedding_gram_sql() -> str:
    """DuckDB oracle: the same fixed-point sums from exact unnested
    pairs (a hash match proves the matmul partials + combine reproduce
    the mathematically-exact integer statistics)."""
    return f"""
WITH f AS (
  SELECT list_transform(embedding, e ->
           CAST(floor(CAST(e AS DOUBLE) * {GRAM_SCALE}) AS BIGINT)) AS fe
  FROM embeddings
),
px AS (
  SELECT u.i AS i, v.i AS j, f.fe[u.i+1] * f.fe[v.i+1] AS p
  FROM f,
       unnest(range(len(f.fe))) u(i),
       unnest(range(len(f.fe))) v(i)
  WHERE u.i <= v.i
),
dims AS (
  SELECT u.i AS i, CAST(SUM(f.fe[u.i+1]) AS BIGINT) AS dsum
  FROM f, unnest(range(len(f.fe))) u(i) GROUP BY u.i
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f)
SELECT CAST(px.i AS BIGINT) AS i, CAST(px.j AS BIGINT) AS j, nn.n,
       a.dsum AS sum_i, b.dsum AS sum_j,
       CAST(SUM(px.p) AS BIGINT) AS sum_ij
FROM px, nn
JOIN dims a ON a.i = px.i
JOIN dims b ON b.i = px.j
GROUP BY px.i, px.j, nn.n, a.dsum, b.dsum
ORDER BY i, j
"""
