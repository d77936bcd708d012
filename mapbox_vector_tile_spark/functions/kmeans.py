"""K-means (Lloyd) centroid training over embeddings, integer-exact.

`similarity.ivf_assignments` quantizes against the first ``n_lists``
vectors and documents that "production IVF would k-means them" — this is
that trainer. Everything is fixed-point (`similarity.SCALE`) so the
DuckDB oracle reproduces every iteration bit-for-bit:

- assignment: squared-L2 argmin over the centroid set in int64 (ties to
  the smallest centroid id);
- update: per-dimension ``floor(sum / count)`` of members' fixed-point
  coordinates (floor-of-double division on both engines; |sum| < 2^29 and
  count < 2^9 keep the quotient > 2^-9 away from integer boundaries while
  double error is < 2^-23, so the floor never straddles);
- empty cluster: keeps its previous centroid.

Scale shape per iteration — the part that matters at 10^9 vectors:

- assignment is a **broadcast** cross join (k*D longs) against the
  streaming corpus + a per-row argmin: the corpus never shuffles;
- the update is posexplode -> groupBy (cid, dim): partial aggregation
  caps every partition's shuffle output at k*D rows, independent of
  corpus size — the same map-side-combine bound the sketches use.

The driver loop runs a FIXED number of iterations (classic mini-batch /
bounded-Lloyd production practice; convergence-delta stopping would add a
per-iteration action without changing any plan). Iterations are unrolled
CTEs in the oracle, so ``iters`` is small by construction.

Analog: the reference's `optimise.py` dictionary reordering is a 1-D
clustering of values by usage; this is its d-dimensional generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .similarity import SCALE

K_CLUSTERS = 8
N_ITERS = 2
DIMS = 64


def _fx_vectors(emb: DataFrame) -> DataFrame:
    return emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * SCALE).cast("long"),
        ).alias("v"),
    )


def _dist2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )


def _assign(fx: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, v, cid, dist2): nearest centroid per vector, ties to the
    smallest cid; one broadcast join, no corpus shuffle."""
    scored = fx.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "v",
        "cid",
        _dist2(F.col("v"), F.col("cv")).alias("dist2"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist2").asc(), F.col("cid").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def _update(assigned: DataFrame, prev: DataFrame) -> DataFrame:
    """New centroid table: per-dim floor(mean) of members; empty clusters
    keep their previous centroid."""
    sums = (
        assigned.select("cid", F.posexplode("v").alias("i", "x"))
        .groupBy("cid", "i")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    new = (
        sums.withColumn("m", F.floor(F.col("s") / F.col("n")).cast("long"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "m"))),
                lambda t: t.getField("m"),
            ).alias("cv_new")
        )
    )
    return prev.join(new, "cid", "left").select(
        "cid", F.coalesce("cv_new", "cv").alias("cv")
    )


def kmeans_train(
    emb: DataFrame, k: int = K_CLUSTERS, iters: int = N_ITERS
) -> DataFrame:
    """Final assignment after ``iters`` Lloyd rounds:
    ``(vec_id, cid, dist2)``, deterministic and oracle-exact."""
    fx = _fx_vectors(emb)
    cents = fx.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    for _ in range(iters):
        cents = _update(_assign(fx, cents), cents)
    return (
        _assign(fx, cents)
        .select("vec_id", "cid", "dist2")
        .orderBy("vec_id")
    )


def kmeans_cluster_stats(
    emb: DataFrame, k: int = K_CLUSTERS, iters: int = N_ITERS
) -> DataFrame:
    """Per-cluster size and inertia (sum of fixed-point squared distances)
    of the trained model — the convergence scoreboard."""
    a = kmeans_train(emb, k, iters)
    return (
        a.groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("dist2").alias("inertia"),
        )
        .orderBy("cid")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle: iterations unrolled as CTEs
# ---------------------------------------------------------------------------

_FX_CTE = (
    "fx AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, "
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {s}) "
    "AS BIGINT)) AS v FROM embeddings)"
).format(s=SCALE)

_DIST2 = (
    "(SELECT SUM((a.v[u.i+1] - c.cv[u.i+1]) * (a.v[u.i+1] - c.cv[u.i+1])) "
    "FROM unnest(range({d})) u(i))"
).format(d=DIMS)


def _assign_cte(name: str, cent: str) -> str:
    return f"""
{name} AS (
  SELECT vec_id, cid, dist2 FROM (
    SELECT a.vec_id, c.cid, {_DIST2} AS dist2,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
                              ORDER BY {_DIST2} ASC, c.cid ASC) AS rn
    FROM fx a CROSS JOIN {cent} c) WHERE rn = 1
)"""


def _update_cte(name: str, assign: str, prev: str) -> str:
    return f"""
{name}_new AS (
  SELECT s.cid,
         list(CAST(floor(s.s / CAST(s.n AS DOUBLE)) AS BIGINT)
              ORDER BY s.i) AS cv
  FROM (SELECT asg.cid, u.i, SUM(f.v[u.i+1]) AS s, COUNT(*) AS n
        FROM {assign} asg JOIN fx f USING (vec_id),
             unnest(range({DIMS})) u(i)
        GROUP BY asg.cid, u.i) s
  GROUP BY s.cid
),
{name} AS (
  SELECT p.cid, COALESCE(n.cv, p.cv) AS cv
  FROM {prev} p LEFT JOIN {name}_new n USING (cid)
)"""


def _train_ctes(k: int, iters: int) -> str:
    parts = [
        _FX_CTE,
        f"c0 AS (SELECT vec_id AS cid, v AS cv FROM fx WHERE vec_id < {k})",
    ]
    for i in range(iters):
        parts.append(_assign_cte(f"a{i}", f"c{i}"))
        parts.append(_update_cte(f"c{i+1}", f"a{i}", f"c{i}"))
    parts.append(_assign_cte("afinal", f"c{iters}"))
    return ",".join(parts)


def kmeans_train_sql(k: int = K_CLUSTERS, iters: int = N_ITERS) -> str:
    return f"""
WITH {_train_ctes(k, iters)}
SELECT vec_id, CAST(cid AS BIGINT) AS cid, CAST(dist2 AS BIGINT) AS dist2
FROM afinal ORDER BY vec_id
"""


def kmeans_cluster_stats_sql(
    k: int = K_CLUSTERS, iters: int = N_ITERS
) -> str:
    return f"""
WITH {_train_ctes(k, iters)}
SELECT CAST(cid AS BIGINT) AS cid,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(dist2) AS BIGINT) AS inertia
FROM afinal GROUP BY cid ORDER BY cid
"""


# ---------------------------------------------------------------------------
# trained IVF: the ANN serving path over k-means lists
# ---------------------------------------------------------------------------


def ann_ivf_trained_top1(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = K_CLUSTERS,
    iters: int = N_ITERS,
) -> DataFrame:
    """`similarity.ann_ivf_top1` with TRAINED lists: candidates share the
    query's k-means cluster instead of a first-k-vectors Voronoi cell.
    Same scale contract — the candidate join carries the cluster id, pair
    space O(n^2/k); training cost is the bounded Lloyd loop above. Output
    ``(query_id, cid, neighbor_id, dot_fixed)``, NULL neighbor when a
    query is alone in its cluster."""
    from .similarity import _dot_fixed

    a = kmeans_train(emb, k, iters).select("vec_id", "cid")
    withl = emb.join(a, "vec_id").select(
        F.col("vec_id").cast("long").alias("vid"), "cid", "embedding"
    )
    q = withl.filter(F.col("vid") < n_queries).select(
        F.col("vid").alias("query_id"), "cid", F.col("embedding").alias("qv")
    )
    c = withl.select(
        F.col("vid").alias("neighbor_id"),
        F.col("cid").alias("ccid"),
        F.col("embedding").alias("cv"),
    )
    scored = q.join(
        c,
        (F.col("cid") == F.col("ccid"))
        & (F.col("neighbor_id") != F.col("query_id")),
        "left",
    ).select(
        "query_id",
        "cid",
        "neighbor_id",
        F.when(
            F.col("neighbor_id").isNotNull(),
            _dot_fixed(F.col("qv"), F.col("cv")),
        ).alias("dot_fixed"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_fixed").desc_nulls_last(),
        F.col("neighbor_id").asc_nulls_last(),
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "cid", "neighbor_id", "dot_fixed")
        .orderBy("query_id")
    )


def ann_ivf_trained_top1_sql(
    n_queries: int = 10, k: int = K_CLUSTERS, iters: int = N_ITERS
) -> str:
    from .similarity import _DOT_QC_SQL

    return f"""
WITH {_train_ctes(k, iters)},
wl AS (
  SELECT a.vec_id, a.cid, e.embedding
  FROM afinal a JOIN embeddings e ON e.vec_id = a.vec_id),
scored AS (
  SELECT q.vec_id AS query_id, q.cid,
         c.vec_id AS neighbor_id,
         CASE WHEN c.vec_id IS NULL THEN NULL ELSE {_DOT_QC_SQL} END
           AS dot_fixed
  FROM wl q LEFT JOIN wl c ON q.cid = c.cid AND c.vec_id != q.vec_id
  WHERE q.vec_id < {n_queries}),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY dot_fixed DESC NULLS LAST,
                      neighbor_id ASC NULLS LAST) AS rn
  FROM scored)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(cid AS BIGINT) AS cid,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(dot_fixed AS BIGINT) AS dot_fixed
FROM ranked WHERE rn = 1 ORDER BY query_id
"""
