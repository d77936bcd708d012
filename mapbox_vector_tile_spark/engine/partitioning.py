"""Size-weighted range partitioning (explicit skew handling, north rule).

``repartitionByRange`` balances *row counts*; with long-document outliers
(``n_tok`` up to 8k+ vs median ~500) that leaves some partitions carrying many
times more bytes than others, which caps scaling efficiency. Here partitions
are cut at equal **cumulative token weight** over a sorted key instead:

1. sample ``(sort_key, weight)``, sort by key, cumulative-sum the weight,
   cut at equal-weight quantiles -> bucket boundary keys (driver-side, small);
2. assign each row its bucket with a JVM-side binary-search expression;
3. map each bucket to a *hash-perfect label* (a small int whose
   ``pmod(hash(label), N)`` is a bijection onto 0..N-1) and
   ``df.repartition(N, label)`` — giving exactly one bucket per partition
   without dropping to RDD custom partitioners.

Sorting the key as (source, doc_id) also makes chunks regime-homogeneous, the
distribution analog of the reference's greedy line reordering that groups
similar values so deltas stay small (/root/reference/mapbox_vector_tile/
optimise.py:133-163 — there within a feature, here across the table).
"""

from __future__ import annotations

from bisect import bisect_left

from pyspark.sql import DataFrame, SparkSession, functions as F

_SAMPLE_TARGET = 100_000


_LABEL_CACHE: dict[int, list[int]] = {}


def hash_perfect_labels(spark: SparkSession, n: int) -> list[int]:
    """Find ints l_0..l_{n-1} with ``pmod(hash(l_i), n) == i`` (Spark's own
    Murmur3 via F.hash so the mapping is exact for ``repartition(n, col)``).
    Data-independent, so memoized per ``n``."""
    if n in _LABEL_CACHE:
        return _LABEL_CACHE[n]
    labels: dict[int, int] = {}
    lo = 0
    while len(labels) < n:
        cand = (
            spark.range(lo, lo + max(20 * n, 1024))
            .select(
                F.col("id").cast("int").alias("label"),
                F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("p"),
            )
            .groupBy("p")
            .agg(F.min("label").alias("label"))
            .collect()
        )
        for r in cand:
            labels.setdefault(r.p, r.label)
        lo += max(20 * n, 1024)
    _LABEL_CACHE[n] = [labels[i] for i in range(n)]
    return _LABEL_CACHE[n]


def weighted_cuts(
    df: DataFrame,
    num_partitions: int,
    sort_col: str,
    weight_col: str,
    sample_fraction: float | None = None,
) -> list:
    """Driver-side boundary keys at equal cumulative-weight quantiles."""
    if sample_fraction is None:
        n = df.count()
        sample_fraction = min(1.0, _SAMPLE_TARGET / max(n, 1))
    # Arrow collect: to_pylist yields the same Python values as Row fields
    # but skips per-row unpickling (~2x the sample job's own cost at 100k
    # rows, measured r6); the sort and walk below are unchanged.
    tbl = (
        df.select(sort_col, weight_col)
        .sample(fraction=sample_fraction, seed=42)
        .toArrow()
    )
    if tbl.num_rows == 0:
        return []
    sample = sorted(
        zip(tbl.column(0).to_pylist(), tbl.column(1).to_pylist()),
        key=lambda r: r[0],
    )
    total = sum(max(int(r[1]), 1) for r in sample)
    target = total / num_partitions
    cuts, acc = [], 0.0
    for r in sample:
        acc += max(int(r[1]), 1)
        if acc >= target * (len(cuts) + 1) and len(cuts) < num_partitions - 1:
            cuts.append(r[0])
    return cuts


def _bucket_expr(sort_col: str, cuts: list):
    if not cuts:
        return F.lit(0)
    # binary-search via array of literals: count boundaries < key (JVM-side)
    arr = F.array(*[F.lit(c) for c in cuts])
    return F.size(F.filter(arr, lambda c: c < F.col(sort_col))).cast("int")


def size_weighted_repartition(
    df: DataFrame,
    num_partitions: int,
    sort_col: str = "doc_id",
    weight_col: str = "n_tok",
    sample_fraction: float | None = None,
    bucket_col: str = "bucket",
    cuts: list | None = None,
) -> DataFrame:
    """Repartition so every partition holds ≈ equal total ``weight_col``,
    exactly one bucket per partition, rows sorted by ``sort_col`` within.

    ``cuts``: precomputed boundary keys (e.g. persisted by a checkpointed
    run) — sampling depends on the physical partition layout, so resumable
    jobs must reuse the first run's cuts verbatim (see engine/checkpoint.py).
    """
    spark = df.sparkSession
    if cuts is None:
        cuts = weighted_cuts(df, num_partitions, sort_col, weight_col, sample_fraction)
    n = len(cuts) + 1
    labels = hash_perfect_labels(spark, n)
    label_of = F.array(*[F.lit(x) for x in labels])
    out = (
        df.withColumn(bucket_col, _bucket_expr(sort_col, cuts))
        .withColumn("_label", F.element_at(label_of, F.col(bucket_col) + 1))
        .repartition(n, F.col("_label"))
        .sortWithinPartitions(sort_col)
        .drop("_label")
    )
    return out


def bucket_of_value(cuts: list, key) -> int:
    """Driver-side mirror of the bucket expression (for tests/planning)."""
    return bisect_left(cuts, key) if cuts else 0


__all__ = [
    "size_weighted_repartition",
    "weighted_cuts",
    "hash_perfect_labels",
    "bucket_of_value",
]
