"""Bucketed (SMB) tables: shuffle-free co-located joins.

The remaining big-join lever the engine had not demonstrated: persisting
both sides of a recurring join pre-hashed into the SAME bucket layout
(``bucketBy(n, key).sortBy(key)``) so every subsequent join is a
SortMergeJoin with ZERO Exchange — Spark trusts the on-disk bucketing
(``HashPartitioning(key, n)``) on both sides and streams bucket i against
bucket i. At 100 TB this converts the nightly "join the token stats to
the document metadata" from two full shuffles into a scan-only merge; the
shuffle cost is paid ONCE at write time and amortized over every join
after.

Contract notes encoded here (and asserted in tests):

- both tables must agree on bucket COUNT and KEY, and the join key must
  equal the bucket key, or Spark silently falls back to shuffling;
- the files are plain parquet + catalog metadata — the bucketing lives in
  the table catalog, so readers go through ``spark.table``, not
  ``read.parquet`` (which would forget the layout);
- broadcast must not pre-empt the demonstration on small inputs: the
  join uses the ``merge`` hint (production keeps the default — a small
  side SHOULD broadcast).

Analog surface: the reference's per-tile key/value tables are co-located
by construction (one tile = one container,
/root/reference/mapbox_vector_tile/encoder.py:241-266) — bucketing is how
a distributed store gets the same "related rows share a physical unit"
property across tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .verify import doc_num_expr

N_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int = N_BUCKETS,
) -> None:
    """Persist ``df`` as an external bucketed+sorted table (overwrite)."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def write_doc_join_pair(
    spark: SparkSession,
    tokens: DataFrame,
    docs: DataFrame,
    base_dir: str,
    n_buckets: int = N_BUCKETS,
    prefix: str = "mvt",
) -> tuple[str, str]:
    """Materialize the two sides of the recurring doc join, co-bucketed on
    the numeric doc id: per-doc token stats (from the tokens corpus) and
    document metadata. Returns the two table names."""
    t_stats = f"{prefix}_doc_stats_b"
    t_meta = f"{prefix}_doc_meta_b"
    stats = tokens.select(
        doc_num_expr().alias("doc_num"),
        F.col("n_tok").cast("long").alias("n_tok"),
        "source",
    )
    meta = docs.select(
        F.col("doc_id").cast("long").alias("doc_num"),
        F.col("n_chars").cast("long").alias("n_chars"),
        "lang",
    )
    write_bucketed(
        stats, t_stats, os.path.join(base_dir, t_stats), "doc_num", n_buckets
    )
    write_bucketed(
        meta, t_meta, os.path.join(base_dir, t_meta), "doc_num", n_buckets
    )
    return t_stats, t_meta


def bucketed_join(
    spark: SparkSession, t_stats: str, t_meta: str
) -> DataFrame:
    """The co-located join itself: SortMergeJoin over matching buckets,
    no Exchange on either side (plan-asserted in tests)."""
    a = spark.table(t_stats)
    b = spark.table(t_meta)
    return a.hint("merge").join(b, "doc_num")


def bucketed_join_rollup(
    spark: SparkSession,
    tokens: DataFrame,
    docs: DataFrame,
    base_dir: str,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Gated end-to-end: write both bucketed tables, join shuffle-free,
    roll up per (source, lang)."""
    t_stats, t_meta = write_doc_join_pair(
        spark, tokens, docs, base_dir, n_buckets
    )
    return (
        bucketed_join(spark, t_stats, t_meta)
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").alias("sum_tok"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("source", "lang")
    )


def bucketed_join_rollup_sql() -> str:
    """Oracle: the same join from the generator formula + documents."""
    from ..corpus import params_cte_sql, source_case_sql

    return f"""
WITH {params_cte_sql('documents')}
SELECT {source_case_sql('p.doc_id')} AS source, d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(p.n_tok) AS BIGINT) AS sum_tok,
       CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
FROM p JOIN documents d ON d.doc_id = p.doc_id
GROUP BY 1, 2 ORDER BY source, lang
"""
