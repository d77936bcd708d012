"""SQL-expressible analogs of the engine's internal computations, run over
the driver's TPC-H-ish tables so the DuckDB oracle can gate them.

Each maps to a SURVEY §2 operator:
- stats_sampler_by_source    -> A1 usage counting / selector stats sampler
- dict_frequency_order       -> O1 frequency-sorted dictionary (optimise.py:26-57)
- rle_run_count_events       -> E3 command/run-length packing (runs per key)
- delta_width_histogram      -> E1/E2 delta-width stats the selector consumes
- size_weighted_buckets_plan -> O2 size-weighted range partition planning
- resume_pending_anti_join   -> §2.7 checkpoint resume primitive
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def stats_sampler_by_source(docs: DataFrame) -> DataFrame:
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("source")
    )


STATS_SAMPLER_SQL = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY source ORDER BY source
"""


def dict_frequency_order(lineitem: DataFrame) -> DataFrame:
    """Hot values get the smallest dictionary indices (optimise.py:26-57)."""
    counts = (
        lineitem.select(
            F.concat_ws("|", "l_returnflag", "l_linestatus").alias("value")
        )
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("value").asc())
    return counts.withColumn(
        "dict_index", (F.row_number().over(w) - 1).cast("long")
    ).orderBy("dict_index")


DICT_FREQ_SQL = """
WITH c AS (
  SELECT l_returnflag || '|' || l_linestatus AS value,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1)
SELECT value, cnt,
       CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, value ASC) - 1 AS BIGINT)
         AS dict_index
FROM c ORDER BY dict_index
"""


def rle_run_count_events(events: DataFrame) -> DataFrame:
    """Runs of equal event_type per user in time order — how RLE-able each
    user's stream is (one header per run, geom_encoder.py:13-15)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = events.withColumn("prev", F.lag("event_type").over(w)).withColumn(
        "is_new_run",
        (F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))).cast("long"),
    )
    return (
        runs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("is_new_run").alias("n_runs"),
        )
        .orderBy("user_id")
    )


RLE_RUNS_SQL = """
WITH r AS (
  SELECT user_id,
         CASE WHEN LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS is_new_run
  FROM events)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(is_new_run) AS BIGINT) AS n_runs
FROM r GROUP BY user_id ORDER BY user_id
"""


def delta_width_histogram(orders: DataFrame, bucket_width: int = 4096) -> DataFrame:
    """Histogram of bit-widths of key deltas in sort order — the exact stat
    the codec selector uses to size DELTA_ZZ_BITPACK (north rule).

    Distributed two-level plan (no single-partition window over the table):
    intra-bucket deltas via a window PARTITIONED by fixed key range, plus
    boundary deltas from per-bucket (min, max) aggregates — the aggregate
    table is ~1/bucket_width the size of the input, so its tiny ordering
    window is the classic two-pass prefix trick, not a serialization point.
    """
    keyed = orders.select(
        "o_orderkey",
        F.floor(F.col("o_orderkey") / F.lit(bucket_width)).alias("kb"),
    )
    w = Window.partitionBy("kb").orderBy("o_orderkey")
    intra = (
        keyed.withColumn(
            "delta", F.col("o_orderkey") - F.lag("o_orderkey").over(w)
        )
        .filter(F.col("delta").isNotNull())
        .select("delta")
    )
    agg = keyed.groupBy("kb").agg(
        F.min("o_orderkey").alias("mn"), F.max("o_orderkey").alias("mx")
    )
    wb = Window.orderBy("kb")  # over bucket aggregates only (small)
    boundary = (
        agg.withColumn("prev_mx", F.lag("mx").over(wb))
        .filter(F.col("prev_mx").isNotNull())
        .select((F.col("mn") - F.col("prev_mx")).alias("delta"))
    )
    width = F.length(F.bin(F.col("delta"))).cast("long")
    return (
        intra.unionAll(boundary)
        .select(width.alias("delta_bit_width"))
        .groupBy("delta_bit_width")
        .agg(F.count(F.lit(1)).alias("n_deltas"))
        .orderBy("delta_bit_width")
    )


DELTA_WIDTH_SQL = """
WITH d AS (
  SELECT o_orderkey - LAG(o_orderkey) OVER (ORDER BY o_orderkey) AS delta
  FROM orders)
SELECT CAST(length(bin(delta)) AS BIGINT) AS delta_bit_width,
       CAST(COUNT(*) AS BIGINT) AS n_deltas
FROM d WHERE delta IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def size_weighted_buckets_plan(
    docs: DataFrame, n_buckets: int = 8, part_width: int = 64
) -> DataFrame:
    """Partition planning as a query: cumulative weight over the sort key ->
    equal-weight bucket ids -> per-bucket totals.

    Distributed two-pass cumsum: per-partition local prefix sums (window
    PARTITIONED by fixed doc_id ranges — range blocks are contiguous in the
    numeric sort order, so the decomposition is exact) + per-partition
    offsets and the grand total from a tiny aggregate table — no
    single-partition window over the data and no driver-side ``first()``
    round trip for the total.
    """
    keyed = docs.select(
        "doc_id",
        "n_chars",
        F.floor(F.col("doc_id") / F.lit(part_width)).alias("pt"),
    )
    w_local = (
        Window.partitionBy("pt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = keyed.withColumn("local_cum", F.sum("n_chars").over(w_local))
    parts = keyed.groupBy("pt").agg(F.sum("n_chars").alias("part_sum"))
    w_off = Window.orderBy("pt").rowsBetween(
        Window.unboundedPreceding, -1
    )  # over the small per-part aggregate only
    w_tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = parts.select(
        "pt",
        F.coalesce(F.sum("part_sum").over(w_off), F.lit(0)).alias("offset"),
        F.sum("part_sum").over(w_tot).alias("total"),
    )
    cum = local.join(F.broadcast(offsets), "pt").withColumn(
        "cum", F.col("offset") + F.col("local_cum")
    )
    bucket = ((F.col("cum") - 1) * n_buckets / F.col("total")).cast("long")
    return (
        cum.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("bucket_chars"),
        )
        .orderBy("bucket")
    )


def size_weighted_buckets_sql(n_buckets: int = 8) -> str:
    return f"""
WITH c AS (
  SELECT doc_id, n_chars,
         SUM(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum,
         (SELECT SUM(n_chars) FROM documents) AS total
  FROM documents)
SELECT CAST((cum - 1) * {n_buckets} // total AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS bucket_chars
FROM c GROUP BY 1 ORDER BY 1
"""


def resume_pending_anti_join(orders: DataFrame) -> DataFrame:
    """Work-list minus checkpointed-done (o_orderkey % 7 < 2 plays 'done')."""
    done = orders.filter(F.col("o_orderkey") % 7 < 2).select("o_orderkey")
    pending = orders.join(done, "o_orderkey", "left_anti")
    return (
        pending.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_pending"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderpriority")
    )


RESUME_ANTI_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_pending,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM orders
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 < 2)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def sequence_pack_plan(
    docs: DataFrame, seq_len: int = 512, part_width: int = 64
) -> DataFrame:
    """GPT-style sequence-packing plan: concatenate documents in doc_id
    order and chunk the token stream every ``seq_len`` tokens (documents may
    span sequence boundaries) — the standard LLM pre-training data layout.
    Emits per doc: global start position, covering sequence range, and the
    offset inside its first sequence.

    Tokens are whitespace words of ``text`` (exact in both engines). The
    global positions come from the same distributed two-level prefix sum as
    :func:`size_weighted_buckets_plan` — per-range local window + broadcast
    per-range offsets — never a single-partition window over the data, so
    the plan is the one you'd run over 100 TB (sequence ids for a trillion
    tokens need exactly one extra aggregate pass)."""
    keyed = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
        F.floor(F.col("doc_id") / F.lit(part_width)).alias("pt"),
    )
    w_local = (
        Window.partitionBy("pt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = keyed.withColumn("local_cum", F.sum("n_tok").over(w_local))
    parts = keyed.groupBy("pt").agg(F.sum("n_tok").alias("part_sum"))
    w_off = Window.orderBy("pt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = parts.select(
        "pt",
        F.coalesce(F.sum("part_sum").over(w_off), F.lit(0)).alias("offset"),
    )
    cum = local.join(F.broadcast(offsets), "pt").withColumn(
        "cum", F.col("offset") + F.col("local_cum")
    )
    start = F.col("cum") - F.col("n_tok")
    return (
        cum.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_tok"),
            start.alias("start_pos"),
            F.floor(start / seq_len).cast("long").alias("first_seq"),
            F.floor((F.col("cum") - 1) / seq_len).cast("long").alias("last_seq"),
            (start % seq_len).cast("long").alias("offset_in_seq"),
        )
        .orderBy("doc_id")
    )


def sequence_pack_plan_sql(seq_len: int = 512) -> str:
    return f"""
WITH c AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
         SUM(len(string_split(text, ' '))) OVER
           (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_tok AS BIGINT) AS n_tok,
       CAST(cum - n_tok AS BIGINT) AS start_pos,
       CAST((cum - n_tok) // {seq_len} AS BIGINT) AS first_seq,
       CAST((cum - 1) // {seq_len} AS BIGINT) AS last_seq,
       CAST((cum - n_tok) % {seq_len} AS BIGINT) AS offset_in_seq
FROM c ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# connected components by min-label propagation (shared by the text and
# embedding dedup-cluster operators)
# ---------------------------------------------------------------------------

def min_label_components(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str,
    a_col: str,
    b_col: str,
    max_iters: int = 12,
) -> DataFrame:
    """``(id_col, cluster_id)`` for every id: connected components over
    the undirected pair graph, label = the component's minimum id.

    Scale shape: each iteration is one edge-to-label equi-join + a
    groupBy-min, both keyed on ids — no all-pairs step (the edge list is
    whatever candidate->verify stage produced it). Iterations needed =
    graph diameter; near-dup components are near-cliques (diameter
    2-3), so convergence takes 2-4 rounds, checked by a per-round
    changed-count action with fail-fast at ``max_iters`` (a graph that
    deep is not near-dup-shaped — a large-star/small-star variant
    belongs in the loop instead)."""
    # symmetrize via explode, not union: the two union branches are
    # separate subtrees, so whatever candidate->verify pipeline produced
    # ``pairs`` would execute TWICE to build the edge cache (measured r6:
    # the LSH pair pipeline dominated embedding_dedup_clusters' wall).
    # One explode evaluates it once and emits both directions.
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(a_col).cast("long").alias("a"),
                    F.col(b_col).cast("long").alias("b"),
                ),
                F.struct(
                    F.col(b_col).cast("long").alias("a"),
                    F.col(a_col).cast("long").alias("b"),
                ),
            )
        ).alias("_e")
    ).select("_e.a", "_e.b").persist()
    labels = ids.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(id_col).cast("long").alias("cluster_id"),
    ).persist()
    cached = labels  # the persisted handle (labels may become a projection)
    for _ in range(max_iters):
        neigh = (
            edges.join(
                labels.select(
                    F.col("_id").alias("b"),
                    F.col("cluster_id").alias("nl"),
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nl").alias("nl"))
            .select(F.col("a").alias("_id"), "nl")
        )
        # the change flag rides along the label fold (a label changes iff
        # a neighbour label beats it), so convergence detection costs one
        # aggregation over the already-persisted result instead of a
        # second labels-to-labels equi-join per iteration
        folded = (
            labels.join(neigh, "_id", "left")
            .select(
                "_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nl", "cluster_id")
                ).alias("cluster_id"),
                (F.coalesce("nl", "cluster_id") < F.col("cluster_id"))
                .cast("long")
                .alias("_chg"),
            )
            .persist()
        )
        changed = folded.agg(F.sum("_chg")).first()[0] or 0
        cached.unpersist()
        cached = folded
        labels = folded.select("_id", "cluster_id")
        if changed == 0:
            break
    else:
        raise ValueError(
            f"min_label_components did not converge in {max_iters} "
            f"iterations"
        )
    edges.unpersist()
    return labels.select(F.col("_id").alias(id_col), "cluster_id")
