"""Token-budget mixture planner: per-source keep rates derived from the
corpus itself to hit a target token mixture under a global budget.

Assembling a training run from N sources is a two-step contract (the
Pile / Dolma / C4-style mixture construction): decide *how many tokens*
each source contributes (``budget * weight``), then turn that into a
*deterministic per-document keep rate* against what the source actually
has (``rate = min(1, target / available)`` — a source smaller than its
target saturates at keep-everything; re-weighting the shortfall is the
caller's policy decision, reported not hidden).

Everything is integer arithmetic and a pure function of (corpus, weights,
budget) — rerun-stable, cluster-size-independent, SQL-reproducible:

1. ONE scan of the corpus builds the per-(source, mixture-bucket)
   histogram — the keep decision is ``mixture_hash(doc) < rate`` with a
   per-mille hash, so counting docs/tokens per hash bucket up front makes
   *every* rate's outcome computable without a second scan. The groupBy
   keys at most ``n_sources * 1000`` groups: map-side combine collapses
   the big side; the shuffled aggregate is tiny.
2. Rates and kept-totals come from that tiny rollup alone (higher-order
   ``filter``/``aggregate`` over per-source bucket arrays).

The mixture hash uses its own multiplicative constant (xxhash32 PRIME32_2,
public), independent of the split (:mod:`.split`), downsample and upsample
hashes (:mod:`.sample`) — mixture membership never correlates with split
assignment or earlier sampling passes.

Reference parity anchor: the reference resolves per-layer option cascades
into effective encode parameters (``/root/reference/mapbox_vector_tile/
encoder.py`` options resolution); this is the corpus-level analog — a
declared policy resolved against observed data into effective rates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..engine.verify import doc_num_expr

_MIX_MULT = 2246822519  # xxhash32 PRIME32_2 (public) — independent hash
_SPACE = 1000  # per-mille rate space


def mixture_hash_expr(doc_id_col: str = "doc_id") -> Column:
    """Per-mille mixture coordinate of a doc — independent of the split,
    downsample and upsample hashes (distinct multiplier)."""
    return (doc_num_expr(doc_id_col) * F.lit(_MIX_MULT)) % F.lit(_SPACE)


def _weight_case(weights: dict[str, int], default_weight: int) -> Column:
    for s, w in weights.items():
        if not 0 <= w <= _SPACE:
            raise ValueError(f"weight for {s!r} out of [0, {_SPACE}]: {w}")
    w: Column = F.lit(default_weight)
    for s, wt in weights.items():
        w = F.when(F.col("source") == s, F.lit(wt)).otherwise(w)
    return w


def mixture_plan(
    df: DataFrame,
    weights: dict[str, int],
    budget_tokens: int,
    default_weight: int = 0,
    source_col: str = "source",
    doc_id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Resolve ``(weights, budget)`` against the corpus into effective
    per-source keep rates, one scan.

    Returns one row per source: ``(source, weight_permille, avail_docs,
    avail_tokens, target_tokens, rate_permille, kept_docs, kept_tokens)``.

    ``target_tokens = budget * weight DIV 1000`` (integer floor);
    ``rate_permille = min(1000, 1000 * target DIV avail_tokens)`` (floor —
    the plan under- rather than over-spends the budget; 0 when the source
    is empty). ``kept_*`` are the EXACT totals the rate admits, read off
    the bucket histogram — not an expectation.
    """
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0: {budget_tokens}")
    buckets = (
        df.groupBy(
            F.col(source_col).alias("source"),
            mixture_hash_expr(doc_id_col).alias("bk"),
        )
        .agg(
            F.count("*").alias("d"),
            F.sum(F.col(n_tok_col).cast("long")).alias("t"),
        )
    )
    per_src = buckets.groupBy("source").agg(
        F.sum("d").alias("avail_docs"),
        F.sum("t").alias("avail_tokens"),
        F.array_sort(F.collect_list(F.struct("bk", "d", "t"))).alias("_bks"),
    )
    # integer DIV throughout: budget*weight reaches ~1e15 and 1000*target
    # ~1e18 at real budgets — float division would round past 2^53 and
    # diverge from the SQL mirror's exact //
    target = F.expr(
        f"(CAST({int(budget_tokens)} AS BIGINT) * weight_permille)"
        f" DIV {_SPACE}"
    )
    rate = F.expr(
        f"CASE WHEN avail_tokens <= 0 THEN CAST(0 AS BIGINT)"
        f" ELSE LEAST(CAST({_SPACE} AS BIGINT),"
        f" (CAST({_SPACE} AS BIGINT) * target_tokens) DIV avail_tokens) END"
    )
    kept = lambda field: F.aggregate(  # noqa: E731
        F.filter(F.col("_bks"), lambda x: x["bk"] < F.col("rate_permille")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x[field],
    )
    return (
        per_src.withColumn(
            "weight_permille",
            _weight_case(weights, default_weight).cast("long"),
        )
        .withColumn("target_tokens", target)
        .withColumn("rate_permille", rate)
        .select(
            "source",
            "weight_permille",
            F.col("avail_docs").cast("long").alias("avail_docs"),
            F.col("avail_tokens").cast("long").alias("avail_tokens"),
            "target_tokens",
            "rate_permille",
            kept("d").alias("kept_docs"),
            kept("t").alias("kept_tokens"),
        )
        .orderBy("source")
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, int],
    budget_tokens: int,
    default_weight: int = 0,
    source_col: str = "source",
    doc_id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Apply the resolved plan: keep each row iff its mixture hash falls
    under its source's effective rate.

    The plan side is at most ``n_sources`` rows — broadcast-joined, so the
    corpus side never shuffles; the filter is a pure Catalyst predicate.
    """
    # the plan shares df's lineage (a self-join): rename its columns so the
    # join condition stays unambiguous
    rates = mixture_plan(
        df,
        weights,
        budget_tokens,
        default_weight,
        source_col,
        doc_id_col,
        n_tok_col,
    ).select(
        F.col("source").alias("_mix_src"),
        F.col("rate_permille").alias("_mix_rate"),
    )
    return (
        df.join(
            F.broadcast(rates),
            F.col(source_col) == F.col("_mix_src"),
            "inner",
        )
        .filter(mixture_hash_expr(doc_id_col) < F.col("_mix_rate"))
        .drop("_mix_src", "_mix_rate")
    )


def mixture_plan_sql(
    weights: dict[str, int],
    budget_tokens: int,
    default_weight: int = 0,
    doc_source: str = "documents",
) -> str:
    """DuckDB mirror of :func:`mixture_plan` — same one-scan bucket
    histogram, same integer floor arithmetic."""
    from .. import corpus as C
    from ..corpus import params_cte_sql

    cases = " ".join(f"WHEN '{s}' THEN {w}" for s, w in weights.items())
    w = f"CASE source {cases} ELSE {default_weight} END"
    return f"""
WITH{params_cte_sql(doc_source)},
  b AS (
    SELECT {C.source_case_sql('doc_id')} AS source,
           (doc_id * {_MIX_MULT}) % {_SPACE} AS bk,
           COUNT(*) AS d, SUM(n_tok) AS t
    FROM p GROUP BY 1, 2
  ),
  s AS (
    SELECT source, SUM(d) AS avail_docs, SUM(t) AS avail_tokens
    FROM b GROUP BY source
  ),
  r AS (
    SELECT source, avail_docs, avail_tokens,
           CAST({w} AS BIGINT) AS weight_permille,
           ({int(budget_tokens)} * ({w})) // {_SPACE} AS target_tokens,
           CASE WHEN avail_tokens <= 0 THEN 0
                ELSE LEAST({_SPACE},
                           ({_SPACE} * (({int(budget_tokens)} * ({w}))
                            // {_SPACE})) // avail_tokens)
           END AS rate_permille
    FROM s
  )
SELECT r.source,
       r.weight_permille,
       CAST(r.avail_docs AS BIGINT) AS avail_docs,
       CAST(r.avail_tokens AS BIGINT) AS avail_tokens,
       CAST(r.target_tokens AS BIGINT) AS target_tokens,
       CAST(r.rate_permille AS BIGINT) AS rate_permille,
       CAST(COALESCE(SUM(b.d) FILTER (WHERE b.bk < r.rate_permille), 0)
            AS BIGINT) AS kept_docs,
       CAST(COALESCE(SUM(b.t) FILTER (WHERE b.bk < r.rate_permille), 0)
            AS BIGINT) AS kept_tokens
FROM r JOIN b ON b.source = r.source
GROUP BY 1, 2, 3, 4, 5, 6
ORDER BY r.source
"""
