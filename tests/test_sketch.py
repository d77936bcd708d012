"""KMV distinct sketch: exactness below k, estimate accuracy above k,
partition invariance, DuckDB mirror."""

import duckdb
import pytest

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.functions.sketch import (
    kmv_distinct_ngrams,
    kmv_distinct_ngrams_sql,
)

N_DOCS = 300


@pytest.fixture(scope="module")
def tokens(spark):
    df = G.corpus_dataframe(spark, N_DOCS, num_partitions=4)
    df.cache().count()
    return df


def _exact_distinct(full, n):
    grams = set()
    for seq in full.values():
        for i in range(len(seq) - n + 1):
            grams.add(tuple(seq[i : i + n]))
    return len(grams)


def test_exact_below_k(tokens):
    # k larger than the distinct-bigram domain of a few docs: the sketch
    # IS the distinct set and the estimate is exact
    few = tokens.filter("doc_id <= 'doc-00000020'")
    full = {r.doc_id: r.tokens for r in few.collect()}
    want = _exact_distinct(full, 2)
    row = kmv_distinct_ngrams(few, n=2, k=100000).first()
    assert row.n_seen == want
    assert row.est_distinct == want


def test_estimate_accuracy_above_k(tokens):
    full = {r.doc_id: r.tokens for r in tokens.collect()}
    want = _exact_distinct(full, 3)
    row = kmv_distinct_ngrams(tokens, n=3, k=1024).first()
    assert row.n_seen == 1024  # sketch saturated: estimate path exercised
    assert want > 1024
    # KMV relative error ~1/sqrt(k-2) ~ 3% at k=1024; allow 10%
    assert abs(row.est_distinct - want) <= want * 0.10, (
        row.est_distinct,
        want,
    )


def test_partition_invariance(spark):
    a = kmv_distinct_ngrams(
        G.corpus_dataframe(spark, N_DOCS, num_partitions=2), n=3, k=512
    ).first()
    b = kmv_distinct_ngrams(
        G.corpus_dataframe(spark, N_DOCS, num_partitions=13), n=3, k=512
    ).first()
    assert a == b


def test_matches_duckdb(tokens):
    row = kmv_distinct_ngrams(tokens, n=3, k=1024).first()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT UNNEST(range({N_DOCS})) AS doc_id"
    )
    want = con.execute(kmv_distinct_ngrams_sql(3, 1024)).fetchone()
    assert tuple(row) == want


# ---------------------------------------------------------------------------
# count-min
# ---------------------------------------------------------------------------

import hashlib
from collections import Counter

from mapbox_vector_tile_spark.functions.sketch import (
    CM_D,
    CM_W,
    cm_estimate_top_ngrams,
    cm_estimate_top_ngrams_sql,
    cm_sketch_ngrams,
    cm_sketch_ngrams_sql,
)


def _cm_bucket(r, g, w=CM_W):
    h = int(hashlib.md5(f"{r};{g}".encode()).hexdigest()[:12], 16)
    return h % w


def _exact_grams(full, n):
    c = Counter()
    for seq in full.values():
        for i in range(len(seq) - n + 1):
            c[",".join(str(int(t)) for t in seq[i : i + n])] += 1
    return c


def test_cm_state_matches_brute_force(tokens):
    full = {r.doc_id: r.tokens for r in tokens.collect()}
    grams = _exact_grams(full, 2)
    state = Counter()
    for g, c in grams.items():
        for r in range(CM_D):
            state[(r, _cm_bucket(r, g))] += c
    rows = cm_sketch_ngrams(tokens, n=2).collect()
    assert len(rows) == CM_D
    total = sum(grams.values())
    for row in rows:
        per = {b: c for (r, b), c in state.items() if r == row.r}
        assert row.sum_counts == total  # every row sees every gram
        assert row.nonzero_buckets == len(per)
        assert row.max_count == max(per.values())


def test_cm_estimates_one_sided(tokens):
    full = {r.doc_id: r.tokens for r in tokens.collect()}
    grams = _exact_grams(full, 2)
    state = Counter()
    for g, c in grams.items():
        for r in range(CM_D):
            state[(r, _cm_bucket(r, g))] += c
    rows = cm_estimate_top_ngrams(tokens, n=2, k=5).collect()
    assert len(rows) == 5
    top5 = sorted(grams.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r.g, r.exact_count) for r in rows] == top5
    for r in rows:
        est = min(state[(rr, _cm_bucket(rr, r.g))] for rr in range(CM_D))
        assert r.est_count == est
        assert r.est_count >= r.exact_count  # CM error is one-sided


def test_cm_matches_duckdb(tokens):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT UNNEST(range({N_DOCS})) AS doc_id"
    )
    got = [tuple(r) for r in cm_sketch_ngrams(tokens, n=2).collect()]
    assert got == con.execute(cm_sketch_ngrams_sql(2)).fetchall()
    got_e = [tuple(r) for r in cm_estimate_top_ngrams(tokens, n=2).collect()]
    assert got_e == con.execute(cm_estimate_top_ngrams_sql(2)).fetchall()


def test_cm_plan_no_python(tokens):
    plan = (
        cm_sketch_ngrams(tokens, n=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_register_invariants(tokens):
    from mapbox_vector_tile_spark.functions.sketch import (
        HLL_M,
        hll_register_table,
    )

    rows = hll_register_table(tokens).collect()
    assert rows
    for r in rows:
        assert 0 <= r.bucket < HLL_M
        assert 1 <= r.rho_max <= 41


def test_hll_merge_is_register_max(tokens):
    """The defining sketch property: HLL(A ∪ B) = register-wise max of
    HLL(A), HLL(B) — what makes it map-side combinable at 100 TB."""
    from mapbox_vector_tile_spark.functions.sketch import hll_register_table

    lo = tokens.filter("doc_id < 'doc-00000150'")
    hi = tokens.filter("doc_id >= 'doc-00000150'")

    def regs(df):
        return {
            (r.source, r.bucket): r.rho_max
            for r in hll_register_table(df).collect()
        }

    whole, a, b = regs(tokens), regs(lo), regs(hi)
    merged = dict(a)
    for k, v in b.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == whole


def test_hll_duplicate_invariance(tokens):
    """Re-ingesting the same corpus must not move a single register."""
    from mapbox_vector_tile_spark.functions.sketch import hll_register_table

    doubled = tokens.unionByName(tokens)
    one = [tuple(r) for r in hll_register_table(tokens).collect()]
    two = [tuple(r) for r in hll_register_table(doubled).collect()]
    assert one == two


def test_hll_estimate_accuracy(tokens):
    from mapbox_vector_tile_spark.functions.sketch import hll_vocab_estimate

    for r in hll_vocab_estimate(tokens).collect():
        assert r.exact_distinct > 0
        err = abs(r.est_raw - r.exact_distinct) / r.exact_distinct
        # m=256 -> ~1.04/sqrt(256) = 6.5% standard error; allow 3 sigma
        assert err < 0.20, (r.source, r.est_raw, r.exact_distinct)
    # registers fully occupied at this cardinality: raw estimator regime,
    # no linear-counting correction needed (documented contract)


def test_hll_duckdb_mirror(tokens, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapbox_vector_tile_spark.functions.sketch import (
        hll_vocab_estimate,
        hll_vocab_estimate_sql,
    )

    ids = sorted(
        int(r.doc_id[4:]) for r in tokens.select("doc_id").collect()
    )
    p = tmp_path / "docs.parquet"
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64())}), p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT doc_id FROM '{p}'")
    want = {
        r[0]: tuple(r[1:])
        for r in con.sql(hll_vocab_estimate_sql()).fetchall()
    }
    got = {
        r.source: (r.n_occupied, r.v_zero, r.s_sum, r.est_raw,
                   r.exact_distinct)
        for r in hll_vocab_estimate(tokens).collect()
    }
    assert got == want


def test_bottomk_sample_quantiles(spark):
    """Order-sample quantile sketch: parallelism-invariant, exact when
    n <= k, rank error within the uniform-sample bound at n >> k."""
    from pyspark.sql import functions as F

    from mapbox_vector_tile_spark.functions.sketch import (
        bottomk_sample_quantiles,
    )

    df = spark.range(0, 20000).select(
        F.col("id").alias("rid"),
        # skewed values uncorrelated with id order
        ((F.col("id") * 2654435761) % 10000).alias("val"),
    ).cache()

    got = bottomk_sample_quantiles(df, "val", "rid", k=1024)
    rows = {r.pct: r.v for r in got.collect()}
    assert set(rows) == {50, 90, 99}
    assert got.first().n_sample == 1024

    # parallelism invariance: 1 vs 16 partitions -> identical sketch
    one = {r.pct: r.v for r in bottomk_sample_quantiles(
        df.coalesce(1), "val", "rid", k=1024).collect()}
    many = {r.pct: r.v for r in bottomk_sample_quantiles(
        df.repartition(16), "val", "rid", k=1024).collect()}
    assert one == many == rows

    # rank error: the estimated quantile's TRUE rank is near the target
    n = df.count()
    for pct, v in rows.items():
        true_rank = df.filter(F.col("val") <= v).count() / n
        assert abs(true_rank - pct / 100) < 0.06  # ~1/sqrt(1024) + slack

    # exact regime: n <= k -> sample IS the data, quantiles exact
    small = df.limit(500)
    exact = {r.pct: r.v for r in bottomk_sample_quantiles(
        small, "val", "rid", k=1024).collect()}
    vals = sorted(r.val for r in small.collect())
    m = len(vals)
    for pct, v in exact.items():
        import math
        want = vals[math.ceil(m * pct / 100) - 1]
        assert v == want, (pct, v, want)
