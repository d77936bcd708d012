"""Size-weighted partitioning + checkpoint/resume tests (SURVEY §5 plan:
kill after k partitions, rerun, assert only pending ran and result equals an
uninterrupted run)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.engine.checkpoint import (
    encode_with_checkpoint,
    read_checkpoint,
)
from mapbox_vector_tile_spark.engine.decode import decode_dataframe
from mapbox_vector_tile_spark.engine.partitioning import (
    bucket_of_value,
    hash_perfect_labels,
    size_weighted_repartition,
    weighted_cuts,
)
from mapbox_vector_tile_spark.engine.verify import verify_roundtrip

N_DOCS = 500
N_BUCKETS = 8


@pytest.fixture(scope="module")
def tokens_df(spark):
    df = G.corpus_dataframe(spark, N_DOCS, num_partitions=4)
    df.cache().count()
    return df


def test_hash_perfect_labels(spark):
    labels = hash_perfect_labels(spark, N_BUCKETS)
    got = (
        spark.createDataFrame([(x,) for x in labels], "label int")
        .select(F.pmod(F.hash("label"), F.lit(N_BUCKETS)).alias("p"))
        .collect()
    )
    assert sorted(r.p for r in got) == list(range(N_BUCKETS))


def test_size_weighted_balance(spark, tokens_df):
    bucketed = size_weighted_repartition(tokens_df, N_BUCKETS, sample_fraction=1.0)
    per_bucket = (
        bucketed.groupBy(F.spark_partition_id().alias("pid"), "bucket")
        .agg(F.sum("n_tok").alias("w"))
        .collect()
    )
    # exactly one bucket per spark partition
    assert len({r.pid for r in per_bucket}) == len(per_bucket)
    weights = np.array([r.w for r in per_bucket], dtype=float)
    assert weights.size == N_BUCKETS
    # byte balance despite 8192-token outlier docs: max <= 2x mean
    assert weights.max() <= 2.0 * weights.mean()


def test_bucket_of_value_mirror(spark, tokens_df):
    cuts = weighted_cuts(tokens_df, N_BUCKETS, "doc_id", "n_tok", sample_fraction=1.0)
    bucketed = size_weighted_repartition(tokens_df, N_BUCKETS, sample_fraction=1.0)
    for r in bucketed.select("doc_id", "bucket").limit(50).collect():
        assert r.bucket == bucket_of_value(cuts, r.doc_id)


def test_resume_equals_uninterrupted(spark, tokens_df, tmp_path):
    out1 = str(tmp_path / "blocks_full")
    ck1 = str(tmp_path / "ckpt_full")
    s = encode_with_checkpoint(spark, tokens_df, out1, ck1, N_BUCKETS)
    assert s["buckets_processed"] == s["buckets_total"]

    out2 = str(tmp_path / "blocks_resumed")
    ck2 = str(tmp_path / "ckpt_resumed")
    # "crash" after 3 buckets
    s1 = encode_with_checkpoint(
        spark, tokens_df, out2, ck2, N_BUCKETS, fail_after_buckets=3
    )
    assert s1["buckets_processed"] == 3
    # resume: only the pending buckets run
    s2 = encode_with_checkpoint(spark, tokens_df, out2, ck2, N_BUCKETS)
    assert s2["buckets_processed"] == s2["buckets_total"] - 3
    # third call: nothing pending
    s3 = encode_with_checkpoint(spark, tokens_df, out2, ck2, N_BUCKETS)
    assert s3["buckets_processed"] == 0

    full = spark.read.parquet(out1)
    resumed = spark.read.parquet(out2)
    # identical decoded contents
    res = verify_roundtrip(tokens_df, decode_dataframe(resumed)).first()
    assert (res.n_docs, res.n_match, res.n_mismatch) == (N_DOCS, N_DOCS, 0)
    # identical byte totals (same partitioning -> same chunks)
    a = full.agg(F.sum("bytes_enc"), F.sum("n_values"), F.sum("n_rows")).first()
    b = resumed.agg(F.sum("bytes_enc"), F.sum("n_values"), F.sum("n_rows")).first()
    assert tuple(a) == tuple(b)

    ck = read_checkpoint(spark, ck2)
    assert ck.count() == s1["buckets_total"]  # one lineage row per bucket
    assert {r.status for r in ck.select("status").distinct().collect()} == {"done"}


def test_bucket_plan_persisted_and_reused(spark, tokens_df, tmp_path):
    import json
    import os

    out = str(tmp_path / "blocks_plan")
    ck = str(tmp_path / "ckpt_plan")
    encode_with_checkpoint(
        spark, tokens_df, out, ck, N_BUCKETS, fail_after_buckets=2
    )
    plan_path = os.path.join(ck, "_bucket_plan.json")
    assert os.path.exists(plan_path)
    with open(plan_path) as f:
        plan = json.load(f)
    assert plan["num_partitions"] == N_BUCKETS
    assert len(plan["cuts"]) == N_BUCKETS - 1
    # resume with a different bucketing must fail fast
    with pytest.raises(ValueError, match="bucket plan mismatch"):
        encode_with_checkpoint(spark, tokens_df, out, ck, N_BUCKETS * 2)
    with pytest.raises(ValueError, match="bucket plan mismatch"):
        encode_with_checkpoint(
            spark, tokens_df, out, ck, N_BUCKETS, sort_col="source"
        )
    # normal resume still completes and round-trips
    s = encode_with_checkpoint(spark, tokens_df, out, ck, N_BUCKETS)
    assert s["buckets_processed"] == s["buckets_total"] - 2
    res = verify_roundtrip(
        tokens_df, decode_dataframe(spark.read.parquet(out))
    ).first()
    assert res.n_mismatch == 0 and res.n_docs == N_DOCS


def test_rerun_of_done_bucket_is_idempotent(spark, tokens_df, tmp_path):
    out = str(tmp_path / "blocks_idem")
    ck_a = str(tmp_path / "ckpt_a")
    ck_b = str(tmp_path / "ckpt_b")
    encode_with_checkpoint(spark, tokens_df, out, ck_a, N_BUCKETS)
    n1 = spark.read.parquet(out).count()
    # fresh checkpoint dir: every bucket reruns into the same out_dir;
    # dynamic partition overwrite must not duplicate rows
    encode_with_checkpoint(spark, tokens_df, out, ck_b, N_BUCKETS)
    n2 = spark.read.parquet(out).count()
    assert n1 == n2
    res = verify_roundtrip(
        tokens_df, decode_dataframe(spark.read.parquet(out))
    ).first()
    assert res.n_mismatch == 0 and res.n_docs == N_DOCS


def test_fused_resume_equals_uninterrupted(spark, tokens_df, tmp_path):
    """Fused flagship path: crash after 2 tasks, resume, third run is a
    no-op; final table byte-identical to an uninterrupted run."""
    import json
    import os

    from mapbox_vector_tile_spark.engine.checkpoint import (
        encode_with_checkpoint_fused,
    )

    tokens_pq = str(tmp_path / "tokens")
    tokens_df.write.parquet(tokens_pq, mode="overwrite")

    out1, ck1 = str(tmp_path / "b1"), str(tmp_path / "c1")
    s1 = encode_with_checkpoint_fused(
        spark, tokens_pq, out1, ck1, N_BUCKETS, n_tasks=4
    )
    assert s1["tasks_total"] == s1["tasks_processed"] == 4

    out2, ck2 = str(tmp_path / "b2"), str(tmp_path / "c2")
    s2a = encode_with_checkpoint_fused(
        spark, tokens_pq, out2, ck2, N_BUCKETS, n_tasks=4, fail_after_tasks=2
    )
    assert s2a["tasks_processed"] == 2
    assert not os.path.exists(os.path.join(out2, "_SUCCESS"))
    s2b = encode_with_checkpoint_fused(
        spark, tokens_pq, out2, ck2, N_BUCKETS, n_tasks=4
    )
    assert s2b["tasks_processed"] == s2a["tasks_total"] - 2
    s2c = encode_with_checkpoint_fused(
        spark, tokens_pq, out2, ck2, N_BUCKETS, n_tasks=4
    )
    assert s2c["tasks_processed"] == 0
    assert os.path.exists(os.path.join(out2, "_SUCCESS"))
    with open(os.path.join(out2, "_manifest.json")) as fh:
        counts = json.load(fh)["row_counts"]
    assert sum(counts.values()) == spark.read.parquet(out2).count()

    # resumed result equals uninterrupted result, and decodes bit-identical
    a = spark.read.parquet(out1)
    b = spark.read.parquet(out2)
    cols = ["chunk_id", "n_rows", "n_values", "checksum", "bytes_enc"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )
    res = verify_roundtrip(tokens_df, decode_dataframe(b)).first()
    assert (res.n_docs, res.n_match, res.n_mismatch) == (N_DOCS, N_DOCS, 0)

    # plan mismatch fails fast
    with pytest.raises(ValueError, match="plan mismatch"):
        encode_with_checkpoint_fused(
            spark, tokens_pq, out2, ck2, N_BUCKETS + 1, n_tasks=4
        )


def test_fused_resume_from_pre_envelope_checkpoint(spark, tokens_df,
                                                   tmp_path):
    """Resuming a checkpoint dir whose earlier files predate the
    min_doc_id/max_doc_id columns (12-column schema) must not fail or
    silently corrupt the manifest: mergeSchema reconciles the mix, and
    pre-envelope rows land as null stats (conservative keep at scan)."""
    import json
    import os

    from mapbox_vector_tile_spark.engine.checkpoint import (
        encode_with_checkpoint_fused,
    )

    tokens_pq = str(tmp_path / "tokens")
    tokens_df.write.parquet(tokens_pq, mode="overwrite")
    out, ck = str(tmp_path / "b"), str(tmp_path / "c")
    s = encode_with_checkpoint_fused(
        spark, tokens_pq, out, ck, N_BUCKETS, n_tasks=4, fail_after_tasks=2
    )
    assert s["tasks_processed"] == 2

    # rewrite the partial checkpoint in the OLD 12-column layout
    old = spark.read.parquet(ck).drop("min_doc_id", "max_doc_id")
    old_rows = old.collect()
    import shutil
    shutil.rmtree(ck)
    spark.createDataFrame(old_rows, old.schema).write.parquet(ck)

    # resume appends 14-column files next to the 12-column ones
    s2 = encode_with_checkpoint_fused(
        spark, tokens_pq, out, ck, N_BUCKETS, n_tasks=4
    )
    assert s2["tasks_processed"] == 2
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    with open(os.path.join(out, "_manifest.json")) as fh:
        man = json.load(fh)
    assert sum(man["row_counts"].values()) == spark.read.parquet(out).count()
    # pre-envelope fragments: null stats; resumed ones: real envelopes
    stats = man["file_stats"]
    assert any(v["min_doc_id"] is None for v in stats.values())
    assert any(v["min_doc_id"] for v in stats.values())
    res = verify_roundtrip(
        tokens_df, decode_dataframe(spark.read.parquet(out))
    ).first()
    assert (res.n_docs, res.n_match, res.n_mismatch) == (N_DOCS, N_DOCS, 0)
