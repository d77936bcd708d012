"""Write-audit-publish: staged bad batches never reach readers; the
rollback is an explicit compensating commit. Plus grouped top-k plan."""

import os

import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.engine import snapshots as S
from mapbox_vector_tile_spark.engine.encode import (
    EncodeOptions,
    encode_dataframe,
)
from mapbox_vector_tile_spark.engine.verify import doc_num_expr
from mapbox_vector_tile_spark.engine.wap import read_main, wap_append

N_DOCS = 200


@pytest.fixture(scope="module")
def tokens(spark):
    df = G.corpus_dataframe(spark, N_DOCS, num_partitions=4)
    df.cache().count()
    return df


def _enc(tokens, pred):
    return encode_dataframe(tokens.filter(pred), EncodeOptions())


def test_wap_publish_and_reject(spark, tokens, tmp_path):
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    r1 = wap_append(spark, root, _enc(tokens, doc_num_expr() % 2 == 0))
    assert r1["mode"] == "published"
    n_even = read_main(spark, root).count()
    assert n_even == tokens.filter(doc_num_expr() % 2 == 0).count()

    # a duplicate batch stages, fails the audit, and main never moves
    r2 = wap_append(spark, root, _enc(tokens, doc_num_expr() % 2 == 0))
    assert r2["mode"] == "rejected" and "duplicate" in r2["reason"]
    assert read_main(spark, root).count() == n_even
    # the staged snapshot and the compensating rewrite are BOTH in
    # history (auditable), reader state is restored content
    ops = [s["operation"] for s in S.snapshot_log(root)]
    assert ops == ["append", "append", "rewrite"]

    # pipeline continues: the next good batch publishes on the restored
    # state and readers see the union
    r3 = wap_append(spark, root, _enc(tokens, doc_num_expr() % 2 == 1))
    assert r3["mode"] == "published"
    assert read_main(spark, root).count() == N_DOCS


def test_wap_first_batch_must_pass(spark, tokens, tmp_path):
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    dup = _enc(tokens, doc_num_expr() < 4).unionByName(
        _enc(tokens, doc_num_expr() < 4)
    )
    with pytest.raises(ValueError, match="first batch"):
        wap_append(spark, root, dup)


def test_top_k_uses_window_group_limit(spark):
    from mapbox_vector_tile_spark.functions.olap import top_events_per_user

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df = top_events_per_user(ev, k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    rows = df.collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    want = {}
    for r in ev.select(
        "user_id", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    ).collect():
        want.setdefault(r.user_id, []).append((-r.value_c, r.event_id))
    for u, got in by_user.items():
        top = sorted(want[u])[:3]
        assert [(-(g.value_c), g.event_id) for g in got] == top
        assert [g.rnk for g in got] == list(range(1, len(got) + 1))
