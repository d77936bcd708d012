"""Incremental materialized view: fold==recompute at every step, noop on
unchanged tables, visible full-refresh fallback across rewrites."""

import os

import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.engine import snapshots as S
from mapbox_vector_tile_spark.engine.encode import EncodeOptions, encode_dataframe
from mapbox_vector_tile_spark.engine.matview import (
    _partial,
    mv_state,
    read_mv,
    refresh_source_rollup_mv,
)
from mapbox_vector_tile_spark.engine.verify import doc_num_expr

N_DOCS = 300


@pytest.fixture(scope="module")
def tokens(spark):
    df = G.corpus_dataframe(spark, N_DOCS, num_partitions=4)
    df.cache().count()
    return df


def _mv_rows(spark, mv):
    return {
        r.source: (r.n_docs, r.sum_tok, r.cks)
        for r in read_mv(spark, mv).collect()
    }


def _recompute(spark, root):
    return {
        r.source: (r.n_docs, r.sum_tok, r.cks)
        for r in _partial(S.decode_at(spark, root)).collect()
    }


def test_incremental_equals_recompute_each_step(spark, tokens, tmp_path):
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    mv = str(tmp_path / "mv")

    S.commit_append(
        root,
        encode_dataframe(tokens.filter(doc_num_expr() % 3 == 0), EncodeOptions()),
    )
    assert refresh_source_rollup_mv(spark, root, mv)["mode"] == "full"
    assert _mv_rows(spark, mv) == _recompute(spark, root)

    # noop when the table did not move
    assert refresh_source_rollup_mv(spark, root, mv)["mode"] == "noop"

    S.commit_append(
        root,
        encode_dataframe(tokens.filter(doc_num_expr() % 3 != 0), EncodeOptions()),
    )
    assert refresh_source_rollup_mv(spark, root, mv)["mode"] == "incremental"
    assert _mv_rows(spark, mv) == _recompute(spark, root)

    S.commit_deletes(
        root, tokens.select("doc_id").filter(doc_num_expr() % 11 == 5)
    )
    assert refresh_source_rollup_mv(spark, root, mv)["mode"] == "incremental"
    assert _mv_rows(spark, mv) == _recompute(spark, root)
    # retraction actually happened
    total = sum(v[0] for v in _mv_rows(spark, mv).values())
    assert total == tokens.filter(doc_num_expr() % 11 != 5).count()


def test_rewrite_window_falls_back_to_full(spark, tokens, tmp_path):
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    mv = str(tmp_path / "mv")
    S.commit_append(
        root,
        encode_dataframe(tokens.filter(doc_num_expr() < 100), EncodeOptions()),
    )
    refresh_source_rollup_mv(spark, root, mv)
    # compact/rewrite the table: the CDC window is not change-shaped
    S.commit_rewrite(root, S.read_blocks_at(spark, root))
    out = refresh_source_rollup_mv(spark, root, mv)
    assert out["mode"] == "full"
    assert _mv_rows(spark, mv) == _recompute(spark, root)
    assert mv_state(mv)["mode"] == "full"


def test_large_delete_window_stays_distributed(spark, tokens, tmp_path):
    """A delete wave covering half the table retracts exactly, through
    the join-shaped decode_doc_ids_df path (no driver-side id collect,
    no per-id plan literals)."""
    root = str(tmp_path / "tbl_bigdel")
    os.makedirs(root)
    mv = str(tmp_path / "mv_bigdel")
    S.commit_append(root, encode_dataframe(tokens, EncodeOptions()))
    assert refresh_source_rollup_mv(spark, root, mv)["mode"] == "full"

    # GDPR-purge-shaped wave: every even doc (half the corpus)
    S.commit_deletes(
        root, tokens.select("doc_id").filter(doc_num_expr() % 2 == 0)
    )
    out = refresh_source_rollup_mv(spark, root, mv)
    assert out["mode"] == "incremental"
    assert _mv_rows(spark, mv) == _recompute(spark, root)
    total = sum(v[0] for v in _mv_rows(spark, mv).values())
    assert total == tokens.filter(doc_num_expr() % 2 != 0).count()
