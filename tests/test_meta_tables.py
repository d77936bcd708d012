"""Metadata tables: snapshots/files/refs as DataFrames, consistent with
the underlying log across appends, deletes, rewrites and refs."""

import os

import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.engine import snapshots as S
from mapbox_vector_tile_spark.engine.encode import (
    EncodeOptions,
    encode_dataframe,
)
from mapbox_vector_tile_spark.engine.meta_tables import (
    table_files,
    table_refs,
    table_snapshots,
)
from mapbox_vector_tile_spark.engine.verify import doc_num_expr


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("meta") / "tbl")
    os.makedirs(root)
    tok = G.corpus_dataframe(spark, 200, num_partitions=4)
    S.commit_append(root, encode_dataframe(tok.filter(doc_num_expr() < 100), EncodeOptions()))
    S.commit_append(root, encode_dataframe(tok.filter(doc_num_expr() >= 100), EncodeOptions()))
    S.commit_deletes(root, tok.select("doc_id").filter(doc_num_expr() % 19 == 1))
    S.set_ref(root, "release-1", sid=2, kind="tag")
    S.set_ref(root, "main", kind="branch")
    return root


def test_snapshots_table(spark, table):
    rows = {r.snapshot_id: r for r in table_snapshots(spark, table).collect()}
    assert [rows[i].operation for i in (1, 2, 3)] == [
        "append", "append", "delete",
    ]
    assert rows[1].parent_id is None and rows[2].parent_id == 1
    # append 2 adds files on top of append 1's; the delete adds none
    assert rows[2].n_files == rows[1].n_files + rows[2].n_new_files
    assert rows[3].n_new_files == 0
    assert rows[3].n_files == rows[2].n_files


def test_files_table(spark, table):
    files = table_files(spark, table).collect()
    snap = S.read_snapshot(table, S.current_snapshot_id(table))
    assert sorted(r.path for r in files) == sorted(snap["data_files"])
    assert all(r.bytes > 0 for r in files)
    # committed_in tracks the first snapshot listing each file
    assert {r.committed_in for r in files} == {1, 2}
    # at snapshot 1, only the first batch's files exist
    first = table_files(spark, table, snapshot_id=1).collect()
    assert all(r.committed_in == 1 for r in first)
    assert len(first) < len(files)


def test_refs_table_and_joinability(spark, table):
    refs = {r.name: r for r in table_refs(spark, table).collect()}
    assert refs["release-1"].kind == "tag" and refs["release-1"].snapshot_id == 2
    assert refs["main"].kind == "branch"
    # metadata tables compose with plain DataFrame ops
    joined = (
        table_refs(spark, table)
        .join(table_snapshots(spark, table), "snapshot_id")
        .filter(F.col("name") == "release-1")
        .first()
    )
    assert joined.operation == "append"
