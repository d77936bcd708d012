"""Filesystem Iceberg catalog (sources/iceberg_catalog.py) tests."""

import os

import pytest

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.sources import iceberg as ICE
from mapbox_vector_tile_spark.sources.iceberg_catalog import (
    FsCatalog,
    resolve_uri,
)

import pyspark.sql.types as T

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
])


def test_ident_validation(tmp_path):
    cat = FsCatalog(str(tmp_path / "wh"))
    for bad in ("", ".", "a..b", "a/b.c", "ns."):
        with pytest.raises(ValueError):
            cat.table_path(bad)
    assert cat.table_path("ns.tbl").endswith(os.path.join("ns", "tbl"))


def test_namespace_and_table_lifecycle(tmp_path):
    cat = FsCatalog(str(tmp_path / "wh"))
    cat.create_namespace("raw")
    cat.create_namespace("curated.gold")
    assert cat.list_namespaces() == ["curated", "raw"]
    assert cat.list_namespaces("curated") == ["curated.gold"]
    assert cat.list_tables("raw") == []

    p1 = cat.create_table("raw.tokens", SCHEMA)
    cat.create_table("raw.tokens2", SCHEMA)
    assert cat.list_tables("raw") == ["raw.tokens", "raw.tokens2"]
    # a table dir is NOT listed as a namespace
    assert cat.list_namespaces("raw") == []
    assert cat.table_exists("raw.tokens")
    assert cat.load_table("raw.tokens") == p1
    with pytest.raises(FileExistsError):
        cat.create_table("raw.tokens", SCHEMA)
    with pytest.raises(FileNotFoundError):
        cat.load_table("raw.missing")
    with pytest.raises(NotImplementedError):
        cat.rename_table("raw.tokens", "raw.renamed")

    cat.drop_table("raw.tokens2", purge=True)
    assert not os.path.exists(cat.table_path("raw.tokens2"))
    cat.drop_table("raw.tokens")  # metadata-only drop
    assert not cat.table_exists("raw.tokens")
    assert os.path.isdir(p1)  # data dir (would) survive


def test_resolve_uri_forms(tmp_path):
    cat = FsCatalog(str(tmp_path / "wh"))
    p = cat.create_table("ns.t", SCHEMA)
    assert resolve_uri(f"iceberg://{cat.warehouse}::ns.t") == (p, "")
    assert resolve_uri(f"iceberg://{cat.warehouse}::ns.t@77") == (p, "77")
    assert resolve_uri("iceberg:///plain/path@5") == ("/plain/path", "5")
    assert resolve_uri("iceberg:///plain/path") == ("/plain/path", "")
    with pytest.raises(ValueError):
        resolve_uri("parquet:///x")
    with pytest.raises(FileNotFoundError):
        resolve_uri(f"iceberg://{cat.warehouse}::ns.missing")


def test_catalog_table_read_write_roundtrip(spark, tmp_path):
    """End to end through the catalog: create in a namespace, append,
    resolve by URI, scan — identical rows to the source frame."""
    cat = FsCatalog(str(tmp_path / "wh"))
    cat.create_namespace("corpus")
    df = G.corpus_dataframe(spark, 80, num_partitions=2)
    ICE.append_dataframe(
        spark, df, cat.create_table("corpus.tokens", df.schema)
    )
    path, snap = resolve_uri(f"iceberg://{cat.warehouse}::corpus.tokens")
    assert snap == ""
    back = ICE.read_table(spark, path)
    assert back.count() == 80
    a = {r.doc_id: r.tokens for r in df.collect()}
    b = {r.doc_id: r.tokens for r in back.collect()}
    assert a == b


def test_catalog_uri_through_file_scan(spark, tmp_path):
    """list_parquet_files accepts the catalog URI form — the fused/direct
    deployment surface consumes catalog tables natively."""
    from mapbox_vector_tile_spark.sources.parquet_direct import (
        list_parquet_files,
    )

    cat = FsCatalog(str(tmp_path / "wh"))
    df = G.corpus_dataframe(spark, 40, num_partitions=2)
    p = cat.create_table("ns.t", df.schema)
    ICE.append_dataframe(spark, df, p)
    via_cat = list_parquet_files(f"iceberg://{cat.warehouse}::ns.t")
    via_path = list_parquet_files(f"iceberg://{p}")
    assert via_cat == via_path and len(via_cat) > 0
