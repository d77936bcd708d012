"""Blocks fsck: every corruption class detected, healthy side still decodes."""

import numpy as np

from pyspark.sql import functions as F

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.engine.decode import decode_dataframe
from mapbox_vector_tile_spark.engine.encode import (
    EncodeOptions,
    encode_dataframe,
)
from mapbox_vector_tile_spark.engine.fsck import (
    BAD_CRC,
    BAD_FRAME,
    BAD_STRUCTURE,
    OK,
    fsck_blocks,
    fsck_summary,
    quarantine_scan,
)


def _blocks(spark, n=200):
    corpus = G.corpus_dataframe(spark, n, num_partitions=3)
    return encode_dataframe(corpus, EncodeOptions())


def _corrupt(spark, blocks, mutate):
    """Apply `mutate(row_dict) -> row_dict` to the first chunk."""
    rows = [r.asDict() for r in blocks.collect()]
    rows[0] = mutate(dict(rows[0]))
    return spark.createDataFrame(rows, blocks.schema)


def test_clean_table_is_all_ok(spark):
    blocks = _blocks(spark)
    rep = fsck_summary(blocks).collect()
    assert [(r.status, r.n_chunks > 0) for r in rep] == [(OK, True)]


def test_bitrot_detected_and_quarantined(spark):
    blocks = _blocks(spark).cache()

    def flip(row):
        p = bytearray(row["payload"])
        p[len(p) // 2] ^= 0xFF
        row["payload"] = bytes(p)
        return row

    bad = _corrupt(spark, blocks, flip)
    rep = {r.status: r.n_chunks for r in fsck_summary(bad).collect()}
    assert rep[BAD_CRC] == 1 and rep[OK] == bad.count() - 1

    healthy, damaged = quarantine_scan(bad)
    assert damaged.count() == 1
    assert damaged.first().error.startswith("payload crc32")
    # the healthy side decodes fully, no poison-chunk failure
    n = decode_dataframe(healthy).count()
    assert n > 0


def test_bad_frame_and_structure_detected(spark):
    blocks = _blocks(spark).cache()

    def bad_magic(row):
        p = bytearray(row["payload"])
        p[0] ^= 0xFF
        row["payload"] = bytes(p)
        import zlib

        row["checksum"] = zlib.crc32(bytes(p))  # crc passes, frame doesn't
        return row

    rep = {
        r.status: r.n_chunks
        for r in fsck_summary(_corrupt(spark, blocks, bad_magic)).collect()
    }
    assert rep[BAD_FRAME] == 1

    def wrong_counts(row):
        row["n_values"] = int(row["n_values"]) + 1
        return row

    rep = {
        r.status: r.n_chunks
        for r in fsck_summary(
            _corrupt(spark, blocks, wrong_counts)
        ).collect()
    }
    assert rep[BAD_STRUCTURE] == 1
