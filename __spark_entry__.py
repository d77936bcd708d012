"""Driver contract for the spark-graft builder (PySpark target).

The flagship path is the engine's core contract: synthesize the deterministic
token corpus (doc ids taken from the driver's ``documents`` table so the
DuckDB oracle can reproduce the set), encode it with per-chunk codec
auto-selection, decode it back, and emit order-sensitive checksums of the
*decoded* tokens. The oracle SQL computes the same checksums straight from
the closed-form generator — a match proves bit-identical round trip through
the full Spark pipeline (BASELINE.json per-row invariant).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from mapbox_vector_tile_spark import corpus as C
from mapbox_vector_tile_spark.codec import blocks as B
from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.engine.decode import decode_dataframe
from mapbox_vector_tile_spark.engine.encode import EncodeOptions, encode_dataframe
from mapbox_vector_tile_spark.engine.verify import (
    doc_num_expr,
    regime_expr,
    regime_rollup,
    with_doc_checksums,
)

_CODECS = [
    "raw",
    "bitpack_zz",
    "for_bitpack",
    "delta_zz_bitpack",
    "delta_zz_varint",
    "rle",
    "dict_bitpack",
]


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens table whose doc-id set == the documents table's (oracle-visible)."""
    ids = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return G.corpus_dataframe_from_ids(ids)


def _per_doc_result(decoded: DataFrame) -> DataFrame:
    out = with_doc_checksums(decoded)
    return out.select(
        "doc_id",
        regime_expr(doc_num_expr()).alias("regime"),
        F.col("n_tok").cast("long").alias("n_tok"),
        "tok_cks",
        "tok_wcks",
        "tok_min",
        "tok_max",
    ).orderBy("doc_id")


def _roundtrip(spark: SparkSession, sf_dir: str, codec: str | None) -> DataFrame:
    tokens = _corpus(spark, sf_dir)
    blocks = encode_dataframe(tokens, EncodeOptions(codec=codec))
    return decode_dataframe(blocks)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full encode->decode round trip at sf0.001, per-regime rollup."""
    decoded = _roundtrip(spark, "/root/testdata/sf0.001", None)
    return regime_rollup(with_doc_checksums(decoded))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # generator parity (no codec in the loop) — isolates corpus correctness
    def corpus_per_doc(spark, sf_dir):
        return _per_doc_result(_corpus(spark, sf_dir))

    q["corpus_per_doc_checksums"] = corpus_per_doc

    # flagship: auto-selected codec round trip, per-doc and per-regime
    def roundtrip_auto_per_doc(spark, sf_dir):
        return _per_doc_result(_roundtrip(spark, sf_dir, None))

    def roundtrip_auto_by_regime(spark, sf_dir):
        return regime_rollup(with_doc_checksums(_roundtrip(spark, sf_dir, None)))

    q["roundtrip_auto_per_doc"] = roundtrip_auto_per_doc
    q["roundtrip_auto_by_regime"] = roundtrip_auto_by_regime

    # every codec forced end-to-end (per-regime rollup granularity)
    for codec in _CODECS:
        def rt(spark, sf_dir, _c=codec):
            return regime_rollup(with_doc_checksums(_roundtrip(spark, sf_dir, _c)))

        q[f"roundtrip_{codec}_by_regime"] = rt

    # compression manifest rollup — codec choice is not SQL-expressible,
    # so this is a rows-only check (driver records the weaker gate)
    def compression_by_codec(spark, sf_dir):
        blocks = encode_dataframe(_corpus(spark, sf_dir))
        return (
            blocks.groupBy("codec")
            .agg(
                F.count(F.lit(1)).alias("n_chunks"),
                F.sum("n_values").alias("n_values"),
                F.sum("bytes_raw").alias("bytes_raw"),
                F.sum("bytes_enc").alias("bytes_enc"),
                F.sum("bytes_ref").alias("bytes_ref"),
            )
            .orderBy("codec")
        )

    q["compression_by_codec"] = compression_by_codec
    return q


def oracle_sql() -> dict[str, str]:
    per_doc = C.per_doc_checksum_sql("documents", string_doc_id=True)
    by_regime = C.per_regime_checksum_sql("documents")
    o = {
        "corpus_per_doc_checksums": per_doc,
        "roundtrip_auto_per_doc": per_doc,
        "roundtrip_auto_by_regime": by_regime,
    }
    for codec in _CODECS:
        o[f"roundtrip_{codec}_by_regime"] = by_regime
    # compression_by_codec: intentionally no oracle (codec selection is the
    # engine's own physical decision; sizes are validated in tests instead)
    return o
