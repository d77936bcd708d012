"""Table-store microbench: whole-table encode/decode wall + per-phase
throughput over the events table at a given SF dir, plus the pushdown
scans' walls. One JSON line, same contract style as bench.py (this is a
SIDE bench — the driver's headline bench.py is unchanged).

Usage: python tools/bench_table.py [sf_dir] [cpus] [replicate]

``replicate`` (default 1) fans each event out k times with re-keyed
ids — sf0.1 events is only 100k rows, where per-job overhead swamps the
encode wall; k=20 gives a 2M-row / 12M-cell signal-bearing measure.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main(
    sf_dir: str = "/root/testdata/sf0.1", cpus: int = 8, replicate: int = 1
) -> int:
    from pyspark.sql import functions as F

    from mapbox_vector_tile_spark.engine.session import get_spark
    from mapbox_vector_tile_spark.engine.table_encode import (
        decode_table,
        encode_table,
        scan_table_range,
        table_group_count,
        table_stats,
    )

    spark = get_spark(app_name="bench_table", cpus=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    if replicate > 1:
        rep = spark.range(replicate).select(F.col("id").alias("__rep"))
        ev = ev.crossJoin(rep).select(
            (F.col("event_id") * replicate + F.col("__rep")).alias("event_id"),
            "ts_us", "user_id", "event_type", "value", "props",
        )
        ev = ev.repartition(cpus).cache()
    n_rows = ev.count()
    n_cols = len(ev.columns)

    t0 = time.time()
    blocks = encode_table(ev, "event_id", 4096)
    blocks.cache()
    enc_rows = blocks.count()
    t_encode = time.time() - t0

    raw_b = blocks.agg(F.sum(F.aggregate(
        "bytes_raw", F.lit(0).cast("long"), lambda a, x: a + x))).first()[0]
    enc_b = blocks.agg(F.sum(F.aggregate(
        "bytes_enc", F.lit(0).cast("long"), lambda a, x: a + x))).first()[0]

    t0 = time.time()
    n_dec = decode_table(blocks, ev.schema).count()
    t_decode = time.time() - t0
    assert n_dec == n_rows

    t0 = time.time()
    lo, hi = 1704240000000000, 1704844800000000
    n_range = scan_table_range(
        blocks, ev.schema, "ts_us", lo, hi, ["ts_us", "event_type"]
    ).count()
    t_range = time.time() - t0

    t0 = time.time()
    n_groups = table_group_count(blocks, ev.schema, "event_type").count()
    t_group = time.time() - t0

    t0 = time.time()
    stats_rows = table_stats(blocks, ev.schema).count()
    t_stats = time.time() - t0

    print(json.dumps({
        "metric": "table-store encode+decode+scan walls (events)",
        "value": round(t_encode + t_decode, 3),
        "unit": "sec",
        "sf_dir": sf_dir,
        "cpus": cpus,
        "n_rows": n_rows,
        "n_cols": n_cols,
        "n_chunks": enc_rows,
        "bytes_raw": int(raw_b),
        "bytes_enc": int(enc_b),
        "compression_vs_raw": round(raw_b / enc_b, 3),
        "queries": {
            "t_encode": round(t_encode, 3),
            "t_decode": round(t_decode, 3),
            "t_range_scan": round(t_range, 3),
            "t_group_count": round(t_group, 3),
            "t_stats": round(t_stats, 3),
        },
        "cells_per_sec_encode": int(n_rows * n_cols / t_encode),
        "cells_per_sec_decode": int(n_rows * n_cols / t_decode),
        "range_rows": n_range,
        "groups": n_groups,
        "stats_rows": stats_rows,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rep = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    raise SystemExit(main(sf, cpus, rep))
