"""Decompose fused-encode scaling loss into its parts.

Runs ``exchange_encode_fused_direct`` on a (cached) bench corpus at several
core counts and, using the per-task wall spans the sink now reports,
separates for each level:

- ``wall``      — what the scaling gate measures (tokens / wall);
- ``busy``      — sum of task spans / cores: pure worker time per core;
- ``head``      — first task start minus job start (driver planning,
                  createDataFrame, scheduling);
- ``tail``      — job end minus last task end (collect + manifest write);
- ``straggle``  — wall - head - tail - (busy_max_core): imbalance between
                  the slowest core's work and the mean.

If ``busy``-based efficiency is near 1.0 while wall-based efficiency is
not, the gap is scheduling/serial overhead, not the engine's kernels; if
``busy`` itself degrades with cores, the engine (or the host's memory
system) is the limit. Usage:

    python tools/encode_scaling_probe.py [tokens_pq] [mult] [cores ...]

Defaults: cached sf0.1 corpus at mult=100 (~274 M tokens), cores 1 4.
Writes nothing outside /tmp; prints one JSON line per level.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/mvt_bench_cache"


def ensure_corpus(mult: int, sf_dir: str) -> str:
    import pyarrow.parquet as pq

    from mapbox_vector_tile_spark.engine import generator as G
    from mapbox_vector_tile_spark.engine.session import get_spark

    n_base = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    n_docs = n_base * mult
    tokens_pq = f"{CACHE}/tokens_{n_docs}"
    if not os.path.exists(f"{tokens_pq}/_SUCCESS"):
        spark = get_spark(app_name="probe-gen", cpus=8, shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
        G.write_corpus_parquet_direct(
            spark, n_docs, tokens_pq, num_partitions=32
        )
        spark.stop()
    return tokens_pq


def run_level(tokens_pq: str, cpus: int, reps: int = 2) -> dict:
    from mapbox_vector_tile_spark.engine.encode import EncodeOptions
    from mapbox_vector_tile_spark.engine.exchange import (
        exchange_encode_fused_direct,
        plan_weighted_cuts,
        regime_doc_key,
    )
    from mapbox_vector_tile_spark.engine.session import get_spark
    from mapbox_vector_tile_spark.sources.parquet_direct import (
        list_parquet_files,
    )

    spark = get_spark(
        app_name=f"probe-{cpus}",
        cpus=cpus,
        shuffle_partitions=max(cpus, 32),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "1m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = "/tmp/mvt_probe_blocks"
    cuts = plan_weighted_cuts(
        spark, list_parquet_files(tokens_pq), 128, key_fn=regime_doc_key
    )
    best = None
    for _ in range(reps):
        t0 = time.time()
        s = exchange_encode_fused_direct(
            spark, tokens_pq, out, 128, EncodeOptions(),
            key_fn=regime_doc_key, n_tasks=2 * cpus, cuts=cuts,
        )
        t1 = time.time()
        spans = s["task_spans"]
        wall = t1 - t0
        busy = sum(e - b for b, e in spans)
        head = min(b for b, _ in spans) - t0
        tail = t1 - max(e for _, e in spans)
        r = {
            "cpus": cpus,
            "wall": round(wall, 3),
            "busy_per_core": round(busy / cpus, 3),
            "head": round(head, 3),
            "tail": round(tail, 3),
            "n_tasks": len(spans),
            "task_busy": [round(e - b, 3) for b, e in spans],
            "tokens": s["n_values"],
            "tps_wall": int(s["n_values"] / wall),
            "tps_busy": int(s["n_values"] * cpus / busy) if busy else 0,
        }
        if best is None or r["wall"] < best["wall"]:
            best = r
    spark.stop()
    shutil.rmtree(out, ignore_errors=True)
    return best


def main() -> int:
    tokens_pq = sys.argv[1] if len(sys.argv) > 1 else ""
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    cores = [int(c) for c in sys.argv[3:]] or [1, 4]
    if not tokens_pq:
        tokens_pq = ensure_corpus(mult, "/root/testdata/sf0.1")
    results = [run_level(tokens_pq, c) for c in cores]
    for r in results:
        print(json.dumps(r))
    if len(results) >= 2:
        lo, hi = results[0], results[-1]
        ratio = hi["cpus"] / lo["cpus"]
        print(
            json.dumps(
                {
                    "eff_wall": round(
                        hi["tps_wall"] / (ratio * lo["tps_wall"]), 3
                    ),
                    "eff_busy": round(
                        hi["tps_busy"] / lo["tps_busy"], 3
                    ),
                }
            )
        )
    return 0


if __name__ == "__main__":
    main()
