"""SparkSession builder with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# glibc malloc tuning for the numpy codec kernels: every chunk allocates
# multi-MB temp arrays; with default malloc they are mmap'd and munmapped per
# chunk, so every pass re-faults its pages (measured ~30 MB/s fault throughput
# on this VM — a 25x penalty at full parallelism). Keeping large blocks on the
# reusable heap makes kernel throughput scale linearly with cores.
MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": "268435456",
    "MALLOC_TRIM_THRESHOLD_": "268435456",
    "ARROW_DEFAULT_MEMORY_POOL": "system",
}


def get_spark(
    app_name: str = "mvt-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 4096,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or ``*``.
    Defaults chosen for the codec workload: AQE on, Arrow transfer on, bounded
    Arrow batch size so encode kernels stay O(batch) in memory (the analog of
    the reference's blockwise batching, /root/reference/mapbox_vector_tile/
    polygon.py:48-67).
    """
    for k, v in MALLOC_ENV.items():
        os.environ.setdefault(k, v)
    if cpus is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cpus = int(env) if env else None
    master = f"local[{cpus}]" if cpus else "local[*]"
    n_shuffle = shuffle_partitions or (cpus or os.cpu_count() or 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in MALLOC_ENV.items():
        builder = builder.config(f"spark.executorEnv.{k}", v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
