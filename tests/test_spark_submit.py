"""End-to-end spark-submit --py-files deployment test (north-rule form):
interrupted run + resumed run via separate spark-submit invocations equals an
uninterrupted encode, verified by decoding the output."""

import json
import os
import shutil
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_encode_resume(spark, tmp_path):
    from pyspark.sql import functions as F

    from mapbox_vector_tile_spark.engine import generator as G
    from mapbox_vector_tile_spark.engine.decode import decode_dataframe
    from mapbox_vector_tile_spark.engine.verify import verify_roundtrip

    n = 300
    tokens_pq = str(tmp_path / "tokens")
    G.corpus_dataframe(spark, n, num_partitions=2).write.parquet(tokens_pq)

    zip_path = subprocess.run(
        ["python", os.path.join(ROOT, "tools", "build_pyfiles.py")],
        capture_output=True, text=True, cwd=ROOT, check=True,
    ).stdout.strip()
    assert zip_path.endswith(".zip") and os.path.exists(zip_path)

    out = str(tmp_path / "blocks")
    ckpt = str(tmp_path / "ckpt")

    def submit(extra):
        cmd = [
            SPARK_SUBMIT, "--master", "local[4]",
            "--py-files", zip_path,
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            os.path.join(ROOT, "jobs", "encode_job.py"),
            "--input", tokens_pq, "--output", out, "--checkpoint", ckpt,
            "--num-buckets", "6",
        ] + extra
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    s1 = submit(["--fail-after", "2"])  # simulated crash after 2 buckets
    assert s1["buckets_processed"] == 2
    s2 = submit([])  # resume
    assert s2["buckets_processed"] == s2["buckets_total"] - 2

    blocks = spark.read.parquet(out)
    res = verify_roundtrip(
        spark.read.parquet(tokens_pq), decode_dataframe(blocks)
    ).first()
    assert (res.n_docs, res.n_match, res.n_mismatch) == (n, n, 0)
    assert blocks.agg(F.sum("bytes_enc")).first()[0] > 0
