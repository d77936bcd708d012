"""Scaling-efficiency evidence (north rule: >=0.8 from N to 4N executors).

Runs bench.py twice — local[8] and local[32] — on the SAME corpus with the
SAME partitioning (128 buckets), in separate JVMs, and reports throughput at
both plus efficiency = tput(32) / (4 x tput(8)). Writes BENCH/scaling.json
and updates BENCH/BASELINE.md.

Usage: python bench_scaling.py [sf_dir] [mult]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_bench(cpus: int, sf_dir: str, mult: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_MULT=str(mult),
        SPARK_GRAFT_BENCH_BUCKETS="128",
        SPARK_DRIVER_MEMORY="12g",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        env=env,
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"bench failed (cpus={cpus}):\n{out.stderr[-3000:]}")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    lo, hi = 8, 32

    # discarded machine-warm pass: this VM backs guest RAM lazily, and the
    # first run to touch fresh pages pays a ~100 MB/s first-touch tax
    run_bench(hi, sf_dir, mult)
    r_lo = run_bench(lo, sf_dir, mult)
    r_hi = run_bench(hi, sf_dir, mult)

    def eff(key: str) -> float:
        return round(r_hi[key] / ((hi / lo) * r_lo[key]), 3)

    result = {
        "sf_dir": sf_dir,
        "n_docs": r_hi["n_docs"],
        "total_tokens": r_hi["total_tokens"],
        "cores_low": lo,
        "cores_high": hi,
        "encode_tokens_per_sec_low": r_lo["encode_tokens_per_sec"],
        "encode_tokens_per_sec_high": r_hi["encode_tokens_per_sec"],
        "decode_tokens_per_sec_low": r_lo["decode_tokens_per_sec"],
        "decode_tokens_per_sec_high": r_hi["decode_tokens_per_sec"],
        "scaling_efficiency_encode": eff("encode_tokens_per_sec"),
        "scaling_efficiency_decode": eff("decode_tokens_per_sec"),
        "queries_low": r_lo["queries"],
        "queries_high": r_hi["queries"],
        "compression_ratio_vs_raw": r_hi["compression_ratio_vs_raw"],
        "bytes_vs_reference_scheme": r_hi["bytes_vs_reference_scheme"],
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
