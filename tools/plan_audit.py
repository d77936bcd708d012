"""Reproducible plan audits: print the executed physical plan of any
gated query, plus the pushdown/codegen evidence PLANS.md cites.

Usage::

    python tools/plan_audit.py <query_name> [sf_dir]
    python tools/plan_audit.py --list

For the named ``queries()`` entry this prints:

- the formatted executed plan (after one action, so AQE's FINAL plan);
- a one-line evidence summary: number of FileScans, Exchanges,
  WholeStageCodegen spans, whether PushedFilters is non-empty anywhere,
  and whether any Python eval node (BatchEvalPython / ArrowEvalPython)
  appears — the five facts every plan claim in PLANS.md reduces to.

The point is that a reviewer can re-derive any "zero exchange" /
"pushed to the scan" / "no Python in the hot path" statement with one
command instead of trusting prose.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")


def evidence(plan: str) -> dict:
    final = plan.split("== Initial Plan ==")[0]
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", final)
    return {
        "file_scans": final.count("FileScan"),
        "exchanges": final.count("Exchange"),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", final))),
        "pushed_filters_nonempty": any(p.strip() for p in pushed),
        "python_eval_nodes": sum(
            final.count(n) for n in ("BatchEvalPython", "ArrowEvalPython")
        ),
        "window_group_limit": final.count("WindowGroupLimit"),
    }


def main() -> int:
    import __spark_entry__ as E

    qs = E.queries()
    if len(sys.argv) < 2 or sys.argv[1] == "--list":
        print("\n".join(sorted(qs)))
        return 0
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    if name not in qs:
        print(f"unknown query {name!r}; --list shows all", file=sys.stderr)
        return 2
    from mapbox_vector_tile_spark.engine.session import get_spark

    spark = get_spark(app_name="plan-audit", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    df = qs[name](spark, sf_dir)
    n = df.count()  # one action so AQE finalizes
    plan = df._jdf.queryExecution().executedPlan().toString()
    print(plan)
    ev = evidence(plan)
    print(f"--- evidence for {name} (rows={n}) ---")
    for k, v in ev.items():
        print(f"{k}: {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
