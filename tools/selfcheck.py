"""Local stand-in for the driver's correctness gate.

Runs entry(spark) as a smoke check, then each queries()[name] at sf0.01 and
compares against oracle_sql()[name] via DuckDB: row count, column names, and
an order-insensitive value hash (columns sorted by name, rows sorted).

Usage: python tools/selfcheck.py [sf_dir] [query_substr ...]

Optional ``query_substr`` arguments restrict the run to queries whose name
contains any of them (entry() smoke check is skipped then) — the per-query
drive the verify skill uses after touching a single operator.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df_pandas):
    import pandas as pd

    df = df_pandas.reindex(sorted(df_pandas.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def value_repr(df):
    rows = []
    for t in df.itertuples(index=False):
        rows.append(
            "|".join(
                "NULL" if v is None or (isinstance(v, float) and v != v)
                else (f"{v:.6f}" if isinstance(v, float) else str(v))
                for v in t
            )
        )
    return rows


def main(sf_dir: str = "/root/testdata/sf0.01", *name_filters: str) -> int:
    import duckdb

    import __spark_entry__ as E
    from mapbox_vector_tile_spark.engine.session import get_spark

    spark = get_spark(app_name="selfcheck", cpus=8, shuffle_partitions=8)

    if not name_filters:
        t0 = time.time()
        res = E.entry(spark)
        n = res.count()
        print(f"entry(): {n} rows, schema {res.columns} [{time.time()-t0:.1f}s]")
        assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    if name_filters:
        qs = {k: v for k, v in qs.items() if any(f in k for f in name_filters)}
        if not qs:
            print(f"no queries match {name_filters}")
            return 1
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        spark_s = time.time() - t0
        if name not in oracles:
            print(
                f"  {name}: {len(sdf)} rows (rows-only, no oracle) "
                f"[spark {spark_s:.1f}s]"
            )
            if len(sdf) == 0:
                failures.append((name, "0 rows"))
            continue
        t0 = time.time()
        odf = con.sql(oracles[name]).df()
        oracle_s = time.time() - t0
        s_n, o_n = normalize(sdf), normalize(odf)
        ok_count = len(s_n) == len(o_n)
        ok_cols = list(s_n.columns) == list(o_n.columns)
        ok_vals = ok_count and ok_cols and value_repr(s_n) == value_repr(o_n)
        status = "OK" if (ok_count and ok_cols and ok_vals) else "FAIL"
        print(
            f"  {name}: {status} rows={len(s_n)}/{len(o_n)} "
            f"cols={'=' if ok_cols else f'{list(s_n.columns)} vs {list(o_n.columns)}'} "
            f"values={'=' if ok_vals else 'DIFF'} "
            f"[spark {spark_s:.1f}s, oracle {oracle_s:.1f}s]"
        )
        if status == "FAIL":
            failures.append((name, "mismatch"))
            if ok_cols and ok_count:
                a, b = value_repr(s_n), value_repr(o_n)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diffs:
                    print(f"    spark:  {x}\n    oracle: {y}")
    print(f"{'PASS' if not failures else 'FAIL'}: {len(qs)-len(failures)}/{len(qs)}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
