"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same sf dir, compare row count + column names + values (columns sorted
by name, rows sorted by all columns). Reports exact-binary and
tolerant-float verdicts separately so fp-rounding risk is visible.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> str:
    if len(sdf) != len(odf):
        return f"ROWS {len(sdf)} vs {len(odf)}"
    if sorted(sdf.columns) != sorted(odf.columns):
        return f"COLS {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    a, b = canon(sdf), canon(odf)
    exact = True
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            af = av.astype(float)
            bf = bv.astype(float)
            both_nan = np.isnan(af) & np.isnan(bf)
            if not np.array_equal(af[~both_nan], bf[~both_nan]):
                exact = False
                if not np.allclose(af[~both_nan], bf[~both_nan], rtol=1e-9, atol=1e-9):
                    bad = np.nonzero(af != bf)[0][:3]
                    return f"VALUES col={c} e.g. {av[bad]} vs {bv[bad]}"
        else:
            if not np.array_equal(av, bv):
                bad = np.nonzero(av != bv)[0][:3]
                return f"VALUES col={c} e.g. {av[bad]!r} vs {bv[bad]!r}"
    return "OK" if exact else "OK(~fp)"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from ccr_web_crawler_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    if os.environ.get("SPARK_GRAFT_CHECK_ALL") == "1":
        qs, oracles = entrymod.queries_all(), entrymod.oracle_sql_all()
    else:  # default: exactly what the external driver replays
        qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} SPARK-ERROR {type(e).__name__}: {str(e)[:160]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only   n={len(sdf)}  {time.time()-t0:5.1f}s")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} DUCK-ERROR {type(e).__name__}: {str(e)[:160]}")
            failures += 1
            continue
        verdict = compare(name, sdf, odf)
        print(f"{name:24s} {verdict:12s} n={len(sdf)}  {time.time()-t0:5.1f}s")
        if verdict.startswith(("ROWS", "COLS", "VALUES")):
            failures += 1

    print(f"\n{'FAIL' if failures else 'PASS'} ({failures} failures)")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
