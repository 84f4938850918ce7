"""Driver-style oracle comparator: runs each queries()[k] on Spark and
oracle_sql()[k] on DuckDB, compares row-count, schema-insensitive sorted
values (columns sorted by name), and a value hash. Mirrors the driver's
CORRECTNESS gate so oracle breakage is caught locally first.

Usage: python tools/check_oracles.py [sf_dir] [only_query_substr]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Columns sorted by name, rows sorted, values stringified at FULL
    precision (float64 via repr -> shortest round-trip). The driver hashes
    raw values — rounding here masked last-ulp divergences (VERDICT r01 #1),
    so this must NOT round."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else "<null>")
        else:
            try:
                df[c] = df[c].astype("float64").map(
                    lambda v: repr(float(v)) if v == v else "<nan>")
            except (TypeError, ValueError):
                df[c] = df[c].map(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else ""

    import __spark_entry__ as e
    from gitnexus_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, osql = e.queries(), e.oracle_sql()
    failures = []
    for k, fn in qs.items():
        if only and only not in k:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as ex:
            print(f"{k:28s} SPARK-ERROR {str(ex).splitlines()[0][:120]}")
            failures.append(k)
            continue
        if k not in osql:
            print(f"{k:28s} rows-only rows={len(sdf)} ({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(osql[k]).df()
        except Exception as ex:
            print(f"{k:28s} ORACLE-ERROR {str(ex).splitlines()[0][:160]}")
            failures.append(k)
            continue
        ok_rows = len(sdf) == len(ddf)
        ok_cols = sorted(sdf.columns) == sorted(ddf.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            cs, cd = canon(sdf), canon(ddf)
            ok_vals = cs.equals(cd)
            if not ok_vals:
                neq = (cs != cd).any(axis=1)
                print(f"  first diffs of {k}:")
                print(pd.concat([cs[neq].head(3).add_suffix("_spark"),
                                 cd[neq].head(3).add_suffix("_oracle")], axis=1))
        status = "OK" if (ok_rows and ok_cols and ok_vals) else \
            f"MISMATCH rows={len(sdf)}/{len(ddf)} cols_ok={ok_cols} vals_ok={ok_vals}"
        print(f"{k:28s} {status} ({time.time()-t0:.1f}s)")
        if status != "OK":
            failures.append(k)
    print("\nFAILURES:", failures if failures else "none")
    spark.stop()


if __name__ == "__main__":
    main()
