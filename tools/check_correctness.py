#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() on the same sf dir, compare rows/schema/values."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

import __spark_entry__ as entry
from invertedfiles_jl_spark.session import get_spark

spark = get_spark("correctness-check", master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"):
    fp = f"{SF}/{t}.parquet"
    if os.path.exists(fp):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{fp}'")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

qs, os_ = entry.queries(), entry.oracle_sql()
results = {}
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    try:
        sdf = canon(fn(spark, SF).toPandas())
        odf = canon(con.sql(os_[name]).df())
        rows = len(sdf) == len(odf)
        schema = list(sdf.columns) == list(odf.columns)
        match = rows and schema
        detail = ""
        if match:
            for c in sdf.columns:
                a, b = sdf[c].to_numpy(), odf[c].to_numpy()
                if np.issubdtype(sdf[c].dtype, np.floating) or np.issubdtype(odf[c].dtype, np.floating):
                    af, bf = a.astype(float), b.astype(float)
                    # byte-level compare like the driver's value-hash: catches
                    # -0.0 vs +0.0 (equal under ==) and NaN-pattern diffs
                    ok = af.tobytes() == bf.tobytes()
                    if not ok:
                        exact = af == bf
                        nz = int((np.signbit(af) != np.signbit(bf)).sum())
                        detail = (f"col {c}: {int((~exact).sum())} value diffs, "
                                  f"max {np.abs(af - bf).max():.2e}, "
                                  f"{nz} sign-bit (±0.0) diffs")
                        match = False
                        break
                else:
                    if not (a.astype(str) == b.astype(str)).all():
                        detail = f"col {c} value mismatch"
                        match = False
                        break
        else:
            detail = f"rows {len(sdf)} vs {len(odf)}; cols {list(sdf.columns)} vs {list(odf.columns)}"
        results[name] = {"ok": bool(match), "rows": len(sdf), "detail": detail}
        print(("PASS " if match else "FAIL ") + name, detail)
    except Exception as ex:
        results[name] = {"ok": False, "err": str(ex)[:300]}
        print("ERR  " + name, str(ex)[:200].replace("\n", " "))

bad = [k for k, v in results.items() if not v["ok"]]
print(json.dumps({"pass": len(results) - len(bad), "fail": bad}))
