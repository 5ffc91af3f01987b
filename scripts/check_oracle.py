#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB oracle compare.

Usage: python3 scripts/check_oracle.py /tmp/vout /root/testdata/sf0.01
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(outdir, sfdir):
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        t = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_green = n_red = n_no = 0
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")])
        if name not in oracle:
            print(f"{name:24s} NO_ORACLE rows={len(spark_df)}")
            n_no += 1
            continue
        try:
            ora_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name:24s} ORACLE_ERR {e}")
            n_red += 1
            continue
        a, b = canon(spark_df), canon(ora_df)
        cols_ok = list(a.columns) == list(b.columns)
        rows_ok = len(a) == len(b)
        if cols_ok and rows_ok:
            try:
                eq = a.equals(b.astype(a.dtypes.to_dict()))
            except Exception:
                eq = False
            if not eq:
                # dtype-insensitive EXACT compare (rtol=atol=0): only papers
                # over int32-vs-int64 style dtype gaps, not value differences
                diffs = []
                for c in a.columns:
                    if not a[c].equals(b[c]):
                        try:
                            import numpy as np
                            if np.allclose(a[c].astype(float), b[c].astype(float), rtol=0, atol=0):
                                continue
                        except Exception:
                            pass
                        diffs.append(c)
                if not diffs:
                    eq = True
            status = "GREEN" if eq else "RED(values)"
        elif not cols_ok:
            status = f"RED(schema {list(a.columns)} vs {list(b.columns)})"
        else:
            status = f"RED(rows {len(a)} vs {len(b)})"
        if status == "GREEN":
            n_green += 1
        else:
            n_red += 1
        print(f"{name:24s} {status}")
        if status.startswith("RED(values"):
            merged = a.compare(b.astype(a.dtypes.to_dict()), result_names=("spark", "oracle"))
            print(merged.head(10))
    print(f"\nGREEN={n_green} RED={n_red} NO_ORACLE={n_no}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
