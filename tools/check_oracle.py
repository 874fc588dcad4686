#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and hash-compare with the Verify dump.
Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

from decimal import Decimal

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            sample = s.dropna()
            if len(sample) and isinstance(sample.iloc[0], Decimal):
                out[c] = s.map(lambda v: None if v is None else round(float(v), 6)).astype("float64")
            else:
                out[c] = s.map(lambda v: None if v is None else str(v))
        elif str(s.dtype).startswith("datetime"):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            out[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype.kind == "f":
            out[c] = s.round(6)
        elif s.dtype.kind in "iu":
            out[c] = s.astype("int64")
        else:
            out[c] = s
    return pd.DataFrame(out)

def align(a: pd.DataFrame, b: pd.DataFrame):
    # coerce numeric columns to a common dtype across the two engines
    for c in a.columns:
        if c in b.columns:
            ka, kb = a[c].dtype.kind, b[c].dtype.kind
            if {ka, kb} <= {"f", "i", "u"} and ka != kb:
                a[c] = a[c].astype("float64").round(6)
                b[c] = b[c].astype("float64").round(6)
    a = a.sort_values(by=list(a.columns), kind="mergesort").reset_index(drop=True)
    b = b.sort_values(by=list(b.columns), kind="mergesort").reset_index(drop=True)
    return a, b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        pdir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            print(f"MISSING  {name} (no spark output)")
            n_fail += 1
            continue
        try:
            spark_df = pq.ParquetDataset(pdir).read().to_pandas()
            duck_df = con.execute(sql).fetchdf()
            a, b = canon(spark_df), canon(duck_df)
            if list(a.columns) == list(b.columns):
                a, b = align(a, b)
            if list(a.columns) != list(b.columns):
                print(f"FAIL     {name}: columns {list(a.columns)} vs {list(b.columns)}")
                n_fail += 1
            elif len(a) != len(b):
                print(f"FAIL     {name}: rows {len(a)} vs {len(b)}")
                n_fail += 1
            elif not a.equals(b):
                diff = (a != b) & ~(a.isna() & b.isna())
                bad = diff.any(axis=1)
                print(f"FAIL     {name}: {int(bad.sum())} differing rows; first:")
                idx = bad[bad].index[:3]
                for i in idx:
                    print(f"  spark: {a.loc[i].to_dict()}")
                    print(f"  duck:  {b.loc[i].to_dict()}")
                n_fail += 1
            else:
                print(f"PASS     {name} ({len(a)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR    {name}: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
