#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir, loads the Spark parquet result and
re-runs the oracle SQL (oracle_sql.json) in DuckDB with each testdata table
registered as a view. Compares after sorting columns by name and rows by
value — approximately what the driver's hash-compare does.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize list/array cells for comparison
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                                str(type(v)).find('ndarray') >= 0 else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        spark_df = pd.concat([pd.read_parquet(f)
                              for f in glob.glob(f"{qdir}/*.parquet")], ignore_index=True)
        if name not in oracles:
            print(f"SKIP  {name} (rows-only: {len(spark_df)} rows)")
            n_skip += 1
            continue
        duck_df = con.execute(oracles[name]).df()
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"PASS  {name} ({len(a)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL  {name}: {str(e).splitlines()[-1] if str(e) else 'diff'}")
            diff_mask = (a != b) & ~(a.isna() & b.isna())
            bad = diff_mask.any(axis=1)
            print(a[bad].head(3)); print(b[bad].head(3))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
