#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Reads `<verifyOutDir>/<name>/` parquet (written by `sbt "runMain
graft.Verify <sfDir> <verifyOutDir>"`) and compares against DuckDB running
`oracle_sql.json` over the source tables. Mirrors the driver: columns
sorted by name, row order ignored (we sort rows by all columns), values
hashed after normalization.
"""
import sys, json, glob, os
import duckdb, pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
        if "datetime" in str(df[c].dtype):
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith(("int", "uint")) or str(df[c].dtype) == "Int64":
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        got = load_spark(outdir, name)
        if got is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}"); n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        if not g.equals(w):
            diff = (g != w) & ~(g.isna() & w.isna())
            bad = diff.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(g)} rows differ; first:")
            idx = bad.idxmax()
            print("  spark:", g.loc[idx].to_dict())
            print("  duck :", w.loc[idx].to_dict())
            # dtype detail
            for c in g.columns:
                if g[c].dtype != w[c].dtype:
                    print(f"  dtype {c}: {g[c].dtype} vs {w[c].dtype}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
