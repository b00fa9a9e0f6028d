#!/usr/bin/env python3
"""Local differential harness mimicking the driver's DuckDB-oracle compare:
run each oracle SQL in DuckDB against the sf tables, load the Spark result
parquet, canonicalize (columns sorted by name, rows sorted by all columns,
floats rounded), and compare."""
import sys, json, glob, math
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # The DRIVER's canonicalizer sorts the raw frame and dies on
            # list/array cells (unhashable ndarray). Fail loudly here so an
            # array-typed output column can never pass locally (qt27 r6).
            vals = df[c].dropna()
            if len(vals):
                v = vals.iloc[0]
                if isinstance(v, (list, tuple, dict)) or getattr(v, "ndim", 0) > 0:
                    raise TypeError(
                        f"column '{c}' is array-typed — the driver cannot sort it; "
                        "serialize to a scalar (concat_ws / array_to_string)")
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: spark output missing: {e}"); fails += 1; continue
    try:
        exp, got = canon(exp), canon(got)
    except TypeError as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(exp.columns)}"); fails += 1; continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} vs oracle {len(exp)}"); fails += 1; continue
    if not exp.equals(got):
        neq = (exp != got) & ~(exp.isna() & got.isna())
        bad = neq.any(axis=1)
        print(f"FAIL {name}: {bad.sum()} mismatched rows of {len(exp)}")
        print("  oracle:", exp[bad].head(3).to_dict("records"))
        print("  spark: ", got[bad].head(3).to_dict("records"))
        fails += 1; continue
    print(f"OK   {name}: {len(exp)} rows")
# queries without oracle
for p in sorted(glob.glob(f"{out_dir}/*/")):
    n = p.rstrip("/").split("/")[-1]
    if n not in oracle:
        cnt = con.sql(f"SELECT count(*) FROM '{p}*.parquet'").fetchone()[0]
        print(f"ROWS {n}: {cnt} rows (no oracle)")
print(f"\n{fails} failures / {len(oracle)} oracled queries")
sys.exit(1 if fails else 0)
