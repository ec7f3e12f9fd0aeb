#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same sf dir, load the Spark-dumped parquet, sort columns by
name + rows by all columns, and compare values exactly."""
import json, sys, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

# Verify writes a verify_errors.json manifest + <name>._FAILED markers for
# thrown queries (round 11): surface those as explicit err rows instead of
# the generic "no spark output". The markers are merged in even when the
# manifest is missing or corrupt — a swallowed manifest must not turn a run
# with thrown queries into a green report (ADVICE r11).
import os
try:
    verify_errors = json.load(open(f"{out_dir}/verify_errors.json"))
except Exception:
    verify_errors = {}
    if glob.glob(f"{out_dir}/*._FAILED"):
        print(f"WARNING: {out_dir}/verify_errors.json missing/corrupt but "
              f"*._FAILED markers exist — merging markers", file=sys.stderr)
for m in glob.glob(f"{out_dir}/*._FAILED"):
    name = os.path.basename(m)[: -len("._FAILED")]
    if name not in verify_errors:
        try:
            verify_errors[name] = open(m).read().strip()
        except Exception:
            verify_errors[name] = "(unreadable _FAILED marker)"

fails, passes = [], []
for name, sql in sorted(oracle.items()):
    try:
        if name in verify_errors:
            fails.append((name, f"VERIFY ERR {verify_errors[name]}")); continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            fails.append((name, "no spark output")); continue
        spark_df = norm(pd.concat([pd.read_parquet(f) for f in files]))
        duck_df = norm(con.sql(sql).df())
        if list(spark_df.columns) != list(duck_df.columns):
            fails.append((name, f"columns {list(spark_df.columns)} vs {list(duck_df.columns)}")); continue
        if len(spark_df) != len(duck_df):
            fails.append((name, f"rows {len(spark_df)} vs {len(duck_df)}")); continue
        diff_cols = []
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                idx = (~eq).idxmax()
                diff_cols.append(f"{c}[row{idx}]: spark={a[idx]!r} duck={b[idx]!r}")
        if diff_cols:
            fails.append((name, "; ".join(diff_cols[:3])))
        else:
            passes.append((name, len(spark_df)))
    except Exception as e:
        fails.append((name, f"EXC {type(e).__name__}: {e}"))

for n, r in passes: print(f"PASS {n} ({r} rows)")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} passed, {len(fails)} failed of {len(oracle)}")
