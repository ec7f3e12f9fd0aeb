#!/usr/bin/env python3
"""DuckDB side of the round-15 sf10m pair (same-session convention: run
immediately after graft.R15Tune on an otherwise idle box). q59/q60/q68's
oracles ARE q03/q05's, so those DuckDB numbers double as the comparison
point for every layout variant; q61's oracle is its natural join."""
import json, os, sys, time
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/localdata/sf10m"
oracle_file = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_full_r15/oracle_sql.json"
heads = ["q01_agg_pricing", "q03_join_topn", "q05_join5_agg",
         "q61_runtime_bloom_join"]
oracle = json.load(open(oracle_file))
con = duckdb.connect()
con.sql("SET threads TO 32")
con.sql("SET memory_limit='90GB'")
con.sql("SET temp_directory='/tmp/duckdb_bench_spill'")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    # multi-file twin layout (tools/split_corpus.py): table is a DIRECTORY
    src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else f"'{p}'"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
out, total = {}, 0.0
for n in heads:
    con.sql(oracle[n]).fetchall()          # warm
    times = []
    for _ in range(3):
        t0 = time.time(); con.sql(oracle[n]).fetchall(); times.append(time.time()-t0)
    out[n] = round(min(times), 4); total += min(times)
print(json.dumps({"metric": "duckdb_r15_total", "value": round(total, 3),
                  "unit": "sec", "queries": out, "sf": sf_dir}))
