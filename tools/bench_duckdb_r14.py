#!/usr/bin/env python3
"""DuckDB side of the round-14 sf10 pair (same-session convention: run
immediately after graft.R14Tune on an otherwise idle box). Queries match
R14Tune's set; q59/q60's oracles ARE q03/q05's, so the DuckDB numbers
for those rows double as the bucketed-variant comparison point."""
import json, sys, time
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/localdata/sf10"
oracle_file = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_full_r14/oracle_sql.json"
heads = ["q01_agg_pricing", "q03_join_topn", "q05_join5_agg",
         "tx01_tokens", "tx28_repetition_filter", "stream15_incremental_index"]
oracle = json.load(open(oracle_file))
con = duckdb.connect()
con.sql("SET threads TO 32")
con.sql("SET memory_limit='90GB'")
con.sql("SET temp_directory='/tmp/duckdb_bench_spill'")  # same envelope as bench_duckdb.py
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
out, total = {}, 0.0
for n in heads:
    con.sql(oracle[n]).fetchall()          # warm
    times = []
    for _ in range(3):
        t0 = time.time(); con.sql(oracle[n]).fetchall(); times.append(time.time()-t0)
    out[n] = round(min(times), 4); total += min(times)
print(json.dumps({"metric": "duckdb_r14_total", "value": round(total, 3),
                  "unit": "sec", "queries": out, "sf": sf_dir}))
