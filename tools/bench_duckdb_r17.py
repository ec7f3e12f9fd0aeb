#!/usr/bin/env python3
"""DuckDB side of the round-17 sf10m re-pair (same-sitting convention,
VERDICT r16 #1a): the five stale weak-set rows (q59/q60/q61/q67/q68/mm13
— last paired r15) plus the live weak heads, timed with the standard
3-rep-best after one warm run. Usage:
  bench_duckdb_r17.py [sf_dir] [oracle_json] [out_json] [q1,q2,...]
"""
import json, multiprocessing, os, sys, time
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/localdata/sf10m"
oracle_file = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/bench/oracle_sql.json"
out_file = sys.argv[3] if len(sys.argv) > 3 else None
heads = (sys.argv[4].split(",") if len(sys.argv) > 4 else
         ["q03_join_topn", "q05_join5_agg", "q08_window_running",
          "q25_events_hourly", "q59_bucketed_topn", "q60_bucketed_join5",
          "q61_runtime_bloom_join", "q67_map_surface",
          "q68_dual_bucketed_join5", "mm13_mp4_walk"])
oracle = json.load(open(oracle_file))

def run_one(sql, q):
    con = duckdb.connect()
    con.sql("SET threads TO 32")
    con.sql("SET memory_limit='90GB'")
    con.sql("SET temp_directory='/tmp/duckdb_bench_spill'")
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else f"'{p}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    con.sql(sql).fetchall()  # warm
    times = []
    for _ in range(3):
        t0 = time.time(); con.sql(sql).fetchall(); times.append(time.time()-t0)
    q.put(round(min(times), 4))

out = {}
for n in heads:
    q = multiprocessing.Queue()
    p = multiprocessing.Process(target=run_one, args=(oracle[n], q))
    t0 = time.time(); p.start(); p.join(timeout=600)
    if p.is_alive():
        p.terminate(); p.join()
        out[n] = f"timeout>600s (elapsed {time.time()-t0:.0f}s incl. warm)"
    else:
        out[n] = q.get()
line = json.dumps({"metric": "duckdb_r17", "queries": out, "sf": sf_dir})
print(line)
if out_file:
    open(out_file, "w").write(line + "\n")
