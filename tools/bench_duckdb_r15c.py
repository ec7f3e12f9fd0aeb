#!/usr/bin/env python3
"""DuckDB side of the round-15 new-operator sf10 pair (same-sitting
convention). Per-query 600 s budget via a worker process, mirroring
tools/sweep.py — tx31's oracle re-inlines the distinct-word relation
~50x and may blow past useful time at sf10."""
import json, multiprocessing, os, sys, time
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/localdata/sf10m"
oracle_file = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_full_r15/oracle_sql.json"
heads = ["q67_map_surface", "mm13_mp4_walk", "dd25_substring_spans",
         "tx31_bpe_train3"]
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
print(json.dumps({"metric": "duckdb_r15c", "queries": out, "sf": sf_dir}))
