#!/usr/bin/env python3
"""DuckDB oracle for the sf1 streaming lanes (StreamLane, VERDICT r15 #7).

The gate oracles (stream16/stream20) encode the order-dependent greedy
admission chain as K-level nested CTEs — exact but quadratic in batch
count, so they stop at 4 batches. This replays the SAME greedy semantics
iteratively: admitted-key set as a DuckDB table, one pass per batch
(reject any doc sharing a key with the admitted set; admit survivors'
keys), comparing the per-batch (n_arrived, n_rejected) ledger row by row.
The band/fp relations come from the Spark dump (fingerprinting itself is
cross-engine-gated at the stream16/stream20/dd03/dd25 gates); what this
checks independently is the sequential admission discipline at volume.
The funnel lane re-runs stream19's batch SQL directly on sf1 events.
"""
import json, sys
import duckdb

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stream_lane_sf1"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/localdata/sf1"
n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 12
user_cap = int(sys.argv[4]) if len(sys.argv) > 4 else 2000

con = duckdb.connect()
con.sql("SET threads TO 32")
failures = 0

def replay(keys_parquet, key_cols, ledger_file, lane):
    global failures
    kc = ", ".join(key_cols)
    con.sql(f"CREATE OR REPLACE TABLE rel AS SELECT doc_id, {kc} FROM read_parquet('{keys_parquet}/*.parquet')")
    con.sql(f"CREATE OR REPLACE TABLE admitted AS SELECT {kc} FROM rel WHERE 1=0")
    ledger = json.load(open(ledger_file))
    assert len(ledger) == n_batches, (lane, len(ledger))
    on = " AND ".join(f"r.{c} = a.{c}" for c in key_cols)
    for row in ledger:
        b = row["batch"]
        # docs with zero keys still arrive; count from the documents table
        n_arrived_all = con.sql(
            f"SELECT COUNT(*) FROM read_parquet('{doc_glob}') WHERE doc_id % {n_batches} = {b}"
        ).fetchone()[0]
        rejected = con.sql(f"""
            SELECT DISTINCT r.doc_id FROM rel r JOIN admitted a ON {on}
            WHERE r.doc_id % {n_batches} = {b}""").df()
        n_rejected = len(rejected)
        not_admitted = " AND ".join(f"a2.{c} = r.{c}" for c in key_cols)
        con.sql(f"""
            INSERT INTO admitted
            SELECT DISTINCT {kc} FROM rel r
            WHERE r.doc_id % {n_batches} = {b}
              AND r.doc_id NOT IN (SELECT DISTINCT r2.doc_id FROM rel r2
                                   JOIN admitted a ON {" AND ".join(f"r2.{c} = a.{c}" for c in key_cols)}
                                   WHERE r2.doc_id % {n_batches} = {b})
              AND NOT EXISTS (SELECT 1 FROM admitted a2 WHERE {not_admitted})""")
        ok = (row["n_arrived"] == n_arrived_all and row["n_rejected"] == n_rejected)
        if not ok:
            failures += 1
            print(f"FAIL {lane} batch {b}: spark arrived={row['n_arrived']} rejected={row['n_rejected']} "
                  f"vs oracle arrived={n_arrived_all} rejected={n_rejected}")
    if failures == 0:
        print(f"PASS {lane}: {n_batches} batches, ledger matches the iterative DuckDB replay")

import os
p = f"{sf_dir}/documents.parquet"
doc_glob = f"{p}/*.parquet" if os.path.isdir(p) else p

replay(f"{out_dir}/bands.parquet", ["band", "key"], f"{out_dir}/lane16_ledger.json", "lane16")
replay(f"{out_dir}/fps.parquet", ["fp"], f"{out_dir}/lane20_ledger.json", "lane20")

# funnel: stream19's batch SQL at the lane's user cap
ep = f"{sf_dir}/events.parquet"
ev_glob = f"{ep}/*.parquet" if os.path.isdir(ep) else ep
want = con.sql(f"""
  WITH e AS (SELECT * FROM read_parquet('{ev_glob}') WHERE user_id <= {user_cap}),
  v AS (SELECT user_id, MIN(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
  c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
  p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
  SELECT 1 AS stage, COUNT(*) AS n_users,
         COALESCE(CAST(SUM(user_id) AS BIGINT), -1) AS user_sum FROM v
  UNION ALL SELECT 2, COUNT(*), COALESCE(CAST(SUM(user_id) AS BIGINT), -1) FROM c
  UNION ALL SELECT 3, COUNT(*), COALESCE(CAST(SUM(user_id) AS BIGINT), -1) FROM p
  ORDER BY stage""").fetchall()
got = [(r["stage"], r["n_users"], r["user_sum"])
       for r in json.load(open(f"{out_dir}/lane19_stages.json"))]
want = [tuple(r) for r in want]
if got == want:
    print(f"PASS lane19: funnel stages match the batch SQL at sf1 (user_cap={user_cap}): {got}")
else:
    failures += 1
    print(f"FAIL lane19: spark={got} oracle={want}")

sys.exit(1 if failures else 0)
