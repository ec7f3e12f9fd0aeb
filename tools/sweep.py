#!/usr/bin/env python3
"""Full-inventory robustness sweep at a large scale factor (VERDICT r11 #7).

Same compare semantics as compare_oracle.py (sort columns by name, rows by
all columns, exact value compare), plus a per-oracle wall-clock budget so
one pathological DuckDB-side query (the recursive-CTE graph oracles are
O(V*E) at scale) cannot hang the whole sweep: queries whose ORACLE exceeds
the budget are recorded as `oracle_timeout` exclusions with the elapsed
time, mirroring the r11 sweep's documented graph04/graph05 exclusions.

Usage: sweep.py <sf_dir> <verify_out_dir> <report.json> [budget_sec]
"""
import json, multiprocessing, sys, time
from queue import Empty
import duckdb
import pandas as pd

sf_dir, out_dir, report_path = sys.argv[1], sys.argv[2], sys.argv[3]
budget = float(sys.argv[4]) if len(sys.argv) > 4 else 300.0

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def run_oracle(name, sql, q):
    import os
    con = duckdb.connect()
    con.sql("SET threads TO 16")
    con.sql(f"SET memory_limit='{os.environ.get('SWEEP_DUCKDB_MEM', '60GB')}'")
    # per-query spill subdir: the parent sweeps the tree between queries
    # (a budget-killed child can't clean up after itself). DuckDB creates
    # only the leaf, not missing ancestors — make the subdir here.
    os.makedirs(f"/tmp/duckdb_sweep_spill/{name}", exist_ok=True)
    con.sql(f"SET temp_directory='/tmp/duckdb_sweep_spill/{name}'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        # multi-file twin layout (tools/split_corpus.py): table is a DIRECTORY
        src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else f"'{p}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    try:
        q.put(("ok", con.sql(sql).df()))
    except Exception as e:
        q.put(("err", str(e)[:500]))


import shutil

# SWEEP_EXCLUDE=name:reason,name:reason — NAMED exclusions recorded in the
# report (r18, VERDICT r17 #3): some oracles must not even START at large
# sf (graph06's recursive-CTE re-inlining spilled >77 GB at sf10 before
# any budget kill could fire — disk exhaustion, not timeout). A named
# exclusion is honest where a timeout kill is roulette with the disk.
named_excl = {}
import os as _os
for tok in filter(None, _os.environ.get("SWEEP_EXCLUDE", "").split(",")):
    n_, _, why = tok.partition(":")
    named_excl[n_] = why or "excluded by operator"

report, n_pass, n_fail, n_skip = {}, 0, 0, 0
for name in sorted(oracle):
    if name in named_excl:
        report[name] = {"status": "named_exclusion", "reason": named_excl[name]}
        n_skip += 1
        print(f"SKIP {name}: named exclusion — {named_excl[name]}", flush=True)
        continue
    # oracle children run serially: sweep the previous child's spill dir
    # here (and once after the loop) so a budget-killed child — which
    # cannot clean up after itself — never accumulates stale temp files
    shutil.rmtree("/tmp/duckdb_sweep_spill", ignore_errors=True)
    sql = oracle[name]
    try:
        spark_df = pd.read_parquet(f"{out_dir}/{name}")
    except Exception as e:
        report[name] = {"status": "no_spark_output", "detail": str(e)[:200]}
        n_fail += 1
        continue
    q = multiprocessing.Queue()
    p = multiprocessing.Process(target=run_oracle, args=(name, sql, q))
    t0 = time.time()
    p.start()
    # Drain the queue BEFORE joining: a child putting a result larger than
    # the pipe buffer blocks inside q.put() until the parent reads, so a
    # join-first harness records every big-result oracle as a false
    # timeout (dd01 at sf1: 475k rows, oracle runs in 0.6s). Poll in short
    # slices rather than one long q.get: a child that dies WITHOUT putting
    # a result (OOM-killed — the graph06 failure mode) must be reported as
    # oracle_error with its exit code, not misfiled as a 600 s timeout
    # (ADVICE r12).
    kind = None
    while True:
        try:
            kind, payload = q.get(timeout=2.0)
            break
        except Empty:
            pass
        if not p.is_alive():
            # the feeder thread can still be flushing the pipe at exit:
            # one generous final get before declaring dead-without-result
            try:
                kind, payload = q.get(timeout=5.0)
            except Empty:
                pass
            break
        if time.time() - t0 > budget:
            break
    elapsed = round(time.time() - t0, 1)
    if kind is None:
        if not p.is_alive():
            report[name] = {"status": "oracle_error", "elapsed_sec": elapsed,
                            "detail": f"oracle child died without a result "
                                      f"(exitcode {p.exitcode}, likely OOM-killed)"}
            n_skip += 1
            print(f"SKIP {name}: oracle child died (exit {p.exitcode})", flush=True)
            continue
        # terminate is SIGTERM, which CPython only honors between bytecodes
        # — a child deep in a native DuckDB call never sees it; escalate
        p.terminate(); p.join(10)
        if p.is_alive():
            p.kill(); p.join()
        report[name] = {"status": "oracle_timeout", "budget_sec": budget,
                        "note": "DuckDB oracle exceeded the budget; Spark side dumped fine"}
        n_skip += 1
        print(f"SKIP {name}: oracle timeout after {elapsed}s", flush=True)
        continue
    p.join()
    if kind == "err":
        report[name] = {"status": "oracle_error", "detail": payload}
        n_skip += 1
        print(f"SKIP {name}: oracle error {payload[:120]}", flush=True)
        continue
    a, b = norm(spark_df), norm(payload)
    if list(a.columns) != list(b.columns):
        report[name] = {"status": "schema_mismatch",
                        "spark_cols": list(a.columns), "oracle_cols": list(b.columns)}
        n_fail += 1
        print(f"FAIL {name}: schema", flush=True)
    elif len(a) != len(b) or not a.astype(str).equals(b.astype(str)):
        report[name] = {"status": "value_mismatch",
                        "spark_rows": len(a), "oracle_rows": len(b)}
        n_fail += 1
        print(f"FAIL {name}: values ({len(a)} vs {len(b)} rows)", flush=True)
    else:
        report[name] = {"status": "pass", "rows": len(a), "oracle_sec": elapsed}
        n_pass += 1
        print(f"PASS {name} ({len(a)} rows, oracle {elapsed}s)", flush=True)

shutil.rmtree("/tmp/duckdb_sweep_spill", ignore_errors=True)
summary = {"sf_dir": sf_dir, "budget_sec": budget, "pass": n_pass,
           "fail": n_fail, "oracle_excluded": n_skip,
           "total": len(oracle), "queries": report}
json.dump(summary, open(report_path, "w"), indent=1)
print(f"\n{n_pass} passed, {n_fail} failed, {n_skip} oracle-excluded of {len(oracle)}")
sys.exit(1 if n_fail else 0)
