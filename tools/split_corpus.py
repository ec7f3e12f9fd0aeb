#!/usr/bin/env python3
"""Build a multi-file twin of an sf corpus: each big table is rewritten as a
DIRECTORY named <table>.parquet containing N contiguous-chunk files (row
order preserved, so any key-sortedness of the generator survives and parquet
footer min/max gives file-level pruning). Small tables are symlinked.

Why: the generated sf corpora are one file per table, and documents/
embeddings are a single ROW GROUP — so every scan of those tables is one
task in Spark and one thread in DuckDB, and no engine can file-prune an
id-slice. A real 100 TB corpus is tens of thousands of files; this twin is
the layout-honest benchmark input. Both engines read the same directories
(Spark: spark.read.parquet(dir); DuckDB: read_parquet('dir/*.parquet')).

Usage: split_corpus.py <src_sf_dir> <dst_sf_dir> [n_splits]
"""
import os, sys, shutil
import pyarrow.parquet as pq
import pyarrow as pa

src, dst = sys.argv[1], sys.argv[2]
n = int(sys.argv[3]) if len(sys.argv) > 3 else 32
SPLIT = {"lineitem", "orders", "events", "documents", "embeddings", "customer"}

os.makedirs(dst, exist_ok=True)
for f in sorted(os.listdir(src)):
    if not f.endswith(".parquet"):
        continue
    t = f[: -len(".parquet")]
    sp, dp = os.path.join(src, f), os.path.join(dst, f)
    if os.path.lexists(dp):
        if os.path.isdir(dp) and not os.path.islink(dp):
            shutil.rmtree(dp)
        else:
            os.remove(dp)
    if t not in SPLIT:
        os.symlink(os.path.abspath(sp), dp)
        print(f"{t}: symlink")
        continue
    tbl = pq.read_table(sp)
    rows = tbl.num_rows
    os.makedirs(dp)
    step = (rows + n - 1) // n
    for i in range(n):
        lo = i * step
        if lo >= rows:
            break
        chunk = tbl.slice(lo, min(step, rows - lo))
        pq.write_table(chunk, os.path.join(dp, f"part-{i:05d}.parquet"))
    print(f"{t}: {rows} rows -> {min(n, (rows + step - 1) // step)} files")
