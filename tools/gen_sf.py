#!/usr/bin/env python3
"""Generate larger scale factors of the driver's synthetic star schema
(same schemas/value distributions as /root/testdata/sf*) for the bench
scaling study. Driver-side tooling only — the Scala library never reads
anything but parquet. Deterministic (seed=42); row counts are 10x sf0.1
per unit of sf (sf=1 -> 6M lineitem).

Usage: python3 tools/gen_sf.py <sf> <outdir>
"""
import os, sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sf = float(sys.argv[1])
outdir = sys.argv[2]
os.makedirs(outdir, exist_ok=True)
rng = np.random.default_rng(42)

DAY_US = 86_400_000_000


def write(name, table):
    # Row-group sizing (r21, spark_optimization_guide §6): pyarrow's default
    # (1 Mi rows / one giant group for small tables) makes every scan
    # unsplittable — Spark's parquet reader cannot split below a row group,
    # so a 50k-doc sf1 documents table ran as ONE task on a 32-core box
    # (measured: dd27's 15-task scan stage had one 1.65 s straggler task).
    # Cap groups at n_rows/256 (≥1024 rows) so any table exposes up to ~256
    # independently readable groups at every sf, while groups never shrink
    # below 1024 rows (metadata overhead). Values are unchanged — layout only.
    rg = max(1024, table.num_rows // 256)
    pq.write_table(table, f"{outdir}/{name}.parquet", row_group_size=rg)
    print(name, table.num_rows)


def ts_col(us):
    return pa.array(us, type=pa.timestamp("us"))


# region / nation: fixed small dims
write("region", pa.table({
    "r_regionkey": pa.array(range(5), type=pa.int32()),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}))
write("nation", pa.table({
    "n_nationkey": pa.array(range(25), type=pa.int32()),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array([i % 5 for i in range(25)], type=pa.int32())}))

# customer
n_cust = int(150_000 * sf)
ck = np.arange(n_cust)
write("customer", pa.table({
    "c_custkey": pa.array(ck, type=pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in ck],
    "c_nationkey": pa.array(ck % 25, type=pa.int32()),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
    "c_mktsegment": np.array(["AUTOMOBILE", "BUILDING", "FURNITURE",
                              "HOUSEHOLD", "MACHINERY"])[ck % 5]}))

# supplier
n_supp = int(10_000 * sf)
sk = np.arange(n_supp)
write("supplier", pa.table({
    "s_suppkey": pa.array(sk, type=pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in sk],
    "s_nationkey": pa.array(sk % 25, type=pa.int32()),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2)}))

# part
n_part = int(200_000 * sf)
pk = np.arange(n_part)
adjectives = np.array(["large", "hot", "blue", "small", "dark", "green",
                       "red", "cold", "shiny", "plain"])
nouns = np.array(["ring", "bolt", "case", "drum", "gear", "plate",
                  "wheel", "pin", "rod", "cap"])
write("part", pa.table({
    "p_partkey": pa.array(pk, type=pa.int64()),
    "p_name": [f"{a} {n}" for a, n in
               zip(adjectives[pk % 10], nouns[(pk // 10) % 10])],
    "p_brand": [f"Brand#{i % 25 + 1}" for i in pk],
    "p_type": np.array(["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
                        "STANDARD"])[pk % 6],
    "p_size": pa.array(pk % 50 + 1, type=pa.int32()),
    "p_retailprice": np.round(900 + (pk % 100000) / 10, 2)}))

# orders: 1995-01-01 .. 2001-08-01
n_ord = int(1_500_000 * sf)
ok = np.arange(n_ord)
base = np.datetime64("1995-01-01", "us").astype(np.int64)
span_days = int((np.datetime64("2001-08-01") - np.datetime64("1995-01-01"))
                / np.timedelta64(1, "D"))
odate_us = base + rng.integers(0, span_days, n_ord) * DAY_US
write("orders", pa.table({
    "o_orderkey": pa.array(ok, type=pa.int64()),
    "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), type=pa.int64()),
    "o_orderstatus": np.array(["O", "P", "F"])[ok % 3],
    "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
    "o_orderdate": ts_col(odate_us),
    "o_orderpriority": np.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                                 "4-NOT SPECIFIED", "5-LOW"])[ok % 5]}))

# lineitem: ~4 lines/order, shipdate = orderdate + 1..95 days
n_li = int(6_000_000 * sf)
lok = rng.integers(0, n_ord, n_li)
lok.sort()
change = np.concatenate(([True], lok[1:] != lok[:-1]))
idx = np.arange(n_li)
run_start = np.maximum.accumulate(np.where(change, idx, 0))
linenum = (idx - run_start + 1).astype(np.int32)
write("lineitem", pa.table({
    "l_orderkey": pa.array(lok, type=pa.int64()),
    "l_partkey": pa.array(rng.integers(0, n_part, n_li), type=pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), type=pa.int64()),
    "l_linenumber": pa.array(linenum, type=pa.int32()),
    "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
    "l_discount": np.round(rng.integers(0, 11, n_li) / 100, 2),
    "l_tax": np.round(rng.integers(0, 9, n_li) / 100, 2),
    "l_returnflag": np.array(["R", "N", "A"])[rng.integers(0, 3, n_li)],
    "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
    "l_shipdate": ts_col(odate_us[lok] + rng.integers(1, 96, n_li) * DAY_US)}))

# events: 30 days of 2024-01, user pool 15k*sf
n_ev = int(1_000_000 * sf)
ev_base = np.datetime64("2024-01-01", "us").astype(np.int64)
ev_us = ev_base + rng.integers(0, 30 * DAY_US, n_ev)
ev_us.sort()
write("events", pa.table({
    "event_id": pa.array(np.arange(n_ev), type=pa.int64()),
    "ts": ts_col(ev_us),
    "user_id": pa.array(rng.integers(0, max(1, int(15_000 * sf)), n_ev),
                        type=pa.int64()),
    "event_type": np.array(["click", "error", "purchase", "signup",
                            "view"])[rng.integers(0, 5, n_ev)],
    "value": np.round(rng.exponential(50, n_ev), 2),
    "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]}))

# documents: word-salad text from the same small vocabulary, ~5% exact dups
n_doc = int(50_000 * sf)
vocab = np.array(["spark", "line", "column", "order", "sort", "fast", "value",
                  "scan", "hash", "slow", "group", "batch", "query", "agg",
                  "table", "key", "stream", "filter", "customer", "window",
                  "join", "part", "vector", "the", "a", "small", "g"])
langs = np.array(["en", "en", "en", "de", "fr", "es", "zh"])
doc_words = rng.integers(12, 60, n_doc)
texts = [" ".join(vocab[rng.integers(0, len(vocab), w)]) for w in doc_words]
for i in range(0, n_doc, 20):     # exact duplicates for dd01
    if i + 1 < n_doc:
        texts[i + 1] = texts[i]
write("documents", pa.table({
    "doc_id": pa.array(np.arange(n_doc), type=pa.int64()),
    "text": texts,
    "lang": langs[rng.integers(0, len(langs), n_doc)],
    "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
    "n_chars": pa.array([len(t) for t in texts], type=pa.int64())}))

# embeddings: 64-dim float32, clustered around 20 centroids
n_vec = int(20_000 * sf)
cents = rng.normal(0, 1, (20, 64))
assign = rng.integers(0, 20, n_vec)
vecs = (cents[assign] + rng.normal(0, 0.4, (n_vec, 64))).astype(np.float32)
write("embeddings", pa.table({
    "vec_id": pa.array(np.arange(n_vec), type=pa.int64()),
    "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
    "label": pa.array(assign, type=pa.int32())}))
