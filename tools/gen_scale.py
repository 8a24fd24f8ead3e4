#!/usr/bin/env python3
"""One-off scale-stress data generator (driver-side tooling, like
check_oracle.py — NOT library code).

Generates the full 10-table layout at a multiple of the sf0.1 sizes,
matching the driver-generated tables' schemas, value ranges, and
category mixes (profiled from /root/testdata/sf0.1), including the
documents table's planted exact-dup and near-dup structure at the same
rates. Used for the SCALE_r8 evidence run: sf1 = 10x bench scale.

Usage: python3 tools/gen_scale.py <outDir> [multiplier]
"""
import json
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1]
M = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SEED = 43
rng = np.random.default_rng(SEED)

import os
os.makedirs(OUT, exist_ok=True)


def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet", version="2.6")
    print(f"{name}: {table.num_rows} rows")


# ---- tiny dimensions (fixed size, mirrored from sf0.1) ---------------------
write("region", pa.table({
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}))
write("nation", pa.table({
    "n_nationkey": pa.array(range(25), pa.int32()),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

# ---- customer --------------------------------------------------------------
NC = 15000 * M
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
write("customer", pa.table({
    "c_custkey": pa.array(range(NC), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(NC)],
    "c_nationkey": pa.array(rng.integers(0, 25, NC), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, NC), 2),
    "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, NC)]}))

# ---- supplier / part -------------------------------------------------------
NS = 1000 * M
write("supplier", pa.table({
    "s_suppkey": pa.array(range(NS), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(NS)],
    "s_nationkey": pa.array(rng.integers(0, 25, NS), pa.int32()),
    "s_acctbal": np.round(rng.uniform(0, 10000, NS), 2)}))
NP = 20000 * M
ADJ = ["large", "hot", "small", "cold", "dark", "pale", "spring", "metal"]
NOUN = ["ring", "bolt", "case", "drum", "tube", "plate", "cap", "rod"]
PTYPE = ["LARGE", "ECONOMY", "STANDARD", "SMALL", "MEDIUM", "PROMO"]
write("part", pa.table({
    "p_partkey": pa.array(range(NP), pa.int64()),
    "p_name": [f"{ADJ[i % 8]} {NOUN[(i // 8) % 8]}" for i in range(NP)],
    "p_brand": [f"Brand#{i % 25}" for i in rng.integers(0, 10**6, NP)],
    "p_type": [PTYPE[i] for i in rng.integers(0, 6, NP)],
    "p_size": pa.array(rng.integers(1, 51, NP), pa.int32()),
    "p_retailprice": np.round(900 + rng.uniform(0, 0.1, NP) * NP % 1100, 2)}))

# ---- orders ----------------------------------------------------------------
NO = 150000 * M
STATUS = ["O", "F", "P"]
PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
odate = (np.datetime64("1995-01-01") +
         rng.integers(0, 2405, NO).astype("timedelta64[D]"))
write("orders", pa.table({
    "o_orderkey": pa.array(range(NO), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, NC, NO), pa.int64()),
    "o_orderstatus": [STATUS[i] for i in rng.integers(0, 3, NO)],
    "o_totalprice": np.round(rng.uniform(1000, 500000, NO), 2),
    # MICROS like the driver's tables — only events.ts is TIMESTAMP(NANOS)
    "o_orderdate": pa.array(odate.astype("datetime64[us]"),
                            pa.timestamp("us")),
    "o_orderpriority": [PRIO[i] for i in rng.integers(0, 5, NO)]}))

# ---- lineitem --------------------------------------------------------------
NL = 600000 * M
sdate = (np.datetime64("1995-01-02") +
         rng.integers(0, 2500, NL).astype("timedelta64[D]"))
write("lineitem", pa.table({
    "l_orderkey": pa.array(rng.integers(0, NO, NL), pa.int64()),
    "l_partkey": pa.array(rng.integers(0, NP, NL), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, NS, NL), pa.int64()),
    "l_linenumber": pa.array(rng.integers(1, 8, NL), pa.int32()),
    "l_quantity": rng.integers(1, 51, NL).astype("float64"),
    "l_extendedprice": np.round(rng.uniform(1000, 100000, NL), 2),
    "l_discount": np.round(rng.uniform(0, 0.1, NL), 2),
    "l_tax": np.round(rng.uniform(0, 0.08, NL), 2),
    "l_returnflag": [["A", "N", "R"][i] for i in rng.integers(0, 3, NL)],
    "l_linestatus": [["O", "F"][i] for i in rng.integers(0, 2, NL)],
    "l_shipdate": pa.array(sdate.astype("datetime64[us]"),
                           pa.timestamp("us"))}))

# ---- events (ts as timestamp[us] NTZ, the driver's r9 encoding; the
# nanos and UTC-adjusted variants are covered by EventTimeSpec) --------------
NE = 100000 * M
span_us = 30 * 24 * 3600 * 10**6
ets = (np.datetime64("2024-01-01", "us") +
       rng.integers(0, span_us, NE).astype("timedelta64[us]"))
ETYPE = ["click", "view", "purchase", "signup", "error"]
write("events", pa.table({
    "event_id": pa.array(range(NE), pa.int64()),
    "ts": pa.array(ets, pa.timestamp("us")),
    "user_id": pa.array(rng.integers(0, NC // 10, NE), pa.int64()),
    "event_type": [ETYPE[i] for i in rng.integers(0, 5, NE)],
    "value": np.round(rng.uniform(0, 560, NE), 2),
    "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, NE)]}))

# ---- documents (same vocab + planted dup/near-dup structure) ---------------
ND = 5000 * M
VOCAB = ("batch part spark line column order small sort fast value scan a "
         "hash slow group agg filter customer stream table the key query "
         "window join vector big data row merge").split()
LANGS = ["en", "es", "fr", "de", "zh"]
LANGP = [0.42, 0.15, 0.15, 0.14, 0.14]
NSRC = 20
texts = []
n_words = rng.integers(8, 100, ND)
for i in range(ND):
    texts.append(" ".join(VOCAB[w] for w in
                          rng.integers(0, len(VOCAB), n_words[i])))
# planted exact duplicates: ~0.2% copy an earlier doc (sf0.1 has
# 8/5000 duplicated texts)
for i in rng.integers(ND // 2, ND, max(1, ND // 500)):
    texts[i] = texts[rng.integers(0, ND // 2)]
# planted near-duplicates: ~2.5% of docs are a base doc with ~10% of
# tokens replaced (jaccard over 3-shingles lands around the 0.5
# threshold, the q25/q34/q35 workload shape)
for i in rng.integers(ND // 2, ND, max(1, ND // 40)):
    base = texts[rng.integers(0, ND // 2)].split()
    for _ in range(max(1, len(base) // 10)):
        base[rng.integers(0, len(base))] = VOCAB[rng.integers(0, len(VOCAB))]
    texts[i] = " ".join(base)
write("documents", pa.table({
    "doc_id": pa.array(range(ND), pa.int64()),
    "text": texts,
    "lang": [LANGS[i] for i in rng.choice(5, ND, p=LANGP)],
    "source": [f"src{i}" for i in rng.integers(0, NSRC, ND)],
    "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

# ---- embeddings ------------------------------------------------------------
NV = 2000 * M
DIM = 64
centers = rng.normal(0, 1, (10, DIM))
labels = rng.integers(0, 10, NV)
vecs = (centers[labels] + rng.normal(0, 0.35, (NV, DIM))).astype("float32")
write("embeddings", pa.table({
    "vec_id": pa.array(range(NV), pa.int64()),
    "embedding": pa.array([v for v in vecs.tolist()],
                          pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32())}))
print("done:", OUT)
