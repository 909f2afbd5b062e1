#!/usr/bin/env python3
"""Generate an sf1 scaling rung from the driver's sf0.1 testdata (NOT
shipped library code; driver-style tooling like check.py).

The driver ships sf0.001/0.01/0.1 only; the scaling ladder needs one more
decade to confirm the measured exponents hold (round-10 verdict, next-round
item 2). sf1 is DERIVED from sf0.1 deterministically (seed 42):

- region/nation: copied (fixed dims).
- customer/supplier/part/orders/lineitem/events: replicated 10x with key
  offsets (custkey +r*15000, orderkey +r*150000, partkey +r*20000,
  suppkey +r*1000, event_id +r*100000, user_id +r*1500) so every FK stays
  consistent and every per-replica distribution matches sf0.1 exactly.
  Event timestamps shift by r*(span rounded up to the 20 s frame grid):
  each replica occupies its OWN time window -- a 10x LONGER deployment
  with the same per-frame activity. This is load-bearing for the graph
  family: interactions are co-occurrence pairs per (frame, event_type),
  so replicating users INTO the same frames would grow per-frame groups
  10x and pairs ~100x / triangles ~1000x -- a densified graph, not a
  scaled one (the first sf1 cut did exactly that and OOMed the c12
  triangle join through a 64 GB heap). Time-shifted replicas keep the
  contact graphs genuinely disjoint and every graph exponent's declared
  growth model linear in sf, which is what a scaling rung measures.
- documents: replica 0 is the original corpus; replicas 1-9 resample each
  row's text as a fresh uniform word sequence of the SAME word count from
  the measured 31-word vocabulary (copying text verbatim would give every
  doc 10 exact duplicates and blow the dedup families' candidate mass far
  past the driver's ~0.2% dup rate). Each replica re-plants 8 exact dup
  pairs -- the sf0.1 rate.
- embeddings: replica 0 original (2000); 6000 more sampled from per-label
  Gaussian fits (mean + per-dim std measured from sf0.1) so the cluster
  structure the IVF/ANN families index is preserved. 8000 total continues
  the 500 -> 2000 x4-per-decade ladder.

Output: /root/repo/testdata/sf1/*.parquet (gitignored; ~15 s to build).
Usage: python3 tools/gen_sf1.py [outdir]
"""
import os
import random
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata/sf1"
R = 10
SEED = 42

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()


def copy(table):
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{table}.parquet') TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")


def replicate(table, sql):
    """sql is a SELECT over src with `r` bound per replica."""
    union = " UNION ALL ".join(sql.format(r=r) for r in range(R))
    con.execute(
        f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/{table}.parquet'")
    con.execute(
        f"COPY ({union}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")


copy("region")
copy("nation")

# Replica key strides are assumptions about sf0.1 cardinalities: if a
# source key ever exceeds its stride, replica keys silently collide and
# merge rows across replicas (for user_id that re-densifies the contact
# graph -- the exact failure mode the time shift exists to avoid). Fail
# loudly instead.
STRIDES = {
    "customer": ("c_custkey", 15000),
    "supplier": ("s_suppkey", 1000),
    "part": ("p_partkey", 20000),
    "orders": ("o_orderkey", 150000),
    "events": ("event_id", 100000),
    "documents": ("doc_id", 5000),
    "embeddings": ("vec_id", 2000),
}
for tbl, (key, stride) in STRIDES.items():
    mx = con.execute(
        f"SELECT max({key}) FROM '{SRC}/{tbl}.parquet'").fetchone()[0]
    assert mx < stride, (
        f"{tbl}.{key} max {mx} >= replica stride {stride}: source testdata "
        f"outgrew the stride table -- raise it before generating sf1")
user_max = con.execute(
    f"SELECT max(user_id) FROM '{SRC}/events.parquet'").fetchone()[0]
assert user_max < 1500, (
    f"events.user_id max {user_max} >= replica stride 1500: replica "
    f"contact graphs would merge -- raise the stride before generating sf1")

replicate("customer",
          "SELECT c_custkey + {r}*15000 AS c_custkey, c_name, c_nationkey, c_acctbal, "
          "c_mktsegment FROM src")
replicate("supplier",
          "SELECT s_suppkey + {r}*1000 AS s_suppkey, s_name, s_nationkey, s_acctbal FROM src")
replicate("part",
          "SELECT p_partkey + {r}*20000 AS p_partkey, p_name, p_brand, p_type, p_size, "
          "p_retailprice FROM src")
replicate("orders",
          "SELECT o_orderkey + {r}*150000 AS o_orderkey, o_custkey + {r}*15000 AS o_custkey, "
          "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM src")
replicate("lineitem",
          "SELECT l_orderkey + {r}*150000 AS l_orderkey, l_partkey + {r}*20000 AS l_partkey, "
          "l_suppkey + {r}*1000 AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
          "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM src")
# per-replica time shift: the sf0.1 span rounded UP to a whole number of
# 20 s frames (plus one frame of slack), so every replica's events keep
# their within-frame offsets and no two replicas share a frame
t0, t1 = con.execute(
    f"SELECT min(epoch(ts))::BIGINT, max(epoch(ts))::BIGINT FROM '{SRC}/events.parquet'"
).fetchone()
DELTA = 20
shift = ((t1 - t0) // DELTA + 2) * DELTA
replicate("events",
          "SELECT event_id + {r}*100000 AS event_id, "
          f"ts + to_seconds({{r}} * {shift}) AS ts, "
          "user_id + {r}*1500 AS user_id, "
          "event_type, value, props FROM src")

# ---- documents: resampled replicas -----------------------------------------
rows = con.execute(
    f"SELECT doc_id, text, lang, source FROM '{SRC}/documents.parquet' ORDER BY doc_id"
).fetchall()
vocab = sorted({w for _, t, _, _ in rows for w in t.split(" ")})
assert len(vocab) >= 20, "unexpected vocabulary"

doc_ids, texts, langs, sources, n_chars = [], [], [], [], []
for r in range(R):
    rep = []
    for doc_id, text, lang, source in rows:
        nid = doc_id + r * 5000
        if r == 0:
            t = text
        else:
            rng = random.Random(f"{SEED}#{nid}")
            t = " ".join(rng.choice(vocab) for _ in range(len(text.split(" "))))
        rep.append([nid, t, lang, source])
    if r > 0:  # re-plant the sf0.1 exact-dup rate: 8 pairs per 5000 docs
        for i in range(8):
            rep[100 * i + 50][1] = rep[100 * i][1]
    for nid, t, lang, source in rep:
        doc_ids.append(nid)
        texts.append(t)
        langs.append(lang)
        sources.append(source)
        n_chars.append(len(t))

pq.write_table(pa.table({
    "doc_id": pa.array(doc_ids, pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array(langs, pa.string()),
    "source": pa.array(sources, pa.string()),
    "n_chars": pa.array(n_chars, pa.int64()),
}), f"{OUT}/documents.parquet")

# ---- embeddings: per-label Gaussian resample -------------------------------
emb_rows = con.execute(
    f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet' ORDER BY vec_id"
).fetchall()
dim = len(emb_rows[0][1])
by_label = {}
for _, e, lbl in emb_rows:
    by_label.setdefault(lbl, []).append(e)
stats = {lbl: (np.mean(v, axis=0), np.std(v, axis=0) + 1e-6)
         for lbl, v in by_label.items()}
labels_cycle = sorted(stats)

rng = np.random.default_rng(SEED)
vec_ids = [v for v, _, _ in emb_rows]
embs = [e for _, e, _ in emb_rows]
labels = [l for _, _, l in emb_rows]
for i in range(6000):
    vid = 2000 + i
    lbl = labels_cycle[i % len(labels_cycle)]
    mu, sd = stats[lbl]
    vec_ids.append(vid)
    embs.append(rng.normal(mu, sd).astype(np.float32).tolist())
    labels.append(lbl)

pq.write_table(pa.table({
    "vec_id": pa.array(vec_ids, pa.int64()),
    "embedding": pa.array(embs, pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32()),
}), f"{OUT}/embeddings.parquet")

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n}")
print(f"wrote {OUT}")
