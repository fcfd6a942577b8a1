#!/usr/bin/env python3
"""One-off sf1 generator for the SCALING.md study (round 14).

Follows the harness testdata discipline — seed 42, deterministic,
same schemas and value distributions as /root/testdata/sf* (observed:
sequential o_orderkey, uniform status/priority, 30-word bag-of-words
documents with ~5%% planted near-dups appending ' dup', 64-dim
clustered float embeddings on the x4-per-decade ladder) — but is NOT
driver testdata: output goes to a scratch dir (default /tmp/sf1) and
only the three tables the scaling queries read (orders for q01,
documents for d04, embeddings for s03) are produced, at 10x the sf0.1
row counts (embeddings x4, its own ladder).
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
rng = np.random.default_rng(42)

import os
os.makedirs(OUT, exist_ok=True)

# ── orders: 1.5M rows (10x sf0.1) ───────────────────────────────────
N_ORD = 1_500_000
statuses = np.array(["F", "P", "O"])
prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                  "5-LOW"])
t0 = np.datetime64("1995-01-01")
t1 = np.datetime64("2001-08-01")
days = int((t1 - t0) / np.timedelta64(1, "D"))
orders = pa.table({
    "o_orderkey": pa.array(np.arange(N_ORD, dtype=np.int64)),
    "o_custkey": pa.array(rng.integers(0, 150_000, N_ORD, dtype=np.int64)),
    "o_orderstatus": pa.array(statuses[rng.integers(0, 3, N_ORD)]),
    "o_totalprice": pa.array(
        np.round(rng.uniform(1000.0, 500_000.0, N_ORD), 2)),
    "o_orderdate": pa.array(
        (t0 + rng.integers(0, days, N_ORD) * np.timedelta64(1, "D"))
        .astype("datetime64[us]")),
    "o_orderpriority": pa.array(prios[rng.integers(0, 5, N_ORD)]),
})
pq.write_table(orders, f"{OUT}/orders.parquet")
print("orders", N_ORD)

# ── documents: 50k rows (10x sf0.1's 5k) ───────────────────────────
N_DOC = 50_000
VOCAB = ["join", "hash", "row", "batch", "scan", "column", "customer",
         "filter", "small", "slow", "merge", "order", "vector", "line",
         "data", "table", "agg", "value", "key", "stream", "window",
         "a", "spark", "group", "part", "big", "sort", "query", "fast",
         "the"]
langs = np.array(["en", "en", "zh", "es", "de", "fr"])  # en-heavy
texts, lang_col, src_col = [], [], []
for i in range(N_DOC):
    if i > 0 and rng.random() < 0.05:
        # planted near-dup: copy an earlier doc, append the marker
        j = int(rng.integers(0, i))
        texts.append(texts[j] + " dup")
    else:
        n = int(rng.integers(10, 110))
        texts.append(" ".join(
            VOCAB[k] for k in rng.integers(0, len(VOCAB), n)))
    lang_col.append(langs[int(rng.integers(0, len(langs)))])
    src_col.append(f"src{i % 20}")
docs = pa.table({
    "doc_id": pa.array(np.arange(N_DOC, dtype=np.int64)),
    "text": pa.array(texts),
    "lang": pa.array(lang_col),
    "source": pa.array(src_col),
    "n_chars": pa.array(np.array([len(t) for t in texts],
                                 dtype=np.int64)),
})
pq.write_table(docs, f"{OUT}/documents.parquet")
print("documents", N_DOC)

# ── embeddings: 8k rows (4x sf0.1's 2k — its own ladder) ────────────
N_EMB, DIM, CLUSTERS = 8_000, 64, 16
centers = rng.normal(0.0, 0.12, (CLUSTERS, DIM))
cl = rng.integers(0, CLUSTERS, N_EMB)
vecs = (centers[cl] + rng.normal(0.0, 0.05, (N_EMB, DIM))
        ).astype(np.float32)
emb = pa.table({
    "vec_id": pa.array(np.arange(N_EMB, dtype=np.int64)),
    "embedding": pa.array(list(vecs),
                          type=pa.list_(pa.float32())),
    "label": pa.array((cl % 10).astype(np.int32)),
})
pq.write_table(emb, f"{OUT}/embeddings.parquet")
print("embeddings", N_EMB)
