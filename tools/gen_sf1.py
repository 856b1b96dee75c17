#!/usr/bin/env python3
"""Deterministic sf1 generator for the scale-proof runs (r11).

The driver owns /root/testdata (read-only, sf <= 0.1). For the 10x
scale-sensitivity evidence we synthesize sf1 into /tmp/sf1 from sf0.1 by
replicating each table 10x with disjoint key spaces — the realistic
growth axis (10x users / docs / vectors, per-entity density unchanged):

- events:     event_id + r*100000, ts + r*30 days; user/type/value/props
              unchanged — 10x LONGER HISTORY for the same user
              population, the linear growth axis. (A 10x-users-same-
              window replica was tried first and rejected: it densifies
              every (hour, type) co-occurrence basket 10x, which grows
              the derived graph EDGE SET ~100x — q_triangle_count's
              input went superlinear by construction and spilled 20 GB
              at sf1. Longer history keeps per-basket density fixed, so
              event-derived inputs scale like the fact table itself;
              the co-occurrence graph then saturates toward the
              user-population bound, which ScaleProof reports alongside
              the timings.)
- documents:  doc_id + r*5000; for r>0 the token sequence is permuted by
              a per-(replica,doc) seeded shuffle — token MULTISET (and so
              tokenization/BPE work) is preserved, while cross-replica
              shingle overlap drops to noise so near-dup clusters do not
              artificially grow 10x (which would square the candidate
              pair counts and make minhash look superlinear).
- embeddings: vec_id + r*2000; for r>0 each vector gets a deterministic
              N(0, 0.05) perturbation — distinct vectors with the same
              distributional shape (exact copies would degenerate LSH
              buckets into 10x-deep duplicate stacks).

Everything is seeded: same inputs -> bit-identical /tmp/sf1.
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
# Flags: --r N or --r=N (replication factor), --skip-embeddings. Any
# other --flag is an error — a typo like `--R 100` or a silently-consumed
# `--r=100` would otherwise generate wrong-scale data with no warning
# (r13 ADVICE).
_KNOWN_FLAGS = {"--r", "--skip-embeddings", "--mog"}
for _a in sys.argv[1:]:
    if _a.startswith("--") and _a != "--r" and not _a.startswith("--r=") \
            and _a not in _KNOWN_FLAGS:
        sys.exit(f"unknown flag {_a}; known: --r N | --r=N, --skip-embeddings")
# DST is the first positional argument, with flags AND their values
# skipped (a bare `--r 100` must neither write into "--r" nor "100")
def _positional(argv):
    i = 0
    while i < len(argv):
        if argv[i] == "--r":
            i += 2
        elif argv[i].startswith("--"):
            i += 1
        else:
            return argv[i]
    return "/tmp/sf1"
DST = _positional(sys.argv[1:])
# --r N: replication factor (default 10 = sf1; 100 = sf10 for the r13
# steep-curve points). Strides are safe for any R: event_id < 100000 and
# doc_id < 5000 at sf0.1, so replica key spaces never collide. --r 100
# implies 8.2 years of event history (the longer-history growth axis).
def _parse_r(argv):
    for i, a in enumerate(argv):
        if a == "--r":
            if i + 1 >= len(argv) or not argv[i + 1].isdigit():
                sys.exit("--r needs an integer value, e.g. --r 100")
            return int(argv[i + 1])
        if a.startswith("--r="):
            v = a[len("--r="):]
            if not v.isdigit():
                sys.exit("--r= needs an integer value, e.g. --r=100")
            return int(v)
    return 10
R = _parse_r(sys.argv[1:])
# --skip-embeddings: the steep-curve set (bpe/substring/cdc/triangles)
# reads only documents+events; embeddings are then copied verbatim from
# sf0.1 so table loaders still resolve.
SKIP_EMB = "--skip-embeddings" in sys.argv

import os

os.makedirs(DST, exist_ok=True)

# ---- events -----------------------------------------------------------
t = pq.read_table(f"{SRC}/events.parquet")
ts_us = pa.compute.cast(t["ts"], pa.int64())
parts = []
for r in range(R):
    shifted = pa.compute.add(ts_us, r * 30 * 86400 * 1000000)
    parts.append(
        pa.table(
            {
                "event_id": pa.compute.add(t["event_id"], r * 100000),
                "ts": pa.compute.cast(shifted, pa.timestamp("us")),
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "value": t["value"],
                "props": t["props"],
            }
        )
    )
ev = pa.concat_tables(parts)
pq.write_table(ev, f"{DST}/events.parquet")
print("events", ev.num_rows)

# ---- documents --------------------------------------------------------
t = pq.read_table(f"{SRC}/documents.parquet")
doc_ids = t["doc_id"].to_pylist()
texts = t["text"].to_pylist()
langs = t["lang"].to_pylist()
sources = t["source"].to_pylist()
out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
for r in range(R):
    for i, (d, txt) in enumerate(zip(doc_ids, texts)):
        if r == 0:
            new = txt
        else:
            toks = txt.split(" ")
            rng = np.random.RandomState((42 + r * 1000003 + d) % (2**31))
            rng.shuffle(toks)
            new = " ".join(toks)
        out["doc_id"].append(d + r * 5000)
        out["text"].append(new)
        out["lang"].append(langs[i])
        out["source"].append(sources[i])
        out["n_chars"].append(len(new))
docs = pa.table(
    {
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "text": pa.array(out["text"], pa.string()),
        "lang": pa.array(out["lang"], pa.string()),
        "source": pa.array(out["source"], pa.string()),
        "n_chars": pa.array(out["n_chars"], pa.int64()),
    }
)
pq.write_table(docs, f"{DST}/documents.parquet")
print("documents", docs.num_rows)

# ---- embeddings -------------------------------------------------------
# Default: replicate the driver's (near-uniform random) vectors with a
# small perturbation — the ADVERSARIAL distribution for every index.
# --mog: deterministic mixture-of-Gaussians instead (r12; 8 centers,
# sigma 0.25 — same recipe StructuredEmbeddingsSpec pins recall >=0.8
# on), for scale runs where the index should see CLUSTERED geometry.
if SKIP_EMB:
    import shutil as _sh
    _sh.copy(f"{SRC}/embeddings.parquet", f"{DST}/embeddings.parquet")
    print("embeddings copied (sf0.1 verbatim — --skip-embeddings)")
if not SKIP_EMB:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_ids = t["vec_id"].to_pylist()
    embs = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    labels = t["label"].to_pylist()
    MOG = "--mog" in sys.argv
    if MOG:
        dim = embs.shape[1]
        rng = np.random.RandomState(4242)
        centers = rng.randn(8, dim)
        n_total = len(vec_ids) * R
        ids = list(range(n_total))
        pts = centers[np.arange(n_total) % 8] + 0.25 * rng.randn(n_total, dim)
        vecs = pts.astype(np.float32).tolist()
        labs = [int(i % 8) for i in range(n_total)]
    else:
        ids, vecs, labs = [], [], []
        for r in range(R):
            rng = np.random.RandomState(42 + r)
            noise = (
                np.zeros_like(embs)
                if r == 0
                else rng.normal(0, 0.05, embs.shape).astype(np.float32)
            )
            ids.extend(v + r * 2000 for v in vec_ids)
            vecs.extend((embs + noise).tolist())
            labs.extend(labels)
    emb = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labs, pa.int32()),
        }
    )
    pq.write_table(emb, f"{DST}/embeddings.parquet")
    print("embeddings", emb.num_rows)

# ---- customer: replicated with regenerated keys + names ---------------
# The record-linkage scale axis (q_fuzzy_link2): the CATALOG grows, and
# names are regenerated from the widened key space ("Customer#%09d"), so
# per-position name entropy widens exactly as a real catalog's would.
# Stride 100000 > max c_custkey (14999), so replica key spaces never
# collide; r=0 reproduces the source rows bit-for-bit (source names are
# already Customer#%09d of the key).
t = pq.read_table(f"{SRC}/customer.parquet")
parts = []
for r in range(R):
    nk = pa.compute.add(t["c_custkey"], r * 100000)
    names = pa.array(["Customer#%09d" % k for k in nk.to_pylist()],
                     t["c_name"].type)
    parts.append(pa.table({
        c: (nk if c == "c_custkey" else names if c == "c_name" else t[c])
        for c in t.column_names}))
pq.write_table(pa.concat_tables(parts), f"{DST}/customer.parquet")
print("customer", sum(p.num_rows for p in parts))

# ---- small dims copied verbatim (loaders expect the files) ------------
import shutil

for name in ["region", "nation", "supplier", "part", "orders", "lineitem"]:
    shutil.copy(f"{SRC}/{name}.parquet", f"{DST}/{name}.parquet")
    print(name, "copied (sf0.1 verbatim — not used by the sf1 heavy set)")
