#!/usr/bin/env python3
"""Generate an sf1-equivalent fixture set by 10x-replicating sf0.1.

Usage: python3 tools/make_sf10x.py /root/testdata/sf0.1 /tmp/graft-sf1 [copies]

Scale-rehearsal data for the bench (never for the correctness oracle):
each fact table is replicated `copies` times with key offsets so joins
and group-bys grow linearly; dimensions are copied as-is.

Replication must preserve the WITHIN-COPY similarity structure without
inventing CROSS-COPY structure, or the dedup/ANN family's output would
grow ~copies^2 and the rehearsal would measure fixture artifacts:

- documents: every word in copy k>0 gets a "~k" suffix — a bijection on
  the shingle alphabet, so intra-copy Jaccard/containment/minhash
  relations are EXACTLY the original ones, while cross-copy pairs share
  zero shingles. Near-dup pair count scales exactly linearly.
- embeddings: copy k's vectors have their dimensions rotated by k
  positions — an orthogonal transform, so intra-copy cosines (and the
  planted near-dup geometry) are exactly preserved, while cross-copy
  cosines decorrelate. vec_id offsets keep ids unique.
- orders/lineitem: o_orderkey/l_orderkey offset per copy (joins fan out
  linearly); dimension FKs unchanged (dims stay single-copy).
- events: event_id offset; user_id offset per copy so per-user session/
  window state counts grow in KEYS (the realistic 100 TB shape), not in
  per-key depth; ts shifted +k hours to widen the timeline.
"""
import sys
import numpy as np
import pandas as pd

SRC, OUT = sys.argv[1], sys.argv[2]
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
import os
os.makedirs(OUT, exist_ok=True)

def stride(series):
    return int(10 ** np.ceil(np.log10(series.max() + 1)))

# dimensions: single copy
for t in ["region", "nation", "customer", "supplier", "part"]:
    pd.read_parquet(f"{SRC}/{t}.parquet").to_parquet(f"{OUT}/{t}.parquet", index=False)
    print(f"{t}: copied as-is")

def replicate(name, df, mutate):
    out = []
    for k in range(COPIES):
        c = df.copy()
        mutate(c, k)
        out.append(c)
    allc = pd.concat(out, ignore_index=True)
    allc.to_parquet(f"{OUT}/{name}.parquet", index=False)
    print(f"{name}: {len(df)} -> {len(allc)}")

orders = pd.read_parquet(f"{SRC}/orders.parquet")
ok_stride = stride(orders.o_orderkey)
replicate("orders", orders, lambda c, k: c.__setitem__("o_orderkey", c.o_orderkey + k * ok_stride))

lineitem = pd.read_parquet(f"{SRC}/lineitem.parquet")
replicate("lineitem", lineitem, lambda c, k: c.__setitem__("l_orderkey", c.l_orderkey + k * ok_stride))

events = pd.read_parquet(f"{SRC}/events.parquet")
ev_stride = stride(events.event_id)
u_stride = stride(events.user_id)
def mut_events(c, k):
    c["event_id"] = c.event_id + k * ev_stride
    c["user_id"] = c.user_id + k * u_stride
    c["ts"] = c.ts + pd.Timedelta(hours=k)
replicate("events", events, mut_events)

docs = pd.read_parquet(f"{SRC}/documents.parquet")
d_stride = stride(docs.doc_id)
def mut_docs(c, k):
    c["doc_id"] = c.doc_id + k * d_stride
    if k > 0:
        suf = f"~{k}"
        c["text"] = c.text.map(lambda t: " ".join(w + suf for w in t.split(" ")))
        c["n_chars"] = c.text.str.len()
replicate("documents", docs, mut_docs)

emb = pd.read_parquet(f"{SRC}/embeddings.parquet")
v_stride = stride(emb.vec_id)
def mut_emb(c, k):
    c["vec_id"] = c.vec_id + k * v_stride
    if k > 0:
        c["embedding"] = c.embedding.map(lambda v: np.roll(np.asarray(v, dtype=np.float32), k))
replicate("embeddings", emb, mut_emb)
print("done:", OUT)
