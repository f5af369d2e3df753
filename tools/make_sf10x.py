#!/usr/bin/env python3
"""Generate a scale-rehearsal fixture set by N-x-replicating sf0.1.

Usage: python3 tools/make_sf10x.py /root/testdata/sf0.1 /tmp/graft-sf1 [copies]
       (copies=10 -> sf1-equivalent; copies=100 -> sf10-equivalent)

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
- embeddings: copy k's vectors get an orthogonal transform D_k∘R_k —
  rotate dimensions by k mod dim, then flip signs by a per-copy
  seeded ±1 pattern. Orthogonal => intra-copy cosines (and the planted
  near-dup geometry) are exactly preserved; the sign pattern
  decorrelates cross-copy pairs even when copies > dim (a bare
  rotation aliases at k >= dim — copy 64 of a 64-d vector would be an
  EXACT cross-copy duplicate of copy 0, an artifact the 100x
  rehearsal would otherwise measure as quadratic near-dup growth).
  vec_id offsets keep ids unique.
- orders/lineitem: o_orderkey/l_orderkey offset per copy (joins fan out
  linearly); dimension FKs unchanged (dims stay single-copy).
- events: event_id offset; user_id offset per copy so per-user session/
  window state counts grow in KEYS (the realistic 100 TB shape), not in
  per-key depth; ts shifted +k hours to widen the timeline.

Copies are streamed into one parquet file via ParquetWriter (one row
group batch per copy) so peak memory is one copy, not copies x table —
at copies=100 a pandas concat of lineitem would hold 60M rows.
"""
import sys
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC, OUT = sys.argv[1], sys.argv[2]
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# optional 5th arg: comma-separated table subset (e.g. the 1000x tail
# rehearsal only needs lineitem,documents,embeddings + dims)
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
def wanted(t):
    return ONLY is None or t in ONLY
import os
os.makedirs(OUT, exist_ok=True)

def stride(series):
    return int(10 ** np.ceil(np.log10(series.max() + 1)))

# dimensions: single copy
for t in ["region", "nation", "customer", "supplier", "part"]:
    if wanted(t) or ONLY is not None:  # dims are cheap: always copy
        pd.read_parquet(f"{SRC}/{t}.parquet").to_parquet(f"{OUT}/{t}.parquet", index=False)
        print(f"{t}: copied as-is")

def replicate(name, df, mutate):
    writer = None
    for k in range(COPIES):
        c = df.copy()
        mutate(c, k)
        tbl = pa.Table.from_pandas(c, preserve_index=False)
        if writer is None:
            writer = pq.ParquetWriter(f"{OUT}/{name}.parquet", tbl.schema)
        writer.write_table(tbl)
    writer.close()
    print(f"{name}: {len(df)} -> {len(df) * COPIES}")

orders = pd.read_parquet(f"{SRC}/orders.parquet")
ok_stride = stride(orders.o_orderkey)
if wanted("orders"):
    replicate("orders", orders, lambda c, k: c.__setitem__("o_orderkey", c.o_orderkey + k * ok_stride))

if wanted("lineitem"):
    lineitem = pd.read_parquet(f"{SRC}/lineitem.parquet")
    replicate("lineitem", lineitem, lambda c, k: c.__setitem__("l_orderkey", c.l_orderkey + k * ok_stride))

if wanted("events"):
    events = pd.read_parquet(f"{SRC}/events.parquet")
    ev_stride = stride(events.event_id)
    u_stride = stride(events.user_id)
    def mut_events(c, k):
        c["event_id"] = c.event_id + k * ev_stride
        c["user_id"] = c.user_id + k * u_stride
        c["ts"] = c.ts + pd.Timedelta(hours=k)
    replicate("events", events, mut_events)

if wanted("documents"):
    docs = pd.read_parquet(f"{SRC}/documents.parquet")
    d_stride = stride(docs.doc_id)
    def mut_docs(c, k):
        c["doc_id"] = c.doc_id + k * d_stride
        if k > 0:
            suf = f"~{k}"
            c["text"] = c.text.map(lambda t: " ".join(w + suf for w in t.split(" ")))
            c["n_chars"] = c.text.str.len()
    replicate("documents", docs, mut_docs)

if wanted("embeddings"):
    emb = pd.read_parquet(f"{SRC}/embeddings.parquet")
    v_stride = stride(emb.vec_id)
    dim = len(emb.embedding.iloc[0])
    def mut_emb(c, k):
        c["vec_id"] = c.vec_id + k * v_stride
        if k > 0:
            signs = np.where(np.random.RandomState(k).rand(dim) < 0.5, -1.0, 1.0).astype(np.float32)
            c["embedding"] = c.embedding.map(
                lambda v: np.roll(np.asarray(v, dtype=np.float32), k % dim) * signs)
    replicate("embeddings", emb, mut_emb)
print("done:", OUT)
