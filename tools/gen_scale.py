#!/usr/bin/env python3
"""Scale-fixture generator: replicate a testdata SF's documents and
embeddings tables N-fold with per-replica perturbation, for the
round-6 linear-scaling measurements (SCALING.md "10x sweep").

Driver-side tooling (like check_oracle.py) — NOT part of the engine;
the engine only ever reads the parquet this writes.

Replica structure, chosen to exercise the dedup paths realistically
instead of degenerately:
  - replica 0 is the original corpus, ids unchanged;
  - replica i>0 offsets doc_id/vec_id by i * 10_000_000 and perturbs:
      documents: every 4th token replaced by a replica-unique token
        (word-shingle Jaccard vs original ~0.5 — below the 0.7 dedup
        threshold, so corpus size, not dup-cluster blowup, drives cost;
        LSH bands still collide occasionally, which is the realistic
        candidate-verify load);
      embeddings: deterministic small noise added per dimension (same
        ANN geometry, distinct vectors).

Usage: python3 tools/gen_scale.py SRC_SF_DIR OUT_DIR N_REPLICAS
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def perturb_text(text, rep):
    if text is None:
        return None
    toks = text.split(" ")
    for j in range(0, len(toks), 4):
        toks[j] = f"r{rep}w{j}"
    return " ".join(toks)


def main():
    src, out, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    # Replica id stride. Up to 100 replicas the historical layout is
    # kept byte-reproducible: ids occupy [0, n*10^7), below the +10^9
    # perturbed-twin namespace some multimodal queries synthesize.
    # Past 100 replicas (the 1000x layout), stride jumps to 10^10 so
    # each replica's band [k*10^10, k*10^10 + 10^7) has its twin ids at
    # k*10^10 + 10^9 + base — still inside the band, no cross-replica
    # collision. Both strides are multiples of 10^7, so base-id
    # recovery via % 10^7 works unchanged.
    stride = 10_000_000 if n <= 100 else 10_000_000_000
    assert n * stride < 2**62, f"replica ids would overflow int64: n={n}"
    if n > 100:
        print(f"n={n} > 100: using wide replica stride {stride}")
    import os
    os.makedirs(out, exist_ok=True)

    docs = pq.read_table(f"{src}/documents.parquet")
    d = docs.to_pydict()
    cols = {k: [] for k in d}
    for rep in range(n):
        off = rep * stride
        cols["doc_id"].extend(x + off for x in d["doc_id"])
        if rep == 0:
            texts = d["text"]
        else:
            texts = [perturb_text(t, rep) for t in d["text"]]
        cols["text"].extend(texts)
        for k in d:
            if k == "n_chars":
                # metadata must track the perturbed text — a replica
                # where n_chars != length(text) is a corpus shape no
                # real SF generation produces, and length-derived ops
                # (weighted sample, gopher rules) would measure a lie.
                # Replica 0's text is untouched, so its metadata passes
                # through verbatim: if a base SF ever deliberately
                # carries n_chars != length(text), the sweep preserves
                # that shape instead of silently normalizing it.
                if rep == 0:
                    cols[k].extend(d[k])
                else:
                    cols[k].extend(
                        None if t is None else len(t) for t in texts)
            elif k not in ("doc_id", "text"):
                cols[k].extend(d[k])
    pq.write_table(pa.table(cols, schema=docs.schema), f"{out}/documents.parquet")
    print(f"documents: {len(d['doc_id'])} -> {len(cols['doc_id'])}")

    emb = pq.read_table(f"{src}/embeddings.parquet")
    e = emb.to_pydict()
    vecs = np.asarray(e["embedding"], dtype=np.float32)
    ids, labels, out_vecs = [], [], []
    rng = np.random.default_rng(42)
    for rep in range(n):
        off = rep * stride
        ids.extend(x + off for x in e["vec_id"])
        labels.extend(e["label"])
        noise = 0.0 if rep == 0 else rng.normal(0, 0.01, vecs.shape).astype(np.float32)
        out_vecs.append(vecs + noise)
    all_vecs = np.concatenate(out_vecs)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(list(all_vecs), type=pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    print(f"embeddings: {len(e['vec_id'])} -> {len(ids)}")


if __name__ == "__main__":
    main()
