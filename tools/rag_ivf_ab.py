"""Exact vs IVF RAG retrieval A/B at ~2M chunks (round-4 verdict item 3).

Builds a RAG chunk store over the 2M-document dedup-stress corpus
(`tools/dedup_stress.ensure_documents`), re-layouts it into 64 IVF cells,
then times the exact scan vs the IVF-routed path in INTERLEAVED legs
(E/I/E/I, one Ray session — the only attributable comparison on this noisy
host) in two modes:

- batch: all fixed queries in one call (the gate entry's shape; the read
  prunes to the UNION of probed cells, so many diverse queries erode the
  file-level pruning while per-query masking still cuts compute);
- serve: one query per call (the serving shape; each call reads only
  nprobe/n_cells of the files — the partition-pruned object-store read the
  module docstring claims at 100 TB).

Reports walls, aggregate recall@5 vs exact, and the measured fraction of
cell files a single-query probe touches. Prints one JSON line.

Usage: python tools/rag_ivf_ab.py  (needs /tmp/wse_dedup_stress; run
`python bench.py --scaling` once then `python tools/dedup_stress.py` — or
this script builds the documents table itself via ensure_documents).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CELLS = 64
NPROBE = 8
STORE = "/tmp/wse_rag_ivf_ab_store"


def main() -> None:
    import ray

    from tools.dedup_stress import ensure_documents

    src = ensure_documents()
    ray.init(address="local", num_cpus=32, include_dashboard=False)

    from web_search_engine_ray.pipelines.rag import (
        build_rag_ivf,
        build_rag_store,
        rag_topk,
        rag_topk_ivf,
    )
    from web_search_engine_ray.pipelines.serving import FIXED_QUERIES

    t0 = time.time()
    rep = build_rag_store(src, STORE, window=64, stride=32)
    store_s = round(time.time() - t0, 3)
    t0 = time.time()
    ivf_rep = build_rag_ivf(STORE, n_cells=N_CELLS)
    ivf_s = round(time.time() - t0, 3)
    n_files = len(ivf_rep["cell_counts"])

    # interleaved batch legs: E/I/E/I
    batch = {"exact_s": [], "ivf_s": []}
    exact = ivf = None
    for _ in range(2):
        t0 = time.time()
        exact = rag_topk(STORE, FIXED_QUERIES, topk=5).to_pandas()
        batch["exact_s"].append(round(time.time() - t0, 3))
        t0 = time.time()
        ivf = rag_topk_ivf(STORE, FIXED_QUERIES, topk=5, nprobe=NPROBE).to_pandas()
        batch["ivf_s"].append(round(time.time() - t0, 3))
    ep = set(zip(exact["query_id"], exact["vec_id"]))
    ip = set(zip(ivf["query_id"], ivf["vec_id"]))
    recall = round(len(ep & ip) / max(1, len(ep)), 4)

    # serving shape: one query per call, interleaved E/I per query
    serve = {"exact_s": [], "ivf_s": []}
    probed_frac = []
    from web_search_engine_ray.pipelines.rag import hash_embed_matrix
    import numpy as np
    import pyarrow as pa

    C = np.load(os.path.join(STORE, "ivf", "centroids.npy"))
    for q in FIXED_QUERIES[:5]:
        t0 = time.time()
        rag_topk(STORE, [q], topk=5)
        serve["exact_s"].append(round(time.time() - t0, 3))
        t0 = time.time()
        rag_topk_ivf(STORE, [q], topk=5, nprobe=NPROBE)
        serve["ivf_s"].append(round(time.time() - t0, 3))
        Q = hash_embed_matrix(pa.chunked_array([pa.array([q])]), C.shape[1])
        cells = np.argsort(-(Q.astype(np.float64) @ C.T), axis=1)[0, :NPROBE]
        probed_frac.append(
            sum(ivf_rep["cell_counts"].get(int(c), 0) for c in cells)
            / max(1, rep["n_chunks"])
        )

    out = {
        "metric": "rag_ivf_ab_2m_chunks",
        "n_chunks": rep["n_chunks"],
        "n_cells": N_CELLS,
        "nprobe": NPROBE,
        "n_cell_files": n_files,
        "store_build_s": store_s,
        "ivf_build_s": ivf_s,
        "batch_legs": batch,
        "serve_legs": serve,
        "recall_at_5_vs_exact": recall,
        "mean_probed_chunk_frac": round(sum(probed_frac) / len(probed_frac), 4),
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
