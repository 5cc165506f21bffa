"""``ray job submit`` entry for the composed RAG pipeline: corpus in ->
sliding-window chunks -> deterministic hashed embeddings -> streamed chunk
store -> cosine top-k retrieval for the fixed query set. Prints ONE JSON
line with store counts, per-query hit counts, and timings.

Usage:
    python -m web_search_engine_ray.jobs.rag_job \
        --input /root/testdata/sf0.001 --out /tmp/rag_store
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="sf dir containing documents.parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--window", type=int, default=64)
    ap.add_argument("--stride", type=int, default=32)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--topk", type=int, default=5)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    from web_search_engine_ray.pipelines.rag import build_rag_store, rag_topk
    from web_search_engine_ray.pipelines.serving import FIXED_QUERIES

    t0 = time.perf_counter()
    store = build_rag_store(
        args.input, args.out, window=args.window, stride=args.stride, dim=args.dim
    )
    t1 = time.perf_counter()
    hits = rag_topk(args.out, FIXED_QUERIES, topk=args.topk)
    t2 = time.perf_counter()
    from collections import Counter

    qids = hits["query_id"].to_pylist()
    per_q = {str(k): v for k, v in sorted(Counter(qids).items())}
    print(
        json.dumps(
            {
                "out_dir": args.out,
                "n_chunks": store["n_chunks"],
                "store_resumed": store["resumed"],
                "n_queries": len(FIXED_QUERIES),
                "n_hits": len(qids),
                "hits_per_query": per_q,
                "build_s": round(t1 - t0, 3),
                "query_s": round(t2 - t1, 3),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
