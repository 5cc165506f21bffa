"""``ray job submit`` entry for the composed curation pipeline: corpus in,
curated (deduped + quality-gated) corpus out as resumable partitioned
Parquet. Prints ONE JSON line.

Usage:
    python -m web_search_engine_ray.jobs.curate_job \
        --input /root/testdata/sf0.001 --out /tmp/curated
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="sf dir containing documents.parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--max-stop-ratio", type=float, default=0.6)
    ap.add_argument("--n-parts", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    from web_search_engine_ray.pipelines.curate import write_curated_corpus

    t0 = time.perf_counter()
    rep = write_curated_corpus(
        args.input,
        args.out,
        min_tokens=args.min_tokens,
        max_stop_ratio=args.max_stop_ratio,
        n_parts=args.n_parts,
    )
    rep["seconds"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(rep))
    ray.shutdown()


if __name__ == "__main__":
    main()
