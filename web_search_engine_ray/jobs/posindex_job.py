"""Positional-index build job (the ``ray job submit`` entry for phrase
search): sharded (term, docid, positions) parquet from a documents table.

    python -m web_search_engine_ray.jobs.posindex_job \
        --input <sf_dir> --out <dir> [--num-shards 8]

Prints one JSON line with shard/row counts. The output directory feeds
``serve.py --pos-index`` (PHRASE mode) and ``pipelines/phrase.py`` query
helpers."""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir containing documents.parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-shards", type=int, default=8)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    from web_search_engine_ray.pipelines.phrase import build_positional_index

    t0 = time.perf_counter()
    stats = build_positional_index(args.input, args.out, n_shards=args.num_shards)
    stats["seconds"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(stats))
    ray.shutdown()


if __name__ == "__main__":
    main()
