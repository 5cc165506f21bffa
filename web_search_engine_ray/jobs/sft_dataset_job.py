"""``ray job submit`` entry for the transcripts -> SFT dataset chain:

    conversation exact dedup + minhash near-dup removal ->
    SFT example construction (per-assistant-turn context/target) ->
    conversation-addressed train/val/test split -> parquet per split.

Staged and resumable (stage markers; parameter drift raises). Prints ONE
JSON line of per-stage stats.

Usage:
    python -m web_search_engine_ray.jobs.sft_dataset_job \
        --input <transcript corpus dir> --out /tmp/sft_dataset
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcript corpus dir")
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-context-turns", type=int, default=64)
    ap.add_argument("--val-pct", type=int, default=10)
    ap.add_argument("--test-pct", type=int, default=10)
    ap.add_argument("--n-parts", type=int, default=16)
    ap.add_argument(
        "--drop-malformed",
        action="store_true",
        help="also drop conversations failing the structure gate "
        "(start user / end assistant / no empty turns / contiguous turn_idx)",
    )
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    from web_search_engine_ray.pipelines.corpus_job import run_sft_dataset_job

    t0 = time.perf_counter()
    stats = run_sft_dataset_job(
        args.input,
        args.out,
        max_context_turns=args.max_context_turns,
        val_pct=args.val_pct,
        test_pct=args.test_pct,
        n_parts=args.n_parts,
        drop_malformed=args.drop_malformed,
    )
    stats["seconds"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(stats))
    ray.shutdown()


if __name__ == "__main__":
    main()
