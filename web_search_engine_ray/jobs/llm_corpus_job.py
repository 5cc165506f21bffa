"""``ray job submit`` entry for the END-TO-END LLM corpus curation chain:

    quality gate + exact dedup -> near-dup removal -> PII redaction ->
    benchmark decontamination -> train/val/test split -> partitioned
    parquet per split.

Staged and resumable (each stage writes a ``_done.json`` marker; re-runs
skip matching stages and fail loudly on parameter drift). Prints ONE JSON
line of per-stage stats.

Usage:
    python -m web_search_engine_ray.jobs.llm_corpus_job \
        --input /root/testdata/sf0.001 --out /tmp/llm_corpus
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
    ap.add_argument("--tau", type=float, default=0.8, help="near-dup jaccard threshold")
    ap.add_argument("--holdout-max-docid", type=int, default=100)
    ap.add_argument("--ngram-n", type=int, default=8)
    ap.add_argument("--val-pct", type=int, default=10)
    ap.add_argument("--test-pct", type=int, default=10)
    ap.add_argument("--n-parts", type=int, default=16)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    from web_search_engine_ray.pipelines.corpus_job import run_llm_corpus_job

    t0 = time.perf_counter()
    stats = run_llm_corpus_job(
        args.input,
        args.out,
        min_tokens=args.min_tokens,
        max_stop_ratio=args.max_stop_ratio,
        tau=args.tau,
        holdout_max_docid=args.holdout_max_docid,
        ngram_n=args.ngram_n,
        val_pct=args.val_pct,
        test_pct=args.test_pct,
        n_parts=args.n_parts,
    )
    stats["seconds"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(stats))
    ray.shutdown()


if __name__ == "__main__":
    main()
