"""``ray job submit`` entry point for building the index from
reference-format run files (legacy TSV / binary RUN1, auto-detected —
SURVEY S4/S5 interop):

    ray job submit --working-dir . -- \\
        python -m web_search_engine_ray.jobs.legacy_job \\
        --runs /shared/reference_runs --out /shared/index \\
        --num-shards 4096 --n-salts 64

``--n-docs`` pins N when the runs cannot see trailing empty documents
(docids past the last posting); omitted, N = max docid + 1. Conversion is
resumable per source file; the merge resumes like the native build.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--runs", required=True, help="dir of legacy TSV / RUN1 run files"
    )
    ap.add_argument("--out", required=True, help="index output dir (shared storage)")
    ap.add_argument("--n-docs", type=int, default=None)
    ap.add_argument("--num-shards", type=int, default=64)
    ap.add_argument("--n-salts", type=int, default=8)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--codec", default="varbyte", choices=["varbyte", "raw"])
    ap.add_argument("--heavy-df-frac", type=float, default=0.05)
    ap.add_argument("--doclen-range-rows", type=int, default=100_000)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False)  # RAY_ADDRESS picks the cluster

    from web_search_engine_ray.pipelines.legacy import build_index_from_runs

    build = build_index_from_runs(
        args.runs,
        args.out,
        n_docs=args.n_docs,
        doclen_range_rows=args.doclen_range_rows,
        num_shards=args.num_shards,
        n_salts=args.n_salts,
        block_size=args.block_size,
        codec=args.codec,
        heavy_df_frac=args.heavy_df_frac,
        resume=not args.no_resume,
    )
    print(
        json.dumps(
            {
                "n_docs": build["n_docs"],
                "n_runs": build["n_runs"],
                "n_postings": build["n_postings"],
                "n_terms": build["n_terms"],
                "heavy_terms": len(build["heavy_terms"]),
                "timings": build["timings"],
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
