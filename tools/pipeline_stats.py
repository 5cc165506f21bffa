"""Print Ray Data `ds.stats()` for the engine's busiest Dataset stages —
the measure-don't-guess loop for per-stage wall time, block sizes, and
task counts.

Usage: python tools/pipeline_stats.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    from web_search_engine_ray.pipelines import analysis, dedup

    print("=" * 72)
    print("minhash LSH candidate pipeline (bands -> pair exchange -> dedup)")
    print("=" * 72)
    # the exchange output is from_arrow_refs (no lineage), so show the
    # stats of the band-emission stage feeding the first exchange instead
    import ray.data

    bands = dedup._read_docs(sf_dir)
    n = dedup.minhash_lsh_candidates_ds(sf_dir).count()
    print(f"[{n} candidate pairs; stats below = corpus read feeding it]")
    m = bands.materialize()
    print(m.stats())

    print("=" * 72)
    print("lm_score pass 2 (model broadcast + per-batch distinct-bigram probe)")
    print("=" * 72)
    m = analysis.lm_score_ds(sf_dir).materialize()
    print(f"[{m.count()} scored docs]")
    print(m.stats())

    ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
