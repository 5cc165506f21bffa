"""Reproduce the BASELINE.md 2M-document dedup/sketch stress.

Converts the bench transcript corpus (generated/cached by bench.py --scaling:
/tmp/wse_bench_corpus_c444000_t8_r8000) into a documents table, then times
the dedup/sketch/analysis operators over it. Templated transcript text forms
huge duplicate clusters — the adversarial case for LSH banding — so the
skewed operators run with their logged ``max_bucket`` guard.

Usage: python tools/dedup_stress.py  (prints one timing line per op)
"""

from __future__ import annotations

import glob
import os
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/tmp/wse_bench_corpus_c444000_t8_r8000"
DOCS_DIR = "/tmp/wse_dedup_stress"


def ensure_documents() -> str:
    if not os.path.isdir(SRC):
        sys.exit(f"{SRC} missing — run `python bench.py --scaling` once to generate it")
    os.makedirs(DOCS_DIR, exist_ok=True)
    path = os.path.join(DOCS_DIR, "documents.parquet")
    if not os.path.exists(path):
        w = None
        base = 0
        for f in sorted(glob.glob(os.path.join(SRC, "*.parquet"))):
            t = pq.read_table(f, columns=["text"])
            out = pa.table(
                {
                    "doc_id": pa.array(range(base, base + t.num_rows), pa.int64()),
                    "text": t["text"],
                }
            )
            if w is None:
                w = pq.ParquetWriter(path, out.schema)
            w.write_table(out)
            base += t.num_rows
        w.close()
        print(f"built {base} docs")
    return DOCS_DIR


def _driver_rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main() -> None:
    import ray

    d = ensure_documents()
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    from web_search_engine_ray.pipelines import analysis, curate, dedup, sketch

    ops = [
        ("exact_dedup", lambda: dedup.exact_dedup_ds(d).count()),
        ("exact_dedup_fast", lambda: dedup.exact_dedup_ds(d, hash_fn="fast").count()),
        ("simhash_dups_guard64", lambda: dedup.simhash_dups(d, max_bucket=64).count()),
        ("minhash_guard64", lambda: dedup.minhash_lsh_candidates_ds(d, max_bucket=64).count()),
        # the full candidate->verify path: candidate pairs stay a Dataset
        # end-to-end, so driver RSS must stay FLAT even with ~20M pairs
        ("ngram_jaccard_guard64", lambda: dedup.ngram_jaccard_dups(d, max_bucket=64).count()),
        ("hll_distinct", lambda: sketch.hll_distinct_terms(d)["estimate"][0].as_py()),
        ("heavy_hitters", lambda: sketch.heavy_hitter_terms(d).num_rows),
        ("lm_score", lambda: analysis.lm_score_ds(d).count()),
        ("sample_docs", lambda: sketch.sample_docs(d).num_rows),
        ("curated_docs", lambda: curate.curated_docs_ds(d).count()),
    ]
    for name, fn in ops:
        t0 = time.time()
        n = fn()
        print(
            f"{name}: {time.time() - t0:.1f}s -> {n} "
            f"(driver_rss={_driver_rss_mb():.0f}MB)"
        )
    ray.shutdown()


if __name__ == "__main__":
    main()
