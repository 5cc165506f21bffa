"""2M-scale stress cards for the round-3/4 newcomers (BASELINE.md table):
RAG store build + retrieval, conversation packing, episode split,
positional index build, spell variant-map build — wall time + driver RSS,
the same discipline as tools/dedup_stress.py.

Inputs: the 2M-turn / 444k-conversation bench corpus
(/tmp/wse_bench_corpus_c444000_t8_r8000, generated/cached here if missing)
and its documents-table conversion (tools/dedup_stress.ensure_documents).

Usage: python tools/stress_r4.py  (prints one line per op; run alone —
bench discipline: never measure concurrently with other work)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.dedup_stress import DOCS_DIR, SRC, _driver_rss_mb, ensure_documents


def ensure_corpus() -> str:
    # gate on the marker, not the dir: an interrupted generation must not
    # silently feed a truncated corpus into the stress numbers
    if not os.path.exists(os.path.join(SRC, ".complete")):
        from web_search_engine_ray.fixtures.transcripts import write_corpus

        write_corpus(SRC, n_convs=444_000, max_turns=8, rows_per_file=8000)
        with open(os.path.join(SRC, ".complete"), "w") as f:
            f.write("ok")
    return SRC


def main() -> None:
    import ray

    corpus = ensure_corpus()
    docs = ensure_documents()
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    from web_search_engine_ray.pipelines import grep, phrase, rag, transcripts_ops
    from web_search_engine_ray.pipelines.build import build_index
    from web_search_engine_ray.pipelines.query import Searcher
    from web_search_engine_ray.pipelines.serving import FIXED_QUERIES
    from web_search_engine_ray.pipelines.spell import SpellIndex

    rag_dir = "/tmp/wse_stress_rag"
    tri_dir = "/tmp/wse_stress_triidx"
    shutil.rmtree(tri_dir, ignore_errors=True)
    pos_dir = "/tmp/wse_stress_posidx"
    idx_dir = "/tmp/wse_stress_idx"
    shutil.rmtree(rag_dir, ignore_errors=True)
    shutil.rmtree(pos_dir, ignore_errors=True)
    shutil.rmtree(idx_dir, ignore_errors=True)

    searcher_box: dict = {}

    def build_idx():
        r = build_index(
            corpus, idx_dir, partition_rows=32_000, num_shards=64, n_salts=8,
            heavy_df_frac=0.5, resume=False,
        )
        searcher_box["s"] = Searcher(idx_dir)
        return r["n_postings"]

    ops = [
        ("rag_store_build_2M", lambda: rag.build_rag_store(docs, rag_dir)["n_chunks"]),
        ("rag_topk_2M", lambda: rag.rag_topk(rag_dir, FIXED_QUERIES, topk=5).num_rows),
        (
            "conv_pack_2M",
            lambda: transcripts_ops.pack_conversations_ds(corpus).count(),
        ),
        (
            "conv_episode_split_2M",
            lambda: transcripts_ops.conversation_episode_split_ds(corpus).count(),
        ),
        (
            # 64 shards: the per-shard sort+write is the bottleneck, and 16
            # partitions underfill 32 CPUs (measured 170.8 s at 16 shards vs
            # 77.5 s at 64 on identical code; BASELINE.md round-4 table)
            "posindex_build_2M",
            lambda: phrase.build_positional_index(docs, pos_dir, n_shards=64)["n_rows"],
        ),
        ("index_build_2M (spell input)", build_idx),
        (
            "spell_map_build_2M",
            lambda: SpellIndex.from_searcher(searcher_box["s"]).n_shards,
        ),
        (
            "spell_suggest_after_build",
            lambda: SpellIndex.from_searcher(searcher_box["s"]).suggest("dta"),
        ),
        (
            "trigram_index_build_2M",
            lambda: grep.build_trigram_index(docs, tri_dir, n_shards=64)[
                "n_trigrams"
            ],
        ),
        (
            # templated clone corpus = worst case for a containment join
            # (few distinct shingles, giant lists): max_bucket=64 is the
            # logged skew guard, same discipline as the LSH stress
            "containment_dups_2M_guarded",
            lambda: __import__(
                "web_search_engine_ray.pipelines.dedup", fromlist=["d"]
            ).containment_dups(docs, tau=0.8, max_bucket=64).count(),
        ),
        (
            "trigram_grep_queries_2M",  # 5 substrings + 4 regexes, pruned
            lambda: grep.substring_search_table(
                docs, n_shards=64, index_dir=tri_dir
            ).num_rows
            + grep.regex_search_table(
                docs, n_shards=64, index_dir=tri_dir
            ).num_rows,
        ),
    ]
    only = sys.argv[1] if len(sys.argv) > 1 else None
    if only:
        ops = [(n, f) for n, f in ops if only in n]
    for name, fn in ops:
        t0 = time.time()
        n = fn()
        print(
            f"{name}: {time.time() - t0:.1f}s -> {n} "
            f"(driver_rss={_driver_rss_mb():.0f}MB)",
            flush=True,
        )
    ray.shutdown()


if __name__ == "__main__":
    main()
