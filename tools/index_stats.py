"""Index inspection: sizes, compression, posting distribution.

The reference publishes postings-file size, lexicon size, and per-codec
compression in README/benchmark.txt (``HW2/README.md:121-126``,
``benchmark.txt:422-442``); this is our equivalent, computed from the build
manifest + shard files.

Usage: python tools/index_stats.py <index_dir>
"""

from __future__ import annotations

import json
import os
import sys


def stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "build.json")) as f:
        build = json.load(f)
    shard_dir = os.path.join(index_dir, "index")
    post_bytes = lex_bytes = 0
    for name in os.listdir(shard_dir):
        p = os.path.join(shard_dir, name)
        if name.endswith(".postings"):
            post_bytes += os.path.getsize(p)
        elif name.endswith(".lexicon"):
            lex_bytes += os.path.getsize(p)
    doclen_dir = os.path.join(index_dir, "doclens")
    dl_bytes = sum(
        os.path.getsize(os.path.join(doclen_dir, f))
        for f in os.listdir(doclen_dir)
        if f.endswith(".parquet")
    )
    n_post = build["n_postings"]
    shards = build["shards"]
    normal = [s for s in shards if s["kind"] == "normal"]
    heavy = [s for s in shards if s["kind"] == "heavy"]
    out = {
        "codec": build["config"]["codec"],
        "n_docs": build["n_docs"],
        "n_terms": build["n_terms"],
        "n_postings": n_post,
        "postings_bytes": post_bytes,
        "bytes_per_posting": round(post_bytes / n_post, 3) if n_post else None,
        "lexicon_bytes": lex_bytes,
        "doclen_bytes": dl_bytes,
        "n_shards_normal": len(normal),
        "n_shards_heavy": len(heavy),
        "heavy_postings_frac": round(
            sum(s["n_postings"] for s in heavy) / n_post, 4
        )
        if n_post
        else None,
        "largest_shard_postings": max((s["n_postings"] for s in shards), default=0),
        "build_timings": build["timings"],
    }
    return out


if __name__ == "__main__":
    print(json.dumps(stats(sys.argv[1]), indent=2))
