"""Interleaved A/B of the positional-index position codec at 2M-doc scale:
plain list<int32> vs delta-gap varbyte (the round-4 format), same session,
alternating legs (P, V, P, V) so host drift hits both sides equally.

Reports per-leg build wall, on-disk bytes, and asserts the two indexes give
identical phrase answers on the fixed query set.

Usage: python tools/poscodec_ab.py [n_shards]  (run alone — bench
discipline: never measure concurrently with other work)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.dedup_stress import ensure_documents


def dir_bytes(d: str) -> int:
    return sum(os.path.getsize(p) for p in glob.glob(os.path.join(d, "*.parquet")))


def main() -> None:
    import ray

    n_shards = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    docs = ensure_documents()
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    import pyarrow as pa

    from web_search_engine_ray.functions.tokenize import token_lists
    from web_search_engine_ray.pipelines import phrase
    from web_search_engine_ray.pipelines.serving import FIXED_QUERIES

    dirs = {"plain": "/tmp/wse_ab_pos_plain", "vb": "/tmp/wse_ab_pos_vb"}
    legs: list[dict] = []
    for rep in range(2):
        for codec in ("plain", "vb"):
            out = dirs[codec]
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.perf_counter()
            stats = phrase.build_positional_index(
                docs, out, n_shards=n_shards, codec=codec
            )
            wall = time.perf_counter() - t0
            legs.append(
                {
                    "codec": codec,
                    "rep": rep,
                    "wall_s": round(wall, 1),
                    "n_rows": stats["n_rows"],
                    "bytes": dir_bytes(out),
                }
            )
            print(json.dumps(legs[-1]), flush=True)

    # identical answers from both surviving indexes
    n_checked = 0
    for q in FIXED_QUERIES:
        terms = token_lists(pa.array([q], pa.string())).to_list()[0] or []
        dp, cp = phrase.phrase_match_counts(dirs["plain"], list(terms), n_shards)
        dv, cv = phrase.phrase_match_counts(dirs["vb"], list(terms), n_shards)
        assert list(dp) == list(dv) and list(cp) == list(cv), f"mismatch on {q!r}"
        n_checked += 1
    import numpy as np

    summary = {
        "plain_wall_s": [x["wall_s"] for x in legs if x["codec"] == "plain"],
        "vb_wall_s": [x["wall_s"] for x in legs if x["codec"] == "vb"],
        "plain_bytes": legs[0]["bytes"],
        "vb_bytes": legs[1]["bytes"],
        "bytes_ratio": round(legs[0]["bytes"] / legs[1]["bytes"], 3),
        "queries_identical": n_checked,
    }
    summary["wall_ratio_mean"] = round(
        float(np.mean(summary["plain_wall_s"]))
        / float(np.mean(summary["vb_wall_s"])),
        3,
    )
    print(json.dumps(summary), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
