"""Interleaved HEAD-vs-pinned-tree A/B of conversation_minhash_dups at the
2M-turn / 444k-conversation card (H, B, H, B legs in one session, same
corpus cache) + a distributed pair-set checksum asserting the two trees
emit IDENTICAL candidate pairs.

Usage: python tools/conv_minhash_ab.py <baseline-tree>  (run alone —
bench discipline: never measure concurrently with other work)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEG = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
import ray
ray.init(address="local", include_dashboard=False)
import numpy as np
import polars as pl
import pyarrow as pa
from web_search_engine_ray.pipelines.transcripts_ops import (
    conversation_minhash_dups_ds,
)

corpus = sys.argv[2]
t0 = time.perf_counter()
ds = conversation_minhash_dups_ds(corpus, max_bucket=64)

def checksum(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return pa.table({"n": pa.array([0], pa.int64()),
                         "x": pa.array([0], pa.uint64())})
    h = pl.from_arrow(
        t["conv_a"].combine_chunks()
    ).cast(pl.Utf8) + "|" + pl.from_arrow(t["conv_b"].combine_chunks()).cast(pl.Utf8)
    hv = h.hash(seed=99).to_numpy()
    return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                     "x": pa.array([np.bitwise_xor.reduce(hv)], pa.uint64())})

parts = ds.map_batches(checksum, batch_format="pyarrow").to_pandas()
wall = time.perf_counter() - t0
n = int(parts["n"].sum())
x = 0
for v in parts["x"]:
    x ^= int(v)
print(json.dumps({"wall_s": round(wall, 1), "n_pairs": n, "xor": x}))
ray.shutdown()
"""


def run_leg(tree: str, corpus: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", LEG, os.path.abspath(tree), corpus],
        capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit("usage: python tools/conv_minhash_ab.py <baseline-tree>")
    base = sys.argv[1]
    from tools.stress_r4 import ensure_corpus

    corpus = ensure_corpus()
    legs = []
    for name, tree in (("head", "."), ("base", base),
                       ("head", "."), ("base", base)):
        r = run_leg(tree, corpus)
        r["leg"] = name
        legs.append(r)
        print(json.dumps(r))
    hs = [r for r in legs if r["leg"] == "head"]
    bs = [r for r in legs if r["leg"] == "base"]
    same = {(r["n_pairs"], r["xor"]) for r in legs}
    print(json.dumps({
        "metric": "conv_minhash_ab_2M",
        "head_walls": [r["wall_s"] for r in hs],
        "base_walls": [r["wall_s"] for r in bs],
        "pairs_identical": len(same) == 1,
        "n_pairs": legs[0]["n_pairs"],
    }))


if __name__ == "__main__":
    main()
