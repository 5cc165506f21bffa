"""Checkpoint/resume + parallelism-invariance tests (SURVEY.md §5.5-5.6).

The index bytes must be a pure function of (corpus, config): invariant to
partitioning, task order, and resume-after-crash."""

import glob
import hashlib
import json
import os

import pytest

from web_search_engine_ray.pipelines.build import build_index
from web_search_engine_ray.pipelines.query import Searcher

CFG = dict(num_shards=4, n_salts=3, block_size=16, heavy_df_frac=0.05)


def _index_digest(out: str) -> dict[str, str]:
    sigs = {}
    for p in sorted(glob.glob(os.path.join(out, "index", "shard_*"))):
        with open(p, "rb") as f:
            sigs[os.path.basename(p)] = hashlib.sha256(f.read()).hexdigest()
    with open(os.path.join(out, "doclens", "stats.json")) as f:
        sigs["stats.json"] = f.read()
    return sigs


@pytest.fixture(scope="module")
def base_build(ray_session, small_corpus_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("resume_base"))
    build = build_index(small_corpus_dir, out, partition_rows=700, **CFG)
    return out, build, _index_digest(out)


def test_partitioning_invariance(ray_session, small_corpus_dir, tmp_path_factory, base_build):
    """Different partition_rows -> byte-identical index shards."""
    _, base, base_sigs = base_build
    out2 = str(tmp_path_factory.mktemp("resume_alt"))
    build2 = build_index(small_corpus_dir, out2, partition_rows=311, **CFG)
    assert build2["n_postings"] == base["n_postings"]
    assert build2["heavy_terms"] == base["heavy_terms"]
    assert _index_digest(out2) == base_sigs


def test_rerun_skips_everything(ray_session, small_corpus_dir, base_build):
    out, _, base_sigs = base_build
    mtimes = {p: os.path.getmtime(p) for p in glob.glob(out + "/index/shard_*")}
    build2 = build_index(small_corpus_dir, out, partition_rows=700, **CFG)
    # all partitions skipped; shards untouched
    for p, t in mtimes.items():
        assert os.path.getmtime(p) == t, f"shard rewritten on clean rerun: {p}"
    assert _index_digest(out) == base_sigs
    man = [json.load(open(p)) for p in glob.glob(out + "/manifests/run_*.json")]
    assert man and all(os.path.exists(out + f"/runs/run_{m['pid']:06d}.parquet") for m in man)


def test_crash_resume_rebuilds_only_missing(ray_session, small_corpus_dir, base_build):
    out, _, base_sigs = base_build
    # simulate a crash: lose two run partitions (data + manifest) and the
    # whole merge output
    runs = sorted(glob.glob(out + "/runs/run_*.parquet"))
    assert len(runs) >= 2
    for victim in runs[:2]:
        pid = victim.split("run_")[-1].split(".")[0]
        os.remove(victim)
        os.remove(out + f"/manifests/run_{pid}.json")
    for p in glob.glob(out + "/index/shard_*"):
        os.remove(p)
    os.remove(out + "/build.json")

    intact = sorted(set(glob.glob(out + "/runs/run_*.parquet")))
    mtimes = {p: os.path.getmtime(p) for p in intact}
    build2 = build_index(small_corpus_dir, out, partition_rows=700, **CFG)
    # intact runs were not rebuilt
    for p, t in mtimes.items():
        assert os.path.getmtime(p) == t
    # final artifacts identical to the uninterrupted build
    assert _index_digest(out) == base_sigs
    s = Searcher(out)
    assert s.N == build2["n_docs"]
    assert s.df("the") > 0
