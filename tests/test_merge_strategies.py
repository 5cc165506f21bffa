"""mapside vs groupby merge strategies must produce byte-identical shards."""

import glob
import hashlib
import os

import pytest

from web_search_engine_ray.pipelines.build import build_index


def _digest(out):
    return {
        os.path.basename(p): hashlib.sha256(open(p, "rb").read()).hexdigest()
        for p in sorted(glob.glob(os.path.join(out, "index", "shard_*")))
    }


def test_strategies_byte_identical(ray_session, small_corpus_dir, tmp_path_factory):
    cfg = dict(num_shards=4, n_salts=3, block_size=16, heavy_df_frac=0.05, partition_rows=400)
    out_a = str(tmp_path_factory.mktemp("ms_mapside"))
    out_b = str(tmp_path_factory.mktemp("ms_groupby"))
    a = build_index(small_corpus_dir, out_a, merge_strategy="mapside", **cfg)
    b = build_index(small_corpus_dir, out_b, merge_strategy="groupby", **cfg)
    assert a["n_postings"] == b["n_postings"]
    assert a["heavy_terms"] == b["heavy_terms"] and a["heavy_terms"]
    da, db = _digest(out_a), _digest(out_b)
    assert da.keys() == db.keys()
    assert da == db
