"""S10 interop: pickled whole-index export matches the oracle dict, and a
reference pickle migrates back into a rank-identical native index."""

import os

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built_index(ray_session, tmp_path_factory):
    from web_search_engine_ray.pipelines.build import build_index

    out = str(tmp_path_factory.mktemp("s10_idx"))
    build_index(
        os.path.join(SF, "documents.parquet"),
        out,
        partition_rows=200,
        num_shards=4,
    )
    return out


def _oracle():
    from web_search_engine_ray.oracle import OracleIndex

    rows = pq.read_table(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    )
    return OracleIndex.build(
        list(zip(rows["doc_id"].to_pylist(), rows["text"].to_pylist()))
    )


def test_export_matches_oracle_dicts(ray_session, built_index, tmp_path):
    from web_search_engine_ray.state.pickled import (
        export_pickled_index,
        load_pickled_index,
    )
    import pickle

    ip = str(tmp_path / "index.pkl")
    dp = str(tmp_path / "doc_lengths.pkl")
    rep = export_pickled_index(built_index, ip, dp)
    oracle = _oracle()
    idx = load_pickled_index(ip)
    assert idx == oracle.index  # exact reference in-memory shape
    with open(dp, "rb") as f:
        dls = pickle.load(f)
    assert dls == oracle.doc_lengths
    assert rep["n_terms"] == len(oracle.index)


def test_export_refuses_oversized(ray_session, built_index, tmp_path):
    from web_search_engine_ray.state.pickled import export_pickled_index

    with pytest.raises(ValueError, match="caps at"):
        export_pickled_index(
            built_index, str(tmp_path / "x.pkl"), max_postings=10
        )


def test_pickle_to_run1_to_native_rank_identity(
    ray_session, built_index, tmp_path
):
    from web_search_engine_ray.pipelines.legacy import build_index_from_runs
    from web_search_engine_ray.pipelines.query import Searcher
    from web_search_engine_ray.state.pickled import (
        export_pickled_index,
        pickled_index_to_run1,
    )

    ip = str(tmp_path / "index.pkl")
    export_pickled_index(built_index, ip)
    run_dir = tmp_path / "runs"
    run_dir.mkdir()
    n = pickled_index_to_run1(ip, str(run_dir / "migrated.run"))
    assert n > 0
    out = str(tmp_path / "migrated_idx")
    import json

    with open(os.path.join(built_index, "build.json")) as f:
        n_docs = json.load(f)["n_docs"]
    build_index_from_runs(str(run_dir), out, n_docs=n_docs, num_shards=4)
    s0, s1 = Searcher(built_index), Searcher(out)
    for q in ["the data", "w0001 w0002", "spark join"]:
        assert s0.bm25_topk(q, 10, "OR") == s1.bm25_topk(q, 10, "OR"), q
