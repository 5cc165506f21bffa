"""RAG store contracts: deterministic hashed embeddings, exact-chunk
retrieval (a query equal to a chunk's text must rank that chunk first with
cosine ~1.0), resume + drift-guard semantics, zero-token queries."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_hash_embed_deterministic_and_normalized():
    from web_search_engine_ray.pipelines.rag import hash_embed_matrix

    texts = pa.chunked_array(
        [pa.array(["the quick brown fox", "", "the quick brown fox", "data spark"])]
    )
    M = hash_embed_matrix(texts, 32)
    assert M.shape == (4, 32) and M.dtype == np.float32
    assert np.array_equal(M[0], M[2])  # same text -> same vector
    assert np.linalg.norm(M[1]) == 0.0  # token-less -> zero vector
    for i in (0, 3):
        assert np.linalg.norm(M[i]) == pytest.approx(1.0, abs=1e-6)


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    from web_search_engine_ray.pipelines.rag import build_rag_store

    out = str(tmp_path_factory.mktemp("rag_store"))
    rep = build_rag_store(SF, out, window=16, stride=8)
    return out, rep


def test_store_build_resume_and_drift(store):
    from web_search_engine_ray.pipelines.rag import build_rag_store

    out, rep = store
    assert rep["n_chunks"] > 0 and rep["resumed"] is False
    rep2 = build_rag_store(SF, out, window=16, stride=8)
    assert rep2["resumed"] is True and rep2["n_chunks"] == rep["n_chunks"]
    with pytest.raises(ValueError, match="different parameters"):
        build_rag_store(SF, out, window=16, stride=4)


def test_exact_chunk_query_ranks_first(store):
    from web_search_engine_ray.pipelines.rag import rag_topk

    out, _ = store
    t = pq.read_table(os.path.join(out, "chunks.parquet"))
    # pick two chunks with >= 4 tokens as literal queries
    rows = t.to_pylist()
    probes = [r for r in rows if r["n_tokens"] >= 4][:2]
    assert probes
    res = rag_topk(out, [p["text"] for p in probes], topk=3).to_pandas()
    for qi, p in enumerate(probes):
        grp = res[res["query_id"] == qi]
        assert len(grp) == 3
        top = grp.iloc[0]
        assert top["cos"] == pytest.approx(1.0, abs=1e-5)
        # the probe chunk itself must be among the cos~1 hits (identical
        # token multisets elsewhere may tie at 1.0 with a smaller uid)
        ones = grp[grp["cos"] >= 1.0 - 1e-6]["vec_id"].tolist()
        assert p["chunk_uid"] in ones or top["vec_id"] == p["chunk_uid"]


def test_zero_token_query_returns_nothing(store):
    from web_search_engine_ray.pipelines.rag import rag_topk

    out, _ = store
    res = rag_topk(out, ["", "%%%"], topk=3).to_pandas()
    assert len(res) == 0


def test_rag_topk_deterministic(store):
    from web_search_engine_ray.pipelines.rag import rag_topk

    out, _ = store
    a = rag_topk(out, ["data spark merge"], topk=5).to_pandas()
    b = rag_topk(out, ["data spark merge"], topk=5).to_pandas()
    assert a.equals(b)
    assert (a["cos"].diff().dropna() <= 1e-12).all()  # sorted desc


def test_chunk_uid_roundtrip(store):
    from web_search_engine_ray.pipelines.rag import CHUNK_UID_SHIFT

    out, _ = store
    t = pq.read_table(os.path.join(out, "chunks.parquet"), columns=["chunk_uid", "docid", "chunk_idx"])
    uid = t["chunk_uid"].to_numpy()
    assert np.array_equal(uid >> CHUNK_UID_SHIFT, t["docid"].to_numpy())
    assert np.array_equal(uid & ((1 << CHUNK_UID_SHIFT) - 1), t["chunk_idx"].to_numpy())
