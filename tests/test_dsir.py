"""DSIR importance-weighting contracts (gate twin is the exact SQL; these
pin semantics on planted corpora)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from web_search_engine_ray.pipelines.dsir import _feature_buckets, dsir_weights_ds


@pytest.fixture(scope="module")
def dsir_dir(tmp_path_factory):
    """Target docs (id < 2) are about 'quantum physics'; raw docs either
    match the target vocabulary or are off-domain."""
    d = tmp_path_factory.mktemp("dsir")
    texts = [
        "quantum physics entangle qubit quantum physics",  # target
        "qubit decohere quantum gate physics",             # target
        "quantum physics qubit entangle",                  # raw, on-target
        "football soccer goal match referee",              # raw, off-target
        "quantum football physics soccer",                 # raw, mixed
        "",                                                # raw, featureless
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_dsir_orders_by_target_affinity(ray_session, dsir_dir):
    got = (
        dsir_weights_ds(dsir_dir, target_max_docid=2)
        .to_pandas()
        .set_index("docid")
    )
    # featureless raw doc absent; target docs never scored
    assert sorted(got.index) == [2, 3, 4]
    # on-target >> mixed >> off-target
    assert got.loc[2, "dsir_score"] > got.loc[4, "dsir_score"] > got.loc[3, "dsir_score"]
    assert got.loc[2, "dsir_score"] > 0 and got.loc[3, "dsir_score"] < 0


def test_dsir_matches_single_process_replay(ray_session, dsir_dir):
    import pyarrow.parquet as pq_

    from web_search_engine_ray.functions.tokenize import token_lists

    B, T = 512, 2
    t = pq_.read_table(dsir_dir + "/documents.parquet")
    toks = token_lists(t["text"]).to_list()
    ids = t["doc_id"].to_pylist()
    ct = np.zeros(B, np.int64)
    cr = np.zeros(B, np.int64)
    for did, tl in zip(ids, toks):
        f = _feature_buckets(tl or [], B).astype(np.int64)
        np.add.at(ct if did < T else cr, f, 1)
    lam = np.log((ct + 1.0) / (ct.sum() + B)) - np.log((cr + 1.0) / (cr.sum() + B))
    want = {}
    for did, tl in zip(ids, toks):
        if did < T:
            continue
        f = _feature_buckets(tl or [], B).astype(np.int64)
        if f.size:
            want[did] = round(float(lam[f].sum() / f.size), 6)

    got = (
        dsir_weights_ds(dsir_dir, target_max_docid=T, n_buckets=B)
        .to_pandas()
        .set_index("docid")["dsir_score"]
        .to_dict()
    )
    assert got == want


def test_feature_buckets_shapes():
    assert _feature_buckets([], 64).size == 0
    assert _feature_buckets(["a"], 64).size == 1           # unigram only
    assert _feature_buckets(["a", "b"], 64).size == 3      # 2 uni + 1 bi
    # deterministic
    assert (_feature_buckets(["x", "y"], 64) == _feature_buckets(["x", "y"], 64)).all()
