"""IVF ANN: deterministic quantizer, probe pruning, recall vs exact knn."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_ivf_recall_vs_exact(ray_session):
    from web_search_engine_ray.pipelines.similarity import ivf_knn, knn_cosine

    exact = knn_cosine(SF, n_queries=3, topk=10).to_pandas()
    approx = ivf_knn(SF, n_queries=3, topk=10, n_cells=16, nprobe=4).to_pandas()
    # cos values for shared (query, vec) pairs must agree with exact
    em = {(q, v): c for q, v, c in exact.itertuples(index=False)}
    hits = 0
    for q, v, c in approx.itertuples(index=False):
        if (q, v) in em:
            hits += 1
            assert abs(em[(q, v)] - c) < 1e-9
    recall = hits / len(exact)
    assert recall >= 0.5, recall  # nprobe=4/16 cells; pinned floor


def test_ivf_deterministic(ray_session):
    from web_search_engine_ray.pipelines.similarity import ivf_knn

    a = ivf_knn(SF, n_queries=2, topk=5).to_pandas()
    b = ivf_knn(SF, n_queries=2, topk=5).to_pandas()
    assert a.equals(b)


def test_centroids_normalized_and_bounded():
    from web_search_engine_ray.pipelines.similarity import _train_centroids

    C = _train_centroids(SF, n_cells=8)
    assert C.shape[0] == 8
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0, atol=1e-9)
