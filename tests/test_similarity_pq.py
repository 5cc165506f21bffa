"""PQ/ADC ANN: deterministic codebooks, ADC shortlist + exact rerank,
recall vs exact knn."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_pq_recall_vs_exact(ray_session):
    from web_search_engine_ray.pipelines.similarity import knn_cosine, pq_knn

    exact = knn_cosine(SF, n_queries=3, topk=10).to_pandas()
    approx = pq_knn(SF, n_queries=3, topk=10).to_pandas()
    # rerank is exact cosine: cos for shared (query, vec) pairs must agree
    em = {(q, v): c for q, v, c in exact.itertuples(index=False)}
    hits = 0
    for q, v, c in approx.itertuples(index=False):
        if (q, v) in em:
            hits += 1
            assert abs(em[(q, v)] - c) < 1e-9
    recall = hits / len(exact)
    assert recall >= 0.6, recall  # m=8/ksub=32 over dim=64; pinned floor


def test_pq_deterministic(ray_session):
    from web_search_engine_ray.pipelines.similarity import pq_knn

    a = pq_knn(SF, n_queries=2, topk=5).to_pandas()
    b = pq_knn(SF, n_queries=2, topk=5).to_pandas()
    assert a.equals(b)


def test_pq_codebook_shape_and_reconstruction():
    """Codebooks quantize the training sample with bounded error: the mean
    ADC self-score of a sample vector must sit close to its true norm
    contribution (a loose sanity bound; exactness comes from the rerank)."""
    from web_search_engine_ray.pipelines.similarity import _sample_matrix, _train_pq

    books = _train_pq(SF, m=8, ksub=32)
    assert books.shape == (8, 32, 8)
    S = _sample_matrix(SF, 256)
    dsub = books.shape[2]
    # encode the sample and measure quantization error per subspace
    err = 0.0
    for j in range(books.shape[0]):
        Sub = S[:, j * dsub : (j + 1) * dsub]
        d2 = ((Sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        err += d2.min(axis=1).mean()
    # normalized vectors have total energy 1; PQ should capture most of it
    assert err < 0.5, err


def test_pq_rejects_indivisible_m():
    import pytest

    from web_search_engine_ray.pipelines.similarity import _train_pq

    with pytest.raises(ValueError, match="not divisible"):
        _train_pq(SF, m=7, ksub=8)
