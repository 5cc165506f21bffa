"""Sketch ops: HLL register correctness, estimate error bound vs exact,
merge associativity; deterministic sample vs its SQL twin."""

import numpy as np
import pytest

from web_search_engine_ray.pipelines.sketch import (
    HLL_P,
    _hll_estimate,
    _hll_registers,
)

SF = "/root/testdata/sf0.001"


def _scalar_rank(h: int, p: int) -> tuple[int, int]:
    idx = h >> (64 - p)
    rest = (h << p) & ((1 << 64) - 1)
    if rest == 0:
        return idx, 64 - p + 1
    lz = 64 - rest.bit_length()
    return idx, lz + 1


def test_hll_registers_match_scalar():
    rng = np.random.default_rng(5)
    hs = rng.integers(0, 2**63, 500, dtype=np.int64).view(np.uint64)
    # adversarial values: zeros after shift, near powers of two
    extra = np.array(
        [0, 1, 2**52 - 1, 2**52, 2**63 - 1, 2**63, (1 << 64) - 1], dtype=np.uint64
    )
    hs = np.concatenate([hs, extra])
    regs = _hll_registers(hs, HLL_P)
    want = np.zeros(1 << HLL_P, dtype=np.uint8)
    for h in hs:
        i, r = _scalar_rank(int(h), HLL_P)
        want[i] = max(want[i], r)
    assert np.array_equal(regs, want)


def test_hll_merge_associative():
    rng = np.random.default_rng(9)
    a = rng.integers(0, 2**64, 1000, dtype=np.uint64)
    b = rng.integers(0, 2**64, 1000, dtype=np.uint64)
    merged = np.maximum(_hll_registers(a), _hll_registers(b))
    together = _hll_registers(np.concatenate([a, b]))
    assert np.array_equal(merged, together)


def test_hll_estimate_error():
    rng = np.random.default_rng(11)
    n = 50_000
    hs = rng.integers(0, 2**64, n, dtype=np.uint64)  # full-range uniform
    hs = np.unique(hs)
    est = _hll_estimate(_hll_registers(hs))
    assert abs(est - hs.size) / hs.size < 0.05


def test_hll_distinct_terms_vs_exact(ray_session):
    import duckdb

    from web_search_engine_ray.pipelines.sketch import hll_distinct_terms

    est = hll_distinct_terms(SF).to_pandas()["estimate"][0]
    exact = duckdb.sql(
        f"""SELECT count(DISTINCT term) FROM (
              SELECT unnest(regexp_extract_all(lower(text),
                '[a-z0-9]+(?:[.-][a-z0-9]+)*')) AS term
              FROM read_parquet('{SF}/documents.parquet'))"""
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.05


def test_sample_docs_matches_sql(ray_session):
    import duckdb

    from web_search_engine_ray.pipelines.sketch import sample_docs

    got = sample_docs(SF, k=50).to_pandas()["docid"].tolist()
    want = [
        r[0]
        for r in duckdb.sql(
            f"""SELECT doc_id FROM read_parquet('{SF}/documents.parquet')
                ORDER BY md5_number_lower(doc_id::VARCHAR), doc_id LIMIT 50"""
        ).fetchall()
    ]
    assert got == sorted(want)
    # determinism
    assert got == sample_docs(SF, k=50).to_pandas()["docid"].tolist()


def test_sample_per_type_matches_sql(ray_session):
    import duckdb

    from web_search_engine_ray.pipelines.sketch import sample_per_type

    got = sample_per_type(SF, k=5).to_pandas()
    want = duckdb.sql(
        f"""SELECT event_type, event_id FROM (
              SELECT event_type, event_id,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY md5_number_lower(event_id::VARCHAR), event_id) AS rn
              FROM read_parquet('{SF}/events.parquet'))
            WHERE rn <= 5 ORDER BY event_type, event_id"""
    ).df()
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_knn_lsh_subset_of_exact(ray_session):
    """LSH-bucketed kNN: every returned neighbor carries the true cosine and
    appears with the same value in the exhaustive result's candidate space;
    deterministic across runs."""
    from web_search_engine_ray.pipelines.similarity import knn_cosine, lsh_bucketed_knn

    exact = knn_cosine(SF, n_queries=3, topk=10).to_pandas()
    em = {(q, v): c for q, v, c in exact.itertuples(index=False)}
    a = lsh_bucketed_knn(SF, n_queries=3, topk=10).to_pandas()
    b = lsh_bucketed_knn(SF, n_queries=3, topk=10).to_pandas()
    assert a.equals(b)
    for q, v, c in a.itertuples(index=False):
        if (q, v) in em:  # shared pairs must agree on the cosine exactly
            assert em[(q, v)] == pytest.approx(c, abs=1e-9)


def test_cms_one_sided_and_merge_linear():
    from web_search_engine_ray.pipelines.sketch import _cms_query, _cms_update

    rng = np.random.default_rng(2)
    words = [f"w{i}" for i in range(3000)]
    c1 = {w: int(rng.integers(1, 50)) for w in words[:2000]}
    c2 = {w: int(rng.integers(1, 50)) for w in words[1000:]}
    merged = _cms_update(c1) + _cms_update(c2)  # linear sketch: sum == union
    total = {w: c1.get(w, 0) + c2.get(w, 0) for w in words}
    est = _cms_query(merged, words)
    true = np.array([total[w] for w in words])
    assert np.all(est >= true)  # CountMin never underestimates
    # CMS tail bound: P(err > 2e*N/w) <= e^-d per query (~1.8% at d=4)
    n = true.sum()
    bound = 2 * np.e * n / 4096
    assert (est - true <= bound).mean() > 1 - 2 * np.exp(-4)


def test_heavy_hitters_contains_true_topk(ray_session):
    import duckdb

    from web_search_engine_ray.pipelines.sketch import heavy_hitter_terms

    got = heavy_hitter_terms(SF, k=10).to_pandas()
    true = duckdb.sql(
        f"""SELECT term, count(*)::BIGINT AS cf FROM (
              SELECT unnest(regexp_extract_all(lower(text),
                '[a-z0-9]+(?:[.-][a-z0-9]+)*')) AS term
              FROM read_parquet('{SF}/documents.parquet'))
            GROUP BY term ORDER BY cf DESC, term LIMIT 10"""
    ).df()
    # the sketch's top-10 must contain every true top-10 term, and estimates
    # never undercount the truth
    true_counts = dict(zip(true["term"], true["cf"]))
    got_terms = set(got["term"])
    assert set(true["term"]) <= got_terms
    for t, e in zip(got["term"], got["cf_est"]):
        if t in true_counts:
            assert e >= true_counts[t]


def test_hybrid_rerank_shape_and_determinism(ray_session):
    """Two-stage BM25 -> cosine rerank: deterministic, k2-bounded per query,
    reranked docids are a subset of the BM25 top-k1 recall set."""
    from web_search_engine_ray.pipelines.serving import (
        documents_searcher,
        hybrid_rerank_table,
    )

    a = hybrid_rerank_table(SF, k1=30, k2=5).to_pandas()
    b = hybrid_rerank_table(SF, k1=30, k2=5).to_pandas()
    assert a.equals(b)
    s = documents_searcher(SF)
    for qid, grp in a.groupby("query_id"):
        assert len(grp) <= 5
        from web_search_engine_ray.pipelines.serving import FIXED_QUERIES

        recall = {
            d for d, _ in s.bm25_topk(
                FIXED_QUERIES[qid], topk=30, mode="OR", tie_semantics="sorted"
            )
        }
        assert set(grp["docid"]) <= recall
        # rerank order: cos non-increasing (the table sorts by FULL-precision
        # cosine before rounding, so the rounded column alone can't pin the
        # docid tiebreak)
        g = grp.reset_index(drop=True)
        for i in range(len(g) - 1):
            assert g["cos"][i] >= g["cos"][i + 1]


def test_sample_fast_hash_path(ray_session):
    """hash_fn='fast': pure-numpy splitmix priorities — k rows,
    deterministic, and a valid (different) uniform sample; md5 stays the
    oracle default."""
    import pytest as _pytest

    from web_search_engine_ray.pipelines.sketch import (
        sample_docs,
        sample_per_type,
    )

    a = sample_docs(SF, k=50, hash_fn="fast")
    b = sample_docs(SF, k=50, hash_fn="fast")
    assert a.num_rows == 50 and a.equals(b)
    md5 = sample_docs(SF, k=50)
    assert set(a["docid"].to_pylist()) != set(md5["docid"].to_pylist())

    s1 = sample_per_type(SF, k=5, hash_fn="fast")
    s2 = sample_per_type(SF, k=5, hash_fn="fast")
    assert s1.equals(s2) and s1.num_rows > 0

    with _pytest.raises(ValueError, match="hash_fn"):
        sample_docs(SF, k=5, hash_fn="sha1")


def test_dl_quantiles_planted(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_search_engine_ray.pipelines.sketch import dl_quantiles_ds

    d = tmp_path / "q"
    d.mkdir()
    # lengths 1..10, one doc each: rank rule -> q=0.5 -> rank 5 -> dl 5
    texts = ["w " * n for n in range(1, 11)]
    t = pa.table(
        {
            "doc_id": pa.array(range(10), pa.int64()),
            "text": pa.array([s.strip() for s in texts], pa.string()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    got = dl_quantiles_ds(str(d), qs=(0.1, 0.5, 1.0)).to_pandas()
    assert list(zip(got.q, got.dl)) == [(0.1, 1), (0.5, 5), (1.0, 10)]


# ---------------------------------------------- mergeable quantile summary


def test_compress_weighted_preserves_weight_and_bounds_rank_error():
    from web_search_engine_ray.pipelines.sketch import _compress_weighted

    rng = np.random.default_rng(17)
    v = rng.normal(size=50_000)
    w = np.ones(v.size, dtype=np.int64)
    k = 256
    cv, cw = _compress_weighted(v, w, k)
    assert cw.sum() == v.size
    assert cv.size <= k
    assert np.all(np.diff(cv) >= 0)
    # one compression moves any rank by at most W/k
    sv = np.sort(v)
    for q in (0.1, 0.5, 0.9):
        rank = int(np.ceil(q * v.size))
        est = cv[np.searchsorted(cw.cumsum(), rank)]
        true_rank = np.searchsorted(sv, est, side="right")
        assert abs(true_rank - rank) <= v.size / k + 1


def test_compress_weighted_small_input_exact():
    from web_search_engine_ray.pipelines.sketch import _compress_weighted

    v = np.array([3.0, 1.0, 2.0])
    w = np.array([1, 5, 2], dtype=np.int64)
    cv, cw = _compress_weighted(v, w, 10)
    assert list(cv) == [1.0, 2.0, 3.0]
    assert list(cw) == [5, 2, 1]


def test_value_quantile_sketch_vs_exact(ray_session):
    import pyarrow.parquet as pq

    from web_search_engine_ray.pipelines.sketch import value_quantile_sketch_ds

    t = value_quantile_sketch_ds(SF)
    vals = pq.read_table(SF + "/events.parquet", columns=["value"])["value"].to_numpy(
        zero_copy_only=False
    )
    vals = np.sort(vals[~np.isnan(vals)])
    n = vals.size
    qs = t["q"].to_pylist()
    ests = t["value_est"].to_pylist()
    assert len(qs) == 8
    for q, est in zip(qs, ests):
        # normalized rank error bound: (max_batch + N) / (k * N) plus
        # slack, in rank-INTERVAL form — with tied values a returned
        # value covers [lt, le]/n of normalized rank, and q must fall in
        # that interval (+/- tol); the point form |le/n - q| fails on
        # rank-correct estimates inside wide tie runs (adversarial gate)
        lo = np.searchsorted(vals, est, side="left") / n
        hi = np.searchsorted(vals, est, side="right") / n
        assert lo - 0.01 <= q <= hi + 0.01, (q, est, lo, hi)


def test_top_terms_per_source_matches_sql(ray_session):
    import duckdb

    from web_search_engine_ray.pipelines.corpus import top_terms_per_source_ds

    mine = (
        top_terms_per_source_ds(SF, 5)
        .to_pandas()
        .sort_values(["source", "rank"])
        .reset_index(drop=True)
    )
    pat = "[a-z0-9]+(?:[.-][a-z0-9]+)*"
    want = duckdb.sql(
        f"""
        WITH tok AS (SELECT source,
                            unnest(regexp_extract_all(lower(text), '{pat}')) AS term
                     FROM read_parquet('{SF}/documents.parquet')),
         cnt AS (SELECT source, term, count(*)::BIGINT AS cf
                 FROM tok GROUP BY source, term)
        SELECT source, term, cf, rn::BIGINT AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY source ORDER BY cf DESC, term) AS rn
              FROM cnt)
        WHERE rn <= 5 ORDER BY source, rank
        """
    ).df()
    assert mine["source"].tolist() == want["source"].tolist()
    assert mine["term"].tolist() == want["term"].tolist()
    assert mine["cf"].tolist() == want["cf"].tolist()
    assert mine["rank"].tolist() == want["rank"].tolist()


def test_hll_twin_raw_estimate_branch(ray_session, oracle_eq, tmp_path):
    """The driver tables' ~31-term vocabulary only exercises the twin's
    linear-counting branch; a planted 30k-term corpus drives the raw
    alpha-corrected estimate branch and must still match engine == twin."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod
    from web_search_engine_ray.pipelines.sketch import hll_distinct_terms

    d = tmp_path / "hllbig"
    d.mkdir()
    texts = [
        " ".join(f"tok{i}x{j}" for j in range(100)) for i in range(300)
    ]  # 30,000 distinct tokens >> 2.5 * 4096
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = hll_distinct_terms(str(d)).to_pandas()
    est = float(got["estimate"][0])
    assert abs(est - 30_000) / 30_000 < 0.05  # ~1.6% std error at p=12
    assert est > 2.5 * 4096  # the raw branch, not linear counting
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    oracle_eq(
        got, con.sql(entrymod.oracle_sql()["distinct_terms_hll"]).df()
    )
