"""TF-IDF cosine "more like this" (doc-to-doc similarity)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def mlt_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("mlt_docs")
    texts = [
        "spark join order window",     # 0: source
        "spark join order window",     # 1: exact clone of 0 -> cosine 1
        "spark join merge",            # 2: partial overlap
        "unrelated filler words here", # 3: no shared term with 0
        "order window small",          # 4: partial overlap
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_mlt_planted(ray_session, mlt_corpus):
    from web_search_engine_ray.pipelines.serving import more_like_this_table

    t = more_like_this_table(mlt_corpus, source_docids=[0], topk=10)
    rows = list(zip(t["docid"].to_pylist(), t["score"].to_pylist(), strict=True))
    ids = [r[0] for r in rows]
    # self excluded; clone first with cosine 1; doc3 shares nothing
    assert 0 not in ids and 3 not in ids
    assert ids[0] == 1
    assert rows[0][1] == pytest.approx(1.0, abs=1e-9)
    # all cosines in (0, 1]
    assert all(0.0 < sc <= 1.0 + 1e-12 for _, sc in rows)
    # partial overlaps present, ordered by score desc then docid
    scores = [sc for _, sc in rows]
    assert scores == sorted(scores, reverse=True) or len(set(scores)) < len(scores)


def test_mlt_norms_match_manual(ray_session, mlt_corpus):
    import math

    import numpy as np

    from web_search_engine_ray.pipelines.serving import _tfidf_norms

    norms = _tfidf_norms(mlt_corpus)
    # doc 3: terms unrelated/filler/words/here each tf=1 df=1, N=5
    w = math.log(5.0 / 1.0)
    assert norms[3] == pytest.approx(math.sqrt(4 * w * w), abs=1e-12)
    assert np.all(norms > 0)


def test_mlt_gate_matches_oracle(ray_session, oracle_eq):
    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    got = entrymod.queries()["more_like_this"](sf).to_pandas()
    want = con.sql(entrymod.oracle_sql()["more_like_this"]).df()


    oracle_eq(got, want)


# -- vector-space ranking -------------------------------------------------------


def test_vsm_hand_computed(ray_session, mlt_corpus):
    import math

    from web_search_engine_ray.pipelines.serving import (
        _tfidf_norms,
        vsm_topk_table,
    )

    got = vsm_topk_table(mlt_corpus, queries=["spark join"]).to_pandas()
    # docs 0/1 are identical 'spark join order window' -> equal scores;
    # doc3 shares nothing -> absent
    assert set(got.docid) == {0, 1, 2}
    s01 = got[got.docid.isin([0, 1])].score
    assert s01.iloc[0] == s01.iloc[1]
    # manual cosine for doc2 ('spark join merge'): both terms tf=1
    norms = _tfidf_norms(mlt_corpus)
    idf_s = math.log(5.0 / 3.0)  # spark in docs 0,1,2
    idf_j = math.log(5.0 / 3.0)  # join in docs 0,1,2
    qnorm = math.sqrt(idf_s**2 + idf_j**2)
    dot = idf_s * idf_s + idf_j * idf_j
    want = round(dot / (qnorm * norms[2]), 6)
    assert float(got[got.docid == 2].score.iloc[0]) == want


def test_vsm_matches_oracle(ray_session, oracle_eq):
    import duckdb

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    oracle_eq(
        entrymod.queries()["vsm_topk"](sf),
        con.sql(entrymod.oracle_sql()["vsm_topk"]).df(),
    )
