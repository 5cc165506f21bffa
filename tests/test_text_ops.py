"""Repetition signals + tf-idf keyword extraction (analysis/corpus)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def odd_docs_dir(tmp_path_factory):
    """Hand-built corpus with degenerate shapes: empty text, one token,
    all-same tokens, a clean high-diversity doc."""
    d = tmp_path_factory.mktemp("odd_docs")
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "",
                    "solo",
                    "spam spam spam spam spam spam",
                    "alpha beta gamma delta epsilon zeta",
                    "ab ab cd cd ab cd",
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_repetition_stats_edges(ray_session, odd_docs_dir):
    from web_search_engine_ray.pipelines.analysis import repetition_stats_ds

    rows = {r["docid"]: r for r in repetition_stats_ds(odd_docs_dir).take_all()}
    assert rows[0]["n_tokens"] == 0
    assert rows[0]["dup_word_ratio"] == 0.0 == rows[0]["dup_2gram_frac"]
    assert rows[1]["n_tokens"] == 1 and rows[1]["top_word_frac"] == 1.0
    assert rows[1]["dup_2gram_frac"] == 0.0  # no bigrams at all
    # all-same: 6 tokens 1 distinct; 5 bigrams 1 distinct
    assert rows[2]["dup_word_ratio"] == round(5 / 6, 6)
    assert rows[2]["top_word_frac"] == 1.0
    assert rows[2]["dup_2gram_frac"] == round(4 / 5, 6)
    # all-distinct doc: zero repetition
    assert rows[3]["dup_word_ratio"] == 0.0
    assert rows[3]["dup_2gram_frac"] == 0.0
    # ab ab cd cd ab cd: 6 tokens 2 distinct; bigrams (ab ab, ab cd, cd cd,
    # cd ab, ab cd) -> 5 total, 4 distinct
    assert rows[4]["dup_word_ratio"] == round(4 / 6, 6)
    assert rows[4]["dup_2gram_frac"] == round(1 / 5, 6)


def test_tfidf_topk_ranks_distinctive_terms(ray_session, odd_docs_dir):
    from web_search_engine_ray.pipelines.corpus import tfidf_topk_ds

    t = tfidf_topk_ds(odd_docs_dir, k=2).to_pandas()
    by_doc = {d: g for d, g in t.groupby("docid")}
    assert 0 not in by_doc  # empty doc has no terms
    # spam appears only in doc 2: idf = ln(5/1), tf 6 -> its only keyword
    spam = by_doc[2]
    assert list(spam["term"]) == ["spam"]
    # per-doc k cap respected, scores descending, ties broken by term asc
    for _, g in by_doc.items():
        assert len(g) <= 2
        s = list(g["tfidf"])
        assert s == sorted(s, reverse=True)
    doc4 = by_doc[4].reset_index(drop=True)
    # ab (tf 3) and cd (tf 3) tie exactly -> term order decides
    assert list(doc4["term"]) == ["ab", "cd"]


def test_collocations_planted(ray_session, tmp_path):
    """'new york' is a planted high-PMI pair; 'the of' co-occurs only as
    often as chance predicts and must rank below it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_search_engine_ray.pipelines.analysis import collocations_ds

    d = tmp_path / "coll"
    d.mkdir()
    texts = (
        ["new york city visit new york today"] * 6
        + ["the of and the of and filler words here"] * 6
        + ["random the words of scattered new text york apart"] * 6
    )
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    got = collocations_ds(str(d), min_count=5, k=50).to_pandas()
    pairs = list(zip(got.w1, got.w2))
    assert ("new", "york") in pairs
    ny = got[(got.w1 == "new") & (got.w2 == "york")].iloc[0]
    # "new york" occurs 12x adjacently vs scattered singles -> strong PMI
    assert ny.c_ab == 12 and ny.pmi > 0
    # pmi ranking is descending and the cut is deterministic
    assert list(got.pmi) == sorted(got.pmi, reverse=True)


# -- chi-square distinctive terms per source ----------------------------------


def test_distinctive_terms_planted(ray_session, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_search_engine_ray.pipelines.analysis import distinctive_terms_ds

    d = tmp_path_factory.mktemp("chi_docs")
    # 'alpha' only in source A docs, 'beta' only in B, 'common' everywhere
    rows = [
        ("A", "alpha common x"),
        ("A", "alpha common y"),
        ("B", "beta common x"),
        ("B", "beta common y"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "source": pa.array([r[0] for r in rows], pa.string()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = distinctive_terms_ds(str(d), k=2).to_pandas()
    top = got[got["rank"] == 1].set_index("source")
    # the perfectly-separating term wins each source with chi2 = N = 4
    assert top.loc["A", "term"] == "alpha" and top.loc["A", "chi2"] == 4.0
    assert top.loc["B", "term"] == "beta" and top.loc["B", "chi2"] == 4.0
    # 'common' is in every doc -> degenerate column (c+d == 0) -> chi2 0,
    # never outranking a separating term
    assert not ((got["term"] == "common") & (got["chi2"] > 0)).any()


def test_distinctive_terms_matches_oracle(ray_session, oracle_eq):
    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    got = entrymod.queries()["distinctive_terms"](sf).to_pandas()
    want = con.sql(entrymod.oracle_sql()["distinctive_terms"]).df()


    oracle_eq(got, want)


def test_langid_confusion_matches_oracle(ray_session, oracle_eq):
    import duckdb

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    got = entrymod.queries()["langid_confusion"](sf).to_pandas()
    want = con.sql(entrymod.oracle_sql()["langid_confusion"]).df()
    oracle_eq(got, want)
    # sanity: totals match the corpus size, truths are the 5 known langs
    assert got.n.sum() == 500
    assert set(got.lang) <= {"en", "de", "es", "fr", "zh"}


def test_burstiness_and_zipf(ray_session, oracle_eq, tmp_path_factory):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod
    from web_search_engine_ray.pipelines.analysis import (
        term_burstiness_ds,
        zipf_slope_table,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    for q in ["term_burstiness", "zipf_slope"]:
        got = entrymod.queries()[q](sf)
        oracle_eq(got, con.sql(entrymod.oracle_sql()[q]).df())

    # planted burstiness: 'bursty' tf 5 in one doc, tf 1 in 19 others
    # (df 20); 'even' tf 1 in 20 docs -> burstiness 0
    d = tmp_path_factory.mktemp("burst_docs")
    texts = ["bursty " * 5 + "even"] + ["bursty even"] * 19 + ["filler"] * 5
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = term_burstiness_ds(str(d)).to_pandas().set_index("term")
    assert got.loc["even", "burstiness"] == 0.0
    s1, s2, n = 5 + 19, 25 + 19, 20.0
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / n
    assert got.loc["bursty", "burstiness"] == round(var / mean, 6)
    assert got.loc["bursty", "burstiness"] > 0
    # zipf slope over a geometric cf profile is near the log-ratio
    z = zipf_slope_table(sf).to_pandas()
    assert z.iloc[0].n_terms >= 2 and z.iloc[0].slope < 0
