"""Distributed Ray build vs single-process oracle: postings, stats, and
query rank-identity (the reference's own conformance strategy,
``HW2/engine/testrun.py:106-136`` + ``searcher.py:253-287``)."""

import glob
import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from web_search_engine_ray.oracle import OracleIndex
from web_search_engine_ray.pipelines.build import build_index
from web_search_engine_ray.pipelines.query import Searcher

QUERIES = [
    "the",                      # heavy stopword
    "the data",                 # heavy + medium, AND nonempty
    "w0001 w0002",              # mid-frequency pair
    "w0040 w0111",              # rarer pair
    "u.s",                      # dotted token (corpus form)
    "u.s.",                     # query form that does NOT match (asymmetry)
    "3.14 the",
    "data data",                # duplicated query term -> double contribution
    "zzzznotaterm",             # unknown only
    "the zzzznotaterm",         # unknown mixed in (silently dropped)
    "Machine LEARNING",         # case-insensitive query path
    "v1.2-beta",
    "w0003 w0004 w0005",        # 3-term
    # the reference's literal benchmark query set (HW2/benchmark.txt
    # boolean-vs-DAAT section) — rank identity must hold on these exact
    # strings regardless of which terms the synthetic corpus contains
    "overturned carriage",
    "communication policy",
    "manhattan project bomb",
    "u.s policy",
    "3.14 math",
]


@pytest.fixture(scope="session")
def built(ray_session, small_corpus_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index_small"))
    build = build_index(
        small_corpus_dir,
        out,
        partition_rows=700,
        num_shards=4,
        n_salts=3,
        block_size=16,
        heavy_df_frac=0.05,
    )
    return out, build


@pytest.fixture(scope="session")
def oracle(small_corpus_dir):
    rows = []
    for f in sorted(glob.glob(small_corpus_dir + "/*.parquet")):
        rows.extend(pq.read_table(f, columns=["text"])["text"].to_pylist())
    return OracleIndex.build(list(enumerate(rows)))


def test_build_manifest_counts(built, oracle):
    _, build = built
    assert build["n_docs"] == oracle.N
    assert build["total_tokens"] == sum(oracle.doc_lengths.values())
    assert build["n_postings"] == sum(len(p) for p in oracle.index.values())
    assert build["n_terms"] == len(oracle.index)
    assert build["heavy_terms"], "expected heavy stopwords at this scale"
    assert "the" in build["heavy_terms"]


def test_corpus_stats(built, oracle):
    out, _ = built
    s = Searcher(out)
    assert s.N == oracle.N
    assert s.avgdl == pytest.approx(oracle.avgdl, rel=1e-12)


def test_doc_lengths_match(built, oracle):
    out, _ = built
    s = Searcher(out)
    dl = s.doclens.dense()
    for docid, want in oracle.doc_lengths.items():
        assert dl[docid] == want
    assert (dl == 0).sum() > 0, "corpus should contain dl=0 docs"


def test_all_postings_match(built, oracle):
    """Full decoded-postings equality for EVERY term (incl. salted heavy)."""
    out, build = built
    s = Searcher(out)
    assert set(build["heavy_terms"]) <= set(oracle.index)
    for term, postings in oracle.index.items():
        d, f = s.postings(term)
        want_d, want_f = oracle.postings(term)
        assert d.tolist() == want_d, f"docids mismatch for {term!r}"
        assert f.tolist() == want_f, f"tfs mismatch for {term!r}"
    # and no phantom terms
    assert s.postings("zzzznotaterm")[0].size == 0


def test_df_and_heavy_routing(built, oracle):
    out, build = built
    s = Searcher(out)
    for term in ["the", "data", "w0001"]:
        assert s.df(term) == oracle.df(term)
    for t in build["heavy_terms"]:
        assert s._shard_of(t) >= build["num_shards"]


def _norm(res):
    return sorted(((d, round(s, 9)) for d, s in res), key=lambda x: (-x[1], x[0]))


def test_daat_rank_identity(built, oracle):
    out, _ = built
    s = Searcher(out)
    for q in QUERIES:
        for mode in ("OR", "AND"):
            got = s.search_topk_daat(q, topk=10, mode=mode)
            want = oracle.ranked_daat(q, topk=10, mode=mode)
            assert [d for d, _ in _norm(got)] == [d for d, _ in _norm(want)], (q, mode)
            for (gd, gs), (wd, ws) in zip(_norm(got), _norm(want)):
                assert gs == pytest.approx(ws, rel=1e-9), (q, mode, gd)


def test_vectorized_equals_daat_loop(built):
    out, _ = built
    s = Searcher(out)
    for q in QUERIES:
        for mode in ("OR", "AND"):
            fast = s.bm25_topk(q, topk=10, mode=mode)
            slow = sorted(
                s.search_topk_daat(q, topk=10, mode=mode), key=lambda x: (-x[1], x[0])
            )
            assert [d for d, _ in fast] == [d for d, _ in slow], (q, mode)
            for (fd, fs), (sd, ss) in zip(fast, slow):
                assert fs == ss or math.isclose(fs, ss, rel_tol=1e-12), (q, mode)


def test_wand_equals_exhaustive_daat(built):
    """Block-max WAND must return IDENTICAL top-k (docids and scores) to the
    exhaustive DAAT loop — the score-safety contract (SURVEY.md §7.1.6)."""
    out, _ = built
    s = Searcher(out)
    for q in QUERIES:
        for topk in (1, 3, 10, 50):
            wand = s.search_topk_wand(q, topk=topk)
            daat = sorted(
                s.search_topk_daat(q, topk=topk, mode="OR"),
                key=lambda x: (-x[1], x[0]),
            )
            assert [d for d, _ in wand] == [d for d, _ in daat], (q, topk)
            assert [sc for _, sc in wand] == [sc for _, sc in daat], (q, topk)


def test_taat_matches_oracle(built, oracle):
    out, _ = built
    s = Searcher(out)
    for q in QUERIES:
        for mode in ("AND", "OR"):
            got = _norm(s.search(q, mode=mode))
            want = _norm(oracle.search(q, mode=mode))
            assert [d for d, _ in got] == [d for d, _ in want], (q, mode)
            for (gd, gs), (wd, ws) in zip(got, want):
                assert gs == pytest.approx(ws, rel=1e-9)


def test_boolean_matches_oracle_and_daat(built, oracle):
    out, _ = built
    s = Searcher(out)
    for q in QUERIES:
        for mode in ("AND", "OR"):
            got = s.boolean(q, mode)
            want = oracle.boolean(q, mode)
            assert got == want, (q, mode)
            assert s.search_boolean_daat(q, mode) == want, (q, mode)


def test_unique_marker_terms(built, oracle):
    """df=1 markers resolve to exactly their own turn."""
    out, _ = built
    s = Searcher(out)
    markers = [t for t in oracle.index if t.startswith("uq")][:20]
    assert markers
    for m in markers:
        d, f = s.postings(m)
        assert d.size == 1 and f[0] >= 1
        assert s.boolean(m, "AND") == set(oracle.index[m])
