"""S4/S5 interop: reference-format run files (legacy TSV + binary RUN1,
auto-detected) build the same index the native corpus path builds."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _corpus_postings():
    """Reference-semantics postings straight from the oracle tokenizer:
    term -> {docid: tf} over the sf0.001 documents."""
    from web_search_engine_ray.oracle import OracleIndex

    rows = pq.read_table(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    )
    docs = list(
        zip(rows["doc_id"].to_pylist(), rows["text"].to_pylist())
    )
    return OracleIndex.build(docs), docs


def _postings_table(oracle, docid_pred) -> pa.Table:
    terms, docids, tfs = [], [], []
    for term in sorted(oracle.index):
        for docid, tf in sorted(oracle.index[term].items()):
            if docid_pred(docid):
                terms.append(term)
                docids.append(docid)
                tfs.append(tf)
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "docid": pa.array(docids, pa.uint64()),
            "tf": pa.array(tfs, pa.uint32()),
        }
    )


@pytest.fixture(scope="module")
def legacy_run_dir(tmp_path_factory):
    """The corpus split into 4 runs by docid range: 2 TSV + 2 RUN1."""
    from web_search_engine_ray.sources.legacy_runs import (
        write_run1,
        write_tsv_run,
    )

    oracle, docs = _corpus_postings()
    d = tmp_path_factory.mktemp("legacy_runs")
    n = oracle.N
    cuts = [0, n // 4, n // 2, 3 * n // 4, n]
    for i in range(4):
        lo, hi = cuts[i], cuts[i + 1]
        t = _postings_table(oracle, lambda x: lo <= x < hi)
        if i % 2 == 0:
            write_tsv_run(t, str(d / f"run_{i}.tsv"))
        else:
            write_run1(t, str(d / f"run_{i}.run"))
    return str(d), n


def test_roundtrip_readers(legacy_run_dir):
    from web_search_engine_ray.sources.legacy_runs import (
        detect_run_format,
        read_legacy_run,
    )

    d, _ = legacy_run_dir
    files = sorted(glob.glob(d + "/*"))
    assert len(files) == 4
    oracle, _ = _corpus_postings()
    whole = _postings_table(oracle, lambda x: True)
    parts = []
    for f in files:
        fmt = detect_run_format(f)
        assert fmt == ("run1" if f.endswith(".run") else "tsv")
        parts.append(read_legacy_run(f))
    got = (
        pa.concat_tables(parts)
        .sort_by([("term", "ascending"), ("docid", "ascending")])
        .to_pandas()
    )
    want = whole.to_pandas()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["docid"].tolist() == want["docid"].tolist()
    assert got["tf"].tolist() == want["tf"].tolist()


def test_build_from_legacy_runs_matches_native(
    ray_session, legacy_run_dir, tmp_path
):
    """Index built from legacy runs == index built from the corpus:
    byte-identical shard files (same layout knobs, heavy salting off so the
    heavy-detection heuristics can't diverge) and identical BM25 answers."""
    from web_search_engine_ray.pipelines.build import build_index
    from web_search_engine_ray.pipelines.legacy import build_index_from_runs
    from web_search_engine_ray.pipelines.query import Searcher

    d, n_docs = legacy_run_dir
    nat = str(tmp_path / "native")
    leg = str(tmp_path / "legacy")
    build_index(
        os.path.join(SF, "documents.parquet"),
        nat,
        partition_rows=200,
        num_shards=4,
        heavy_df_frac=0,
    )
    b = build_index_from_runs(
        d, leg, n_docs=n_docs, num_shards=4, heavy_df_frac=0
    )
    assert b["n_docs"] == n_docs

    for kind in ("postings", "lexicon"):
        for f in sorted(glob.glob(os.path.join(nat, "index", f"*.{kind}"))):
            g = os.path.join(leg, "index", os.path.basename(f))
            with open(f, "rb") as a_, open(g, "rb") as b_:
                assert a_.read() == b_.read(), f

    sn, sl = Searcher(nat), Searcher(leg)
    assert sn.N == sl.N and sn.avgdl == sl.avgdl
    qset = ["the data", "w0001 w0002", "spark join", "nosuchterm data"]
    for q in qset:
        assert sn.bm25_topk(q, 10, "OR") == sl.bm25_topk(q, 10, "OR"), q
        assert sn.bm25_topk(q, 10, "AND") == sl.bm25_topk(q, 10, "AND"), q


def test_build_from_runs_with_heavy_salting(ray_session, legacy_run_dir, tmp_path):
    """With heavy detection on, salted heavy terms still decode to the
    oracle's exact posting lists."""
    from web_search_engine_ray.pipelines.legacy import build_index_from_runs
    from web_search_engine_ray.pipelines.query import Searcher

    d, n_docs = legacy_run_dir
    out = str(tmp_path / "legacy_heavy")
    b = build_index_from_runs(
        d, out, n_docs=n_docs, num_shards=4, n_salts=4, heavy_df_frac=0.05
    )
    assert b["heavy_terms"], "fixture corpus should trip the heavy threshold"
    oracle, _ = _corpus_postings()
    s = Searcher(out)
    for t in b["heavy_terms"] + ["w0001", "data"]:
        if t not in oracle.index:
            continue
        dd, ff = s.postings(t)
        wd, wf = oracle.postings(t)
        assert dd.tolist() == wd and ff.tolist() == wf, t


def test_build_from_runs_resume(ray_session, legacy_run_dir, tmp_path):
    """Conversion is resumable per source file: a second build skips all
    conversions (manifest fingerprint) and rebuilds nothing."""
    from web_search_engine_ray.pipelines.legacy import build_index_from_runs

    d, n_docs = legacy_run_dir
    out = str(tmp_path / "legacy_resume")
    b1 = build_index_from_runs(d, out, n_docs=n_docs, num_shards=4)
    b2 = build_index_from_runs(d, out, n_docs=n_docs, num_shards=4)
    assert b1["build_fp"] == b2["build_fp"]
    assert b1["n_postings"] == b2["n_postings"]


def test_dl_from_runs_matches_token_counts(ray_session, legacy_run_dir, tmp_path):
    """dl(doc) from runs == the doc's token count (A5 rule), empty docs
    dl=0 but counted in N."""
    from web_search_engine_ray.pipelines.legacy import build_index_from_runs
    from web_search_engine_ray.state.docstats import DocLengths

    d, n_docs = legacy_run_dir
    out = str(tmp_path / "legacy_dl")
    build_index_from_runs(
        d, out, n_docs=n_docs, num_shards=4, doclen_range_rows=128
    )
    oracle, docs = _corpus_postings()
    dls = DocLengths(os.path.join(out, "doclens"))
    assert dls.N == n_docs
    got = dls.get_many(np.arange(n_docs, dtype=np.uint64))
    for docid in range(n_docs):
        want = sum(
            pl.get(docid, 0) for pl in oracle.index.values()
        )
        assert got[docid] == want, docid


def test_build_from_runs_refuses_stale_conversions(
    ray_session, legacy_run_dir, tmp_path
):
    """An out_dir holding conversions beyond the current source set must
    refuse — stale runs would silently fold foreign postings in."""
    import pytest as _pytest

    from web_search_engine_ray.pipelines.legacy import build_index_from_runs

    d, n_docs = legacy_run_dir
    out = str(tmp_path / "stale")
    files = sorted(glob.glob(d + "/*"))
    build_index_from_runs(files, out, n_docs=n_docs, num_shards=4)
    with _pytest.raises(ValueError, match="not in this source set"):
        build_index_from_runs(files[:2], out, n_docs=n_docs, num_shards=4)
