"""Deletion lifecycle on the partitioned index: tombstoned docids vanish from
results immediately; after compaction the index is EXACT over the surviving
corpus (N/avgdl/df recomputed, docids preserved); appends continue from the
fixed docid space end; a second compaction with no new deletes is a no-op.

The reference engine has no deletion path (full rebuild only); the contract
here is the Lucene segment model re-expressed over range indexes.
"""

import glob
import json
import os

import numpy as np
import pytest

from web_search_engine_ray.pipelines.build import build_index
from web_search_engine_ray.pipelines.distributed import (
    PartitionedSearcher,
    build_partitioned_index,
    compact_deletes,
    delete_docs,
    load_deletes,
)
from web_search_engine_ray.pipelines.query import Searcher

QUERIES = ["the data", "w0001 w0002", "data data", "w0003 w0004 w0005"]
CFG = dict(partition_rows=400, num_shards=4, n_salts=3, block_size=16)


@pytest.fixture(scope="module")
def deleted_pair(ray_session, small_corpus_dir, tmp_path_factory):
    """(partitioned-with-deletes dir, equivalent single-index dir, deleted ids)."""
    part = str(tmp_path_factory.mktemp("del_part"))
    m = build_partitioned_index(small_corpus_dir, part, n_ranges=3, **CFG)
    n = int(m["n_docs"])
    deleted = sorted(set(range(3, n, 7)) | {0, n - 1})
    return part, m, deleted


def _single_minus(small_corpus_dir, out, deleted):
    """Oracle: one single-process index built with the same delete mask."""
    return build_index(small_corpus_dir, out, delete_docids=tuple(deleted), **CFG)


def test_tombstones_hide_docs_immediately(deleted_pair):
    part, m, deleted = deleted_pair
    delete_docs(part, deleted)
    assert load_deletes(part) == deleted
    ps = PartitionedSearcher(part)
    try:
        dels = set(deleted)
        for q in QUERIES:
            for mode in ("OR", "AND"):
                got = ps.bm25_topk(q, topk=10, mode=mode)
                assert not (dels & {d for d, _ in got}), (q, mode)
    finally:
        ps.shutdown()


def test_delete_docs_validates_range(deleted_pair):
    part, m, _ = deleted_pair
    with pytest.raises(ValueError, match="outside"):
        delete_docs(part, [int(m.get("docid_end", m["n_docs"])) + 5])


def test_compaction_exact_vs_filtered_build(
    deleted_pair, small_corpus_dir, tmp_path_factory
):
    part, m0, deleted = deleted_pair
    delete_docs(part, deleted)
    m1 = compact_deletes(part)
    # tombstones consumed; alive count shrank; docid space end unchanged
    assert load_deletes(part) == []
    assert m1["n_docs"] == m0["n_docs"] - len(deleted)
    assert m1.get("docid_end", None) == m0["n_docs"]

    single = str(tmp_path_factory.mktemp("del_single"))
    b = _single_minus(small_corpus_dir, single, deleted)
    assert b["n_docs"] == m1["n_docs"]
    assert b["n_deleted"] == len(deleted)
    s = Searcher(single)
    assert s.N == m1["n_docs"]
    assert s.avgdl == pytest.approx(m1["avgdl"], rel=1e-12)

    ps = PartitionedSearcher(part)
    try:
        for q in QUERIES:
            for mode in ("OR", "AND"):
                got = ps.bm25_topk(q, topk=10, mode=mode)
                want = s.bm25_topk(q, topk=10, mode=mode, tie_semantics="sorted")
                assert got == want, (q, mode)
                assert not (set(deleted) & {d for d, _ in got})
    finally:
        ps.shutdown()


def test_recompaction_is_resumed_noop(deleted_pair):
    part, _, deleted = deleted_pair
    delete_docs(part, deleted)
    compact_deletes(part)
    # re-tombstone the same ids: every partition fingerprint (which includes
    # the delete-set hash) matches, so the rebuild resumes through
    delete_docs(part, deleted)
    m2 = compact_deletes(part)
    assert load_deletes(part) == []
    for r in m2["ranges"]:
        lo, hi = r["docid_span"]
        assert r.get("deleted_docids", []) == [d for d in deleted if lo <= d < hi]


def test_deleted_dl_slots_stay_dense(small_corpus_dir, tmp_path_factory, ray_session):
    """The dl store still resolves every SURVIVING docid after a masked build
    (deleted slots are dl=0 placeholders, never consulted)."""
    from web_search_engine_ray.state.docstats import DocLengths

    out = str(tmp_path_factory.mktemp("dense_dl"))
    full = str(tmp_path_factory.mktemp("dense_dl_full"))
    bf = build_index(small_corpus_dir, full, **CFG)
    n = int(bf["n_docs"])
    deleted = list(range(0, n, 5))
    _single_minus(small_corpus_dir, out, deleted)
    dl_del = DocLengths(os.path.join(out, "doclens"))
    dl_full = DocLengths(os.path.join(full, "doclens"))
    ids = np.arange(n, dtype=np.uint64)
    got = dl_del.get_many(ids)
    want = dl_full.get_many(ids)
    mask = np.ones(n, dtype=bool)
    mask[deleted] = False
    assert np.array_equal(got[mask], want[mask])
    assert (got[~mask] == 0).all()
    assert dl_del.N == n - len(deleted)


def test_append_after_compaction(
    ray_session, small_corpus_dir, tmp_path_factory
):
    """Delete + compact, then append new docs: new docids start at the FIXED
    docid space end (not the shrunken alive count), and results equal a
    single index over (original minus deleted) + appended."""
    from web_search_engine_ray.pipelines.distributed import append_range_index

    files = sorted(glob.glob(small_corpus_dir + "/*.parquet"))
    assert len(files) >= 3
    part = str(tmp_path_factory.mktemp("del_grow"))
    m0 = build_partitioned_index(files[:-1], part, n_ranges=2, **CFG)
    end0 = int(m0["docid_end"])
    deleted = list(range(1, end0, 9))
    delete_docs(part, deleted)
    compact_deletes(part)
    m1 = append_range_index(part, files[-1:], **CFG)
    assert m1["ranges"][-1]["docid_span"][0] == end0
    assert m1["docid_end"] > end0
    n_app = m1["ranges"][-1]["n_docs"]
    assert m1["n_docs"] == end0 - len(deleted) + n_app

    single = str(tmp_path_factory.mktemp("del_grow_single"))
    build_index(small_corpus_dir, single, delete_docids=tuple(deleted), **CFG)
    s = Searcher(single)
    assert s.N == m1["n_docs"]
    ps = PartitionedSearcher(part)
    try:
        for q in QUERIES:
            got = ps.bm25_topk(q, topk=10, mode="OR")
            want = s.bm25_topk(q, topk=10, mode="OR", tie_semantics="sorted")
            assert got == want, q
    finally:
        ps.shutdown()


def test_partitioned_json_has_no_stale_fields(deleted_pair):
    part, _, _ = deleted_pair
    with open(os.path.join(part, "partitioned.json")) as f:
        m = json.load(f)
    spans = [tuple(r["docid_span"]) for r in m["ranges"]]
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b == c
    assert spans[-1][1] == m["docid_end"]


def test_optimize_ranges_preserves_everything(
    ray_session, small_corpus_dir, tmp_path_factory
):
    """append x2 -> delete+compact -> optimize to 2 ranges: results identical
    before/after, old segment dirs gone, pending tombstones refused."""
    from web_search_engine_ray.pipelines.distributed import (
        append_range_index,
        optimize_ranges,
    )

    files = sorted(glob.glob(small_corpus_dir + "/*.parquet"))
    assert len(files) >= 3
    part = str(tmp_path_factory.mktemp("opt_idx"))
    m = build_partitioned_index(files[:2], part, n_ranges=2, **CFG)
    m = append_range_index(part, files[2:3], **CFG)
    assert len(m["ranges"]) == 3
    deleted = list(range(2, int(m["docid_end"]), 11))
    delete_docs(part, deleted)

    with pytest.raises(ValueError, match="pending tombstones"):
        optimize_ranges(part, 2)

    compact_deletes(part)
    ps = PartitionedSearcher(part)
    try:
        before = {
            (q, mode): ps.bm25_topk(q, topk=10, mode=mode)
            for q in QUERIES
            for mode in ("OR", "AND")
        }
    finally:
        ps.shutdown()
    m1 = json.load(open(os.path.join(part, "partitioned.json")))
    old_dirs = [r["dir"] for r in m1["ranges"]]

    m2 = optimize_ranges(part, 2)
    assert len(m2["ranges"]) == 2
    assert m2["n_docs"] == m1["n_docs"]
    assert m2["total_tokens"] == m1["total_tokens"]
    assert m2["docid_end"] == m1["docid_end"]
    spans = [tuple(r["docid_span"]) for r in m2["ranges"]]
    assert spans[0][0] == 0 and spans[-1][1] == m2["docid_end"]
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b == c
    for d in old_dirs:
        assert not os.path.exists(d)
    # cumulative deletions carried into the merged segments
    carried = sorted(x for r in m2["ranges"] for x in r.get("deleted_docids", []))
    assert carried == deleted

    ps = PartitionedSearcher(part)
    try:
        for key, want in before.items():
            got = ps.bm25_topk(key[0], topk=10, mode=key[1])
            assert got == want, key
    finally:
        ps.shutdown()

    # idempotent below target
    m3 = optimize_ranges(part, 2)
    assert [r["dir"] for r in m3["ranges"]] == [r["dir"] for r in m2["ranges"]]


def test_compaction_swaps_generation_dirs(
    ray_session, small_corpus_dir, tmp_path_factory
):
    """compact_deletes rebuilds into fresh ``_c<gen>`` dirs and swaps the
    manifest atomically (optimize_ranges' crash-safety contract): the old
    range dirs are gone only after the swap, and a second compaction bumps
    the generation."""
    part = str(tmp_path_factory.mktemp("del_gen"))
    m0 = build_partitioned_index(small_corpus_dir, part, n_ranges=2, **CFG)
    old_dirs = [r["dir"] for r in m0["ranges"]]
    n = int(m0["n_docs"])

    delete_docs(part, list(range(0, n, 9)))
    m1 = compact_deletes(part)
    assert m1["compact_gen"] == 1
    for r, old in zip(m1["ranges"], old_dirs):
        assert r["dir"] == old + "_c1"
        assert os.path.isdir(r["dir"])
        assert not os.path.exists(old)  # removed only after the swap

    # second round: new deletions -> gen 2; dirs swap again
    delete_docs(part, list(range(1, n, 17)))
    m2 = compact_deletes(part)
    assert m2["compact_gen"] == 2
    for r, old in zip(m2["ranges"], old_dirs):
        assert r["dir"] == old + "_c1_c2"
        assert os.path.isdir(r["dir"])
        assert not os.path.exists(old + "_c1")

    # still exact vs the filtered single build
    deleted = sorted(set(range(0, n, 9)) | set(range(1, n, 17)))
    single = str(tmp_path_factory.mktemp("del_gen_single"))
    _single_minus(small_corpus_dir, single, deleted)
    s = Searcher(single)
    ps = PartitionedSearcher(part)
    try:
        for q in QUERIES:
            got = ps.bm25_topk(q, topk=10, mode="OR")
            want = s.bm25_topk(q, topk=10, mode="OR", tie_semantics="sorted")
            assert got == want, q
    finally:
        ps.shutdown()


def test_tombstone_overfetch_is_bounded_and_exact(
    ray_session, small_corpus_dir, tmp_path_factory
):
    """A LARGE uncompacted tombstone set: results equal stale-stats scoring
    filtered post-hoc (the tombstone contract), while the searcher's fetch
    depth stays near topk instead of topk + len(dels)."""
    from web_search_engine_ray.pipelines.distributed import RangeSearcher

    part = str(tmp_path_factory.mktemp("del_big"))
    m = build_partitioned_index(small_corpus_dir, part, n_ranges=1, **CFG)
    n = int(m["n_docs"])
    dels = list(range(0, n, 2))  # half the corpus tombstoned

    rs = RangeSearcher(m["ranges"][0]["dir"])
    calls = []
    inner = rs.s.bm25_topk

    def spy(query, topk=10, **kw):
        calls.append(topk)
        return inner(query, topk=topk, **kw)

    rs.s.bm25_topk = spy
    full = Searcher(m["ranges"][0]["dir"])
    df_g = {t: full.df(t) for q in QUERIES for t in q.split()}
    for q in QUERIES:
        calls.clear()
        got = rs.topk(q, 10, "OR", full.N, full.avgdl, df_g, exclude=dels)
        # oracle: full stale-stats ranking, filtered, cut
        want = [
            h
            for h in full.bm25_topk(q, topk=n, mode="OR", tie_semantics="sorted")
            if int(h[0]) not in set(dels)
        ][:10]
        assert got == want, q
        # bounded: every fetch depth well under topk + len(dels)
        assert max(calls) < 10 + len(dels) / 4, (q, calls)
