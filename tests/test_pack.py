"""Sequence-packing contracts: the distributed two-level prefix sum must be
a bijective re-expression of the serial scan — verified directly against a
single-process numpy replay, plus range-size invariance (the scan's answer
cannot depend on how ranges partition the corpus) and boundary semantics."""

import numpy as np

from web_search_engine_ray.functions.tokenize import tokenize
from web_search_engine_ray.pipelines.pack import pack_chunks_ds

SF = "/root/testdata/sf0.001"


def _serial(sf_dir, chunk):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    rows = sorted(
        zip(
            t["doc_id"].to_pylist(),
            (len(tokenize(x or "")) for x in t["text"].to_pylist()),
        )
    )
    out, off = {}, 0
    for did, n in rows:
        out[did] = (n, off, off // chunk, off % chunk)
        off += n
    return out


def test_matches_serial_scan(ray_session):
    got = pack_chunks_ds(SF, chunk_tokens=256).to_pandas()
    want = _serial(SF, 256)
    assert len(got) == len(want)
    for r in got.itertuples():
        n, start, cid, coff = want[r.docid]
        assert (r.n_tokens, r.start_tok, r.chunk_id, r.chunk_off) == (
            n,
            start,
            cid,
            coff,
        ), r.docid


def test_range_rows_invariance(ray_session):
    """The partitioning knob must not change the answer."""
    a = (
        pack_chunks_ds(SF, chunk_tokens=512, range_rows=7)
        .to_pandas()
        .sort_values("docid")
        .reset_index(drop=True)
    )
    b = (
        pack_chunks_ds(SF, chunk_tokens=512, range_rows=200)
        .to_pandas()
        .sort_values("docid")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_chunks_are_dense(ray_session):
    """Every chunk except the last must be exactly full: the max start_tok
    + its n_tokens spans all chunk ids contiguously from 0."""
    got = pack_chunks_ds(SF, chunk_tokens=1024).to_pandas()
    total = int(got["n_tokens"].sum())
    assert set(got["chunk_id"]) == set(range(got["chunk_id"].max() + 1))
    assert got["start_tok"].max() < total
    # offsets are consistent: start_tok == chunk_id * chunk + chunk_off
    assert (
        got["start_tok"] == got["chunk_id"] * 1024 + got["chunk_off"]
    ).all()
