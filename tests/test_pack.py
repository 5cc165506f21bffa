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


def test_chunk_docs_reconstruction_and_edges(ray_session, tmp_path):
    """Sliding-window chunks: chunk 0 starts at token 0; strided starts;
    ragged tail; token-less docs emit nothing; concatenating stride-prefixes
    of the chunks reconstructs the token stream."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_search_engine_ray.pipelines.pack import chunk_docs_ds

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    " ".join(f"w{i}" for i in range(10)),  # 10 toks: ragged tail
                    "",  # no tokens -> no chunks
                    " ".join(f"x{i}" for i in range(4)),  # window == len
                    "one",
                ]
            ),
        }
    )
    d = str(tmp_path / "chunk_docs")
    __import__("os").makedirs(d)
    pq.write_table(docs, d + "/documents.parquet")
    out = chunk_docs_ds(d, window=4, stride=2).to_pandas()

    assert set(out["docid"]) == {0, 2, 3}
    d0 = out[out["docid"] == 0].sort_values("chunk_idx")
    assert d0["start"].tolist() == [0, 2, 4, 6, 8]
    assert d0["n_tokens"].tolist() == [4, 4, 4, 4, 2]
    assert d0["text"].iloc[0] == "w0 w1 w2 w3"
    assert d0["text"].iloc[-1] == "w8 w9"
    # stride-prefix concat reconstructs the stream
    toks = []
    for _, r in d0.iterrows():
        toks.extend(r["text"].split()[:2])
    assert " ".join(toks)[: len("w0 w1 w2 w3")] == "w0 w1 w2 w3"
    d2 = out[out["docid"] == 2].sort_values("chunk_idx")
    assert d2["n_tokens"].tolist() == [4, 2]
    d3 = out[out["docid"] == 3]
    assert d3["text"].tolist() == ["one"]
