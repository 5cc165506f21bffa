"""Curated-corpus sink: survivors match curated_docs_ds, text preserved,
atomic partitioned output, resume skips finished partitions."""

import glob
import os

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_write_curated_corpus_roundtrip(ray_session, tmp_path):
    from web_search_engine_ray.pipelines.curate import (
        curated_docs_ds,
        write_curated_corpus,
    )

    out = str(tmp_path / "curated")
    rep = write_curated_corpus(SF, out, n_parts=8)
    assert rep["n_files"] == 8 and rep["n_resumed"] == 0

    files = sorted(glob.glob(out + "/curated_*.parquet"))
    assert len(files) == 8
    rows = []
    for f in files:
        rows.extend(pq.read_table(f).to_pylist())
    got_ids = sorted(r["docid"] for r in rows)
    want_ids = sorted(curated_docs_ds(SF).to_pandas()["docid"])
    assert got_ids == want_ids
    assert rep["n_rows"] == len(want_ids)

    # text preserved exactly
    src = {
        r["doc_id"]: r["text"]
        for r in pq.read_table(
            os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
        ).to_pylist()
    }
    for r in rows:
        assert r["text"] == src[r["docid"]]

    # resume: second run rewrites nothing
    rep2 = write_curated_corpus(SF, out, n_parts=8)
    assert rep2["n_resumed"] == 8
    assert rep2["n_rows"] == rep["n_rows"]

    # resume after losing one partition: only that one is rebuilt
    os.remove(files[3])
    rep3 = write_curated_corpus(SF, out, n_parts=8)
    assert rep3["n_resumed"] == 7
    assert rep3["n_rows"] == rep["n_rows"]


def test_resume_refuses_on_routing_probe_change(ray_session, tmp_path):
    """The params fingerprint pins the partition routing via sentinel-hash
    probes; a tampered probe (standing in for a polars hash change across
    an upgrade) must refuse to resume rather than mix two routings."""
    import json

    import pytest as _pytest

    from web_search_engine_ray.pipelines.curate import write_curated_corpus

    out = str(tmp_path / "curated_probe")
    write_curated_corpus(SF, out, n_parts=4)
    fp_path = os.path.join(out, "_curation_params.json")
    with open(fp_path) as f:
        fp = json.load(f)
    assert "routing_probe" in fp and len(fp["routing_probe"]) == 3
    fp["routing_probe"] = [(p + 1) % 4 for p in fp["routing_probe"]]
    with open(fp_path, "w") as f:
        json.dump(fp, f)
    with _pytest.raises(ValueError, match="different parameters"):
        write_curated_corpus(SF, out, n_parts=4)
