"""End-to-end LLM corpus curation job: staged chain, resume, determinism,
and the per-stage semantic contracts (near-dup survivors, decontamination,
split rule)."""

import glob
import hashlib
import json
import os

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def job_out(ray_session, tmp_path_factory):
    from web_search_engine_ray.pipelines.corpus_job import run_llm_corpus_job

    out = str(tmp_path_factory.mktemp("llmjob"))
    stats = run_llm_corpus_job(SF, out)
    return out, stats


def _read_all(d: str):
    rows = []
    for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
        rows.extend(pq.read_table(f).to_pylist())
    return rows


def test_counts_monotone_and_consistent(job_out):
    out, s = job_out
    assert (
        s["n_input"]
        >= s["n_after_quality_exact_dedup"]
        >= s["n_after_neardup"]
        == s["n_after_redact"]
        >= s["n_after_decontamination"]
        == s["n_final"]
        == sum(s["splits"].values())
    )
    assert s["n_final"] > 0


def test_neardup_survivor_rule(ray_session, job_out):
    """Every near-dup cluster of stage 1 keeps exactly its min docid."""
    from web_search_engine_ray.pipelines.graph import dedup_clusters_ds

    out, _ = job_out
    cc = dedup_clusters_ds(os.path.join(out, "s1_curated"), tau=0.8).to_pandas()
    kept = {r["docid"] for r in _read_all(os.path.join(out, "s2_neardup"))}
    for cid, grp in cc.groupby("cluster_id"):
        members = sorted(grp["docid"])
        assert members[0] in kept, (cid, members)
        for m in members[1:]:
            assert m not in kept, (cid, m)


def test_no_holdout_leakage(job_out):
    """No final doc is a holdout doc, and no final doc shares an 8-gram
    with the holdout (recomputed independently)."""
    import numpy as np

    from web_search_engine_ray.functions.tokenize import token_lists
    from web_search_engine_ray.pipelines.dedup import _shingle_hashes

    out, _ = job_out
    hold = pq.read_table(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pylist()
    import pyarrow as pa

    grams = []
    hold_texts = [r["text"] for r in hold if r["doc_id"] < 100]
    for t in hold_texts:
        toks = token_lists(pa.array([t or ""])).to_list()[0] or []
        grams.append(_shingle_hashes(list(toks), k=8))
    gset = np.unique(np.concatenate(grams)) if grams else np.empty(0, "uint64")
    for sp in ("train", "val", "test"):
        for r in _read_all(os.path.join(out, "final", sp)):
            assert r["docid"] >= 100
            toks = token_lists(pa.array([r["text"] or ""])).to_list()[0] or []
            hs = _shingle_hashes(list(toks), k=8)
            assert not np.isin(hs, gset).any(), r["docid"]


def test_split_rule_content_addressed(job_out):
    out, _ = job_out
    for sp, lo, hi in (("val", 0, 10), ("test", 10, 20), ("train", 20, 100)):
        for r in _read_all(os.path.join(out, "final", sp)):
            low64 = int.from_bytes(
                hashlib.md5((r["text"] or "").encode()).digest()[8:16], "little"
            )
            assert lo <= low64 % 100 < hi, (sp, r["docid"])


def test_resume_skips_and_drift_raises(ray_session, job_out):
    from web_search_engine_ray.pipelines.corpus_job import run_llm_corpus_job

    out, first = job_out
    again = run_llm_corpus_job(SF, out)
    assert again["splits"] == first["splits"]
    with pytest.raises(ValueError, match="different parameters"):
        run_llm_corpus_job(SF, out, tau=0.5)


def test_deterministic_across_fresh_runs(ray_session, job_out, tmp_path_factory):
    out, _ = job_out
    out2 = str(tmp_path_factory.mktemp("llmjob2"))
    from web_search_engine_ray.pipelines.corpus_job import run_llm_corpus_job

    run_llm_corpus_job(SF, out2)
    for sp in ("train", "val", "test"):
        a = _read_all(os.path.join(out, "final", sp))
        b = _read_all(os.path.join(out2, "final", sp))
        assert a == b


def test_stage_markers_written(job_out):
    out, _ = job_out
    for d in ("s1_curated", "s2_neardup", "s3_redacted", "s4_decontaminated", "final"):
        with open(os.path.join(out, d, "_done.json")) as f:
            m = json.load(f)
        assert m["n_rows"] >= 0


def test_input_drift_raises(ray_session, job_out):
    """Same out_dir, different input corpus: stage markers embed the input
    fingerprint, so the job raises instead of silently re-serving the old
    stage outputs (review finding: params-only markers reused stale data)."""
    from web_search_engine_ray.pipelines.corpus_job import run_llm_corpus_job

    out, _ = job_out
    with pytest.raises(ValueError, match="different parameters"):
        run_llm_corpus_job("/root/testdata/sf0.01", out)


def test_partial_stage_param_drift_raises(ray_session, tmp_path):
    """A crash-resume with different params must raise at stage START (the
    _params.json begin marker), never mix partitions from two runs."""
    import json

    from web_search_engine_ray.pipelines.corpus_job import _begin_stage

    d = str(tmp_path / "s2")
    _begin_stage(d, {"tau": 0.8})
    _begin_stage(d, {"tau": 0.8})  # same params: fine
    with pytest.raises(ValueError, match="partial stage"):
        _begin_stage(d, {"tau": 0.5})
