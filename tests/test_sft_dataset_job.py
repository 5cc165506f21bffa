"""Transcripts -> SFT dataset job: conversation dedup, conversation-addressed
splits (no conversation straddles train/val/test), resume."""

import glob
import hashlib
import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def sft_corpus(tmp_path_factory):
    """Fixture corpus + 2 exact clone conversations + 2 near-dup clones."""
    import pandas as pd
    import pyarrow as pa

    from web_search_engine_ray.fixtures.transcripts import write_corpus

    d = tmp_path_factory.mktemp("sftcorpus")
    write_corpus(str(d), n_convs=100, max_turns=6, rows_per_file=200)
    f = sorted(glob.glob(f"{d}/*.parquet"))[0]
    df = pq.read_table(f).to_pandas()
    out = [df]
    convs = sorted(df["conv_id"].unique())[:4]
    for i, c in enumerate(convs):
        g = df[df["conv_id"] == c].copy()
        g["conv_id"] = f"zclone{i:05d}"
        if i >= 2:  # near-dup: perturb one turn
            g.loc[g.index[0], "text"] = (g.loc[g.index[0], "text"] or "") + " zz"
        out.append(g)
    pq.write_table(
        pa.Table.from_pandas(pd.concat(out).reset_index(drop=True), preserve_index=False),
        f"{d}/zextra.parquet",
    )
    return str(d), convs


@pytest.fixture(scope="module")
def sft_out(ray_session, sft_corpus, tmp_path_factory):
    from web_search_engine_ray.pipelines.corpus_job import run_sft_dataset_job

    d, convs = sft_corpus
    out = str(tmp_path_factory.mktemp("sftjob"))
    stats = run_sft_dataset_job(d, out)
    return out, stats, convs


def _final_rows(out):
    rows = []
    for sp in ("train", "val", "test"):
        for f in sorted(glob.glob(os.path.join(out, "final", sp, "*.parquet"))):
            for r in pq.read_table(f).to_pylist():
                rows.append((sp, r))
    return rows


def test_clone_conversations_dropped(sft_out):
    out, stats, convs = sft_out
    assert stats["n_convs_dropped"] >= 4  # 2 exact + 2 near-dup clones
    kept_convs = {r["conv_id"] for _, r in _final_rows(out)}
    for i in range(4):
        assert f"zclone{i:05d}" not in kept_convs  # clone loses to original


def test_conversation_addressed_split(sft_out):
    """A conversation's examples all land in ONE split, and the split
    matches the md5(conv_id) rule."""
    out, _, _ = sft_out
    seen: dict[str, str] = {}
    for sp, r in _final_rows(out):
        c = r["conv_id"]
        assert seen.setdefault(c, sp) == sp, c
        low64 = int.from_bytes(hashlib.md5(c.encode()).digest()[8:16], "little")
        b = low64 % 100
        want = "val" if b < 10 else ("test" if b < 20 else "train")
        assert sp == want, (c, b)


def test_examples_match_operator(ray_session, sft_out):
    """The job's example set == sft_examples_ds over the deduped stage."""
    from web_search_engine_ray.pipelines.transcripts_ops import sft_examples_ds

    out, stats, _ = sft_out
    direct = sft_examples_ds(os.path.join(out, "s1_convs")).to_pandas()
    assert len(direct) == stats["n_examples"]
    got = {(r["conv_id"], r["turn_idx"]) for _, r in _final_rows(out)}
    want = set(map(tuple, direct[["conv_id", "turn_idx"]].itertuples(index=False)))
    assert got == want


def test_resume_and_drift(ray_session, sft_out, sft_corpus):
    from web_search_engine_ray.pipelines.corpus_job import run_sft_dataset_job

    d, _ = sft_corpus
    out, first, _ = sft_out
    again = run_sft_dataset_job(d, out)
    assert again["splits"] == first["splits"]
    with pytest.raises(ValueError, match="different parameters"):
        run_sft_dataset_job(d, out, max_context_turns=2)


def test_drop_malformed_flag(ray_session, sft_corpus, tmp_path_factory):
    """With --drop-malformed, the job additionally drops every conversation
    the structure gate rejects; the surviving corpus must be exactly the
    well-formed non-dup set."""
    from web_search_engine_ray.pipelines.corpus_job import run_sft_dataset_job
    from web_search_engine_ray.pipelines.transcripts_ops import (
        conversation_structure_stats_ds,
    )

    d, _ = sft_corpus
    st = conversation_structure_stats_ds(d).to_pandas()
    malformed = set(st.loc[~st["is_wellformed"], "conv_id"])
    assert malformed  # the fixture must exercise the gate
    out = str(tmp_path_factory.mktemp("sftjob_malformed"))
    stats = run_sft_dataset_job(d, out, drop_malformed=True)
    assert stats["n_malformed_dropped"] > 0
    # surviving conversations in s1 must exclude every malformed conv
    kept = set()
    for f in sorted(glob.glob(os.path.join(out, "s1_convs", "*.parquet"))):
        kept.update(pq.read_table(f, columns=["conv_id"])["conv_id"].to_pylist())
    assert not (kept & malformed)
    # counts agree: dropped = dups + malformed-not-already-dup
    assert stats["n_convs_dropped"] >= stats["n_malformed_dropped"]


def test_drop_malformed_param_drift(ray_session, sft_corpus, tmp_path_factory):
    """Resuming a flagged run without the flag (or vice versa) must refuse,
    not silently mix."""
    from web_search_engine_ray.pipelines.corpus_job import run_sft_dataset_job

    d, _ = sft_corpus
    out = str(tmp_path_factory.mktemp("sftjob_drift"))
    run_sft_dataset_job(d, out, drop_malformed=True)
    with pytest.raises(ValueError):
        run_sft_dataset_job(d, out, drop_malformed=False)
