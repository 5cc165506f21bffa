"""Source-layer tests: partition planning, docid assignment, load_transcripts,
and the sort_corpus normalization path."""

import glob

import numpy as np
import pyarrow.parquet as pq
import pytest

from web_search_engine_ray.sources.transcripts import (
    corpus_files,
    partition_docids,
    plan_partitions,
    read_partition,
    sort_corpus,
)


def test_plan_partitions_covers_all_rows(tiny_corpus_dir):
    files = corpus_files(tiny_corpus_dir)
    descs, total = plan_partitions(files, partition_rows=30)
    assert total == sum(pq.read_metadata(f).num_rows for f in files)
    # contiguous, disjoint docid spans in pid order
    pos = 0
    for d in descs:
        assert d["base_docid"] == pos
        pos += d["n_rows"]
    assert pos == total
    # descriptor reads return exactly n_rows
    for d in descs[:3]:
        t = read_partition(d, columns=["conv_id"])
        assert t.num_rows == d["n_rows"]
        assert partition_docids(d).tolist() == list(
            range(d["base_docid"], d["base_docid"] + d["n_rows"])
        )


def test_load_transcripts_docids(ray_session, tiny_corpus_dir):
    from web_search_engine_ray.sources.transcripts import load_transcripts

    ds = load_transcripts(tiny_corpus_dir, partition_rows=37)
    df = ds.to_pandas().sort_values("docid").reset_index(drop=True)
    # docid = global rank of (conv_id, turn_idx)
    keys = list(zip(df["conv_id"], df["turn_idx"]))
    assert keys == sorted(keys)
    assert df["docid"].tolist() == list(range(len(df)))
    assert set(df.columns) >= {"docid", "conv_id", "turn_idx", "role", "text", "tool", "ts"}


def test_sort_corpus_normalizes_unsorted_input(ray_session, tiny_corpus_dir, tmp_path):
    import pyarrow as pa

    # shuffle the corpus rows deterministically into unsorted files
    tbl = pa.concat_tables(
        [pq.read_table(f) for f in corpus_files(tiny_corpus_dir)]
    )
    rng = np.random.RandomState(7)
    perm = rng.permutation(tbl.num_rows)
    shuffled = tbl.take(pa.array(perm))
    unsorted_dir = tmp_path / "unsorted"
    unsorted_dir.mkdir()
    half = tbl.num_rows // 2
    pq.write_table(shuffled.slice(0, half), str(unsorted_dir / "a.parquet"))
    pq.write_table(shuffled.slice(half), str(unsorted_dir / "b.parquet"))

    out_dir = tmp_path / "sorted"
    files = sort_corpus(str(unsorted_dir), str(out_dir))
    assert files
    got = pa.concat_tables([pq.read_table(f) for f in files])
    keys = list(zip(got["conv_id"].to_pylist(), got["turn_idx"].to_pylist()))
    assert keys == sorted(keys)
    assert got.num_rows == tbl.num_rows


def test_build_from_resorted_equals_original(ray_session, tiny_corpus_dir, tmp_path):
    """sort_corpus output builds the same index as the pre-sorted original
    (same rows, same canonical order => same docids => same postings)."""
    import hashlib

    import pyarrow as pa

    from web_search_engine_ray.pipelines.build import build_index

    tbl = pa.concat_tables([pq.read_table(f) for f in corpus_files(tiny_corpus_dir)])
    perm = np.random.RandomState(3).permutation(tbl.num_rows)
    unsorted_dir = tmp_path / "u"
    unsorted_dir.mkdir()
    pq.write_table(tbl.take(pa.array(perm)), str(unsorted_dir / "x.parquet"))
    sorted_dir = tmp_path / "s"
    sort_corpus(str(unsorted_dir), str(sorted_dir), rows_per_file=50)

    cfg = dict(partition_rows=40, num_shards=4, n_salts=2, block_size=16)
    a = build_index(tiny_corpus_dir, str(tmp_path / "idx_a"), **cfg)
    b = build_index(str(sorted_dir), str(tmp_path / "idx_b"), **cfg)
    assert a["n_postings"] == b["n_postings"]

    def digest(p):
        return {
            f.split("/")[-1]: hashlib.sha256(open(f, "rb").read()).hexdigest()
            for f in sorted(glob.glob(p + "/index/shard_*.postings"))
        }

    assert digest(str(tmp_path / "idx_a")) == digest(str(tmp_path / "idx_b"))
