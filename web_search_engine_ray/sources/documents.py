"""Shared reader for the ``documents`` table (the dedup / analysis /
curation / sketch operators' corpus): column-pruned parquet read, one
definition so every operator reads identically.

``read_docs`` also accepts a STAGE directory (curated / composed-job
output: part files with (docid|doc_id, text)) or an explicit parquet
path/list, so the same operators compose over intermediate corpora —
the llm_corpus_job chains quality gate -> near-dup -> redact ->
decontaminate over staged directories through this one entry point.
"""

from __future__ import annotations

import glob
import os


def docs_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def docs_files(corpus) -> list[str]:
    """Resolve a corpus argument to its parquet file list: an sf dir
    (``documents.parquet``), a directory of stage part files, a single
    parquet path, or an explicit list."""
    if isinstance(corpus, (list, tuple)):
        files = [str(f) for f in corpus]
    elif os.path.isdir(corpus):
        dp = docs_path(corpus)
        if os.path.exists(dp):
            files = [dp]
        else:
            files = sorted(glob.glob(os.path.join(corpus, "*.parquet")))
    else:
        files = [str(corpus)]
    if not files:
        raise ValueError(f"no parquet files under {corpus!r}")
    return files


def read_docs(corpus):
    import pyarrow.parquet as pq
    import ray.data

    files = docs_files(corpus)
    names = set(pq.read_schema(files[0]).names)
    if "doc_id" in names:
        return ray.data.read_parquet(files, columns=["doc_id", "text"])
    if "docid" not in names:
        raise ValueError(
            f"{files[0]} has neither a 'doc_id' nor a 'docid' column "
            f"(columns: {sorted(names)})"
        )
    # stage outputs name the id column 'docid': rename zero-copy
    ds = ray.data.read_parquet(files, columns=["docid", "text"])

    def rn(t):
        return t.select(["docid", "text"]).rename_columns(["doc_id", "text"])

    return ds.map_batches(rn, batch_format="pyarrow")
