"""Shared reader for the ``documents`` table (the dedup / analysis /
curation / sketch operators' corpus): column-pruned parquet read, one
definition so every operator reads identically."""

from __future__ import annotations

import os


def docs_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def read_docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(docs_path(sf_dir), columns=["doc_id", "text"])
