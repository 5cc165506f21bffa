"""Deterministic train/val/test splitting over the ``documents`` table.

The standard content-addressed split an LLM pipeline applies after curation:
the bucket is a pure function of the DOCUMENT TEXT (md5 low-64 % 100), so
the assignment is stable under re-ordering, re-sharding, partial re-runs,
and corpus growth — a doc never migrates between splits, and exact
duplicates always land in the SAME split (no train/test leakage through
copies; near-dups are the decontamination ops' job). No shuffle: one
``map_batches`` pass, embarrassingly parallel at any scale.

The md5-low-64 value matches DuckDB's ``md5_number_lower`` bit-for-bit
(little-endian low 8 bytes — the same contract simhash uses), so the twin
is plain SQL. NULL text buckets via the empty string (``coalesce``), same
both sides.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from web_search_engine_ray.sources.documents import read_docs as _read_docs

SPLIT_NAMES = ("train", "val", "test")


def split_docs_ds(sf_dir: str, val_pct: int = 10, test_pct: int = 10):
    """(docid, bucket, split): bucket = md5_low64(text) % 100; split =
    'val' for bucket < val_pct, 'test' for the next test_pct buckets,
    'train' for the rest."""
    if val_pct < 0 or test_pct < 0 or val_pct + test_pct > 100:
        raise ValueError(
            f"need 0 <= val_pct + test_pct <= 100, got {val_pct}+{test_pct}"
        )

    def f(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        low64 = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5((t or "").encode("utf-8")).digest()[8:16],
                    "little",
                )
                for t in texts
            ),
            dtype=np.uint64,
            count=len(texts),
        )
        bucket = (low64 % np.uint64(100)).astype(np.int64)
        split = np.where(
            bucket < val_pct,
            "val",
            np.where(bucket < val_pct + test_pct, "test", "train"),
        )
        return pa.table(
            {
                "docid": batch["doc_id"].cast(pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
                "split": pa.array(split, pa.string()),
            }
        )

    return _read_docs(sf_dir).map_batches(f, batch_format="pyarrow")
