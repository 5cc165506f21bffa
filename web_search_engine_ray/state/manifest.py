"""Per-partition checkpoint manifests: lineage + metrics + resume.

The reference build is restartable only by hand (``parallel_merge.py:160-165``
round dirs). The north rule requires the build to be "resumable from
per-partition checkpoints carrying lineage and merge metrics". Layout:

    <out_dir>/runs/run_{pid:06d}.parquet           sorted (term, docid, tf) run
    <out_dir>/doclens/doclen_{pid:06d}.parquet     (docid, dl) for the span
    <out_dir>/manifests/run_{pid:06d}.json         this manifest
    <out_dir>/index/shard_{sid:05d}.postings/.lexicon
    <out_dir>/manifests/shard_{sid:05d}.json       merge manifest
    <out_dir>/build.json                           build-level manifest

A partition manifest records its input fragments (lineage), row/docid spans,
posting counts, a content fingerprint, and wall time. Resume = skip partitions
whose manifest exists, fingerprint-matches the descriptor, and whose output
files exist. All outputs are written to temp names and atomically renamed so a
killed task never leaves a manifest without its data (or truncated data with a
manifest).
"""

from __future__ import annotations

import hashlib
import json
import os


def _fingerprint(obj) -> str:
    return hashlib.sha256(json.dumps(obj, sort_keys=True, default=str).encode()).hexdigest()[:16]


def write_manifest(path: str, payload: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True)
    os.replace(tmp, path)


def read_manifest(path: str) -> dict | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def partition_done(manifest_path: str, descriptor_fp: str, outputs: list[str]) -> bool:
    """True iff a valid checkpoint for this descriptor already exists."""
    m = read_manifest(manifest_path)
    if not m or m.get("descriptor_fp") != descriptor_fp:
        return False
    return all(os.path.exists(p) for p in outputs)


def descriptor_fingerprint(desc: dict) -> str:
    """Stable fingerprint of a partition descriptor (lineage identity)."""
    keys = ("pid", "path", "row_groups", "row_lo", "row_hi", "base_docid")
    return _fingerprint({k: desc.get(k) for k in keys})


def atomic_write_bytes(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
