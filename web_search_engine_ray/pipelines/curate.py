"""Corpus curation: the composed training-data pipeline (filter -> dedup).

The canonical pre-training data flow this engine exists to serve: per-doc
quality signals and content hashes are computed in ONE vectorized pass, one
``groupby(text_hash)`` picks each duplicate group's min-docid survivor, and
the quality gate keeps or drops the survivor. Output feeds straight into
``build_index`` (curated corpus -> inverted index).

Scale shape: the shuffle moves one small row per doc (hash, docid, flags),
never text; survivor selection is a per-group O(1) reduction.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa

from web_search_engine_ray.functions.tokenize import token_lists
from web_search_engine_ray.pipelines.analysis import STOPWORDS


def _read_docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def _doc_signals(batch: pa.Table, min_tokens: int, max_stop_ratio: float) -> pa.Table:
    toks = token_lists(batch["text"]).to_list()
    ok, hashes, ntok = [], [], []
    for t, text in zip(toks, batch["text"].to_pylist()):
        t = t or []
        n = len(t)
        sr = sum(1 for w in t if w in STOPWORDS) / n if n else 1.0
        ok.append(bool(n >= min_tokens and sr <= max_stop_ratio))
        hashes.append(hashlib.md5((text or "").encode("utf-8")).hexdigest())
        ntok.append(n)
    return pa.table(
        {
            "docid": batch["doc_id"].cast(pa.int64()),
            "text_hash": pa.array(hashes, pa.string()),
            "quality_ok": pa.array(ok, pa.bool_()),
            "n_tokens": pa.array(ntok, pa.int64()),
        }
    )


def curated_docs_ds(sf_dir: str, min_tokens: int = 5, max_stop_ratio: float = 0.6):
    """(docid): survivors — each exact-dup group's min-docid doc, kept only
    if it passes the quality gate."""

    def signals(batch: pa.Table) -> pa.Table:
        return _doc_signals(batch, min_tokens, max_stop_ratio)

    def survivor(group: pa.Table) -> pa.Table:
        idx = pa.compute.min(group["docid"]).as_py()
        row = group.filter(pa.compute.equal(group["docid"], idx))
        if not row["quality_ok"][0].as_py():
            return pa.table({"docid": pa.array([], pa.int64())})
        return pa.table({"docid": pa.array([idx], pa.int64())})

    ds = _read_docs(sf_dir).map_batches(signals, batch_format="pyarrow")
    return ds.groupby("text_hash").map_groups(survivor, batch_format="pyarrow")


def curation_stats_table(sf_dir: str, min_tokens: int = 5, max_stop_ratio: float = 0.6) -> pa.Table:
    """One row: n_input, n_quality, n_unique, n_survivors, survivor_tokens."""
    import ray.data  # noqa: F401

    def signals(batch: pa.Table) -> pa.Table:
        return _doc_signals(batch, min_tokens, max_stop_ratio)

    ds = _read_docs(sf_dir).map_batches(signals, batch_format="pyarrow").materialize()
    n_input = ds.count()
    n_quality = ds.filter(lambda r: r["quality_ok"]).count()

    def survivor(group: pa.Table) -> pa.Table:
        idx = pa.compute.min(group["docid"]).as_py()
        row = group.filter(pa.compute.equal(group["docid"], idx))
        return pa.table(
            {
                "docid": pa.array([idx], pa.int64()),
                "quality_ok": row["quality_ok"],
                "n_tokens": row["n_tokens"],
            }
        )

    surv = ds.groupby("text_hash").map_groups(survivor, batch_format="pyarrow")
    surv_df = surv.to_pandas()
    kept = surv_df[surv_df["quality_ok"]]
    return pa.table(
        {
            "n_input": pa.array([int(n_input)], pa.int64()),
            "n_quality": pa.array([int(n_quality)], pa.int64()),
            "n_unique": pa.array([len(surv_df)], pa.int64()),
            "n_survivors": pa.array([len(kept)], pa.int64()),
            "survivor_tokens": pa.array([int(kept["n_tokens"].sum())], pa.int64()),
        }
    )
