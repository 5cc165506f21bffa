"""S10 parity: the reference's pickled whole-index store.

The reference can persist its in-memory index as one pickle of
``term -> {docid: tf}`` plus a ``docid -> dl`` dict
(``HW2/engine/utils.py:29-53``, ``:5-27``) — a format the reference
itself deprecated, and one that is definitionally driver-memory-bound (a
Python dict of every posting). It exists here as an INTEROP surface, not
a storage engine:

- :func:`export_pickled_index` lets a reference deployment's dict-based
  tooling consume an index built by this engine (guarded by
  ``max_postings`` — at 10^12 postings the format is impossible, and the
  guard says so loudly instead of OOMing);
- :func:`pickled_index_to_run1` converts a reference pickle into a RUN1
  run file, from which :func:`~web_search_engine_ray.pipelines.legacy.
  build_index_from_runs` builds the native sharded index — the migration
  path INTO this engine.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pyarrow as pa


def export_pickled_index(
    index_dir: str,
    index_path: str,
    doc_lengths_path: str | None = None,
    max_postings: int = 50_000_000,
) -> dict:
    """Decode a built index into the reference's pickle formats.

    Returns ``{n_terms, n_postings, n_docs}``. Raises when the index holds
    more than ``max_postings`` postings — the target format is one driver
    dict, so the bound is inherent, not a tuning knob."""
    import json

    from web_search_engine_ray.pipelines.legacy import decode_all_postings
    from web_search_engine_ray.state.docstats import DocLengths

    with open(os.path.join(index_dir, "build.json")) as f:
        build = json.load(f)
    n_post = int(build["n_postings"])
    if n_post > max_postings:
        raise ValueError(
            f"index holds {n_post} postings; the pickled whole-index format "
            f"is a single driver dict and caps at {max_postings} — use the "
            "sharded index directly (this format is deprecated in the "
            "reference too)"
        )
    index: dict[str, dict[int, int]] = {}
    for batch in decode_all_postings(index_dir).iter_batches(
        batch_format="pyarrow"
    ):
        terms = batch["term"].to_pylist()
        docids = batch["docid"].to_numpy(zero_copy_only=False)
        tfs = batch["tf"].to_numpy(zero_copy_only=False)
        for t, d, f in zip(terms, docids, tfs):
            index.setdefault(t, {})[int(d)] = int(f)
    tmp = index_path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(index, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, index_path)

    n_docs = 0
    if doc_lengths_path is not None:
        dls = DocLengths(os.path.join(index_dir, "doclens"))
        dense = dls.dense()
        doc_lengths = {i: int(v) for i, v in enumerate(dense)}
        n_docs = len(doc_lengths)
        tmp = doc_lengths_path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(doc_lengths, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, doc_lengths_path)
    return {"n_terms": len(index), "n_postings": n_post, "n_docs": n_docs}


def load_pickled_index(path: str) -> dict[str, dict[int, int]]:
    """Load a reference-format pickled index (``term -> {docid: tf}``)."""
    with open(path, "rb") as f:
        return pickle.load(f)


def pickled_index_to_run1(index_path: str, run_path: str) -> int:
    """Reference pickle -> RUN1 run file (sorted by (term, docid)), ready
    for :func:`~web_search_engine_ray.pipelines.legacy.build_index_from_runs`.
    Returns the posting count."""
    from web_search_engine_ray.sources.legacy_runs import write_run1

    index = load_pickled_index(index_path)
    terms_l, docs_l, tfs_l = [], [], []
    for term in sorted(index):
        plist = index[term]
        ds = np.fromiter(plist.keys(), dtype=np.int64, count=len(plist))
        fs = np.fromiter(plist.values(), dtype=np.int64, count=len(plist))
        order = np.argsort(ds, kind="stable")
        terms_l.append(term)
        docs_l.append(ds[order])
        tfs_l.append(fs[order])
    lens = [d.size for d in docs_l]
    idx = np.repeat(np.arange(len(terms_l), dtype=np.int64), lens)
    import pyarrow.compute as pc

    t = pa.table(
        {
            "term": pc.take(pa.array(terms_l, pa.string()), pa.array(idx)),
            "docid": pa.array(
                np.concatenate(docs_l) if docs_l else np.empty(0, np.int64)
            ).cast(pa.uint64()),
            "tf": pa.array(
                np.concatenate(tfs_l) if tfs_l else np.empty(0, np.int64)
            ).cast(pa.uint32()),
        }
    )
    write_run1(t, run_path)
    return t.num_rows
