"""Positional index + phrase / proximity search.

The reference engine stores only (docid, tf) postings
(``HW2/engine/listio.py`` layout) — phrase queries are impossible there.
This module adds the standard positional-index layer on top of the same
build discipline:

- :func:`positional_postings_ds` — (term, docid, positions list<int64>)
  with 1-based token positions. NO shuffle: a document never spans batches,
  so each per-batch (term, docid) group is already complete (the same
  invariant the postings build relies on, ``pipelines/corpus.py``).
- :func:`build_positional_index` — hash-exchange on the term's md5-low-64
  into ``n_shards`` parquet shard files sorted by (term, docid). A query
  for terms T touches ONLY the shards owning terms in T, and within a
  shard pyarrow's dictionary/statistics row-group pruning + an ``isin``
  row filter keep the read term-sized, not shard-sized.
- :func:`phrase_match_counts` — consecutive-position chain: encode
  (doc, pos) as one u64 composite (dense doc RANK * 2^32 + pos; ranks are
  result-set-scale so raw docids may exceed 2^32), then fold
  ``S = intersect1d(S + 1, P_i)`` across the phrase terms — all documents
  at once, no per-doc loop (cross-doc composites differ by >= 2^32, so a
  +1 step can never leak across documents).
- :func:`proximity_query` — two terms within a token window: nearest-
  neighbour gaps via one ``searchsorted`` over the composite arrays.

Scale note: query-time reads pull only the queried terms' posting rows to
the caller — index-lookup-scale, same serving model as the BM25
``Searcher``. A stopword's positional list is corpus-scale; phrase engines
cap or impact-order those lists — here the gate's fixed phrases are
content terms, and the build keeps every list complete.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from web_search_engine_ray.functions.tokenize import token_lists
from web_search_engine_ray.sources.documents import read_docs as _read_docs

N_SHARDS = 8
_POS_BITS = np.uint64(32)  # composite key = doc_rank << 32 | pos


def _term_shard(term: str, n_shards: int) -> int:
    """md5-low-64 of the term mod n_shards — computable at query time for
    a single term without polars (same digest family as the engine's other
    term hashing)."""
    h = int.from_bytes(hashlib.md5(term.encode()).digest()[8:16], "little")
    return h % n_shards


def _term_shard_column(terms: pa.ChunkedArray | pa.Array, n_shards: int) -> np.ndarray:
    """Per-row shard ids for a term column, hashing each DISTINCT term once
    (dictionary-encode + gather — the ``build.py::assign_gkeys`` pattern;
    terms repeat heavily in a postings relation, so this cuts Python hash
    calls by the repeat factor)."""
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    enc = terms.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    md5 = hashlib.md5
    shard_of = np.fromiter(
        (
            int.from_bytes(md5(w.encode()).digest()[8:16], "little") % n_shards
            for w in uniq
        ),
        dtype=np.int64,
        count=len(uniq),
    )
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return shard_of[idx]


def positional_postings_ds(sf_dir: str):
    """(term, docid, positions): one row per (term, doc), positions sorted
    ascending, 1-based over the tokenized stream. Positions are int32 —
    half the shuffle/storage bytes of i64; a single document would need
    >2^31 tokens to overflow (guarded)."""

    def f(batch: pa.Table) -> pa.Table:
        toks = token_lists(batch["text"])
        ids = batch["doc_id"].cast(pa.int64())
        lens = toks.list.len().fill_null(0)
        if len(lens) and int(lens.max()) >= (1 << 31):
            raise ValueError("document token count exceeds int32 position space")
        df = (
            pl.DataFrame({"docid": pl.from_arrow(ids), "ws": toks})
            .explode("ws")
            .drop_nulls("ws")
            .with_columns(
                p=(pl.int_range(pl.len()).over("docid") + 1).cast(pl.Int32)
            )
        )
        g = (
            df.group_by(["ws", "docid"])
            .agg(positions=pl.col("p").sort())
            .rename({"ws": "term"})
            .sort(["term", "docid"])
        )
        return g.to_arrow().cast(
            pa.schema(
                [
                    ("term", pa.string()),
                    ("docid", pa.int64()),
                    ("positions", pa.list_(pa.int32())),
                ]
            )
        )

    return _read_docs(sf_dir).map_batches(f, batch_format="pyarrow")


def build_positional_index(
    sf_dir: str, out_dir: str, n_shards: int = N_SHARDS
) -> dict:
    """Write the positional index: ``out_dir/shard_{i:05d}.parquet``, each
    sorted by (term, docid). Atomic per-shard writes (tmp + rename)."""
    from web_search_engine_ray.stages.exchange import exchange_map

    os.makedirs(out_dir, exist_ok=True)

    def route(t: pa.Table) -> np.ndarray:
        return _term_shard_column(t["term"], n_shards)

    def write_shard(t: pa.Table, pi: int) -> pa.Table:
        tt = (
            pl.from_arrow(t)
            .sort(["term", "docid"])
            .to_arrow()
            .cast(t.schema)
        )
        path = os.path.join(out_dir, f"shard_{pi:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(tt, tmp)
        os.replace(tmp, path)
        return pa.table(
            {
                "shard": pa.array([pi], pa.int64()),
                "n_rows": pa.array([tt.num_rows], pa.int64()),
            }
        )

    ds = positional_postings_ds(sf_dir)
    stats = exchange_map(ds, route, n_shards, write_shard, with_index=True)
    rows = stats.to_pandas()
    return {
        "out_dir": out_dir,
        "n_shards": n_shards,
        "n_rows": int(rows["n_rows"].sum()),
    }


def _cached_positional_index(sf_dir: str, n_shards: int = N_SHARDS) -> str:
    """Build-or-reuse, keyed by source file identity (mirrors
    ``serving.documents_index``)."""
    from web_search_engine_ray.pipelines.serving import _cache_key

    path = os.path.join(sf_dir, "documents.parquet")
    out = os.path.join(
        "/tmp", "wse_ray_cache", f"pos_{_cache_key(path, f'pos{n_shards}:v2')}"
    )
    if not all(
        os.path.exists(os.path.join(out, f"shard_{i:05d}.parquet"))
        for i in range(n_shards)
    ):
        build_positional_index(sf_dir, out, n_shards)
    return out


def read_term_positions(
    index_dir: str, terms: list[str], n_shards: int = N_SHARDS
) -> dict[str, pa.Table]:
    """term -> (docid, positions) table, reading only the shards that own
    the requested terms, with a term row filter pushed into the read."""
    by_shard: dict[int, list[str]] = {}
    for w in dict.fromkeys(terms):  # preserve order, drop dups
        by_shard.setdefault(_term_shard(w, n_shards), []).append(w)
    out: dict[str, pa.Table] = {}
    for sh, ws in by_shard.items():
        t = pq.read_table(
            os.path.join(index_dir, f"shard_{sh:05d}.parquet"),
            filters=pc.field("term").isin(ws),
        )
        for w in ws:
            out[w] = t.filter(pc.equal(t["term"], w)).select(["docid", "positions"])
    return out


def _doc_universe(tables: list[pa.Table]) -> np.ndarray:
    """Sorted distinct docids across the queried terms' postings — the
    dense rank domain for composite keys. Raw docids can exceed 2^32 at
    10^12-doc scale, so composites use the RANK (result-set-scale, always
    < 2^32 for any answerable query), not the docid itself."""
    parts = [
        t["docid"].combine_chunks().to_numpy(zero_copy_only=False)
        for t in tables
        if t.num_rows
    ]
    if not parts:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(parts))


def _composite(t: pa.Table, universe: np.ndarray) -> np.ndarray:
    """Sorted u64 composite keys rank(docid) << 32 | pos for one term."""
    if t.num_rows == 0:
        return np.empty(0, np.uint64)
    docids = t["docid"].combine_chunks().to_numpy(zero_copy_only=False)
    ranks = np.searchsorted(universe, docids).astype(np.uint64)
    pos_col = t["positions"].combine_chunks()
    flat = pos_col.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    counts = pc.list_value_length(pos_col).to_numpy(zero_copy_only=False)
    rep = np.repeat(ranks, counts)
    keys = (rep << _POS_BITS) | flat
    keys.sort()
    return keys


def phrase_match_counts(
    index_dir: str, phrase_terms: list[str], n_shards: int = N_SHARDS
) -> tuple[np.ndarray, np.ndarray]:
    """(docids, n_matches) for documents containing the exact consecutive
    phrase. Vectorized over ALL documents at once via composite keys."""
    if not phrase_terms:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    tp = read_term_positions(index_dir, phrase_terms, n_shards)
    universe = _doc_universe([tp[w] for w in dict.fromkeys(phrase_terms)])
    s = _composite(tp[phrase_terms[0]], universe)
    for w in phrase_terms[1:]:
        if s.size == 0:
            break
        s = np.intersect1d(
            s + np.uint64(1), _composite(tp[w], universe), assume_unique=True
        )
    if s.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    ranks = (s >> _POS_BITS).astype(np.int64)
    uniq, counts = np.unique(ranks, return_counts=True)
    return universe[uniq], counts.astype(np.int64)


def phrase_search_table(
    sf_dir: str, phrases: list[str] | None = None, n_shards: int = N_SHARDS
) -> pa.Table:
    """(query_id, docid, n_matches): exact-phrase hits for the fixed query
    set over the cached positional index. Phrases tokenize with the
    engine's document tokenizer (a phrase is a token sequence)."""
    from web_search_engine_ray.pipelines.serving import FIXED_QUERIES

    phrases = phrases if phrases is not None else FIXED_QUERIES
    idx = _cached_positional_index(sf_dir, n_shards)
    q_l, d_l, n_l = [], [], []
    for qid, phrase in enumerate(phrases):
        terms = token_lists(pa.array([phrase], pa.string())).to_list()[0] or []
        docs, counts = phrase_match_counts(idx, list(terms), n_shards)
        q_l.append(np.full(docs.size, qid, np.int64))
        d_l.append(docs)
        n_l.append(counts)
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(q_l) if q_l else [], pa.int64()),
            "docid": pa.array(np.concatenate(d_l) if d_l else [], pa.int64()),
            "n_matches": pa.array(np.concatenate(n_l) if n_l else [], pa.int64()),
        }
    )


PROXIMITY_QUERIES: list[tuple[str, str, int]] = [
    ("spark", "join", 3),
    ("customer", "order", 5),
    ("window", "merge", 4),
    ("vector", "nosuchterm", 8),
]


def proximity_search_table(
    sf_dir: str,
    queries: list[tuple[str, str, int]] | None = None,
    n_shards: int = N_SHARDS,
) -> pa.Table:
    """(query_id, docid, min_gap): documents where the two terms occur
    within ``window`` tokens (min over all occurrence pairs). One
    searchsorted pass over composite keys — the nearest b-position for
    every a-position; a same-document guard masks neighbours that fall in
    an adjacent document."""
    queries = queries if queries is not None else PROXIMITY_QUERIES
    idx = _cached_positional_index(sf_dir, n_shards)
    q_l, d_l, g_l = [], [], []
    for qid, (wa, wb, window) in enumerate(queries):
        tp = read_term_positions(idx, [wa, wb], n_shards)
        universe = _doc_universe([tp[wa], tp[wb]])
        a, b = _composite(tp[wa], universe), _composite(tp[wb], universe)
        if a.size == 0 or b.size == 0:
            continue
        j = np.searchsorted(b, a)
        gaps = np.full(a.size, np.iinfo(np.int64).max, np.int64)
        adoc = a >> _POS_BITS
        # right neighbour (first b >= a), same doc only — a cross-doc
        # composite difference can exceed int64 and wrap negative
        right = (j < b.size) & ((b[np.minimum(j, b.size - 1)] >> _POS_BITS) == adoc)
        gaps[right] = (b[j[right]] - a[right]).astype(np.int64)
        left = (j > 0) & ((b[np.maximum(j, 1) - 1] >> _POS_BITS) == adoc)
        lg = (a[left] - b[j[left] - 1]).astype(np.int64)
        gaps[left] = np.minimum(gaps[left], lg)
        ok = gaps <= window
        if not ok.any():
            continue
        docs = universe[(a[ok] >> _POS_BITS).astype(np.int64)]
        uniq, inv = np.unique(docs, return_inverse=True)
        best = np.full(uniq.size, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(best, inv, gaps[ok])
        q_l.append(np.full(uniq.size, qid, np.int64))
        d_l.append(uniq)
        g_l.append(best)
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(q_l) if q_l else [], pa.int64()),
            "docid": pa.array(np.concatenate(d_l) if d_l else [], pa.int64()),
            "min_gap": pa.array(np.concatenate(g_l) if g_l else [], pa.int64()),
        }
    )
