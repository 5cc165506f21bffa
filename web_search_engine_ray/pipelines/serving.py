"""Driver-facing search pipelines over the ``documents`` table: cached index
build + BM25 / boolean query result tables (int64/float64 columns, named to
match the DuckDB oracle SQL in ``__ray_entry__``)."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from web_search_engine_ray.pipelines.build import build_index
from web_search_engine_ray.pipelines.query import Searcher

# Fixed query set over the documents vocabulary (bench_search.py-style fixed
# list; includes AND-empty, unknown-term, and duplicate-term cases).
FIXED_QUERIES = [
    "spark join",
    "the data",
    "window merge sort",
    "vector",
    "slow fast big small",
    "data data",
    "nosuchterm spark",
    "stream filter",
    "hash group agg",
    "customer order line",
]

_searchers: dict[str, Searcher] = {}


def documents_index(sf_dir: str) -> str:
    """Build (or reuse) the inverted index for a documents table. Keyed by
    path + file identity; resumable on disk, so repeat calls are cheap."""
    path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(path)
    key = hashlib.sha256(f"{path}:{st.st_size}:{st.st_mtime_ns}:v1".encode()).hexdigest()[:16]
    out = os.path.join("/tmp", "wse_ray_cache", f"docs_{key}")
    build_index(
        path,
        out,
        text_column="text",
        partition_rows=20_000,
        num_shards=8,
        n_salts=4,
        heavy_df_frac=0.05,
    )
    return out


def documents_searcher(sf_dir: str) -> Searcher:
    idx = documents_index(sf_dir)
    s = _searchers.get(idx)
    if s is None:
        s = Searcher(idx)
        _searchers[idx] = s
    return s


def bm25_topk_table(
    sf_dir: str,
    queries: list[str] | None = None,
    topk: int = 10,
    mode: str = "OR",
    round_to: int = 4,
) -> pa.Table:
    """(query_id, docid, score) — top-k BM25 per fixed query; score rounded
    so the Ray float64 sum and the SQL float64 sum hash identically."""
    s = documents_searcher(sf_dir)
    queries = queries if queries is not None else FIXED_QUERIES
    q_l, d_l, s_l = [], [], []
    for qid, q in enumerate(queries):
        # "sorted" tie semantics = the SQL-expressible (-score, docid) cut,
        # matching the oracle's ORDER BY score DESC, docid LIMIT k
        for docid, score in s.bm25_topk(q, topk=topk, mode=mode, tie_semantics="sorted"):
            q_l.append(qid)
            d_l.append(int(docid))
            s_l.append(float(np.round(score, round_to)))
    return pa.table(
        {
            "query_id": pa.array(q_l, pa.int64()),
            "docid": pa.array(d_l, pa.int64()),
            "score": pa.array(s_l, pa.float64()),
        }
    )


def bm25_partitioned_table(
    sf_dir: str,
    queries: list[str] | None = None,
    topk: int = 10,
    mode: str = "OR",
    n_ranges: int = 3,
    round_to: int = 4,
) -> pa.Table:
    """Same result shape as :func:`bm25_topk_table` but served by the
    doc-range-partitioned actor pool (``pipelines/distributed.py``) — the
    driver checks it against the SAME SQL oracle, proving the distributed
    path end-to-end."""
    import hashlib
    import os

    from web_search_engine_ray.pipelines.distributed import (
        PartitionedSearcher,
        build_partitioned_index,
    )

    path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(path)
    key = hashlib.sha256(
        f"{path}:{st.st_size}:{st.st_mtime_ns}:part{n_ranges}:v1".encode()
    ).hexdigest()[:16]
    out = os.path.join("/tmp", "wse_ray_cache", f"docs_part_{key}")
    # the documents table is a single file: split it into range files once
    corpus_dir = os.path.join(out, "corpus")
    if not os.path.exists(os.path.join(out, "partitioned.json")):
        import pyarrow.parquet as pq

        os.makedirs(corpus_dir, exist_ok=True)
        t = pq.read_table(path)
        per = (t.num_rows + n_ranges - 1) // n_ranges
        for i in range(n_ranges):
            part = t.slice(i * per, per)
            if part.num_rows:
                pq.write_table(part, os.path.join(corpus_dir, f"docs_{i:03d}.parquet"))
        build_partitioned_index(
            corpus_dir, out, n_ranges=n_ranges,
            text_column="text", partition_rows=20_000, num_shards=4, n_salts=4,
        )
    ps = PartitionedSearcher(out)
    queries = queries if queries is not None else FIXED_QUERIES
    try:
        q_l, d_l, s_l = [], [], []
        for qid, q in enumerate(queries):
            for docid, score in ps.bm25_topk(q, topk=topk, mode=mode):
                q_l.append(qid)
                d_l.append(int(docid))
                s_l.append(float(np.round(score, round_to)))
    finally:
        ps.shutdown()
    return pa.table(
        {
            "query_id": pa.array(q_l, pa.int64()),
            "docid": pa.array(d_l, pa.int64()),
            "score": pa.array(s_l, pa.float64()),
        }
    )


def boolean_table(sf_dir: str, queries: list[str] | None = None, mode: str = "AND") -> pa.Table:
    """(query_id, docid) — boolean AND/OR result sets per fixed query."""
    s = documents_searcher(sf_dir)
    queries = queries if queries is not None else FIXED_QUERIES
    q_l, d_l = [], []
    for qid, q in enumerate(queries):
        for docid in sorted(s.boolean(q, mode)):
            q_l.append(qid)
            d_l.append(int(docid))
    return pa.table(
        {"query_id": pa.array(q_l, pa.int64()), "docid": pa.array(d_l, pa.int64())}
    )
