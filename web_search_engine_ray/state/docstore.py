"""DocStore: docid -> original corpus row (random access for serving).

The reference keeps no doc content at serving time (its API returns only
docid + score; the snippet helper is dead code because nothing can resolve a
docid back to text — ``HW2/app.py:85-104``). Our docids are global row ranks
over the sorted corpus parquet, so random access is a metadata seek: binary
search the partition plan for the row group containing the docid, read that
row group (LRU-cached), slice the row. This is what lets ``serve.py``
actually return text/snippets.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from web_search_engine_ray.sources.transcripts import corpus_files, plan_partitions


class DocStore:
    def __init__(self, corpus_path_or_dir, columns: list[str] | None = None, max_cached: int = 64):
        files = corpus_files(corpus_path_or_dir)
        # one descriptor per row group for exact seeks
        descs, self.n_docs = plan_partitions(files, partition_rows=1)
        self._base = np.array([d["base_docid"] for d in descs], dtype=np.int64)
        self._descs = descs
        self.columns = columns
        self._cache: dict[int, dict] = {}
        self.max_cached = max_cached

    def _rows_for(self, di: int) -> list[dict]:
        hit = self._cache.get(di)
        if hit is None:
            d = self._descs[di]
            f = pq.ParquetFile(d["path"])
            lo, hi = d["row_groups"]
            t = f.read_row_groups(list(range(lo, hi)), columns=self.columns)
            hit = t.to_pylist()
            if len(self._cache) >= self.max_cached:
                self._cache.pop(next(iter(self._cache)))
            self._cache[di] = hit
        else:
            self._cache[di] = self._cache.pop(di)  # LRU refresh
        return hit

    def get(self, docid: int) -> dict | None:
        if not (0 <= docid < self.n_docs):
            return None
        di = int(np.searchsorted(self._base, docid, side="right")) - 1
        rows = self._rows_for(di)
        return rows[docid - int(self._base[di])]

    def get_text(self, docid: int) -> str:
        row = self.get(docid)
        return (row or {}).get("text", "") or ""


def create_snippet(content: str, query: str, max_length: int = 200) -> str:
    """Query-centred snippet (reference logic, ``HW2/app.py:118-155``): pick
    the window around the query-term hit with the most other terms within
    +/-50 chars; ellipsize both ends."""
    if not content or not query:
        return content[:max_length] + "..." if len(content) > max_length else content
    terms = query.lower().split()
    low = content.lower()
    best_start = 0
    best_score = 0
    for term in terms:
        pos = low.find(term)
        if pos != -1:
            nearby = sum(1 for t in terms if t in low[max(0, pos - 50) : pos + 50])
            if nearby > best_score:
                best_score = nearby
                best_start = max(0, pos - 50)
    end = min(len(content), best_start + max_length)
    snippet = content[best_start:end]
    if best_start > 0:
        snippet = "..." + snippet
    if end < len(content):
        snippet = snippet + "..."
    return snippet
