"""Doc-range-partitioned index + distributed searcher actor pool.

The single-index :class:`~web_search_engine_ray.pipelines.query.Searcher`
holds every term shard of one index. At 10^12 turns, serving state must be
split across nodes; the classic layout is **document partitioning**: the
corpus is cut into contiguous docid ranges, each range gets its own complete
index, and one searcher actor owns each range (its lexicon, postings, and
doc-length shards — memory-mapped locally).

Query protocol (exactness argument):

1. every posting of a doc lives in exactly one range index (docids are
   GLOBAL — each range build uses ``docid_offset``), so a doc's full BM25
   score is computable inside its owner actor;
2. BM25 needs CORPUS-GLOBAL statistics (``N``, ``avgdl``, per-term ``df`` —
   ``HW2/engine/ranker.py:24-33`` computes them corpus-wide): the coordinator
   gathers per-range partial dfs for the query terms and pushes the summed
   globals into each actor (``Searcher.set_global_stats``);
3. in AND mode an actor whose range lacks one of the globally-known terms
   returns nothing (no local doc can match all terms);
4. the coordinator merges per-range top-k by ``(-score, docid)`` and cuts to
   k — identical to the single-index ``bm25_topk(tie_semantics="sorted")``
   because per-doc scores are bit-identical and the cut rule is the same
   (proven in ``tests/test_distributed.py``).
"""

from __future__ import annotations

import json
import os

from web_search_engine_ray.functions.tokenize import query_terms
from web_search_engine_ray.sources.transcripts import corpus_files
from web_search_engine_ray.state import manifest as mf


def build_partitioned_index(
    input_path_or_dir, out_dir: str, n_ranges: int, **build_kw
) -> dict:
    """Build ``n_ranges`` contiguous doc-range indexes with GLOBAL docids.

    Ranges split on file boundaries (files are the corpus's sort units).
    Writes ``<out_dir>/partitioned.json`` with the range dirs, docid spans,
    and corpus-global stats. Each range build is itself resumable.
    """
    import pyarrow.parquet as pq

    files = corpus_files(input_path_or_dir)
    n_ranges = max(1, min(n_ranges, len(files)))
    counts = [pq.read_metadata(f).num_rows for f in files]
    per = (len(files) + n_ranges - 1) // n_ranges
    ranges = []
    offset = 0
    for i in range(0, len(files), per):
        group = files[i : i + per]
        n = sum(counts[i : i + per])
        ranges.append({"files": group, "offset": offset, "n_docs": n})
        offset += n

    os.makedirs(out_dir, exist_ok=True)
    infos = []
    total_tokens = 0
    for ri, r in enumerate(ranges):
        rdir = os.path.join(out_dir, f"range_{ri:03d}")
        b = __import__(
            "web_search_engine_ray.pipelines.build", fromlist=["build_index"]
        ).build_index(r["files"], rdir, docid_offset=r["offset"], **build_kw)
        total_tokens += b["total_tokens"]
        infos.append(
            {
                "dir": rdir,
                "docid_span": [r["offset"], r["offset"] + r["n_docs"]],
                "n_docs": r["n_docs"],
                "total_tokens": b["total_tokens"],
            }
        )
    n_docs = offset
    manifest = {
        "ranges": infos,
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
    }
    mf.write_manifest(os.path.join(out_dir, "partitioned.json"), manifest)
    return manifest


def append_range_index(out_dir: str, input_path_or_dir, **build_kw) -> dict:
    """Incremental corpus growth: index NEW documents as one additional
    doc-range (docids continue after the current corpus end) and atomically
    update ``partitioned.json`` — existing ranges are untouched, no rebuild.

    Exactness: BM25's corpus-global inputs are never baked into range
    indexes — ``N``/``avgdl`` live in the manifest (updated here) and
    per-term global ``df`` is gathered per query — so queries after an
    append are bit-identical to a from-scratch build over the grown corpus
    (pinned in ``tests/test_distributed.py::test_append_range``). The
    reference engine has no incremental path (full rebuild,
    ``HW2/README.md``); at 100 TB this is how a daily ingest lands."""
    import pyarrow.parquet as pq

    from web_search_engine_ray.pipelines.build import build_index

    path = os.path.join(out_dir, "partitioned.json")
    with open(path) as f:
        manifest = json.load(f)
    offset = int(manifest["n_docs"])
    ri = len(manifest["ranges"])
    files = corpus_files(input_path_or_dir)
    n = sum(pq.read_metadata(f).num_rows for f in files)
    rdir = os.path.join(out_dir, f"range_{ri:03d}")
    b = build_index(files, rdir, docid_offset=offset, **build_kw)
    manifest["ranges"].append(
        {
            "dir": rdir,
            "docid_span": [offset, offset + n],
            "n_docs": n,
            "total_tokens": b["total_tokens"],
        }
    )
    manifest["n_docs"] = offset + n
    manifest["total_tokens"] = int(manifest["total_tokens"]) + b["total_tokens"]
    manifest["avgdl"] = (
        manifest["total_tokens"] / manifest["n_docs"] if manifest["n_docs"] else 0.0
    )
    mf.write_manifest(path, manifest)
    return manifest


class RangeSearcher:
    """One actor per docid range: a full Searcher over that range's index."""

    def __init__(self, range_dir: str):
        from web_search_engine_ray.pipelines.query import Searcher

        self.s = Searcher(range_dir)

    def local_dfs(self, terms: list[str]) -> dict[str, int]:
        out = {}
        for t in terms:
            hit = self.s.lookup(t)
            if hit is not None:
                out[t] = int(hit[0]["df"])
        return out

    def topk(
        self,
        query: str,
        topk: int,
        mode: str,
        n: int,
        avgdl: float,
        df_global: dict[str, int],
    ) -> list[tuple[int, float]]:
        self.s.set_global_stats(n, avgdl, df_global)
        if mode.upper() == "AND":
            known_global = {t for t in query_terms(query) if df_global.get(t, 0) > 0}
            known_local = {t for t in known_global if self.s.lookup(t) is not None}
            if known_local != known_global:
                return []  # some required term has no postings in this range
        return self.s.bm25_topk(query, topk=topk, mode=mode, tie_semantics="sorted")


class PartitionedSearcher:
    """Coordinator over one RangeSearcher actor per docid range."""

    def __init__(self, out_dir: str, num_cpus_per_actor: float = 1.0):
        import ray

        with open(os.path.join(out_dir, "partitioned.json")) as f:
            self.manifest = json.load(f)
        self.N = int(self.manifest["n_docs"])
        self.avgdl = float(self.manifest["avgdl"])
        actor = ray.remote(num_cpus=num_cpus_per_actor)(RangeSearcher)
        self.actors = [actor.remote(r["dir"]) for r in self.manifest["ranges"]]

    def bm25_topk(self, query: str, topk: int = 10, mode: str = "OR"):
        import ray

        terms = sorted(set(query_terms(query)))
        partials = ray.get([a.local_dfs.remote(terms) for a in self.actors])
        df_global: dict[str, int] = {}
        for p in partials:
            for t, c in p.items():
                df_global[t] = df_global.get(t, 0) + c
        results = ray.get(
            [
                a.topk.remote(query, topk, mode, self.N, self.avgdl, df_global)
                for a in self.actors
            ]
        )
        merged = [x for r in results for x in r]
        merged.sort(key=lambda x: (-x[1], x[0]))
        return merged[:topk]

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []
