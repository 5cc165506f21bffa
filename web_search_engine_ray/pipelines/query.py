"""Query engine: shard-backed Searcher + DAAT/TAAT BM25 + boolean + actor pool.

API surface mirrors the reference's ``Searcher`` (``HW2/engine/searcher.py``):

- ``search(query, mode, topk)``      — TAAT BM25 with AND/OR allowed-set filter
- ``search_topk_daat(query, topk, mode)`` — DAAT BM25 top-k (cursor loop,
  the reference algorithm transliterated: ``HW2/engine/daat_ranker.py:47-141``)
- ``search_boolean_daat(query, mode)``   — DAAT set ops (``HW2/engine/daat.py``)
- ``boolean(query, mode)``           — full-postings set intersection/union
- ``bm25_topk(query, topk, mode)``   — vectorized scorer, float-identical to
  the DAAT loop (same per-doc accumulation order: terms ascending-df), used by
  the serving path / benches. Tested equal to ``search_topk_daat``.

Semantics preserved exactly (SURVEY.md §7.6-7.7): query tokenization is
``query.lower().split()`` (NOT the corpus tokenizer); unknown terms silently
dropped; terms sorted by ascending df (stable) before scoring; dl=0 docs are
never scored; duplicate query terms contribute once per occurrence; AND mode
requires presence in every (known-term) stream.

State layout: each Searcher lazily loads lexicon shards, opens postings shard
files, and range-loads doc-length shards — once per process/actor, reused
across queries (the reference loads its single lexicon/doc_lengths pickles
once per Searcher, ``searcher.py:18-39``; ours shard so a 10^12-doc index
serves from a pool of actors each holding O(1/num_actors) of the state).
"""

from __future__ import annotations

import heapq
import json
import math
import os
from collections import defaultdict

import numpy as np

from web_search_engine_ray.functions.tokenize import query_terms
from web_search_engine_ray.state.docstats import DocLengths
from web_search_engine_ray.state.lexicon import LexiconShard, term_shard
from web_search_engine_ray.state.listio import PostingsShardReader

from web_search_engine_ray.stages.exchange import pool_size

K1 = 1.2
B = 0.75


class PostingsCursor:
    """Block-aware cursor over one term's postings: ``docid() / advance() /
    next_ge()`` (the reference's cursor contract,
    ``HW2/engine/postings_cursor.py``; block seeks via the lexicon directory)."""

    __slots__ = ("reader", "entry", "term", "bidx", "block_last", "docids", "freqs", "j", "exhausted")

    def __init__(self, reader: PostingsShardReader, term: str, entry: dict):
        self.reader = reader
        self.entry = entry
        self.term = term
        self.bidx = -1
        self.block_last = -1
        self.docids = np.empty(0, dtype=np.uint64)
        self.freqs = np.empty(0, dtype=np.uint64)
        self.j = 0
        self.exhausted = entry["df"] == 0
        if not self.exhausted:
            hit = reader.seek_block_ge(entry, -1)
            if hit is None:
                self.exhausted = True
            else:
                self.bidx, self.block_last, self.docids, self.freqs = hit

    def _load_block(self, bidx: int) -> bool:
        if bidx < 0 or bidx >= self.entry["nblocks"]:
            return False
        d, f = self.reader._decode_block(self.entry, bidx)
        self.bidx = bidx
        self.block_last = int(self.entry["blk_last_docid"][bidx])
        self.docids, self.freqs = d, f
        self.j = 0
        return True

    def docid(self) -> int | None:
        if self.exhausted or self.j >= self.docids.size:
            return None
        return int(self.docids[self.j])

    def tf(self) -> int:
        return int(self.freqs[self.j])

    def advance(self) -> int | None:
        if self.exhausted:
            return None
        self.j += 1
        if self.j < self.docids.size:
            return int(self.docids[self.j])
        if not self._load_block(self.bidx + 1):
            self.exhausted = True
            return None
        return int(self.docids[self.j])

    def next_ge(self, target: int) -> int | None:
        if self.exhausted:
            return None
        if target <= self.block_last:
            j = int(np.searchsorted(self.docids[self.j :], np.uint64(target))) + self.j
            if j < self.docids.size:
                self.j = j
                return int(self.docids[j])
            if not self._load_block(self.bidx + 1):
                self.exhausted = True
                return None
            return int(self.docids[self.j])
        hit = self.reader.seek_block_ge(self.entry, target)
        if hit is None:
            self.exhausted = True
            return None
        self.bidx, self.block_last, self.docids, self.freqs = hit
        j = int(np.searchsorted(self.docids, np.uint64(target)))
        if j >= self.docids.size:
            if not self._load_block(self.bidx + 1):
                self.exhausted = True
                return None
            return int(self.docids[self.j])
        self.j = j
        return int(self.docids[j])


def _heap_topk_select(docids: np.ndarray, scores: np.ndarray, k: int) -> list[int]:
    """Top-k selection with the reference's exact tie semantics.

    The reference keeps a size-k min-heap of ``(score, docid)`` tuples over
    docs in ascending-docid order and only replaces on strictly-greater score
    (``daat_ranker.py:125-131``). For docs tied at the final threshold this
    keeps a specific docid subset that a plain ``(-score, docid)`` sort does
    NOT reproduce (the heap evicts smallest-docid ties first). Docs scoring
    below the k-th largest score can neither enter nor influence the final
    heap, so emulating the heap over only the ``score >= theta*`` subsequence
    (ascending docid) yields the identical final set at O(m log k).
    Returns candidate indices ordered by (-score, docid)."""
    n = scores.size
    if n <= k:
        order = np.lexsort((docids, -scores))
        return list(order)
    theta = np.partition(scores, n - k)[n - k]
    idx = np.flatnonzero(scores >= theta)  # ascending docid
    top: list[tuple[float, int, int]] = []  # (score, docid, cand_index)
    for i in idx:
        sc = float(scores[i])
        d = int(docids[i])
        if len(top) < k:
            heapq.heappush(top, (sc, d, int(i)))
        elif sc > top[0][0]:
            heapq.heapreplace(top, (sc, d, int(i)))
    top.sort(key=lambda x: (-x[0], x[1]))
    return [i for _, _, i in top]


class Searcher:
    """Query-time state over a built index directory (one per process/actor)."""

    def __init__(
        self,
        index_dir: str,
        k1: float = K1,
        b: float = B,
        cache_bytes: int = 64 << 20,
    ):
        self.dir = index_dir
        with open(os.path.join(index_dir, "build.json")) as f:
            self.build = json.load(f)
        self.k1, self.b = k1, b
        self.num_shards = int(self.build["num_shards"])
        self.heavy = {t: self.num_shards + i for i, t in enumerate(self.build["heavy_terms"])}
        self.doclens = DocLengths(os.path.join(index_dir, "doclens"))
        self.N = self.doclens.N
        self.avgdl = self.doclens.avgdl
        self._df_override: dict[str, int] = {}
        self._lex: dict[int, LexiconShard | None] = {}
        self._readers: dict[int, PostingsShardReader] = {}
        # ONE decoded-postings budget for the whole searcher, shared by all
        # shard readers — per-reader caches would scale with shard count
        from web_search_engine_ray.state.listio import _DecodedLRU

        self._decoded_cache = _DecodedLRU(cache_bytes) if cache_bytes else None

    def set_global_stats(self, n: int, avgdl: float, df_override: dict[str, int]) -> None:
        """Override corpus stats for doc-range-partitioned serving: this index
        holds one docid range of a larger corpus, but BM25 must score with
        CORPUS-GLOBAL N / avgdl / df (SURVEY.md §2.5 A4). df lookups for the
        given terms use the override; everything else stays shard-local."""
        self.N = int(n)
        self.avgdl = float(avgdl)
        self._df_override = dict(df_override)

    # -- shard plumbing -------------------------------------------------
    def _shard_of(self, term: str) -> int:
        return self.heavy.get(term, term_shard(term, self.num_shards))

    def _lexicon(self, sid: int) -> LexiconShard | None:
        if sid not in self._lex:
            path = os.path.join(self.dir, "index", f"shard_{sid:05d}.lexicon")
            self._lex[sid] = LexiconShard.load(path) if os.path.exists(path) else None
        return self._lex[sid]

    def _reader(self, sid: int) -> PostingsShardReader:
        r = self._readers.get(sid)
        if r is None:
            path = os.path.join(self.dir, "index", f"shard_{sid:05d}.postings")
            r = (
                PostingsShardReader(path, cache=self._decoded_cache)
                if self._decoded_cache is not None
                else PostingsShardReader(path, cache_bytes=0)
            )
            self._readers[sid] = r
        return r

    def lookup(self, term: str) -> tuple[dict, PostingsShardReader] | None:
        sid = self._shard_of(term)
        lex = self._lexicon(sid)
        if lex is None:
            return None
        entry = lex.get(term)
        if entry is None:
            return None
        return entry, self._reader(sid)

    def df(self, term: str) -> int:
        if term in self._df_override:
            return self._df_override[term]
        hit = self.lookup(term)
        return 0 if hit is None else hit[0]["df"]

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        hit = self.lookup(term)
        if hit is None:
            return np.empty(0, np.uint64), np.empty(0, np.uint64)
        entry, reader = hit
        return reader.read_postings(entry)

    def close(self) -> None:
        for r in self._readers.values():
            r.close()
        self._readers.clear()

    def complete(self, prefix: str, k: int = 10) -> list[tuple[str, int]]:
        """Top-k lexicon completions for a prefix by (df desc, term) — the
        type-ahead serving surface. Each shard's sorted term list is sliced
        with two bisects (no vocab iteration); the per-shard candidate set
        is cut to k BEFORE the merge, so the driver-side merge sees at most
        k x num_shards rows regardless of vocabulary size. Terms hash-route
        to shards, so a prefix can live anywhere — every shard answers, in
        parallel across query actors at scale (each actor owns its shards;
        the reference's single lexicon dict cannot answer prefixes at all
        without a full scan)."""
        import bisect

        if not prefix:
            return []
        # ascii-safe exclusive upper bound for the prefix range
        hi_key = prefix + "\x7f"
        cands: list[tuple[int, str]] = []  # (-df, term)
        # heavy terms live in dedicated salted shards PAST num_shards — a
        # prefix can complete to one, so scan those lexicons too
        for sid in range(self.num_shards + len(self.heavy)):
            lex = self._lexicon(sid)
            if lex is None:
                continue
            lo = bisect.bisect_left(lex.terms, prefix)
            hi = bisect.bisect_left(lex.terms, hi_key, lo=lo)
            if hi <= lo:
                continue
            dfs = lex.df[lo:hi]
            if hi - lo > k:
                # stable (df desc, term asc) cut: argpartition on df alone
                # drops the lexicographically-first of df-tied terms at the
                # k boundary, diverging from the SQL twin's row_number order
                # (terms[lo:hi] is already sorted, so index order is term
                # order)
                keep = np.lexsort((np.arange(hi - lo), -dfs))[:k]
            else:
                keep = np.arange(hi - lo)
            for i in keep:
                cands.append((-int(dfs[i]), lex.terms[lo + int(i)]))
        cands.sort()
        return [(t, -nd) for nd, t in cands[:k]]

    # -- scoring helpers ------------------------------------------------
    def _idf(self, df: int) -> float:
        return math.log((self.N - df + 0.5) / (df + 0.5) + 1.0)

    def _contrib_daat(self, tf: np.ndarray, df: int, dl: np.ndarray) -> np.ndarray:
        """Vectorized BM25 term contribution with the DAAT ranker's float
        association ``(idf * num) / den`` (``daat_ranker.py:40-44``)."""
        idf = self._idf(df)
        tf = tf.astype(np.float64)
        den = tf + self.k1 * (1.0 - self.b + self.b * (dl.astype(np.float64) / self.avgdl))
        return (idf * (tf * (self.k1 + 1.0))) / den

    def _contrib_taat(self, tf: np.ndarray, df: int, dl: np.ndarray) -> np.ndarray:
        """TAAT ranker association ``idf * (num / den)`` (``ranker.py:45-48``)."""
        idf = self._idf(df)
        tf = tf.astype(np.float64)
        den = tf + self.k1 * (1.0 - self.b + self.b * (dl.astype(np.float64) / self.avgdl))
        return idf * ((tf * (self.k1 + 1.0)) / den)

    def _known_terms(self, query: str) -> list[str]:
        return [t for t in query_terms(query) if self.lookup(t) is not None]

    # -- ranked: vectorized (serving path) ------------------------------
    def bm25_topk(
        self, query: str, topk: int = 10, mode: str = "AND", tie_semantics: str = "heap"
    ):
        """Vectorized DAAT-equivalent BM25 top-k; identical results (docids,
        scores bit-for-bit) to ``search_topk_daat`` — per-doc accumulation
        runs over terms in ascending-df order, matching the tied-cursor pop
        order of the reference loop (SURVEY.md §7.7). OR-mode queries mixing
        rare terms with stopwords route through a score-exact MaxScore path
        (prune heavy-term-only candidates when their upper bound provably
        cannot reach the top-k threshold; automatic fallback otherwise).

        ``tie_semantics``: "heap" (default) reproduces the reference's size-k
        min-heap boundary-tie membership exactly; "sorted" uses the
        normalized (-score, docid) cut — SQL-expressible (``ORDER BY score
        DESC, docid LIMIT k``), used by the driver oracle queries."""
        terms = self._known_terms(query)
        if not terms or self.N == 0:
            return []
        terms.sort(key=self.df)
        if mode.upper() != "AND" and len(terms) > 1 and tie_semantics == "heap":
            res = self._bm25_topk_maxscore(terms, topk)
            if res is not None:
                return res
        plists = [self.postings(t) for t in terms]
        cand = np.unique(np.concatenate([d for d, _ in plists]))
        if mode.upper() == "AND" and len(plists) > 1:
            cnt = np.zeros(cand.size, dtype=np.int32)
            for d, _ in plists:
                cnt[np.searchsorted(cand, d)] += 1
            cand = cand[cnt == len(plists)]
            if cand.size == 0:
                return []
        dl_all = self.doclens.get_many(cand)
        scores = np.zeros(cand.size, dtype=np.float64)
        for t, (d, f) in zip(terms, plists):
            if mode.upper() == "AND" and len(plists) > 1:
                pos = np.searchsorted(cand, d)
                sel = (pos < cand.size) & (cand[np.minimum(pos, cand.size - 1)] == d)
                pos, fsel = pos[sel], f[sel]
            else:
                pos = np.searchsorted(cand, d)
                fsel = f
            dl = dl_all[pos]
            contrib = self._contrib_daat(fsel, self.df(t), dl)
            contrib[dl == 0] = 0.0
            scores[pos] += contrib
        if tie_semantics == "sorted":
            keep = np.lexsort((cand, -scores))[:topk]
        else:
            keep = _heap_topk_select(cand, scores, topk)
        return [(int(cand[i]), float(scores[i])) for i in keep]

    def _bm25_topk_maxscore(self, terms: list[str], topk: int):
        """MaxScore candidate pruning, score-exact or bail.

        Terms are split into *essential* (df below a cutoff) and
        *non-essential* (stopword-grade). Candidates = union of essential
        postings only; every candidate's EXACT full score is computed (the
        non-essential tf comes from a block-targeted directory lookup, so a
        stopword's list is never fully decoded). A doc matched ONLY by
        non-essential terms scores at most the sum of their upper bounds
        (``bm25(max blk tf, dl=1)``); when that bound is STRICTLY below the
        candidate top-k threshold, such docs can neither enter nor perturb
        the reference heap (same >=theta* argument as ``_heap_topk_select``),
        so the candidate-only answer is exact. Returns ``None`` (caller falls
        back to exhaustive scoring) whenever the bound doesn't separate.
        """
        hits = [self.lookup(t) for t in terms]
        dfs = [self.df(t) for t in terms]
        cutoff = max(50 * topk, self.N // 20)
        ess = [i for i in range(len(terms)) if dfs[i] <= cutoff]
        non = [i for i in range(len(terms)) if dfs[i] > cutoff]
        if not non:
            return None  # nothing to prune
        if not ess:
            ess = [0]  # smallest-df term seeds candidates
            non = list(range(1, len(terms)))
        # only profitable when the candidate set is much smaller than the
        # pruned lists; otherwise the targeted lookups touch most blocks and
        # the plain full scan wins (measured on the 1M-turn index)
        if sum(dfs[i] for i in ess) > max(10_000, self.N // 10):
            return None
        dl1 = np.array([1], np.uint64)
        ub_non = 0.0
        for i in non:
            entry = hits[i][0]
            mtf = int(entry["blk_max_tf"].max()) if entry["nblocks"] else 0
            if mtf == 0 and dfs[i] > 0:
                # degenerate directory (pre-blk_max_tf lexicon): a zero
                # bound would prune EVERYTHING — fall back to exhaustive
                return None
            ub_non += float(
                self._contrib_daat(np.array([mtf], np.uint64), dfs[i], dl1)[0]
            )
        ess_lists = {i: hits[i][1].read_postings(hits[i][0]) for i in ess}
        cand = np.unique(np.concatenate([ess_lists[i][0] for i in ess]))
        if cand.size < topk:
            return None  # non-essential-only docs could still place
        dl_all = self.doclens.get_many(cand)
        scores = np.zeros(cand.size, dtype=np.float64)
        for i in range(len(terms)):  # ascending df = reference accumulation order
            if i in ess_lists:
                d, f = ess_lists[i]
                pos = np.searchsorted(cand, d)
            else:
                entry, reader = hits[i]
                tf = reader.read_tfs_for(entry, cand)
                sel = tf > 0
                pos = np.flatnonzero(sel)
                d = cand[sel]
                f = tf[sel]
            dl = dl_all[pos]
            contrib = self._contrib_daat(f, dfs[i], dl)
            contrib[dl == 0] = 0.0
            scores[pos] += contrib
        keep = _heap_topk_select(cand, scores, topk)
        theta = float(scores[keep[-1]])
        if not (ub_non < theta):
            return None
        return [(int(cand[i]), float(scores[i])) for i in keep]

    # -- ranked: TAAT (reference `search`) ------------------------------
    def search(self, query: str, mode: str = "AND", topk: int | None = None):
        """TAAT BM25 with allowed-set filtering (``searcher.py:52-90``).
        Duplicate query terms contribute per occurrence; accumulation per doc
        follows query-token order. Result sorted by (-score, docid)."""
        q = query_terms(query)
        infos = []
        doc_sets = []
        seen: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for t in q:
            if t not in seen:
                d, f = self.postings(t)
                if d.size:
                    seen[t] = (d, f)
                    doc_sets.append(d)
            if t in seen:
                infos.append((t, *seen[t]))
        if not infos:
            return []
        if mode.upper() == "AND":
            allowed = doc_sets[0]
            for s in doc_sets[1:]:
                allowed = np.intersect1d(allowed, s, assume_unique=True)
            if allowed.size == 0:
                return []
        else:
            allowed = np.unique(np.concatenate(doc_sets))
        cand = np.unique(np.concatenate([d for _, d, _ in infos]))
        dl_all = self.doclens.get_many(cand)
        scores = np.zeros(cand.size, dtype=np.float64)
        for t, d, f in infos:
            pos = np.searchsorted(cand, d)
            dl = dl_all[pos]
            contrib = self._contrib_taat(f, self.df(t), dl)
            # dl=0 guard (same rule as bm25_topk / search_topk_daat): a
            # posted doc always has dl>0 on a consistent index, so this only
            # fires on corrupt/mismatched doclens — score 0, don't rank
            contrib[dl == 0] = 0.0
            scores[pos] += contrib
        keep = np.searchsorted(cand, allowed)
        sk = scores[keep]
        order = np.lexsort((allowed, -sk))
        out = [(int(allowed[i]), float(sk[i])) for i in order]
        return out[:topk] if topk else out

    # -- ranked: query-likelihood (Dirichlet-smoothed LM) ----------------
    def ql_topk(self, query: str, topk: int | None = 10, mu: float = 2000.0):
        """Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty,
        SIGIR 2001) — the second classic ranking family next to BM25:

            score(q, d) = sum_t ln( (tf(t,d) + mu * cf(t)/T) / (dl(d) + mu) )

        over the query's token occurrences (duplicates count per occurrence,
        the same multiplicity rule as :meth:`search`), where cf(t) is the
        collection frequency and T the corpus token total. Candidates are
        the OR set (docs matching >= 1 known term); a candidate missing a
        term pays that term's background probability, so tf=0 contributes
        ln(mu*cf/T / (dl+mu)) — unknown terms (cf=0) are dropped on both
        sides rather than sending every score to -inf. cf comes free from
        the already-decoded postings (f.sum()); no extra index artifact.

        Per-(term, doc) float expression is kept EXACTLY as the SQL twin's
        ln((tf + mu*cf/T)/(dl + mu)) so the driver hash-compare sees the
        same float64 stream. Note: under doc-range partitioned serving this
        scores with shard-local cf/T (``set_global_stats`` overrides N/avgdl
        /df only — BM25's inputs); QL across ranges would need the cf sums
        broadcast the same way."""
        q = query_terms(query)
        T = float(self.doclens.total_tokens)
        infos = []
        seen: dict[str, tuple[np.ndarray, np.ndarray, float]] = {}
        for t in q:
            if t not in seen:
                d, f = self.postings(t)
                if d.size:
                    seen[t] = (d, f.astype(np.float64), float(f.sum()))
            if t in seen:
                infos.append(seen[t])
        if not infos or T <= 0:
            return []
        cand = np.unique(np.concatenate([d for d, _, _ in infos]))
        dl = self.doclens.get_many(cand).astype(np.float64)
        scores = np.zeros(cand.size, dtype=np.float64)
        den = dl + mu
        for d, f, cf in infos:
            tfv = np.zeros(cand.size, dtype=np.float64)
            tfv[np.searchsorted(cand, d)] = f
            scores += np.log((tfv + mu * cf / T) / den)
        order = np.lexsort((cand, -scores))
        out = [(int(cand[i]), float(scores[i])) for i in order]
        return out[:topk] if topk else out

    # -- ranked: exact DAAT cursor loop ---------------------------------
    def search_topk_daat(self, query: str, topk: int = 10, mode: str = "AND"):
        """Transliteration of the reference DAAT+BM25 loop
        (``daat_ranker.py:47-141``): k-way docid heap over per-term cursors,
        tied-cursor accumulation in pop order, size-k min-heap, dl=0 guard."""
        terms = self._known_terms(query)
        if not terms or self.N == 0:
            return []
        terms.sort(key=self.df)
        cursors = []
        for t in terms:
            entry, reader = self.lookup(t)
            cursors.append(PostingsCursor(reader, t, entry))
        heap = [(c.docid(), i) for i, c in enumerate(cursors) if c.docid() is not None]
        heapq.heapify(heap)
        if not heap:
            return []
        dfs = [self.df(t) for t in terms]
        scores: defaultdict[int, float] = defaultdict(float)
        top: list[tuple[float, int]] = []
        want_and = mode.upper() == "AND"
        while heap:
            d, i = heapq.heappop(heap)
            tied = [i]
            while heap and heap[0][0] == d:
                _, j = heapq.heappop(heap)
                tied.append(j)
            if want_and and len(tied) < len(cursors):
                for idx in tied:
                    nxt = cursors[idx].advance()
                    if nxt is not None:
                        heapq.heappush(heap, (nxt, idx))
                continue
            dl = self.doclens.get(d)
            for idx in tied:
                if dl > 0:
                    c = cursors[idx]
                    scores[d] += self._contrib_daat(
                        np.array([c.tf()], np.uint64), dfs[idx], np.array([dl], np.uint64)
                    )[0]
            sc = scores[d]
            if len(top) < topk:
                heapq.heappush(top, (sc, d))
            elif sc > top[0][0]:
                heapq.heapreplace(top, (sc, d))
            for idx in tied:
                nxt = cursors[idx].advance()
                if nxt is not None:
                    heapq.heappush(heap, (nxt, idx))
        top.sort(key=lambda x: (-x[0], x[1]))
        return [(d, s) for (s, d) in top]

    # -- ranked: block-max WAND (score-safe pruning) ---------------------
    def search_topk_wand(self, query: str, topk: int = 10) -> list[tuple[int, float]]:
        """Block-max WAND top-k (OR semantics), score-safe: returns results
        identical to the exhaustive DAAT loop (tested), but skips blocks whose
        max-possible contribution cannot beat the current threshold.

        The reference has no pruning (``HW2/README.md:132-133``, "no
        impact-ordered or pruning-aware query processing"), so correctness is
        judged against our exhaustive DAAT (SURVEY.md §7.1.6). Upper bounds
        use the per-block ``blk_max_tf`` directory with dl=1 (BM25 term score
        is monotone up in tf and down in dl, so ``bm25(max_tf, dl=1)`` bounds
        every posting in the block). Full evaluations accumulate per-doc
        contributions in ascending-df cursor order — float-identical to DAAT.
        """
        terms = self._known_terms(query)
        if not terms or self.N == 0:
            return []
        terms.sort(key=self.df)
        cursors = []
        for t in terms:
            entry, reader = self.lookup(t)
            if entry["df"] > 0 and (
                entry["nblocks"] == 0 or int(entry["blk_max_tf"].max()) == 0
            ):
                # degenerate block-max directory (pre-blk_max_tf lexicon):
                # zero bounds would skip real blocks — exhaustive instead
                return self.search_topk_daat(query, topk, mode="OR")
            cursors.append(PostingsCursor(reader, t, entry))
        k1, b = self.k1, self.b
        dl1 = np.array([1], np.uint64)

        def _ub_term(c: PostingsCursor) -> float:
            mtf = int(c.entry["blk_max_tf"].max()) if c.entry["nblocks"] else 0
            return self._contrib_daat(np.array([mtf], np.uint64), self.df(c.term), dl1)[0]

        def _ub_block(c: PostingsCursor) -> float:
            mtf = int(c.entry["blk_max_tf"][c.bidx])
            return self._contrib_daat(np.array([mtf], np.uint64), self.df(c.term), dl1)[0]

        ubs = [_ub_term(c) for c in cursors]
        n = len(cursors)
        live = [i for i in range(n) if not cursors[i].exhausted]
        top: list[tuple[float, int]] = []
        theta = -1.0

        while live:
            # order live cursors by current docid (stable on cursor index)
            live.sort(key=lambda i: (cursors[i].docid(), i))
            # find pivot: first prefix whose term-UB sum can beat theta
            acc = 0.0
            pivot = -1
            for pos, i in enumerate(live):
                acc += ubs[i]
                if acc > theta:
                    pivot = pos
                    break
            if pivot < 0:
                break
            pivot_doc = cursors[live[pivot]].docid()
            if cursors[live[0]].docid() == pivot_doc:
                # block-max refinement: tighter bound from the current blocks.
                # The bound must cover EVERY cursor positioned at pivot_doc —
                # including ones past the pivot position that are tied on it
                # (e.g. a duplicate query term's twin cursor) — or the skip
                # would discard their contribution.
                prefix = list(live[: pivot + 1]) + [
                    i for i in live[pivot + 1 :] if cursors[i].docid() == pivot_doc
                ]
                block_acc = 0.0
                for i in prefix:
                    c = cursors[i]
                    if c.docid() == pivot_doc or c.block_last >= pivot_doc:
                        block_acc += _ub_block(c)
                    else:
                        block_acc += ubs[i]
                if block_acc <= theta:
                    # no doc in these blocks can win: skip past the pivot doc
                    self._wand_advance(cursors, live, pivot_doc + 1)
                    live = [i for i in live if not cursors[i].exhausted]
                    continue
                # full evaluation, ascending-df (original cursor) order
                dl = self.doclens.get(pivot_doc)
                score = 0.0
                matched = [i for i in range(n) if not cursors[i].exhausted and cursors[i].docid() == pivot_doc]
                if dl > 0:
                    for i in matched:
                        c = cursors[i]
                        score += self._contrib_daat(
                            np.array([c.tf()], np.uint64),
                            self.df(c.term),
                            np.array([dl], np.uint64),
                        )[0]
                if len(top) < topk:
                    heapq.heappush(top, (score, pivot_doc))
                    if len(top) == topk:
                        theta = top[0][0]
                elif score > theta:
                    heapq.heapreplace(top, (score, pivot_doc))
                    theta = top[0][0]
                for i in matched:
                    cursors[i].advance()
                live = [i for i in live if not cursors[i].exhausted]
            else:
                # every doc below the pivot is reachable only through the
                # pre-pivot cursors, whose UB sum is <= theta — advance them
                # ALL to the pivot doc (also keeps duplicate-term twin
                # cursors in lockstep, which per-cursor advancing would break)
                for i in live:
                    d = cursors[i].docid()
                    if d is not None and d < pivot_doc:
                        cursors[i].next_ge(pivot_doc)
                live = [i for i in live if not cursors[i].exhausted]

        top.sort(key=lambda x: (-x[0], x[1]))
        return [(d, s) for (s, d) in top]

    @staticmethod
    def _wand_advance(cursors, live, target: int) -> None:
        for i in live:
            if cursors[i].docid() is not None and cursors[i].docid() < target:
                cursors[i].next_ge(target)

    # -- boolean ---------------------------------------------------------
    def boolean(self, query: str, mode: str = "AND") -> set[int]:
        """Full-postings set ops; unknown terms silently dropped
        (``searcher.py:92-109``)."""
        arrays = []
        for t in query_terms(query):
            d, _ = self.postings(t)
            if d.size:
                arrays.append(d)
        if not arrays:
            return set()
        if mode.upper() == "AND":
            out = arrays[0]
            for a in arrays[1:]:
                out = np.intersect1d(out, a, assume_unique=True)
        else:
            out = np.unique(np.concatenate(arrays))
        return set(int(x) for x in out)

    def search_boolean_daat(self, query: str, mode: str = "AND") -> set[int]:
        """Cursor-based DAAT set ops (``HW2/engine/daat.py:21-91``)."""
        terms = self._known_terms(query)
        if not terms:
            return set()
        cursors = []
        for t in terms:
            entry, reader = self.lookup(t)
            cursors.append(PostingsCursor(reader, t, entry))
        if mode.upper() == "AND":
            return set(_and_daat(cursors))
        return set(_or_daat(cursors))


def _and_daat(cursors):
    heads = [c.docid() for c in cursors]
    if any(h is None for h in heads):
        return
    while True:
        target = max(heads)
        aligned = True
        for i, c in enumerate(cursors):
            if heads[i] < target:
                nxt = c.next_ge(target)
                if nxt is None:
                    return
                heads[i] = nxt
                aligned = False
        if aligned:
            yield target
            for i, c in enumerate(cursors):
                nxt = c.advance()
                if nxt is None:
                    return
                heads[i] = nxt


def _or_daat(cursors):
    heap = [(c.docid(), i) for i, c in enumerate(cursors) if c.docid() is not None]
    heapq.heapify(heap)
    while heap:
        d, i = heapq.heappop(heap)
        yield d
        nxt = cursors[i].advance()
        if nxt is not None:
            heapq.heappush(heap, (nxt, i))
        while heap and heap[0][0] == d:
            _, j = heapq.heappop(heap)
            nxt = cursors[j].advance()
            if nxt is not None:
                heapq.heappush(heap, (nxt, j))


class SearcherActor:
    """Actor-pool stage: score a Dataset of queries against a built index.

    Pass as a CLASS to ``map_batches(SearcherActor, fn_constructor_args=
    (index_dir,), concurrency=N)`` — index state loads once per actor
    (``__init__``), every batch reuses it (SURVEY.md §2.3 T2)."""

    def __init__(self, index_dir: str, topk: int = 10, mode: str = "OR"):
        self.searcher = Searcher(index_dir)
        self.topk = topk
        self.mode = mode

    def __call__(self, batch):
        import pyarrow as pa

        qids, queries = batch["query_id"].to_pylist(), batch["query"].to_pylist()
        out_qid, out_rank, out_docid, out_score = [], [], [], []
        for qid, q in zip(qids, queries):
            for rank, (docid, score) in enumerate(
                self.searcher.bm25_topk(q, self.topk, self.mode), 1
            ):
                out_qid.append(qid)
                out_rank.append(rank)
                out_docid.append(docid)
                out_score.append(score)
        return pa.table(
            {
                "query_id": pa.array(out_qid),
                "rank": pa.array(out_rank, pa.int32()),
                "docid": pa.array(out_docid, pa.uint64()),
                "score": pa.array(out_score, pa.float64()),
            }
        )


def run_queries(
    index_dir: str,
    queries: list[str],
    topk: int = 10,
    mode: str = "OR",
    concurrency: int = 2,
):
    """Score a list of queries with a SearcherActor pool; returns a Dataset
    of (query_id, rank, docid, score)."""
    import ray.data

    items = [{"query_id": i, "query": q} for i, q in enumerate(queries)]
    ds = ray.data.from_items(items, override_num_blocks=max(1, min(len(items), 64)))
    return ds.map_batches(
        SearcherActor,
        fn_constructor_args=(index_dir, topk, mode),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=pool_size(concurrency),
    )
