"""Query spell correction: symmetric-delete (SymSpell depth-1) suggestions
over the corpus vocabulary — the "did you mean" fallback for query terms the
lexicon doesn't know.

Rule (exact, shared with the SQL twin): two strings are candidates iff
``{x} ∪ deletes1(x)`` and ``{y} ∪ deletes1(y)`` intersect — the standard
SymSpell depth-1 candidate set: substitution (same-position delete on both
sides), insertion/deletion (one-sided delete), adjacent transposition (each
side deletes one of the swapped characters), plus the handful of other
both-sides-delete-to-the-same-string pairs. The suggestion for a probe is
the candidate with the highest document
frequency, ties to the lexicographically first term. The rule ranks purely
by df — a probe that IS a vocab term usually suggests itself, but a much
more frequent distance-1 neighbor can outrank it (deliberate: that is how
SymSpell handles typo-shaped rare vocab words; pin with the ``data`` probe).

Shape: the probe set is tiny and broadcast (``ray.put`` of the
variant->probe inverted map); the vocabulary relation streams through one
``map_batches`` that emits only (probe, term, df) candidate rows —
candidate-scale, never vocabulary-scale — merged on the driver. At 10^9
terms the same pass runs unchanged; only the per-batch variant generation
grows with term length (len+1 strings per term, memo-free by design: terms
stream once).

The reference engine silently drops unknown query terms
(``HW2/engine/searcher.py:60-68``); this is the capability a real search
box layers on top.
"""

from __future__ import annotations

import json
import os

import numpy as np
import polars as pl
import pyarrow as pa

# misspellings of the fixed-query vocabulary: substitution, insertion,
# deletion, an exact vocab word (self-suggests), and an unmatchable junk
# probe (emits nothing) — mirrored into the SQL twin via PROBES
PROBES = ["spork", "mergee", "windo", "dta", "data", "zzqqzz"]


def _variants(s: str) -> set[str]:
    """{s} ∪ all single-character deletions of s."""
    return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}


def spell_suggest_ds(sf_dir: str, probes: list[str] | None = None) -> pa.Table:
    """(probe, suggestion, df): best distance-<=1 vocab term per probe."""
    import ray

    from web_search_engine_ray.pipelines.corpus import term_stats_ds

    probes = probes if probes is not None else PROBES
    inv: dict[str, list[str]] = {}
    for p in probes:
        for v in _variants(p):
            inv.setdefault(v, []).append(p)
    bref = ray.put(inv)

    def partial(batch: pa.Table) -> pa.Table:
        pvm = ray.get(bref)
        terms = batch["term"].to_pylist()
        dfs = batch["df"].to_pylist()
        out_p, out_t, out_d = [], [], []
        for term, df in zip(terms, dfs):
            hits: set[str] = set()
            for v in _variants(term):
                ps = pvm.get(v)
                if ps:
                    hits.update(ps)
            for p in hits:
                out_p.append(p)
                out_t.append(term)
                out_d.append(int(df))
        return pa.table(
            {
                "probe": pa.array(out_p, pa.string()),
                "term": pa.array(out_t, pa.string()),
                "df": pa.array(out_d, pa.int64()),
            }
        )

    parts = term_stats_ds(sf_dir).map_batches(partial, batch_format="pyarrow").to_pandas()
    out_p, out_s, out_d = [], [], []
    if not parts.empty:
        for probe, grp in parts.groupby("probe"):
            best = grp.sort_values(["df", "term"], ascending=[False, True]).iloc[0]
            out_p.append(probe)
            out_s.append(best["term"])
            out_d.append(int(best["df"]))
    order = np.argsort(out_p, kind="stable")
    return pa.table(
        {
            "probe": pa.array([out_p[i] for i in order], pa.string()),
            "suggestion": pa.array([out_s[i] for i in order], pa.string()),
            "df": pa.array([out_d[i] for i in order], pa.int64()),
        }
    )


# ----------------------------------------------------------- serving state
#
# Variant -> best (df, term) maps sharded by hash(variant), persisted beside
# the lexicon (``<index_dir>/spell/shard_{i:05d}.parquet``) and lazy-loaded
# per shard — the same serving model as the lexicon itself: each process
# holds O(vocab / n_shards) of the map, never the whole vocabulary.

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
SPELL_VERSION = "v2"
N_SPELL_SHARDS = 8


def _fnv1a64(s: str) -> int:
    """FNV-1a 64-bit over the utf-8 bytes — the scalar routing twin of
    :func:`_fnv1a64_column` (query-time, one variant at a time)."""
    h = _FNV_OFFSET
    for b in s.encode("utf-8"):
        h = ((h ^ b) * _FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
    return h


def _fnv1a64_column(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized FNV-1a 64 over a string column: numpy passes over the raw
    arrow byte buffer, one pass per character position (max_len iterations,
    each vectorized over every still-active string)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.large_utf8())
    buf_off = np.frombuffer(arr.buffers()[1], np.int64)
    offsets = buf_off[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    starts = offsets[:-1]
    lengths = (offsets[1:] - starts).astype(np.int64)
    h = np.full(len(arr), np.uint64(_FNV_OFFSET))
    prime = np.uint64(_FNV_PRIME)
    max_len = int(lengths.max()) if len(lengths) else 0
    for k in range(max_len):
        active = lengths > k
        if not active.any():
            break
        byte = data[starts[active] + k].astype(np.uint64)
        h[active] = (h[active] ^ byte) * prime  # u64 wraps, matching scalar
    return h


def variant_shard(variant: str, n_shards: int) -> int:
    """Query-time variant -> spell-shard routing."""
    return _fnv1a64(variant) % n_shards


def _variant_frame(terms: list[str], dfs) -> "pl.DataFrame":
    """(variant, term, df) rows for one lexicon shard, vectorized: the
    identity variant plus every single-character deletion via polars string
    slicing (terms are ASCII by the tokenizer's charset, so byte slices ==
    character deletions)."""
    import polars as pl

    base = pl.DataFrame(
        {"term": terms, "df": [int(x) for x in dfs]},
        schema={"term": pl.Utf8, "df": pl.Int64},
    )
    ident = base.select(variant=pl.col("term"), term="term", df="df")
    dels = (
        base.with_columns(i=pl.int_ranges(0, pl.col("term").str.len_chars()))
        .explode("i", empty_as_null=False)  # len-0 terms: no deletion rows
        .select(
            variant=pl.col("term").str.slice(0, pl.col("i"))
            + pl.col("term").str.slice(pl.col("i") + 1),
            term="term",
            df="df",
        )
    )
    return pl.concat([ident, dels])


def build_spell_shards(
    searcher, spell_dir: str, n_spell_shards: int = N_SPELL_SHARDS
) -> dict:
    """Persist the variant->best maps beside the index. Streams ONE lexicon
    shard at a time (bounded memory: O(vocab / n_lex_shards) live rows),
    scatters per-variant-shard partials to disk, then reduces each variant
    shard independently — a disk-based exchange, the single-process analogue
    of the build pipeline's hash exchange."""
    import polars as pl
    import pyarrow.parquet as pq

    import shutil
    import tempfile

    # PRIVATE scratch dir per build: a fixed shared tmp/ made concurrent
    # builders (two server workers on a fresh index) rmtree each other's
    # partials mid-build and install a silently incomplete map; crashed
    # builds' orphans are swept here instead of trusted
    for stale in os.listdir(spell_dir) if os.path.isdir(spell_dir) else []:
        if stale.startswith("tmp"):
            shutil.rmtree(os.path.join(spell_dir, stale), ignore_errors=True)
    tmp_dir = tempfile.mkdtemp(prefix="tmp_build_", dir=spell_dir)
    n_lex = int(searcher.build["num_shards"]) + len(
        searcher.build.get("heavy_terms", [])
    )
    for lid in range(n_lex):
        lex = searcher._lexicon(lid)
        if lex is None or not len(lex):
            continue
        frame = _variant_frame(lex.terms, lex.df)
        # reduce to per-variant best within this lexicon shard first: cuts
        # partial rows before they hit disk, and the reduce is associative
        frame = frame.sort(
            ["variant", "df", "term"], descending=[False, True, False]
        ).unique(subset="variant", keep="first", maintain_order=True)
        tbl = frame.to_arrow()
        shard_ids = _fnv1a64_column(tbl["variant"]) % np.uint64(n_spell_shards)
        for sid in np.unique(shard_ids):
            part = tbl.take(np.nonzero(shard_ids == sid)[0])
            pq.write_table(
                part, os.path.join(tmp_dir, f"part_{lid:05d}_{int(sid):05d}.parquet")
            )
    n_variants = 0
    for sid in range(n_spell_shards):
        parts = sorted(
            os.path.join(tmp_dir, f)
            for f in os.listdir(tmp_dir)
            if f.endswith(f"_{sid:05d}.parquet")
        )
        if parts:
            merged = pl.concat([pl.read_parquet(p) for p in parts])
            merged = merged.sort(
                ["variant", "df", "term"], descending=[False, True, False]
            ).unique(subset="variant", keep="first", maintain_order=True)
        else:
            merged = pl.DataFrame(
                schema={"variant": pl.Utf8, "term": pl.Utf8, "df": pl.Int64}
            )
        n_variants += len(merged)
        out = os.path.join(spell_dir, f"shard_{sid:05d}.parquet")
        # stage inside the private dir (two builders racing on a shared
        # ".tmp" name could replace a half-written file); os.replace is
        # atomic within the same filesystem
        staged = os.path.join(tmp_dir, f"shard_{sid:05d}.staged.parquet")
        merged.write_parquet(staged)
        os.replace(staged, out)
    shutil.rmtree(tmp_dir, ignore_errors=True)
    meta = {
        "version": SPELL_VERSION,
        "n_shards": n_spell_shards,
        "n_variants": n_variants,
        "build_fp": searcher.build.get("build_fp", ""),
    }
    mpath = os.path.join(spell_dir, "meta.json")
    with open(mpath + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(mpath + ".tmp", mpath)
    return meta


class SpellIndex:
    """Serving-side suggestion state, sharded by ``hash(variant)``.

    Keeping only the best candidate per variant is exact: the global pick is
    ``max over variants of (per-variant best)`` under the same total order
    (df desc, term asc). Shards load lazily on first probe, so a process
    serving a few shards' worth of traffic holds only those shards; each
    shard is O(vocab x avg_term_len / n_shards) strings."""

    def __init__(self, spell_dir: str, n_shards: int):
        self.dir = spell_dir
        self.n_shards = int(n_shards)
        self._shards: dict[int, dict[str, tuple[int, str]]] = {}

    @classmethod
    def from_searcher(
        cls, searcher, n_spell_shards: int = N_SPELL_SHARDS
    ) -> "SpellIndex":
        """Open (building if missing or stale) the spell artifact beside the
        index. The build streams one lexicon shard at a time; reopening an
        already-built index costs nothing until the first probe."""
        spell_dir = os.path.join(searcher.dir, "spell")
        meta = None
        mpath = os.path.join(spell_dir, "meta.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                meta = json.load(f)
            if (
                meta.get("version") != SPELL_VERSION
                or meta.get("n_shards") != n_spell_shards
                or meta.get("build_fp") != searcher.build.get("build_fp", "")
            ):
                meta = None
        if meta is None:
            try:
                os.makedirs(spell_dir, exist_ok=True)
                meta = build_spell_shards(searcher, spell_dir, n_spell_shards)
            except OSError:
                # read-only index mount: build the artifact in the tmp
                # cache instead of failing create_app at startup (round-3
                # behavior was in-memory-only; keep serving possible)
                import hashlib

                key = hashlib.sha256(
                    f"{searcher.dir}:{searcher.build.get('build_fp', '')}".encode()
                ).hexdigest()[:16]
                spell_dir = os.path.join("/tmp", "wse_ray_cache", f"spell_{key}")
                mpath = os.path.join(spell_dir, "meta.json")
                meta = None
                if os.path.exists(mpath):
                    with open(mpath) as f:
                        meta = json.load(f)
                    if (
                        meta.get("version") != SPELL_VERSION
                        or meta.get("n_shards") != n_spell_shards
                        or meta.get("build_fp")
                        != searcher.build.get("build_fp", "")
                    ):
                        meta = None
                if meta is None:
                    os.makedirs(spell_dir, exist_ok=True)
                    meta = build_spell_shards(searcher, spell_dir, n_spell_shards)
        return cls(spell_dir, meta["n_shards"])

    def _shard(self, sid: int) -> dict[str, tuple[int, str]]:
        m = self._shards.get(sid)
        if m is None:
            import pyarrow.parquet as pq

            path = os.path.join(self.dir, f"shard_{sid:05d}.parquet")
            if os.path.exists(path):
                t = pq.read_table(path)
                m = dict(
                    zip(
                        t["variant"].to_pylist(),
                        zip(t["df"].to_pylist(), t["term"].to_pylist()),
                    )
                )
            else:
                m = {}
            self._shards[sid] = m
        return m

    def loaded_shards(self) -> list[int]:
        """Shard ids currently resident (for bounded-memory checks)."""
        return sorted(self._shards)

    def suggest(self, word: str) -> str | None:
        """Best shared-variant candidate for ``word`` (None if no candidate).
        Routes each of the word's len+1 variants to its owning shard."""
        cand: tuple[int, str] | None = None
        for v in _variants(word):
            hit = self._shard(variant_shard(v, self.n_shards)).get(v)
            if hit is not None and (
                cand is None or (-hit[0], hit[1]) < (-cand[0], cand[1])
            ):
                cand = hit
        return cand[1] if cand else None


# -- fuzzy (edit-distance <= 1) term search ------------------------------------

FUZZY_QUERIES = ["spark", "jon", "merg", "customes", "zzzz"]


def _lev1(a: str, b: str) -> bool:
    """Plain Levenshtein(a, b) <= 1 (no transpositions — DuckDB's
    ``levenshtein`` semantics, the twin)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # one insertion: a must equal b minus one char
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def fuzzy_candidate_terms_ds(sf_dir: str, queries: list[str]):
    """(query_id, term) vocabulary terms within Levenshtein 1 of each query
    word — the SymSpell deletes trick run as a DISTRIBUTED vocabulary scan:
    the query words' deletion variants broadcast (tiny), each vocab batch
    generates its own variants VECTORIZED (the spell artifact's polars
    slicing) and semi-joins; sharing a deletion (or identity) is necessary
    for ED<=1 but not sufficient ('ab'/'ba' share a deletion at distance
    2), so survivors get an exact ``_lev1`` verify — candidates per query
    are a handful, the scan never leaves vectorized land."""
    import ray.data

    from web_search_engine_ray.pipelines.corpus import term_stats_ds

    qv = []
    for qid, w in enumerate(queries):
        for v in {w} | {w[:i] + w[i + 1 :] for i in range(len(w))}:
            qv.append((v, qid))
    qtab = pa.table(
        {
            "variant": pa.array([v for v, _ in qv], pa.string()),
            "query_id": pa.array([q for _, q in qv], pa.int64()),
        }
    )
    import ray

    qref = ray.put(qtab)
    qwords = list(queries)

    def scan(t: pa.Table) -> pa.Table:
        frame = _variant_frame(
            t["term"].to_pylist(), np.zeros(t.num_rows, np.int64)
        )
        hits = (
            frame.join(
                pl.from_arrow(ray.get(qref)), on="variant", how="inner"
            )
            .select("query_id", "term")
            .unique()
        )
        if hits.height:
            keep = [
                _lev1(qwords[int(q)], trm)
                for q, trm in zip(hits["query_id"], hits["term"])
            ]
            hits = hits.filter(pl.Series(keep))
        return hits.to_arrow().cast(
            pa.schema([("query_id", pa.int64()), ("term", pa.string())])
        )

    return term_stats_ds(sf_dir).map_batches(scan, batch_format="pyarrow")


def fuzzy_search_table(
    sf_dir: str, queries: list[str] | None = None
) -> pa.Table:
    """(query_id, docid): documents containing ANY term within edit
    distance 1 of the query word — typo-tolerant boolean search (the
    reference silently drops unknown terms; this recovers them). Matched
    terms come from the distributed vocab scan; docids are the boolean-OR
    postings union from the same index state BM25 serves."""
    import ray

    from web_search_engine_ray.pipelines.serving import documents_searcher

    queries = queries if queries is not None else FUZZY_QUERIES
    s = documents_searcher(sf_dir)
    # empty blocks ride through with a degenerate schema (Ray skips the
    # UDF on them): keep only real rows
    parts = [
        t
        for t in ray.get(fuzzy_candidate_terms_ds(sf_dir, queries).to_arrow_refs())
        if t.num_rows
    ]
    cand = (
        pa.concat_tables(parts)
        if parts
        else pa.table(
            {"query_id": pa.array([], pa.int64()), "term": pa.array([], pa.string())}
        )
    )
    terms_by_q: dict[int, set[str]] = {}
    for q, t in zip(cand["query_id"].to_pylist(), cand["term"].to_pylist()):
        terms_by_q.setdefault(int(q), set()).add(t)
    q_l, d_l = [], []
    for qid in range(len(queries)):
        docs = [
            s.postings(t)[0]
            for t in sorted(terms_by_q.get(qid, ()))
        ]
        docs = [d for d in docs if d.size]
        if not docs:
            continue
        u = np.unique(np.concatenate(docs)).astype(np.int64)
        q_l.append(np.full(u.size, qid, np.int64))
        d_l.append(u)
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(q_l) if q_l else [], pa.int64()),
            "docid": pa.array(np.concatenate(d_l) if d_l else [], pa.int64()),
        }
    )
