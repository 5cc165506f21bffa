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

import numpy as np
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


class SpellIndex:
    """Serving-side suggestion state: variant -> best (df, term) candidate,
    built once from an index's OWN lexicon shards (no Ray, no corpus scan —
    the vocabulary and df are already on disk next to the postings).

    Keeping only the best candidate per variant is exact: the global pick is
    ``max over variants of (per-variant best)`` under the same total order
    (df desc, term asc). Memory is O(vocab x avg_term_len) strings; at 10^9
    terms the map shards by ``hash(variant)`` exactly like the lexicon —
    same routing, one more artifact per shard."""

    def __init__(self, terms, dfs):
        best: dict[str, tuple[int, str]] = {}
        for term, df in zip(terms, dfs):
            df = int(df)
            for v in _variants(term):
                cur = best.get(v)
                if cur is None or (-df, term) < (-cur[0], cur[1]):
                    best[v] = (df, term)
        self._best = best

    @classmethod
    def from_searcher(cls, searcher) -> "SpellIndex":
        """Collect (term, df) from every lexicon shard (normal + heavy)."""
        terms: list[str] = []
        dfs: list[int] = []
        n_shards = int(searcher.build["num_shards"]) + len(
            searcher.build.get("heavy_terms", [])
        )
        for sid in range(n_shards):
            lex = searcher._lexicon(sid)
            if lex is None or not len(lex):
                continue
            terms.extend(lex.terms)
            dfs.extend(int(x) for x in lex.df)
        return cls(terms, dfs)

    def suggest(self, word: str) -> str | None:
        """Best shared-variant candidate for ``word`` (None if no candidate)."""
        cand: tuple[int, str] | None = None
        for v in _variants(word):
            hit = self._best.get(v)
            if hit is not None and (cand is None or (-hit[0], hit[1]) < (-cand[0], cand[1])):
                cand = hit
        return cand[1] if cand else None
