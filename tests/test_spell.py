"""SymSpell depth-1 suggestions: variant-rule unit contract, engine vs an
independent brute-force edit-distance-<=1 recount over the vocabulary, and
the probe-family behaviors (self-suggest, junk probe emits nothing)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def test_variants_rule():
    from web_search_engine_ray.pipelines.spell import _variants

    assert _variants("ab") == {"ab", "b", "a"}
    assert _variants("a") == {"a", ""}
    # shared-variant <=> edit distance <= 1 (no transpositions)
    def close(x, y):
        return bool(_variants(x) & _variants(y))

    assert close("spark", "spork")  # substitution
    assert close("merge", "mergee")  # insertion
    assert close("windo", "window")  # deletion
    # adjacent transposition IS covered: both sides delete a swapped char
    assert close("spark", "sprak")
    assert not close("spark", "spoon")
    assert not close("spark", "spraks")  # swap + insert = out


def _brute_force(sf, probes):
    """Independent oracle: exhaustive shared-deletion-variant scan written
    against the documented rule, not the engine code."""
    pat = "[a-z0-9]+(?:[.-][a-z0-9]+)*"
    vocab = duckdb.sql(
        f"""
        WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '{pat}')) AS term
                     FROM read_parquet('{sf}/documents.parquet')),
         tf AS (SELECT doc_id, term FROM tok GROUP BY doc_id, term)
        SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
        """
    ).fetchall()

    def var(s):
        out = {s}
        for i in range(len(s)):
            out.add(s[:i] + s[i + 1 :])
        return out

    pv = {p: var(p) for p in probes}
    out = {}
    for p in probes:
        cands = [(df, t) for t, df in vocab if pv[p] & var(t)]
        if cands:
            best = sorted(cands, key=lambda x: (-x[0], x[1]))[0]
            out[p] = (best[1], best[0])
    return out


def test_spell_suggest_vs_bruteforce(ray_session):
    from web_search_engine_ray.pipelines.spell import PROBES, spell_suggest_ds

    t = spell_suggest_ds(SF).to_pandas()
    want = _brute_force(SF, PROBES)
    got = {r["probe"]: (r["suggestion"], r["df"]) for _, r in t.iterrows()}
    assert got == want
    assert "zzqqzz" not in got  # junk probe matches nothing
    assert "data" in got  # vocab probe yields a suggestion (df rule decides)
