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


# ---------------------------------------------------------- sharded serving


def test_fnv_vector_scalar_twins():
    import numpy as np
    import pyarrow as pa

    from web_search_engine_ray.pipelines.spell import _fnv1a64, _fnv1a64_column

    words = ["", "a", "data", "zzqqzz", "x" * 40, "naïve", "日本語", "merge"]
    vec = _fnv1a64_column(pa.array(words, pa.string()))
    assert [int(v) for v in vec] == [_fnv1a64(w) for w in words]
    # sliced arrays (non-zero arrow offset) hash identically
    sl = pa.array(words, pa.string()).slice(2, 4)
    assert [int(v) for v in _fnv1a64_column(sl)] == [_fnv1a64(w) for w in words[2:6]]


def test_variant_frame_matches_rule():
    from web_search_engine_ray.pipelines.spell import _variant_frame, _variants

    terms = ["data", "a", "merge", "zz"]
    dfs = [5, 1, 3, 2]
    f = _variant_frame(terms, dfs)
    got: dict[str, set] = {}
    for v, t in zip(f["variant"], f["term"]):
        got.setdefault(t, set()).add(v)
    for t in terms:
        assert got[t] == _variants(t)


@pytest.fixture(scope="module")
def spell_index_dir(ray_session, tmp_path_factory):
    from web_search_engine_ray.fixtures.transcripts import write_corpus
    from web_search_engine_ray.pipelines.build import build_index

    corpus = tmp_path_factory.mktemp("spell_corpus")
    write_corpus(str(corpus), n_convs=200, max_turns=6, rows_per_file=400)
    out = str(tmp_path_factory.mktemp("spell_idx"))
    build_index(str(corpus), out, partition_rows=500, num_shards=4, n_salts=2)
    return out


def test_sharded_spell_index(spell_index_dir):
    """Sharded serving state: exact vs a whole-vocab brute force, artifact
    persisted beside the lexicon, per-shard memory bounded, lazy loading."""
    import os

    from web_search_engine_ray.pipelines.query import Searcher
    from web_search_engine_ray.pipelines.spell import (
        N_SPELL_SHARDS,
        SpellIndex,
        _variants,
    )

    searcher = Searcher(spell_index_dir)
    idx = SpellIndex.from_searcher(searcher)
    spell_dir = os.path.join(spell_index_dir, "spell")
    assert os.path.exists(os.path.join(spell_dir, "meta.json"))
    shard_files = [f for f in os.listdir(spell_dir) if f.endswith(".parquet")]
    assert len(shard_files) == N_SPELL_SHARDS

    # whole-vocab brute force (the OLD in-memory shape) as the oracle
    terms, dfs = [], []
    n_lex = int(searcher.build["num_shards"]) + len(searcher.build["heavy_terms"])
    for sid in range(n_lex):
        lex = searcher._lexicon(sid)
        if lex is None or not len(lex):
            continue
        terms.extend(lex.terms)
        dfs.extend(int(x) for x in lex.df)
    best: dict[str, tuple[int, str]] = {}
    for term, df in zip(terms, dfs):
        for v in _variants(term):
            cur = best.get(v)
            if cur is None or (-df, term) < (-cur[0], cur[1]):
                best[v] = (df, term)

    def brute(word):
        cand = None
        for v in _variants(word):
            hit = best.get(v)
            if hit and (cand is None or (-hit[0], hit[1]) < (-cand[0], cand[1])):
                cand = hit
        return cand[1] if cand else None

    probes = ["dta", "data", "mergee", "windo", "zzqqzz"] + terms[:50]
    for p in probes:
        assert idx.suggest(p) == brute(p), p

    # bounded per-shard state: no shard holds more than ~3x its fair share
    import pyarrow.parquet as pq

    counts = [
        pq.read_metadata(os.path.join(spell_dir, f)).num_rows for f in shard_files
    ]
    assert sum(counts) == len(best)
    assert max(counts) <= max(64, 3 * sum(counts) // len(counts))

    # lazy loading: a fresh handle loads only the probed variants' shards
    fresh = SpellIndex.from_searcher(searcher)
    assert fresh.loaded_shards() == []
    fresh.suggest("dta")
    assert 0 < len(fresh.loaded_shards()) <= len("dta") + 1


# -- fuzzy (ED<=1) search -------------------------------------------------------


def test_lev1_semantics():
    from web_search_engine_ray.pipelines.spell import _lev1

    assert _lev1("spark", "spark")          # identity
    assert _lev1("spark", "spar")           # deletion
    assert _lev1("spar", "spark")           # insertion
    assert _lev1("spark", "spork")          # substitution
    assert not _lev1("ab", "ba")            # transposition = 2 in plain Lev
    assert not _lev1("spark", "spa")        # distance 2
    assert not _lev1("spark", "sporks")     # sub + insert


def test_fuzzy_search_planted(ray_session, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_search_engine_ray.pipelines.spell import fuzzy_search_table

    d = tmp_path_factory.mktemp("fuzzy_docs")
    texts = ["spark rules", "spork here", "spa day", "sparkle lots", "other"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = fuzzy_search_table(str(d), queries=["spark"]).to_pandas()
    # spark (identity), spork (sub); spa is ED 2; sparkle is ED 2
    assert list(got.docid) == [0, 1]


def test_fuzzy_search_matches_oracle(ray_session, oracle_eq):
    import duckdb

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    oracle_eq(
        entrymod.queries()["fuzzy_search"](sf),
        con.sql(entrymod.oracle_sql()["fuzzy_search"]).df(),
    )
