"""Mid-scale oracle conformance (~15k turns, default block size) — opt-in via
``WSE_SLOW=1`` so the default suite stays fast. Catches scale-dependent
regressions (multi-block heavy lists, salt-bucket chaining) between rounds."""

import glob
import os

import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("WSE_SLOW"), reason="set WSE_SLOW=1 to run mid-scale conformance"
)


@pytest.fixture(scope="module")
def mid_corpus(tmp_path_factory):
    from web_search_engine_ray.fixtures.transcripts import write_corpus

    d = tmp_path_factory.mktemp("mid_corpus")
    write_corpus(str(d), n_convs=3500, max_turns=8, rows_per_file=2000)
    return str(d)


def test_midscale_conformance(ray_session, mid_corpus, tmp_path_factory):
    from web_search_engine_ray.oracle import OracleIndex
    from web_search_engine_ray.pipelines.build import build_index
    from web_search_engine_ray.pipelines.query import Searcher

    out = str(tmp_path_factory.mktemp("mid_idx"))
    build = build_index(mid_corpus, out, partition_rows=2000, num_shards=8, n_salts=4)
    rows = []
    for f in sorted(glob.glob(mid_corpus + "/*.parquet")):
        rows.extend(pq.read_table(f, columns=["text"])["text"].to_pylist())
    oracle = OracleIndex.build(list(enumerate(rows)))
    assert build["n_docs"] == oracle.N
    assert build["n_postings"] == sum(len(p) for p in oracle.index.values())
    s = Searcher(out)
    # heavy terms fully decoded vs oracle
    for t in build["heavy_terms"]:
        d, f = s.postings(t)
        wd, wf = oracle.postings(t)
        assert d.tolist() == wd and f.tolist() == wf, t
    # rank identity on mixed queries
    for q in ["the data", "w0001 w0002", "data data", "u.s 3.14"]:
        got = sorted(s.bm25_topk(q, 10, "OR"), key=lambda x: (-x[1], x[0]))
        want = sorted(oracle.ranked_daat(q, 10, "OR"), key=lambda x: (-x[1], x[0]))
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (wd_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9)


def test_midscale_dedup_oracles(ray_session):
    """Dedup-family oracle conformance at sf0.1 (5,000 docs — one decade
    above the sf0.01 gate) plus the bigram-LM score, where multi-block
    exchanges and bucket skew actually engage."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod
    from web_search_engine_ray.pipelines import dedup

    sf = "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if pd.api.types.is_integer_dtype(df[c]):
                df[c] = df[c].astype("int64")
            elif pd.api.types.is_float_dtype(df[c]):
                df[c] = df[c].astype("float64").round(9)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    from web_search_engine_ray.pipelines import analysis
    from web_search_engine_ray.pipelines.sketch import sample_docs

    sqls = entrymod.oracle_sql()
    for name, fn in [
        ("simhash_dups", lambda: dedup.simhash_dups(sf).to_pandas()),
        ("dedup_exact", lambda: dedup.exact_dedup_ds(sf).to_pandas()),
        ("sample_docs", lambda: sample_docs(sf, k=100).to_pandas()),
        ("lm_score", lambda: analysis.lm_score_ds(sf).to_pandas()),
    ]:
        got = canon(fn())
        want = canon(con.sql(sqls[name]).df())
        assert got.equals(want), name


def test_midscale_rows_only_contracts(ray_session):
    """The rows-only entries' property contracts at sf0.1 (the sf0.01
    versions run in the default suite): IVF recall vs exact kNN,
    embedding-LSH subset + recall vs the exact block-pair answer, and the
    HLL estimate inside its theoretical error bound vs the exact distinct
    count."""
    import duckdb
    import pytest as _pytest

    from web_search_engine_ray.pipelines import dedup
    from web_search_engine_ray.pipelines.similarity import ivf_knn, knn_cosine
    from web_search_engine_ray.pipelines.sketch import HLL_P, hll_distinct_terms

    sf = "/root/testdata/sf0.1"

    # IVF recall: nprobe=4 of 16 cells must keep >= half the exact top-k
    exact = knn_cosine(sf, n_queries=3, topk=10).to_pandas()
    approx = ivf_knn(sf, n_queries=3, topk=10, n_cells=16, nprobe=4).to_pandas()
    em = {(q, v): c for q, v, c in exact.itertuples(index=False)}
    hits = 0
    for q, v, c in approx.itertuples(index=False):
        if (q, v) in em:
            hits += 1
            assert abs(em[(q, v)] - c) < 1e-9
    assert hits / len(exact) >= 0.5, hits / len(exact)

    # embedding LSH: subset of exact, recall >= 0.8, cos agree on shared
    e_pairs = dedup.embedding_dups(sf, tau=0.45).to_pandas()
    a_pairs = dedup.embedding_dups_lsh(sf, tau=0.45).to_pandas()
    ke = set(zip(e_pairs["vec_id_a"], e_pairs["vec_id_b"]))
    ka = set(zip(a_pairs["vec_id_a"], a_pairs["vec_id_b"]))
    assert ka <= ke
    assert len(ka & ke) / max(1, len(ke)) >= 0.8
    ecos = {(a, b): c for a, b, c in e_pairs.itertuples(index=False)}
    for a, b, c in a_pairs.itertuples(index=False):
        assert ecos[(a, b)] == _pytest.approx(c, abs=2e-6)  # f32 transport

    # HLL estimate vs exact distinct terms (DuckDB twin of the tokenizer's
    # distinct-count is not available, so count via the engine's term_stats
    # oracle instead)
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    exact_terms = con.sql(
        f"SELECT COUNT(*) AS n FROM ({entrymod.oracle_sql()['term_stats']})"
    ).fetchone()[0]
    est = hll_distinct_terms(sf)["estimate"][0].as_py()
    rel_err = abs(est - exact_terms) / exact_terms
    # 3 sigma of the HLL standard error 1.04/sqrt(2^p)
    assert rel_err <= 3 * 1.04 / (1 << HLL_P) ** 0.5, (est, exact_terms)


def test_midscale_round3_oracles(ray_session):
    """sf0.1 oracle conformance for the round-3 additions: duplicated-span
    detection/removal, phrase + proximity search, DSIR weights, PMI
    collocations, exact dl quantiles."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.1"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if pd.api.types.is_integer_dtype(df[c]):
                df[c] = df[c].astype("int64")
            elif pd.api.types.is_float_dtype(df[c]):
                df[c] = df[c].astype("float64").round(9)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    q = entrymod.queries()
    sqls = entrymod.oracle_sql()
    for name in (
        "dup_spans",
        "dup_span_clean",
        "phrase_search",
        "proximity_search",
        "dsir_weights",
        "collocations",
        "dl_quantiles",
    ):
        res = q[name](sf)
        got = canon(res.to_pandas() if hasattr(res, "to_pandas") else res)
        want = canon(con.sql(sqls[name]).df())
        assert got.equals(want), name


def test_midscale_bpe_and_bloom(ray_session):
    """Rows-only round-3 contracts at sf0.1: BPE trainer vs the naive
    recount on the real word-frequency relation, and the Bloom increment
    scan's no-false-negative guarantee against the exact dup relation."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_bpe import naive_bpe

    from web_search_engine_ray.pipelines import dedup
    from web_search_engine_ray.pipelines.bpe import train_bpe, word_frequencies

    sf = "/root/testdata/sf0.1"
    freqs = word_frequencies(sf, max_words=2000)
    assert train_bpe(sf, n_merges=50, max_words=2000) == naive_bpe(list(freqs), 50)

    # exact dups across the prior/new boundary must never scan as novel
    exact = dedup.exact_dedup_ds(sf).to_pandas()  # (text_hash, min docid)
    novel = (
        dedup.incremental_novel_ds(sf, prior_max_docid=100)
        .to_pandas()
        .set_index("docid")["novel"]
    )
    import pyarrow.parquet as pq_

    t = pq_.read_table(sf + "/documents.parquet", columns=["doc_id", "text"])
    import hashlib as _h

    prior_hashes = {
        "NULL" if x is None else _h.md5(x.encode()).hexdigest()
        for i, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        if i < 100
    }
    for i, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        if i >= 100:
            hx = "NULL" if x is None else _h.md5(x.encode()).hexdigest()
            if hx in prior_hashes:
                assert not novel.loc[i], i


def test_midscale_recall_error_contracts(ray_session):
    """Round-3/4 recall + error contracts at sf0.1: IVF/PQ recall floors vs
    exact knn, quantile-summary rank error on events.value, Bloom FPR bound
    on the incremental scan."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq_

    sf = "/root/testdata/sf0.1"

    from web_search_engine_ray.pipelines.similarity import (
        ANN_RECALL_FLOORS,
        ivf_knn,
        knn_cosine,
        pq_knn,
    )

    exact = knn_cosine(sf, 3, 10).to_pandas()
    ep = set(zip(exact["query_id"], exact["vec_id"]))
    for fn, floor in ((ivf_knn, ANN_RECALL_FLOORS["ivf"]), (pq_knn, ANN_RECALL_FLOORS["pq"])):
        a = fn(sf, 3, 10).to_pandas()
        hits = sum((q, v) in ep for q, v in zip(a["query_id"], a["vec_id"]))
        assert hits / len(ep) >= floor, (fn.__name__, hits / len(ep))

    # quantile summary rank error (same normalized tolerance as the unit test)
    from web_search_engine_ray.pipelines.sketch import value_quantile_sketch_ds

    t = value_quantile_sketch_ds(sf)
    vals = pq_.read_table(sf + "/events.parquet", columns=["value"])["value"].to_numpy(
        zero_copy_only=False
    )
    vals = np.sort(vals[~np.isnan(vals)])
    for q, est in zip(t["q"].to_pylist(), t["value_est"].to_pylist()):
        r = np.searchsorted(vals, est, side="right")
        assert abs(r / vals.size - q) < 0.01, (q, est)

    # Bloom FPR: among TRULY-novel increment docs, the "probably seen"
    # fraction must stay tiny (theory ~(kn/m)^k ~ 3e-11 at n=2500, m=2^22,
    # k=4; 1e-3 allows generous slack while still catching a broken filter)
    from web_search_engine_ray.pipelines import dedup

    prior_max = 2500
    got = (
        dedup.incremental_novel_ds(sf, prior_max_docid=prior_max)
        .to_pandas()
        .set_index("docid")["novel"]
    )
    tdocs = pq_.read_table(sf + "/documents.parquet", columns=["doc_id", "text"])
    hx = [
        "NULL" if x is None else hashlib.md5(x.encode()).hexdigest()
        for x in tdocs["text"].to_pylist()
    ]
    ids = tdocs["doc_id"].to_pylist()
    prior_hashes = {h for i, h in zip(ids, hx) if i < prior_max}
    truly_novel = [i for i, h in zip(ids, hx) if i >= prior_max and h not in prior_hashes]
    fp = sum(1 for i in truly_novel if not got.loc[i])
    assert fp / max(1, len(truly_novel)) <= 1e-3, fp


def test_largescale_episode_split_identity(ray_session):
    """Gap-free ~0.46M-turn corpus: episode split is the IDENTITY (every
    turn lands in episode 0 — the fixture's 7 s turn gaps are far under the
    1800 s rule). Checked distributed: per-batch (rows, nonzero) partials,
    never a driver materialization of the per-turn relation."""
    import glob

    import pyarrow as pa

    from web_search_engine_ray.fixtures.transcripts import write_corpus_ray
    from web_search_engine_ray.pipelines.transcripts_ops import (
        conversation_episode_split_ds,
    )

    d = "/tmp/wse_slow_epi_corpus_c100000"
    write_corpus_ray(d, n_convs=100_000, max_turns=8)
    n_rows = sum(
        pq.read_metadata(f).num_rows for f in glob.glob(d + "/*.parquet")
    )

    def counts(t: pa.Table) -> pa.Table:
        nz = int(
            (t["episode_idx"].combine_chunks().to_numpy(zero_copy_only=False) != 0).sum()
        )
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "nonzero": pa.array([nz], pa.int64()),
            }
        )

    parts = (
        conversation_episode_split_ds(d)
        .map_batches(counts, batch_format="pyarrow")
        .to_pandas()
    )
    assert int(parts["n"].sum()) == n_rows
    assert int(parts["nonzero"].sum()) == 0


@pytest.mark.skipif(not os.environ.get("WSE_SLOW"), reason="set WSE_SLOW=1")
def test_sf01_twins_slow(ray_session, oracle_eq):
    """sf0.1 oracle equality for the round-4 families the sf0.01 gate
    samples (larger corpus, same twins): grep, pagerank, funnel,
    burstiness."""
    import duckdb

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in ["documents", "events"]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    for q in ["substring_search", "regex_search", "pagerank",
              "events_funnel", "term_burstiness"]:
        got = entrymod.queries()[q](sf)
        oracle_eq(got, con.sql(entrymod.oracle_sql()[q]).df())
