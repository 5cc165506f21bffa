"""Engine-vs-twin equality on the ADVERSARIAL corpus (tools/
adversarial_gate.py): handcrafted events where event_id order, second-
resolution order, and microsecond order all disagree around session
breaks; embeddings with zero vectors, duplicates, and negations; and
documents with empty texts, exact-dup groups, identical-token-multiset
tie blocks, HTML entities, unicode, and ``[.-]`` token-shape stress.

The driver's generators assign event_id in ts order and draw continuous
values/texts, so an engine/twin pair that disagrees on tie ordering still
hashes green there — this corpus exists to make that class FAIL. It
caught: the zero-vector cosine divergence in the knn_cosine/hybrid_rerank
twins (DuckDB list_cosine_similarity returns -1.0, the engine's zero-
stays-zero gives 0.0); raw-float ranking of exactly-tied tf-idf cosines
in vsm_topk/more_like_this (now round-before-rank both sides); rank-
sensitive RRF pools shifting on nondeterministic SQL sum() float order
(pools now rank+cut on the rounded score); and NULL fingerprints for
zero-token docs in the text_stats twin.

Default run covers the highest-risk entries; WSE_SLOW=1 runs the whole
events + embeddings + text families.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAST_ENTRIES = [
    "events_funnel",
    "events_sessionize",
    "events_window",
    "conversion_lags",
    "knn_cosine",
    "hybrid_rerank",
    # text-family round-before-rank / zero-token pins (the documents plants
    # caught vsm_topk, more_like_this, rrf_fusion, ranker_agreement and
    # text_stats diverging on exact score ties and empty docs)
    "text_stats",
    "vsm_topk",
    "rrf_fusion",
]

SLOW_ENTRIES = [
    "events_hopping",
    "events_asof_join",
    "events_range_join",
    "events_topn_per_user",
    "events_value_quantiles",
    "events_daily_users",
    "events_anomalies",
    "events_retention",
    "events_hourly_profile",
    "events_running_sum",
    "events_value_histogram",
    "json_props_agg",
    "event_paths",
    "transition_matrix",
    "centroid_classify",
    "label_doc_stats",
    "semdedup",
    "embedding_dups",
    "kmeans",
    "value_quantiles_bound",
    # text/dedup families over the planted documents table
    "more_like_this",
    "ranker_agreement",
    "dedup_exact",
    "minhash_lsh_candidates",
    "simhash_dups",
    "containment_dups",
    "dup_spans",
    "quality",
    "repetition_stats",
    "term_burstiness",
    "zipf_slope",
    "dl_quantiles",
    "chunk_docs",
    "pii_redact",
    "bm25_topk_or",
    "ql_topk",
    "postings",
    "doc_lengths",
]


@pytest.fixture(scope="module")
def adversarial_dir(ray_session):
    from tools.adversarial_gate import build_corpus

    return build_corpus()


def test_tokenizer_twin_parity():
    """Python engine tokenizer == the twins' SQL tokenization (lower + UNESC
    entity chain + regex) over EVERY planted adversarial text — entities,
    unicode, [.-] token chains, empties. No Ray needed."""
    import duckdb

    from __ray_entry__ import PAT, UNESC
    from tools.adversarial_gate import build_documents
    from web_search_engine_ray.functions.tokenize import tokenize

    t = build_documents()
    con = duckdb.connect()
    con.register("documents", t)
    rows = con.execute(
        f"SELECT doc_id, regexp_extract_all(lower({UNESC}), '{PAT}')"
        " FROM documents ORDER BY doc_id"
    ).fetchall()
    texts = t["text"].to_pylist()
    for doc_id, toks in rows:
        assert tokenize(texts[doc_id]) == toks, (doc_id, texts[doc_id][:80])


def test_adversarial_fast_entries(adversarial_dir):
    from tools.check_driver import main

    assert main(adversarial_dir, FAST_ENTRIES, shutdown=False) == 0


@pytest.mark.skipif(
    not os.environ.get("WSE_SLOW"), reason="full families: set WSE_SLOW=1"
)
def test_adversarial_full_families(adversarial_dir):
    from tools.check_driver import main

    assert main(adversarial_dir, SLOW_ENTRIES, shutdown=False) == 0


def test_json_props_twin_parity():
    """polars json_path_match + strict Int64 cast (the engine's parse in
    json_props_agg_ds) == the twin's guarded json_valid / digits-regexp /
    TRY_CAST chain, over every pathological props shape the adversarial
    corpora plant: floats round under a bare TRY_CAST (5.7 -> 6), DuckDB's
    json_extract THROWS on malformed JSON where polars yields null, and
    TRY_CAST trims padded strings polars rejects. No Ray needed."""
    import duckdb
    import polars as pl

    cases = [
        '{"k": 5}', '{"k": "5"}', '{"k": 5.7}', '{"k": true}', '{"k": null}',
        '{"k": [1]}', '{"k": {"a":1}}', '{}', '', 'not json', '{"k": 5',
        '{"K": 5}', '{"k": -3}', '{"k": 99999999999999999999}', '[1,2]',
        'null', '{"k": "  7 "}', '{"k": "-0"}', '{"k": 0}', '{"k": "+5"}',
        '{"k": "5e2"}',
    ]
    eng = (
        pl.DataFrame({"props": cases})
        .with_columns(
            pl.col("props")
            .str.json_path_match("$.k")
            .cast(pl.Int64, strict=False)
            .alias("k")
        )["k"]
        .to_list()
    )
    con = duckdb.connect()
    expr = """TRY_CAST(CASE WHEN json_valid(?) AND regexp_matches(
      coalesce(json_extract_string(?, '$.k'), ''), '^[+-]?[0-9]+$')
      THEN json_extract_string(?, '$.k') END AS BIGINT)"""
    for c, a in zip(cases, eng):
        b = con.execute(f"SELECT {expr}", [c, c, c]).fetchone()[0]
        assert a == b, (c, a, b)


@pytest.mark.skipif(
    not os.environ.get("WSE_SLOW"), reason="fuzz gate: set WSE_SLOW=1"
)
def test_fuzz_gate_seed1(ray_session):
    """Seeded RANDOM tie-forcing corpus (tools/adversarial_gate.py --fuzz):
    every distribution collides — scrambled event_ids over coarse
    timestamps, 6-value `value` set, 12-word vocabulary with clones and
    empties, small-integer embeddings. Seed 1 caught hybrid_rerank ranking
    raw cosine where orthogonal int vectors dot to exact 0 in SQL but to
    float cancellation noise after normalize-then-dot."""
    from tools.adversarial_gate import build_fuzz_corpus
    from tools.check_driver import main

    d = build_fuzz_corpus(1)
    assert main(d, FAST_ENTRIES + ["rag_topk", "ann_recall_bounds"],
                shutdown=False) == 0
