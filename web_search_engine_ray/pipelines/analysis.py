"""Text-analysis operators over the ``documents`` table: per-doc statistics,
quality signals, fingerprints, and a language-ID heuristic.

Training-data-pipeline extensions (beyond the reference's operator set). Each
stage is a vectorized ``map_batches`` transform; ``text_stats_ds`` has an
exact DuckDB-SQL twin, ``langid_ds`` is heuristic (rows-only check).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from web_search_engine_ray.functions.tokenize import token_lists

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "zu"},
    "fr": {"le", "la", "de", "et", "un", "est", "que", "pour"},
}


def _read_docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def text_stats_ds(sf_dir: str):
    """(docid, n_tokens, n_uniq, n_chars, stop_ratio, mean_token_len,
    fingerprint): token counting, quality ratios, and a normalized-content
    fingerprint (md5 of the space-joined token stream)."""

    def f(batch: pa.Table) -> pa.Table:
        toks = token_lists(batch["text"]).to_list()
        texts = batch["text"].to_pylist()
        n_tok, n_uniq, stop_r, mean_len, fps = [], [], [], [], []
        for tl in toks:
            tl = tl or []
            n = len(tl)
            n_tok.append(n)
            n_uniq.append(len(set(tl)))
            stop_r.append(round(sum(1 for t in tl if t in STOPWORDS) / n, 6) if n else 0.0)
            mean_len.append(round(sum(len(t) for t in tl) / n, 6) if n else 0.0)
            fps.append(hashlib.md5(" ".join(tl).encode("utf-8")).hexdigest())
        return pa.table(
            {
                "docid": batch["doc_id"].cast(pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_uniq": pa.array(n_uniq, pa.int64()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                "stop_ratio": pa.array(stop_r, pa.float64()),
                "mean_token_len": pa.array(mean_len, pa.float64()),
                "fingerprint": pa.array(fps, pa.string()),
            }
        )

    return _read_docs(sf_dir).map_batches(f, batch_format="pyarrow")


def quality_ds(sf_dir: str, min_tokens: int = 5, max_stop_ratio: float = 0.6):
    """(docid, quality_ok): simple keep/drop quality gate — length bounds +
    stopword-ratio cap (the usual first-pass corpus filter shape)."""

    def f(batch: pa.Table) -> pa.Table:
        toks = token_lists(batch["text"]).to_list()
        ok = []
        for tl in toks:
            tl = tl or []
            n = len(tl)
            sr = sum(1 for t in tl if t in STOPWORDS) / n if n else 1.0
            ok.append(bool(n >= min_tokens and sr <= max_stop_ratio))
        return pa.table(
            {
                "docid": batch["doc_id"].cast(pa.int64()),
                "quality_ok": pa.array(ok, pa.bool_()),
            }
        )

    return _read_docs(sf_dir).map_batches(f, batch_format="pyarrow")


class LangIdStage:
    """Actor-pool language-ID stage: stopword-hit voting per language.

    Stateful-stage shape on purpose (tables built once in ``__init__``, reused
    per batch) — the pattern a real fasttext/CLD model would use."""

    def __init__(self):
        self.tables = {k: frozenset(v) for k, v in LANG_STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = token_lists(batch["text"]).to_list()
        langs = []
        for tl in toks:
            tl = tl or []
            best, best_hits = "unknown", 0
            for lang, sw in sorted(self.tables.items()):
                hits = sum(1 for t in tl if t in sw)
                if hits > best_hits:
                    best, best_hits = lang, hits
            langs.append(best)
        return pa.table(
            {
                "docid": batch["doc_id"].cast(pa.int64()),
                "lang_pred": pa.array(langs, pa.string()),
            }
        )


def langid_ds(sf_dir: str, concurrency: int = 2):
    return _read_docs(sf_dir).map_batches(
        LangIdStage, batch_format="pyarrow", concurrency=concurrency
    )


def lm_score_ds(sf_dir: str):
    """(docid, lm_score): corpus-self bigram language-model quality score —
    the classic LM-based training-data filter shape.

    Model: bigram counts over the whole corpus (pairs within a doc, no BOS);
    per-doc score = mean over its bigrams of
    ``ln((C(w1,w2) + 1) / (C(w1·) + V))`` (add-1 smoothing, V = distinct
    unigram count, C(w1·) = bigram-prefix count). Docs with < 2 tokens score
    0.0. Scale shape: counts are per-batch partials merged by a small
    groupby, the finished model is broadcast once (``ray.put``) and the
    scoring pass streams. At this corpus size the model collection happens
    driver-side; the SQL oracle computes the identical quantity."""
    import ray
    import ray.data

    def partial_counts(batch: pa.Table):
        toks = token_lists(batch["text"]).to_list()
        bi: dict[tuple[str, str], int] = {}
        uni: set[str] = set()
        for tl in toks:
            tl = tl or []
            uni.update(tl)
            for a, b in zip(tl, tl[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
        return bi, uni

    # pass 1: model (driver-merged partials; small relative to the corpus)
    bi_counts: dict[tuple[str, str], int] = {}
    vocab: set[str] = set()
    ds = _read_docs(sf_dir)
    for batch in ds.iter_batches(batch_format="pyarrow"):
        bi, uni = partial_counts(batch)
        vocab.update(uni)
        for k, v in bi.items():
            bi_counts[k] = bi_counts.get(k, 0) + v
    prefix: dict[str, int] = {}
    for (a, _b), c in bi_counts.items():
        prefix[a] = prefix.get(a, 0) + c
    V = float(len(vocab))
    model_ref = ray.put((bi_counts, prefix, V))

    # pass 2: streaming score
    def score(batch: pa.Table) -> pa.Table:
        import math

        bi, pre, v = ray.get(model_ref)
        toks = token_lists(batch["text"]).to_list()
        out = []
        for tl in toks:
            tl = tl or []
            if len(tl) < 2:
                out.append(0.0)
                continue
            s = 0.0
            n = 0
            for a, b in zip(tl, tl[1:]):
                s += math.log((bi.get((a, b), 0) + 1.0) / (pre.get(a, 0) + v))
                n += 1
            out.append(round(s / n, 6))
        return pa.table(
            {
                "docid": batch["doc_id"].cast(pa.int64()),
                "lm_score": pa.array(out, pa.float64()),
            }
        )

    return _read_docs(sf_dir).map_batches(score, batch_format="pyarrow")


def rolling_fingerprint_ds(sf_dir: str, window: int = 8):
    """(docid, window_idx, whash): rolling window hashes over the token
    stream — document fingerprinting for containment/overlap detection."""

    def f(batch: pa.Table) -> pa.Table:
        toks = token_lists(batch["text"]).to_list()
        ids = batch["doc_id"].to_pylist()
        d_l, w_l, h_l = [], [], []
        for did, tl in zip(ids, toks):
            tl = tl or []
            for i in range(0, max(len(tl) - window + 1, 0), window // 2):
                chunk = " ".join(tl[i : i + window])
                d_l.append(did)
                w_l.append(i)
                h_l.append(hashlib.blake2b(chunk.encode(), digest_size=8).hexdigest())
        return pa.table(
            {
                "docid": pa.array(d_l, pa.int64()),
                "window_idx": pa.array(w_l, pa.int64()),
                "whash": pa.array(h_l, pa.string()),
            }
        )

    return _read_docs(sf_dir).map_batches(f, batch_format="pyarrow")
