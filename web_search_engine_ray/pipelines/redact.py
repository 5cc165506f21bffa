"""PII redaction over the ``documents`` table — the scrubbing pass an LLM
training corpus runs before anything else (emails, SSNs, phone numbers,
IPv4 addresses -> typed placeholder tokens, plus per-doc match counts).

One vectorized ``map_batches`` stage: counts via polars
``str.count_matches`` and redaction via chained ``str.replace_all`` — both
Rust-regex kernels over the whole column, no per-row Python, no shuffle.
The patterns avoid lookaround/backreferences so the Rust regex crate
(engine) and RE2 (DuckDB twin) agree exactly; the pattern constants are
imported by ``__ray_entry__`` and templated into BOTH sides so they cannot
drift.

The synthetic test corpus contains no PII, so a value-level oracle over the
raw text would verify only the identity transform. Instead the operator (and
its twin) first PLANT deterministic PII derived from ``doc_id`` — one email,
one IPv4, one SSN, one phone per row, built by the same string formula in
both engines — then count and redact. Every row therefore exercises every
pattern, and the hash comparison checks real match/replace semantics, not a
no-op. ``plant=False`` gives the production behavior (redact the text as
is); the fixture-based tests cross-check that path against DuckDB directly
on a corpus that does contain PII.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa

from web_search_engine_ray.sources.documents import read_docs as _read_docs

# (name, pattern, replacement) — applied in ORDER (counts are measured on
# the pre-redaction text; replacements chain, so an earlier rule's
# placeholder is never re-matched by a later rule)
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (
        "phone",
        r"\+?\d{1,2}[ .-]?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b",
        "<PHONE>",
    ),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def _planted_expr() -> pl.Expr:
    """text + deterministic per-doc PII (mirrors the SQL twin's formula)."""
    did = pl.col("docid")
    z4 = (did % 10000).cast(pl.Utf8).str.zfill(4)  # == lpad(x, 4, '0')
    return (
        pl.col("text").fill_null("")
        + pl.lit(" contact user")
        + did.cast(pl.Utf8)
        + pl.lit("@example.com ip 10.")
        + (did % 256).cast(pl.Utf8)
        + pl.lit(".")
        + (did % 100).cast(pl.Utf8)
        + pl.lit(".7 ssn 123-45-")
        + z4
        + pl.lit(" call +1 (555) 010-")
        + z4
    )


def pii_redact_ds(sf_dir: str, plant: bool = True):
    """(docid, redacted, n_email, n_ssn, n_phone, n_ipv4). ``plant=True``
    appends the deterministic synthetic PII first (oracle mode — see module
    docstring); ``plant=False`` redacts the stored text as-is."""

    def f(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame(
            {
                "docid": pl.from_arrow(batch["doc_id"]).cast(pl.Int64),
                "text": pl.from_arrow(batch["text"]),
            }
        )
        src = _planted_expr() if plant else pl.col("text").fill_null("")
        red = src
        exprs = []
        for name, pat, repl in PII_PATTERNS:
            exprs.append(
                src.str.count_matches(pat).cast(pl.Int64).alias(f"n_{name}")
            )
            red = red.str.replace_all(pat, repl)
        out = df.select(
            pl.col("docid"), red.alias("redacted"), *exprs
        )
        return out.to_arrow()

    return _read_docs(sf_dir).map_batches(f, batch_format="pyarrow")
