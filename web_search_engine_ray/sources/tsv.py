"""MS-MARCO-style TSV corpus source — the reference's native input format.

A reference user's corpus is a TSV of ``<docid>\t<text>`` lines
(``HW2/engine/build_runs_mp.py:60-91``). This converter normalizes such a
corpus into the engine's canonical sorted-Parquet transcript layout so every
pipeline here (build, queries, analysis) runs on it unchanged.

Semantics follow the reference's production MP path, with ONE deliberate
divergence on blank lines:

- **positional docids**: docid = line number (a driver counter in the
  reference, ``build_runs_mp.py:144-151``); the first TSV column is IGNORED,
  the LAST tab field is the text (``parts[-1]``, ``:87``);
- a line with *no tab at all* still indexes — the whole line is its own
  ``parts[-1]``;
- a whitespace-only line consumes a docid and becomes a dl=0 row that
  **counts in N/avgdl**. The reference MP path (``build_runs_mp.py:82-84``)
  instead skips blank lines entirely — the docid is consumed but the row is
  excluded from doc_lengths, so its N/avgdl (and hence BM25 scores) differ
  on corpora containing blank lines. We keep the every-row-has-a-docid rule
  because the engine's dense range-sharded dl store has no notion of a
  docid hole; the divergence is pinned by
  ``tests/test_tsv_source.py::test_blank_line_semantics``.

The conversion runs as Ray tasks over byte-range-planned chunks? No — TSV
has no row-group metadata, so chunking must honor line boundaries: the
driver plans LINE-COUNT offsets with one cheap streaming pass (newline
counting, no parsing), then tasks re-read their byte ranges. For simplicity
and determinism this implementation streams once on the driver and writes
sorted parquet files of ``rows_per_file`` lines; at 100 TB you'd split the
corpus into many TSV files and map this converter over them (file = the
natural unit, exactly how the reference shards MS MARCO).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def tsv_to_corpus(
    tsv_path: str,
    out_dir: str,
    rows_per_file: int = 100_000,
    conv_prefix: str = "d",
) -> list[str]:
    """Convert one TSV file to the canonical transcript-parquet layout.

    Each line becomes one turn: ``conv_id = f"{conv_prefix}{lineno:012d}"``
    (zero-padded so lexicographic order == positional order), ``turn_idx=0``,
    ``text = line.split("\t")[-1]``. Returns the written file list.
    """
    os.makedirs(out_dir, exist_ok=True)
    paths: list[str] = []
    buf_ids: list[str] = []
    buf_text: list[str] = []
    base = 0

    def flush():
        nonlocal base
        if not buf_ids:
            return
        n = len(buf_ids)
        t = pa.table(
            {
                "conv_id": pa.array(buf_ids, pa.string()),
                "turn_idx": pa.array([0] * n, pa.int32()),
                "role": pa.array(["doc"] * n, pa.string()),
                "text": pa.array(buf_text, pa.string()),
                "tool": pa.array([""] * n, pa.string()),
                "ts": pa.array([base + i for i in range(n)], pa.timestamp("us")),
            }
        )
        path = os.path.join(out_dir, f"transcripts_{len(paths):05d}.parquet")
        pq.write_table(t, path + ".tmp")
        os.replace(path + ".tmp", path)
        paths.append(path)
        base += n
        buf_ids.clear()
        buf_text.clear()

    with open(tsv_path, encoding="utf-8", errors="ignore") as f:
        for lineno, line in enumerate(f):
            line = line.rstrip("\n")
            # reference MP path: last tab field is the text; a tab-less line
            # is its own text; whitespace-only lines keep their docid (dl=0)
            text = line.split("\t")[-1] if line.strip() else ""
            buf_ids.append(f"{conv_prefix}{lineno:012d}")
            buf_text.append(text)
            if len(buf_ids) >= rows_per_file:
                flush()
    flush()
    return paths


def build_index_from_tsv(tsv_path: str, out_dir: str, **build_kw) -> dict:
    """Convenience: TSV corpus -> canonical parquet -> full index build.
    docids equal the TSV line numbers (the reference's positional contract)."""
    from web_search_engine_ray.pipelines.build import build_index

    corpus_dir = os.path.join(out_dir, "corpus")
    tsv_to_corpus(tsv_path, corpus_dir)
    return build_index(corpus_dir, out_dir, **build_kw)
