"""web_search_engine_ray — a Ray-Data-native inverted-index build + BM25 query engine.

A from-scratch reimplementation of the *capabilities* of the reference
``siyanlau/Web-Search-Engine`` (external-sort inverted index + blocked/compressed
postings + Boolean-DAAT / BM25 query engine), re-expressed Ray-Data-first:

- corpus = a Parquet table of multi-turn transcripts ``(conv_id, turn_idx, role,
  text, tool, ts)``; one *turn* is one document,
- tokenize / posting extraction = ``Dataset.map_batches`` over zero-copy Arrow,
- run build = per-partition sorted ``(term, docid, tf)`` Parquet runs with
  per-partition checkpoint manifests (lineage + metrics),
- merge = ONE hash shuffle on (salted) term replacing the reference's
  layered heap-merge (``HW2/engine/merger.py`` / ``parallel_merge.py``),
- final index = sharded blocked postings (varbyte + delta-gap, the reference's
  logical block layout, ``HW2/engine/listio.py:9-94``) + per-shard lexicons,
- query = stateful searcher actors holding lexicon/postings/doc-length shards,
  DAAT BM25 top-k rank-identical to the reference (``HW2/engine/daat_ranker.py``).

See SURVEY.md for the full blueprint and file:line parity citations.
"""

__version__ = "0.1.0"
