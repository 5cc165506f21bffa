"""Distributed inverted-index build: tokenize -> runs -> shuffle-merge -> shards.

Ray-Data-native replacement for the reference's three-stage external sort
(``build_runs_mp`` -> ``parallel_merge`` -> ``merger``):

- **Phase 1 (runs)**: Dataset-of-partition-descriptors ->
  ``map_batches(_build_partitions)``. Each partition (a run of whole parquet
  row groups, ~``partition_rows`` rows) is tokenized vectorized (polars regex
  over zero-copy Arrow), partially tf-aggregated, sorted by ``(term, docid)``,
  and written as a Parquet run + a doc-length range file + a checkpoint
  manifest (lineage, spans, metrics, content hash). Resume skips partitions
  with valid manifests. This replaces ``HW2/engine/build_runs_mp.py``; docids
  come from the metadata offset plan (``sources.transcripts``), never from
  task completion order.

- **Phase 2 (merge)**: ONE partitioned exchange replaces the reference's
  layered heap merge + single-writer final merge (its stated bottleneck,
  ``HW2/README.md:131``). Every posting gets a group key ``gkey`` — the
  explicit repartition required by the north rule:

    * normal term  -> ``gkey = hash(term) % num_shards``
    * heavy term i -> ``gkey = num_shards + i * n_salts + docid // bucket_width``
      (salted partitioning: a stopword's postings spread over ``n_salts``
      docid-range buckets so no single group ever materializes the full list)

  Two interchangeable exchange strategies (byte-identical output, tested):

    * ``merge_strategy="mapside"`` (default): phase 1 sorts each partition's
      postings by ``(gkey, term, docid)`` and writes ONE PARQUET ROW GROUP
      PER GKEY, recording the gkey -> row-group map in the run manifest. The
      merge is then embarrassingly parallel: one task per normal gkey reads
      exactly its row groups from each run (a map-side-partitioned shuffle,
      MapReduce-style — no sort all-to-all; no task reads a row it doesn't
      own) and encodes the blocked/varbyte shard + lexicon shard. One task
      per HEAVY term streams its salt gkeys in docid-range order through the
      incremental block encoder — O(block) memory, a 10^12-posting stopword
      list is never materialized (unlike the reference's per-term dict,
      ``merger.py:101``).
    * ``merge_strategy="groupby"``: the Ray-native all-to-all —
      ``groupby("gkey").map_groups`` over the runs Dataset; heavy groups
      write docid-sorted bucket partials reconciled by a per-term streaming
      pass. Prefer this when the partition count is so large (~10^6+ per
      job) that mapside's per-gkey row-group fan-in reads would dominate;
      below that, mapside wins outright by deleting the sort shuffle.

Heavy terms are detected BEFORE phase 1 by a deterministic sample pre-pass
over a fixed, partitioning-independent subset of input files (so the run
layout — and every output byte — is invariant to partition size and task
order; missing a true heavy term only costs balance, never correctness).

All shard/run/manifest writes are atomic (tmp + rename) with deterministic
names, so a rerun after a crash reuses finished partitions and rewrites only
the rest, and output bytes are invariant to parallelism (everything is sorted
before encoding; nothing depends on task order).
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import time
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from web_search_engine_ray.functions.tokenize import batch_postings
from web_search_engine_ray.sources.transcripts import (
    corpus_files,
    partition_docids,
    plan_partitions,
    read_partition,
)
from web_search_engine_ray.state import manifest as mf
from web_search_engine_ray.state.docstats import write_stats
from web_search_engine_ray.state.lexicon import LexiconShard, term_shard_array
from web_search_engine_ray.state.listio import PostingsShardWriter


@dataclass
class BuildConfig:
    out_dir: str
    block_size: int = 128  # reference default, HW2/engine/listio.py:7
    codec: str = "varbyte"
    num_shards: int = 8
    n_salts: int = 8
    partition_rows: int = 100_000
    resume: bool = True
    text_column: str = "text"
    # docid shift for doc-range-partitioned builds (this corpus slice is one
    # range of a larger corpus; see pipelines/distributed.py)
    docid_offset: int = 0
    # "mapside" (default: map-side-partitioned runs, no sort all-to-all) or
    # "groupby" (Ray-native sort shuffle) — identical output bytes
    merge_strategy: str = "mapside"
    # docids to EXCLUDE from postings and global stats while PRESERVING the
    # positional docid assignment (compaction rebuilds, pipelines/distributed
    # `compact_deletes`): deleted rows keep a dense dl slot with dl=0 — never
    # consulted, since no posting references them — and don't count in
    # N/avgdl/sum_dl, so the result equals an index over the corpus minus
    # those docs with docids unchanged
    delete_docids: tuple = ()
    # a term is "heavy" (salted) when its sampled df fraction exceeds this
    heavy_df_frac: float = 0.05
    # heavy-detection sample: fixed, partitioning-independent file subset
    heavy_sample_files: int = 8
    heavy_sample_rows: int = 200_000
    manifest_top_terms: int = 64
    # map_batches knobs for the run phase
    run_concurrency: int | None = None

    @property
    def runs_dir(self):
        return os.path.join(self.out_dir, "runs")

    @property
    def doclens_dir(self):
        return os.path.join(self.out_dir, "doclens")

    @property
    def manifests_dir(self):
        return os.path.join(self.out_dir, "manifests")

    @property
    def index_dir(self):
        return os.path.join(self.out_dir, "index")

    @property
    def heavy_dir(self):
        return os.path.join(self.out_dir, "heavy_parts")


def _np(col: pa.ChunkedArray | pa.Array, dtype) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False).astype(dtype, copy=False)


def _sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()[:16]


# ---------------------------------------------------- heavy-term detection


def detect_heavy_sample(files: list[str], cfg: BuildConfig) -> list[str]:
    """Pre-phase-1 heavy-hitter detection over a deterministic sample.

    Reads up to ``heavy_sample_rows`` rows from up to ``heavy_sample_files``
    evenly-spaced input FILES (files are stable across partition sizes, so
    the resulting heavy set — and hence the whole run/shard layout — is
    partitioning-invariant). A term is heavy when its sampled df fraction is
    >= ``heavy_df_frac``. Misses only cost group balance, never correctness.
    """
    if cfg.heavy_df_frac is None or cfg.heavy_df_frac <= 0:
        return []
    import polars as pl

    from web_search_engine_ray.functions.tokenize import token_lists

    k = min(cfg.heavy_sample_files, len(files))
    stride = max(1, len(files) // k)
    sample_files = files[::stride][:k]
    per_file_rows = max(1, cfg.heavy_sample_rows // len(sample_files))

    def _sample_one(path: str) -> tuple[int, dict[str, int]]:
        t = pq.ParquetFile(path).read_row_group(0, columns=[cfg.text_column])
        t = t.slice(0, per_file_rows)
        toks = token_lists(t[cfg.text_column])
        dfp = (
            pl.DataFrame({"term": toks})
            .with_row_index("rid")
            .explode("term", empty_as_null=True)
            .drop_nulls("term")
            .unique(subset=["rid", "term"])
            .group_by("term")
            .len(name="df")
        )
        return t.num_rows, dict(zip(dfp["term"].to_list(), (int(x) for x in dfp["df"].to_list())))

    results: list[tuple[int, dict[str, int]]]
    try:
        import ray

        if ray.is_initialized() and len(sample_files) > 1:
            f = ray.remote(num_cpus=1)(_sample_one)
            results = ray.get([f.remote(p) for p in sample_files])
        else:
            results = [_sample_one(p) for p in sample_files]
    except ImportError:  # pragma: no cover
        results = [_sample_one(p) for p in sample_files]

    acc: dict[str, int] = {}
    n_sampled = 0
    for n_rows, dfs in results:
        n_sampled += n_rows
        for term, df in dfs.items():
            acc[term] = acc.get(term, 0) + df
    if n_sampled == 0:
        return []
    thresh = cfg.heavy_df_frac * n_sampled
    return sorted(t for t, c in acc.items() if c >= thresh)


def make_layout(heavy_terms: list[str], n_docs: int, cfg: BuildConfig) -> dict:
    """The gkey routing contract shared by phase 1 and both merge paths."""
    layout = {
        "S": cfg.num_shards,
        "n_salts": cfg.n_salts,
        "bucket_width": max(1, math.ceil(n_docs / cfg.n_salts)),
        "heavy": list(heavy_terms),
    }
    layout["fp"] = hashlib.sha256(
        json.dumps(layout, sort_keys=True).encode()
    ).hexdigest()[:16]
    return layout


def assign_gkeys(
    terms: pa.ChunkedArray | pa.Array, docids: np.ndarray, layout: dict
) -> np.ndarray:
    """Row-level group keys: hash shard for normal terms, per-docid-range
    salt buckets for heavy terms (the salted repartition)."""
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    S, nsalts = layout["S"], layout["n_salts"]
    heavy_idx = {t: i for i, t in enumerate(layout["heavy"])}
    enc = terms.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    indices = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    shard_of = term_shard_array(uniq, S).astype(np.int64)
    hv = np.array([heavy_idx.get(t, -1) for t in uniq], dtype=np.int64)
    gkey = shard_of[indices]
    hrow = hv[indices]
    mask = hrow >= 0
    if mask.any():
        salt = (docids[mask] // np.uint64(layout["bucket_width"])).astype(np.int64)
        gkey[mask] = S + hrow[mask] * nsalts + salt
    return gkey


# ---------------------------------------------------------------- phase 1


def _build_one_partition(desc: dict, cfg: BuildConfig, layout: dict) -> dict:
    t0 = time.perf_counter()
    pid = desc["pid"]
    run_path = os.path.join(cfg.runs_dir, f"run_{pid:06d}.parquet")
    dl_path = os.path.join(cfg.doclens_dir, f"doclen_{pid:06d}.parquet")
    man_path = os.path.join(cfg.manifests_dir, f"run_{pid:06d}.json")
    fp = mf.descriptor_fingerprint(desc) + ":" + layout["fp"]
    # fingerprint only THIS partition's slice of the delete set, so growing
    # the tombstone union elsewhere in the range never forces an untouched
    # partition to re-tokenize on the next compaction
    sel = np.empty(0, dtype=np.uint64)
    dels = getattr(cfg, "_deletes_np", None)
    if dels is not None and dels.size:
        lo = np.uint64(desc["base_docid"])
        hi = np.uint64(int(desc["base_docid"]) + int(desc["n_rows"]))
        sel = dels[(dels >= lo) & (dels < hi)]
    if sel.size:
        fp += ":del:" + hashlib.sha256(sel.tobytes()).hexdigest()[:16]

    if cfg.resume and mf.partition_done(man_path, fp, [run_path, dl_path]):
        m = mf.read_manifest(man_path)
        m["skipped"] = True
        return m

    tbl = read_partition(desc, columns=[cfg.text_column])
    docids = partition_docids(desc)

    # deletion mask (compaction rebuild): drop deleted rows BEFORE tokenize —
    # their docid slots stay reserved (dl written below as 0)
    alive_mask = None
    n_deleted = 0
    if sel.size:
        alive_mask = ~np.isin(docids, sel)
        n_deleted = int(sel.size)
        tbl = tbl.filter(pa.array(alive_mask))
        docids_full = docids
        docids = docids[alive_mask]
    # tokenize in ~8k-row chunks: large polars string pipelines degrade
    # super-linearly under many-way concurrency (allocator/bandwidth churn);
    # chunking halves the 24-way wall time (measured). Chunk concat keeps
    # docid order ascending per term because chunk docid ranges are disjoint.
    CHUNK = 8192
    if tbl.num_rows <= CHUNK + CHUNK // 2:
        postings, dl = batch_postings(docids, tbl[cfg.text_column])
    else:
        parts, dls = [], []
        for lo in range(0, tbl.num_rows, CHUNK):
            n = min(CHUNK, tbl.num_rows - lo)
            p, d = batch_postings(docids[lo : lo + n], tbl[cfg.text_column].slice(lo, n))
            parts.append(p)
            dls.append(d)
        postings = pa.concat_tables(parts)
        dl = np.concatenate(dls)

    # group-key routing + stable sort by gkey: rows within a gkey keep their
    # (term, docid) order (heavy salts are docid-monotonic), giving the
    # (gkey, term, docid) order the map-side shuffle layout needs
    pdoc = _np(postings["docid"], np.uint64)
    gkey = assign_gkeys(postings["term"], pdoc, layout)
    order = np.argsort(gkey, kind="stable")
    postings = postings.take(pa.array(order, pa.int64()))
    gsorted = gkey[order]
    bounds = np.flatnonzero(np.diff(gsorted, prepend=gsorted[0] - 1)) if gsorted.size else np.array([], dtype=np.int64)
    bounds = np.append(bounds, gsorted.size)
    gkeys_present = [int(gsorted[int(b)]) for b in bounds[:-1]]

    # one parquet row group per gkey — the map-side partitioned run layout
    tmp = run_path + ".tmp"
    writer = pq.ParquetWriter(tmp, postings.schema)
    for i in range(len(gkeys_present)):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        writer.write_table(postings.slice(lo, hi - lo))
    writer.close()
    os.replace(tmp, run_path)

    if alive_mask is not None:
        # keep the dl shard DENSE over the full docid span (the reader
        # indexes by docid - lo): deleted slots get dl=0 and are excluded
        # from sum_dl/N — no posting ever references them
        dl_full = np.zeros(alive_mask.size, dtype=dl.dtype)
        dl_full[alive_mask] = dl
        dl_write_ids, dl_write = docids_full, dl_full
    else:
        dl_write_ids, dl_write = docids, dl
    dl_tbl = pa.table(
        {"docid": pa.array(dl_write_ids, pa.uint64()), "dl": pa.array(dl_write, pa.uint32())}
    ).replace_schema_metadata({"docid_lo": str(int(desc["base_docid"]))})
    tmp = dl_path + ".tmp"
    pq.write_table(dl_tbl, tmp)
    os.replace(tmp, dl_path)

    # per-partition df partials for heavy-hitter detection (term run lengths:
    # postings are (term, docid)-sorted and docid-unique within the partition)
    tcol = postings["term"].combine_chunks()
    counts = tcol.value_counts()
    vals = counts.field("values").to_pylist()
    cnts = np.asarray(counts.field("counts"))
    top = np.argsort(cnts)[::-1][: cfg.manifest_top_terms]
    top_terms = {vals[i]: int(cnts[i]) for i in top}

    m = {
        "pid": pid,
        "descriptor_fp": fp,
        "lineage": {
            "path": desc["path"],
            "row_groups": desc["row_groups"],
        },
        "docid_span": [int(desc["base_docid"]), int(desc["base_docid"] + desc["n_rows"])],
        "n_docs": int(desc["n_rows"]),
        "n_deleted": n_deleted,
        "n_postings": int(postings.num_rows),
        "n_terms": int(len(vals)),
        "sum_dl": int(dl.sum()),
        "top_terms": top_terms,
        "gkeys": gkeys_present,
        "run_sha256": _sha256_file(run_path),
        "wall_s": round(time.perf_counter() - t0, 4),
        "skipped": False,
    }
    mf.write_manifest(man_path, m)
    return m


def build_runs(descs: list[dict], cfg: BuildConfig, layout: dict) -> list[dict]:
    """Phase 1 over Ray Data; returns the per-partition manifests."""
    import ray.data

    for d in (cfg.runs_dir, cfg.doclens_dir, cfg.manifests_dir):
        os.makedirs(d, exist_ok=True)

    def _build_partitions(batch: pa.Table) -> pa.Table:
        out = [_build_one_partition(row, cfg, layout) for row in batch.to_pylist()]
        return pa.table({"manifest": pa.array([json.dumps(m) for m in out], pa.string())})

    ds = ray.data.from_items(descs, override_num_blocks=max(1, len(descs)))
    kw = {}
    if cfg.run_concurrency:
        kw["concurrency"] = cfg.run_concurrency
    res = ds.map_batches(_build_partitions, batch_format="pyarrow", batch_size=None, **kw)
    return [json.loads(s) for s in res.to_pandas()["manifest"]]


# ---------------------------------------------------------------- phase 2


def _encode_normal_shard(batch: pa.Table, sid: int, cfg: BuildConfig, build_fp: str) -> dict:
    """Sort one shard's postings and write shard files (atomic)."""
    t0 = time.perf_counter()
    batch = batch.sort_by([("term", "ascending"), ("docid", "ascending")])
    terms = batch["term"].combine_chunks()
    docids = _np(batch["docid"], np.uint64)
    tfs = _np(batch["tf"], np.uint64)

    # term run boundaries: sorted column -> positions where term changes
    n = len(terms)
    if n > 1:
        neq = pc.not_equal(terms.slice(1), terms.slice(0, n - 1))
        starts = np.concatenate(
            [[0], np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1]
        )
    else:
        starts = np.array([0], dtype=np.int64)
    bounds = np.append(starts, n)
    uniq = terms.take(pa.array(starts, pa.int64())).to_pylist()

    post_path = os.path.join(cfg.index_dir, f"shard_{sid:05d}.postings")
    lex_path = os.path.join(cfg.index_dir, f"shard_{sid:05d}.lexicon")
    w = PostingsShardWriter(post_path + ".tmp", cfg.block_size, cfg.codec)
    entries, names = [], []
    n_postings = 0
    for i in range(len(uniq)):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        d, f = docids[lo:hi], tfs[lo:hi]
        # safety collapse of duplicate (term, docid) — partitions are
        # doc-disjoint so this is a no-op invariant, like the reference's
        # tf-sum at merge (HW2/engine/merger.py:114-132)
        if d.size > 1 and np.any(d[1:] == d[:-1]):
            keep = np.flatnonzero(np.diff(d, prepend=np.uint64(d[0]) - np.uint64(1)))
            f = np.add.reduceat(f, keep)
            d = d[keep]
        entries.append(w.add_term(uniq[i], d, f))
        names.append(uniq[i])
        n_postings += int(d.size)
    size = w.close()
    lex = LexiconShard.from_entries(names, entries)
    lex.save(lex_path + ".tmp")
    os.replace(post_path + ".tmp", post_path)
    os.replace(lex_path + ".tmp", lex_path)
    m = {
        "shard": sid,
        "kind": "normal",
        "build_fp": build_fp,
        "n_terms": len(names),
        "n_postings": n_postings,
        "postings_bytes": size,
        "wall_s": round(time.perf_counter() - t0, 4),
    }
    mf.write_manifest(os.path.join(cfg.manifests_dir, f"shard_{sid:05d}.json"), m)
    return m


def _write_heavy_bucket(batch: pa.Table, term_idx: int, salt: int, cfg: BuildConfig) -> dict:
    t0 = time.perf_counter()
    batch = batch.sort_by([("docid", "ascending")])
    out = pa.table({"docid": batch["docid"], "tf": batch["tf"]})
    path = os.path.join(cfg.heavy_dir, f"heavy_{term_idx:05d}_{salt:03d}.parquet")
    pq.write_table(out, path + ".tmp")
    os.replace(path + ".tmp", path)
    return {
        "kind": "heavy_bucket",
        "term_idx": term_idx,
        "salt": salt,
        "n_postings": batch.num_rows,
        "wall_s": round(time.perf_counter() - t0, 4),
    }


def merge_runs_groupby(
    cfg: BuildConfig,
    layout: dict,
    heavy_terms: list[str],
    build_fp: str,
    run_files: list[str],
) -> list[dict]:
    """Phase 2, Ray-native strategy: groupby(gkey) sort shuffle + per-group
    encode; heavy groups write bucket partials (reconciled in phase 3).
    ``run_files`` is the EXPLICIT file list from the current build's run
    manifests — never a directory glob, which would silently fold in stale
    runs left by a previous build with a different partitioning."""
    import ray.data

    os.makedirs(cfg.index_dir, exist_ok=True)
    os.makedirs(cfg.heavy_dir, exist_ok=True)
    # heavy bucket files are pure intra-merge intermediates (reconciled a
    # few lines below); stale buckets from a previous merge with different
    # salts / heavy sets must not survive into this one's reconcile glob
    for f in os.listdir(cfg.heavy_dir):
        if f.startswith("heavy_") and f.endswith(".parquet"):
            os.remove(os.path.join(cfg.heavy_dir, f))
    S, nsalts = layout["S"], layout["n_salts"]

    def _assign_gkey(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("gkey", pa.array([], pa.int64()))
        gkey = assign_gkeys(batch["term"], _np(batch["docid"], np.uint64), layout)
        return batch.append_column("gkey", pa.array(gkey, pa.int64()))

    def _encode_group(batch: pa.Table) -> pa.Table:
        g = int(batch["gkey"][0].as_py())
        batch = batch.drop_columns(["gkey"])
        if g < S:
            m = _encode_normal_shard(batch, g, cfg, build_fp)
        else:
            h = g - S
            m = _write_heavy_bucket(batch, h // nsalts, h % nsalts, cfg)
        return pa.table({"manifest": pa.array([json.dumps(m)], pa.string())})

    ds = ray.data.read_parquet(run_files)
    ds = ds.map_batches(_assign_gkey, batch_format="pyarrow")
    res = ds.groupby("gkey").map_groups(_encode_group, batch_format="pyarrow")
    df = res.to_pandas()
    ms = [json.loads(s) for s in df["manifest"]] if "manifest" in df.columns else []
    ms = [m for m in ms if m["kind"] == "normal"]
    ms += reconcile_heavy(cfg, heavy_terms, build_fp)
    return ms


def _encode_heavy_shard(
    term_idx: int, term: str, chunks, cfg: BuildConfig, build_fp: str
) -> dict:
    """Stream one heavy term's docid-ascending (docids, tfs) chunks through
    the incremental block encoder into its dedicated shard (atomic), shared
    by both merge strategies."""
    t0 = time.perf_counter()
    sid = cfg.num_shards + term_idx
    post_path = os.path.join(cfg.index_dir, f"shard_{sid:05d}.postings")
    lex_path = os.path.join(cfg.index_dir, f"shard_{sid:05d}.lexicon")
    w = PostingsShardWriter(post_path + ".tmp", cfg.block_size, cfg.codec)
    entry = w.add_term_stream(term, chunks)
    size = w.close()
    lex = LexiconShard.from_entries([term], [entry])
    lex.save(lex_path + ".tmp")
    os.replace(post_path + ".tmp", post_path)
    os.replace(lex_path + ".tmp", lex_path)
    m = {
        "shard": sid,
        "kind": "heavy",
        "term": term,
        "build_fp": build_fp,
        "n_terms": 1,
        "n_postings": entry["df"],
        "postings_bytes": size,
        "wall_s": round(time.perf_counter() - t0, 4),
    }
    mf.write_manifest(os.path.join(cfg.manifests_dir, f"shard_{sid:05d}.json"), m)
    return m


def merge_runs_mapside(
    cfg: BuildConfig, run_manifests: list[dict], layout: dict, build_fp: str
) -> list[dict]:
    """Phase 2, map-side strategy: the runs are already partitioned by gkey
    (one parquet row group per gkey); one task per normal gkey gathers and
    encodes its shard, one task per heavy term streams its salt gkeys in
    docid-range order (runs visited in pid order => globally docid-ascending,
    so no sort and O(block) memory)."""
    import ray.data

    os.makedirs(cfg.index_dir, exist_ok=True)
    S, nsalts = layout["S"], layout["n_salts"]
    heavy_terms = layout["heavy"]

    # gkey -> [(run_path, row_group_ordinal)], runs in pid order
    sources: dict[int, list[tuple[str, int]]] = {}
    for m in sorted(run_manifests, key=lambda x: x["pid"]):
        path = os.path.join(cfg.runs_dir, f"run_{m['pid']:06d}.parquet")
        for ordinal, g in enumerate(m["gkeys"]):
            sources.setdefault(int(g), []).append((path, ordinal))

    items = []
    for g in sorted(k for k in sources if k < S):
        items.append({"kind": "normal", "gkey": g, "srcs": json.dumps(sources[g])})
    for i, term in enumerate(heavy_terms):
        salt_srcs = [sources.get(S + i * nsalts + s, []) for s in range(nsalts)]
        if any(salt_srcs):
            items.append(
                {"kind": "heavy", "idx": i, "term": term, "srcs": json.dumps(salt_srcs)}
            )

    if not items:  # corpus produced no postings at all (all docs token-less)
        return []

    def _read_rg(path: str, ordinal: int, columns) -> pa.Table:
        return pq.ParquetFile(path).read_row_group(ordinal, columns=columns)

    def _one(item: dict) -> dict:
        if item["kind"] == "normal":
            srcs = json.loads(item["srcs"])
            parts = [_read_rg(p, o, ["term", "docid", "tf"]) for p, o in srcs]
            batch = pa.concat_tables(parts)
            return _encode_normal_shard(batch, int(item["gkey"]), cfg, build_fp)
        # heavy: stream salts in order; each salt's runs arrive docid-ascending
        idx, term = int(item["idx"]), item["term"]
        salt_srcs = json.loads(item["srcs"])

        def chunks():
            for srcs in salt_srcs:
                for p, o in srcs:
                    t = _read_rg(p, o, ["docid", "tf"])
                    yield (
                        _np(t["docid"], np.uint64),
                        _np(t["tf"], np.uint64),
                    )

        return _encode_heavy_shard(idx, term, chunks(), cfg, build_fp)

    def _run(batch: pa.Table) -> pa.Table:
        out = [_one(r) for r in batch.to_pylist()]
        return pa.table({"manifest": pa.array([json.dumps(m) for m in out], pa.string())})

    ds = ray.data.from_items(items, override_num_blocks=max(1, len(items)))
    res = ds.map_batches(_run, batch_format="pyarrow", batch_size=None)
    return [json.loads(s) for s in res.to_pandas()["manifest"]]


# ---------------------------------------------------------------- phase 3


def reconcile_heavy(cfg: BuildConfig, heavy_terms: list[str], build_fp: str) -> list[dict]:
    """One task per heavy term: stream salt buckets (docid-range-ordered)
    through the incremental block encoder into a dedicated heavy shard."""
    import ray.data

    if not heavy_terms:
        return []

    def _one(term_idx: int, term: str) -> dict:
        import glob as _g

        parts = sorted(
            _g.glob(os.path.join(cfg.heavy_dir, f"heavy_{term_idx:05d}_*.parquet"))
        )

        def chunks():
            for p in parts:
                pf = pq.ParquetFile(p)
                for b in pf.iter_batches(columns=["docid", "tf"]):
                    d = b.column(0).to_numpy(zero_copy_only=False).astype(np.uint64)
                    f = b.column(1).to_numpy(zero_copy_only=False).astype(np.uint64)
                    yield d, f

        return _encode_heavy_shard(term_idx, term, chunks(), cfg, build_fp)

    items = [{"idx": i, "term": t} for i, t in enumerate(heavy_terms)]
    ds = ray.data.from_items(items, override_num_blocks=len(items))

    def _run(batch: pa.Table) -> pa.Table:
        out = [_one(int(r["idx"]), r["term"]) for r in batch.to_pylist()]
        return pa.table({"manifest": pa.array([json.dumps(m) for m in out], pa.string())})

    res = ds.map_batches(_run, batch_format="pyarrow", batch_size=None)
    return [json.loads(s) for s in res.to_pandas()["manifest"]]


# ---------------------------------------------------------------- driver


def build_index(input_path_or_dir, out_dir: str, **kw) -> dict:
    """End-to-end index build. Returns the build manifest (also written to
    ``<out_dir>/build.json``). Ray must already be initialized by the caller
    (or auto-inits in standalone scripts)."""
    cfg = BuildConfig(out_dir=out_dir, **kw)
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.perf_counter()

    files = corpus_files(input_path_or_dir)
    if not files:
        raise ValueError(f"no parquet files found under {input_path_or_dir!r}")
    for f in (files[0], files[-1]):
        names = pq.read_schema(f).names
        if cfg.text_column not in names:
            raise ValueError(
                f"corpus file {f!r} has no {cfg.text_column!r} column "
                f"(columns: {names}); point --input at the transcript corpus "
                "(a dir of transcript parquet files or a single file), not a "
                "directory of mixed tables"
            )
    descs, n_docs = plan_partitions(files, cfg.partition_rows, cfg.docid_offset)
    heavy = detect_heavy_sample(files, cfg)
    layout = make_layout(heavy, cfg.docid_offset + n_docs, cfg)
    if cfg.delete_docids:
        dels = np.asarray(sorted({int(x) for x in cfg.delete_docids}), dtype=np.uint64)
        cfg._deletes_np = dels
        cfg._delete_fp = hashlib.sha256(dels.tobytes()).hexdigest()[:16]
    t_plan = time.perf_counter()
    run_ms = build_runs(descs, cfg, layout)
    run_ms.sort(key=lambda m: m["pid"])
    total_tokens = sum(m["sum_dl"] for m in run_ms)
    n_deleted = sum(m.get("n_deleted", 0) for m in run_ms)
    n_alive = n_docs - n_deleted
    stats = write_stats(cfg.doclens_dir, n_alive, total_tokens)
    t_runs = time.perf_counter()

    build_fp = hashlib.sha256(
        json.dumps(
            {
                "runs": [m["run_sha256"] for m in run_ms],
                "codec": cfg.codec,
                "block_size": cfg.block_size,
                "layout": layout["fp"],
            },
            sort_keys=True,
        ).encode()
    ).hexdigest()[:16]

    # merge resume: skip the shuffle when every shard manifest matches build_fp
    prev = mf.read_manifest(os.path.join(out_dir, "build.json"))
    shard_ms: list[dict] | None = None
    if cfg.resume and prev and prev.get("build_fp") == build_fp:
        ok = True
        for sm in prev.get("shards", []):
            sp = os.path.join(cfg.index_dir, f"shard_{sm['shard']:05d}.postings")
            lp = os.path.join(cfg.index_dir, f"shard_{sm['shard']:05d}.lexicon")
            if not (os.path.exists(sp) and os.path.exists(lp)):
                ok = False
                break
        if ok:
            shard_ms = prev["shards"]
    if shard_ms is None:
        if cfg.merge_strategy == "mapside":
            shard_ms = merge_runs_mapside(cfg, run_ms, layout, build_fp)
        elif cfg.merge_strategy == "groupby":
            run_files = [
                os.path.join(cfg.runs_dir, f"run_{m['pid']:06d}.parquet")
                for m in run_ms
            ]
            shard_ms = merge_runs_groupby(cfg, layout, heavy, build_fp, run_files)
        else:
            raise ValueError(f"unknown merge_strategy: {cfg.merge_strategy}")
    t_merge = time.perf_counter()

    cfg_dict = asdict(cfg)
    if cfg.delete_docids:
        # don't inline a possibly-large docid list into build.json
        cfg_dict["delete_docids"] = {
            "n": int(cfg._deletes_np.size),
            "fp": cfg._delete_fp,
        }
    build = {
        "config": cfg_dict,
        "build_fp": build_fp,
        "n_docs": n_alive,
        "n_deleted": n_deleted,
        "docid_span": [cfg.docid_offset, cfg.docid_offset + n_docs],
        "total_tokens": total_tokens,
        "avgdl": stats["avgdl"],
        "n_partitions": len(descs),
        "n_postings": sum(m["n_postings"] for m in run_ms),
        "n_terms": sum(m.get("n_terms", 0) for m in shard_ms),
        "heavy_terms": heavy,
        "num_shards": cfg.num_shards,
        "shards": sorted(shard_ms, key=lambda m: m["shard"]),
        "timings": {
            "plan_s": round(t_plan - t0, 3),
            "runs_s": round(t_runs - t_plan, 3),
            "merge_s": round(t_merge - t_runs, 3),
            "total_s": round(t_merge - t0, 3),
        },
    }
    mf.write_manifest(os.path.join(out_dir, "build.json"), build)
    return build
