"""Blocked postings shard files (write / read / block-seek).

Keeps the reference's *logical* per-term layout (``HW2/engine/listio.py:9-94``):
postings of a term are split into blocks of ≤ ``block_size`` (default 128)
``(docid, tf)`` pairs; each block stores its encoded docid segment followed by
its encoded freq segment (``[doc_bytes][freq_bytes]`` back-to-back); docids are
delta-gap encoded within a block against ``base = previous block's last
docid`` (0 for the first block); a per-block directory
``{offset, doc_bytes, freq_bytes, last_docid}`` enables O(log B) block seeks
(``HW2/engine/lexicon.py:6-27``).

Differences from the reference (documented, SURVEY.md §7.5):

- the postings FILE is a *shard* — one of ``num_shards`` independent files
  keyed by ``hash(term) % num_shards`` — so the final merge is embarrassingly
  parallel instead of the reference's single-writer bottleneck
  (``HW2/README.md:131``);
- "raw" codec stores docids u64 LE (u32 caps at 4.3e9 docs; we target 10^12);
- encode/decode are numpy-vectorized (whole-term at once) rather than
  per-integer Python loops. Gap chaining across blocks means a term's gap
  stream is just ``diff(docids)`` with ``gap[0] = docid[0]``, so whole-term
  encode/decode is a single vectorized pass; the block directory only decides
  where the byte stream is split.

Rank/score parity requires identical *decoded* ``(docids, tfs, df)`` per term,
not identical bytes — the reference's own conformance check compares decoded
lists (``HW2/engine/testrun.py:94-99``).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np

from web_search_engine_ray.functions import codecs

BLOCK_SIZE = 128  # reference default, HW2/engine/listio.py:7


def _chunk_sums(sizes: np.ndarray, block_size: int) -> np.ndarray:
    """Sum ``sizes`` in consecutive chunks of ``block_size``."""
    starts = np.arange(0, sizes.size, block_size)
    return np.add.reduceat(sizes, starts)


class PostingsShardWriter:
    """Append-only writer for one postings shard file.

    ``add_term`` must be called in the caller's canonical term order with
    docids strictly ascending (the ordering contract of the reference run
    format, ``HW2/engine/runio.py:102-104``). Returns a lexicon entry.
    """

    def __init__(self, path: str, block_size: int = BLOCK_SIZE, codec: str = "varbyte"):
        self.path = path
        self.block_size = int(block_size)
        self.codec = codec.lower()
        if self.codec not in ("varbyte", "raw"):
            raise ValueError(f"unknown codec: {codec}")
        self.file = open(path, "wb")
        self._offset = 0

    def _encode_write_blocks(
        self, d: np.ndarray, f: np.ndarray, base: int
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Encode ``(d, f)`` (a whole number of blocks, except possibly the
        final partial one) starting from gap base ``base`` and append to the
        file. Returns per-block (offset, doc_bytes, freq_bytes, last, max_tf)."""
        bs = self.block_size
        df = int(d.size)
        nblocks = (df + bs - 1) // bs
        if self.codec == "varbyte":
            gaps = codecs.delta_encode(d, base)
            doc_bytes_all = codecs.vb_encode(gaps)
            doc_sizes = codecs.vb_sizes(gaps)
            freq_bytes_all = codecs.vb_encode(f)
            freq_sizes = codecs.vb_sizes(f)
            blk_doc_bytes = _chunk_sums(doc_sizes, bs)
            blk_freq_bytes = _chunk_sums(freq_sizes, bs)
        else:
            doc_bytes_all = d.astype("<u8").tobytes()
            freq_bytes_all = f.astype("<u4").tobytes()
            counts = np.full(nblocks, bs, dtype=np.int64)
            counts[-1] = df - bs * (nblocks - 1)
            blk_doc_bytes = counts * 8
            blk_freq_bytes = counts * 4

        doc_ends = np.cumsum(blk_doc_bytes)
        freq_ends = np.cumsum(blk_freq_bytes)
        blk_offset = np.empty(nblocks, dtype=np.int64)
        pos = self._offset
        dmv, fmv = memoryview(doc_bytes_all), memoryview(freq_bytes_all)
        d0 = f0 = 0
        write = self.file.write
        for i in range(nblocks):
            blk_offset[i] = pos
            d1, f1 = int(doc_ends[i]), int(freq_ends[i])
            write(dmv[d0:d1])
            write(fmv[f0:f1])
            pos += (d1 - d0) + (f1 - f0)
            d0, f0 = d1, f1
        self._offset = pos
        starts = np.arange(0, df, bs)
        blk_last = d[np.minimum(starts + bs, df) - 1]
        blk_max_tf = np.maximum.reduceat(f, starts)
        return (
            blk_offset,
            blk_doc_bytes.astype(np.int64),
            blk_freq_bytes.astype(np.int64),
            blk_last.astype(np.uint64),
            blk_max_tf.astype(np.uint64),
        )

    def add_term(self, term: str, docids: np.ndarray, freqs: np.ndarray) -> dict:
        d = np.ascontiguousarray(docids, dtype=np.uint64)
        f = np.ascontiguousarray(freqs, dtype=np.uint64)
        df = int(d.size)
        if df == 0:
            raise ValueError(f"empty postings for term {term!r}")
        start_offset = self._offset
        blk_offset, blk_doc_bytes, blk_freq_bytes, blk_last, blk_max_tf = (
            self._encode_write_blocks(d, f, 0)
        )
        nblocks = blk_offset.size
        # blk_max_tf powers score-safe block-max WAND pruning at query
        # time (an extension; the reference has none, HW2/README.md:132-133)
        return {
            "offset": start_offset,
            "df": df,
            "nblocks": nblocks,
            "codec": self.codec,
            "blk_offset": blk_offset,
            "blk_doc_bytes": blk_doc_bytes.astype(np.int64),
            "blk_freq_bytes": blk_freq_bytes.astype(np.int64),
            "blk_last_docid": blk_last.astype(np.uint64),
            "blk_max_tf": blk_max_tf.astype(np.uint64),
        }

    def add_term_stream(self, term: str, chunks) -> dict:
        """Encode one term's postings from an iterator of ``(docids, freqs)``
        chunks WITHOUT ever materializing the full list — O(block_size +
        chunk) memory. This is how a 10^12-doc stopword list is encoded
        (SURVEY.md §7.6.3); chunks must be docid-ascending across the whole
        stream (salt buckets arrive in docid-range order)."""
        bs = self.block_size
        start_offset = self._offset
        parts = {k: [] for k in ("off", "db", "fb", "last", "mtf")}
        buf_d = np.empty(0, dtype=np.uint64)
        buf_f = np.empty(0, dtype=np.uint64)
        prev_last = 0
        df = 0

        def _flush(d, f, base):
            off, db, fb, last, mtf = self._encode_write_blocks(d, f, base)
            parts["off"].append(off)
            parts["db"].append(db)
            parts["fb"].append(fb)
            parts["last"].append(last)
            parts["mtf"].append(mtf)
            return int(last[-1])

        for d, f in chunks:
            d = np.ascontiguousarray(d, dtype=np.uint64)
            f = np.ascontiguousarray(f, dtype=np.uint64)
            df += int(d.size)
            buf_d = np.concatenate([buf_d, d]) if buf_d.size else d
            buf_f = np.concatenate([buf_f, f]) if buf_f.size else f
            nfull = (buf_d.size // bs) * bs
            if nfull:
                prev_last = _flush(buf_d[:nfull], buf_f[:nfull], prev_last)
                buf_d, buf_f = buf_d[nfull:], buf_f[nfull:]
        if buf_d.size:
            prev_last = _flush(buf_d, buf_f, prev_last)
        if df == 0:
            raise ValueError(f"empty postings for term {term!r}")
        return {
            "offset": start_offset,
            "df": df,
            "nblocks": int(sum(a.size for a in parts["off"])),
            "codec": self.codec,
            "blk_offset": np.concatenate(parts["off"]),
            "blk_doc_bytes": np.concatenate(parts["db"]),
            "blk_freq_bytes": np.concatenate(parts["fb"]),
            "blk_last_docid": np.concatenate(parts["last"]),
            "blk_max_tf": np.concatenate(parts["mtf"]),
        }

    def close(self) -> int:
        self.file.close()
        return self._offset


class _DecodedLRU:
    """Byte-bounded LRU for decoded posting arrays (the engine's version of
    the reference's decoded-block cache, ``HW2/profkit.py:30-47``). Values
    are (docids, freqs) numpy pairs, marked read-only before caching so a
    mutating caller fails loudly instead of corrupting later hits."""

    def __init__(self, max_bytes: int):
        self.max_bytes = int(max_bytes)
        self.bytes = 0
        self.hits = 0
        self.misses = 0
        self._d: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}

    def get(self, key: tuple):
        got = self._d.get(key)
        if got is None:
            self.misses += 1
            return None
        self.hits += 1
        self._d[key] = self._d.pop(key)  # refresh LRU position
        return got

    def put(self, key: tuple, docids: np.ndarray, freqs: np.ndarray):
        sz = int(docids.nbytes + freqs.nbytes)
        if sz > self.max_bytes:
            return  # one giant list must not evict the whole cache
        docids.setflags(write=False)
        freqs.setflags(write=False)
        while self.bytes + sz > self.max_bytes and self._d:
            oldest = next(iter(self._d))
            d, f = self._d.pop(oldest)
            self.bytes -= int(d.nbytes + f.nbytes)
        self._d[key] = (docids, freqs)
        self.bytes += sz


class PostingsShardReader:
    """Reads a postings shard written by :class:`PostingsShardWriter`.

    The shard file is memory-mapped read-only: block decodes slice the map
    directly (zero syscalls per block, OS page cache shared across query
    actors on a node — the serving model the reference approximates with one
    open fd per Searcher, ``HW2/engine/searcher.py:28``). On top of the page
    cache sits a byte-bounded LRU of DECODED arrays (``cache_bytes``, 0
    disables) keyed per block and per whole term — repeated terms (stopword
    queries, WAND re-seeks) skip the varbyte decode entirely. Pass an
    existing :class:`_DecodedLRU` as ``cache`` to SHARE one budget across
    many readers (a Searcher over thousands of shards must have one global
    bound, not one per shard — keys carry the shard path).

    Copy before mutating anything returned by read_postings/_decode_block:
    cached arrays are read-only."""

    def __init__(
        self,
        path: str,
        cache_bytes: int = 32 << 20,
        cache: "_DecodedLRU | None" = None,
    ):
        import mmap

        self.path = path
        self.file = open(path, "rb")
        size = os.fstat(self.file.fileno()).st_size
        self._mm = (
            mmap.mmap(self.file.fileno(), 0, access=mmap.ACCESS_READ) if size else None
        )
        self._view = memoryview(self._mm) if self._mm is not None else memoryview(b"")
        if cache is not None:
            self.cache = cache
        else:
            self.cache = _DecodedLRU(cache_bytes) if cache_bytes else None

    def close(self) -> None:
        self._view.release()
        if self._mm is not None:
            self._mm.close()
        self.file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _read_extent(self, entry: dict) -> memoryview:
        start = int(entry["offset"])
        total = int(entry["blk_doc_bytes"].sum() + entry["blk_freq_bytes"].sum())
        return self._view[start : start + total]

    def read_postings(self, entry: dict) -> tuple[np.ndarray, np.ndarray]:
        """Full postings of a term -> (docids u64, freqs u64), whole-term
        vectorized decode (gap chaining makes concatenated doc segments one
        valid gap stream with base 0). Cached per term (read-only arrays —
        copy before mutating)."""
        if self.cache is not None:
            key = ("t", self.path, int(entry["offset"]))
            hit = self.cache.get(key)
            if hit is not None:
                return hit
        buf = self._read_extent(entry)
        db, fb = entry["blk_doc_bytes"], entry["blk_freq_bytes"]
        rel = entry["blk_offset"] - entry["offset"]
        if entry["codec"] == "varbyte":
            doc_parts = [buf[int(r) : int(r + n)] for r, n in zip(rel, db)]
            freq_parts = [buf[int(r + n) : int(r + n + m)] for r, n, m in zip(rel, db, fb)]
            docids = codecs.decode_docids(b"".join(doc_parts), 0)
            freqs = codecs.decode_freqs(b"".join(freq_parts))
        else:
            doc_parts = [buf[int(r) : int(r + n)] for r, n in zip(rel, db)]
            freq_parts = [buf[int(r + n) : int(r + n + m)] for r, n, m in zip(rel, db, fb)]
            docids = np.frombuffer(b"".join(doc_parts), dtype="<u8").astype(np.uint64)
            freqs = np.frombuffer(b"".join(freq_parts), dtype="<u4").astype(np.uint64)
        if self.cache is not None:
            self.cache.put(("t", self.path, int(entry["offset"])), docids, freqs)
        return docids, freqs

    def _decode_block(self, entry: dict, bidx: int) -> tuple[np.ndarray, np.ndarray]:
        if self.cache is not None:
            key = ("b", self.path, int(entry["offset"]), bidx)
            hit = self.cache.get(key)
            if hit is not None:
                return hit
        off = int(entry["blk_offset"][bidx])
        db = int(entry["blk_doc_bytes"][bidx])
        fb = int(entry["blk_freq_bytes"][bidx])
        base = int(entry["blk_last_docid"][bidx - 1]) if bidx > 0 else 0
        raw = self._view[off : off + db + fb]
        if entry["codec"] == "varbyte":
            docids = codecs.decode_docids(raw[:db], base)
            freqs = codecs.decode_freqs(raw[db:])
        else:
            docids = np.frombuffer(raw[:db], dtype="<u8").astype(np.uint64)
            freqs = np.frombuffer(raw[db:], dtype="<u4").astype(np.uint64)
        if docids.size != freqs.size:
            raise ValueError("corrupt block: docid/freq length mismatch")
        if self.cache is not None:
            self.cache.put(("b", self.path, int(entry["offset"]), bidx), docids, freqs)
        return docids, freqs

    def read_tfs_for(self, entry: dict, targets: np.ndarray) -> np.ndarray:
        """tf lookup for a sorted docid array: decode ONLY the blocks that can
        contain a target (block directory seek), 0 where absent. Falls back to
        a full-list read when the targets touch most blocks anyway."""
        t = np.ascontiguousarray(targets, dtype=np.uint64)
        out = np.zeros(t.size, dtype=np.uint64)
        if t.size == 0 or entry["df"] == 0:
            return out
        last = entry["blk_last_docid"]
        blk = np.searchsorted(last, t, side="left")
        valid = blk < entry["nblocks"]
        blocks = np.unique(blk[valid])
        if blocks.size > max(8, entry["nblocks"] // 2):
            d_all, f_all = self.read_postings(entry)
            pos = np.searchsorted(d_all, t)
            ok = pos < d_all.size
            ok[ok] = d_all[pos[ok]] == t[ok]
            out[ok] = f_all[pos[ok]]
            return out
        for b in blocks:
            d, f = self._decode_block(entry, int(b))
            sel = np.flatnonzero(valid & (blk == b))
            pos = np.searchsorted(d, t[sel])
            ok = pos < d.size
            ok[ok] &= d[pos[ok]] == t[sel][ok]
            out[sel[ok]] = f[pos[ok]]
        return out

    def iter_blocks(self, entry: dict) -> Iterator[tuple[int, np.ndarray, np.ndarray]]:
        """Yield ``(last_docid, docids, freqs)`` per block in order."""
        for b in range(entry["nblocks"]):
            docids, freqs = self._decode_block(entry, b)
            yield int(entry["blk_last_docid"][b]), docids, freqs

    def seek_block_ge(self, entry: dict, target_docid: int):
        """First block whose ``last_docid >= target`` (binary search on the
        block directory — ``HW2/engine/listio.py:179-226`` semantics).
        Returns ``(block_index, last_docid, docids, freqs)`` or ``None``."""
        last = entry["blk_last_docid"]
        bidx = int(np.searchsorted(last, max(target_docid, 0), side="left"))
        if bidx >= entry["nblocks"]:
            return None
        docids, freqs = self._decode_block(entry, bidx)
        return bidx, int(last[bidx]), docids, freqs


def shard_path(index_dir: str, shard: int, kind: str) -> str:
    return os.path.join(index_dir, f"shard_{shard:05d}.{kind}")
