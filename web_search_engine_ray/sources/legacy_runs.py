"""Reference-format posting-run files: legacy TSV and binary RUN1.

The reference engine's external-sort intermediates come in two formats its
merger auto-detects per file (``HW2/engine/merger.py:37-51``):

- **legacy TSV** (``HW2/engine/runio.py:13-77``): one ``term<TAB>docid<TAB>tf``
  line per posting, globally sorted by (term, docid);
- **binary RUN1** (``HW2/engine/runio.py:87-160``): magic ``b"RUN1"`` then
  per-term groups ``[len_term:u32][term][n:u32][docid:u32 x n][tf:u32 x n]``,
  little-endian, terms in sorted order.

This module reads BOTH into Arrow ``(term: string, docid: uint64,
tf: uint32)`` tables — the engine's native run schema — with the same
magic-sniff autodetection, and writes both for round-trip tests and for
exporting runs a reference deployment can consume. Parsing is vectorized:
TSV via pyarrow's C CSV reader, RUN1 via ``np.frombuffer`` group walks
(one Python iteration per TERM, not per posting).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyarrow import csv as pacsv

RUN1_MAGIC = b"RUN1"

RUN_SCHEMA = pa.schema(
    [("term", pa.string()), ("docid", pa.uint64()), ("tf", pa.uint32())]
)


def detect_run_format(path: str) -> str:
    """'run1' when the file starts with the RUN1 magic, else 'tsv' — the
    reference's exact fallback contract (any read issue -> TSV)."""
    try:
        with open(path, "rb") as f:
            if f.read(4) == RUN1_MAGIC:
                return "run1"
    except OSError:
        pass
    return "tsv"


def read_tsv_run(path: str) -> pa.Table:
    if os.path.getsize(path) == 0:
        # the reference RunReader yields nothing for an empty run file
        return RUN_SCHEMA.empty_table()
    t = pacsv.read_csv(
        path,
        read_options=pacsv.ReadOptions(
            column_names=["term", "docid", "tf"], use_threads=False
        ),
        parse_options=pacsv.ParseOptions(delimiter="\t", quote_char=False),
        convert_options=pacsv.ConvertOptions(
            column_types={
                "term": pa.string(),
                "docid": pa.uint64(),
                "tf": pa.uint32(),
            }
        ),
    )
    return t.cast(RUN_SCHEMA)


def read_run1(path: str) -> pa.Table:
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != RUN1_MAGIC:
        raise ValueError(f"{path!r} is not a RUN1 file")
    off = 4
    end = len(data)
    terms: list[str] = []
    lens: list[int] = []
    doc_parts: list[np.ndarray] = []
    tf_parts: list[np.ndarray] = []
    while off < end:
        lt = int(np.frombuffer(data, np.dtype("<u4"), 1, off)[0])
        off += 4
        terms.append(data[off : off + lt].decode("utf-8"))
        off += lt
        n = int(np.frombuffer(data, np.dtype("<u4"), 1, off)[0])
        off += 4
        doc_parts.append(np.frombuffer(data, np.dtype("<u4"), n, off))
        off += 4 * n
        tf_parts.append(np.frombuffer(data, np.dtype("<u4"), n, off))
        off += 4 * n
        lens.append(n)
    if off != end:
        raise ValueError(f"{path!r}: trailing bytes after last RUN1 group")
    if not terms:
        return RUN_SCHEMA.empty_table()
    idx = np.repeat(np.arange(len(terms), dtype=np.int64), lens)
    term_col = pc.take(pa.array(terms, pa.string()), pa.array(idx))
    docid = np.concatenate(doc_parts).astype(np.uint64) if doc_parts else np.empty(0, np.uint64)
    tf = np.concatenate(tf_parts).astype(np.uint32) if tf_parts else np.empty(0, np.uint32)
    return pa.table(
        {
            "term": term_col,
            "docid": pa.array(docid, pa.uint64()),
            "tf": pa.array(tf, pa.uint32()),
        }
    )


def read_legacy_run(path: str) -> pa.Table:
    """Autodetecting reader (the S5 behavior): RUN1 by magic, else TSV."""
    if detect_run_format(path) == "run1":
        return read_run1(path)
    return read_tsv_run(path)


def write_tsv_run(table: pa.Table, path: str) -> None:
    """Write a (term, docid, tf) table as a reference-format TSV run.
    Rows must already be (term, docid)-sorted (the format's contract)."""
    import polars as pl

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pl.from_arrow(table).write_csv(
        path, separator="\t", include_header=False, quote_style="never"
    )


def write_run1(table: pa.Table, path: str) -> None:
    """Write a (term, docid, tf) table as a reference-format RUN1 run.
    Rows must already be (term, docid)-sorted; docid/tf must fit u32
    (raises otherwise — silent truncation would corrupt the index)."""
    docid = table["docid"].to_numpy(zero_copy_only=False)
    tf = table["tf"].to_numpy(zero_copy_only=False)
    if docid.size and (docid.max() >= 1 << 32 or tf.max() >= 1 << 32):
        raise ValueError("RUN1 stores u32 docid/tf; values exceed 2^32")
    terms = table["term"]
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    n = len(terms)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    u32 = struct.Struct("<I")
    with open(path, "wb") as f:
        f.write(RUN1_MAGIC)
        if n == 0:
            return
        # term run boundaries on the sorted column
        neq = pc.not_equal(terms.slice(1), terms.slice(0, n - 1))
        starts = np.concatenate(
            [[0], np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1]
        )
        bounds = np.append(starts, n)
        uniq = terms.take(pa.array(starts, pa.int64())).to_pylist()
        d32 = docid.astype("<u4")
        t32 = tf.astype("<u4")
        for i, term in enumerate(uniq):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            tb = term.encode("utf-8")
            f.write(u32.pack(len(tb)))
            f.write(tb)
            f.write(u32.pack(hi - lo))
            f.write(d32[lo:hi].tobytes())
            f.write(t32[lo:hi].tobytes())
