"""Transcript corpus source: partition planning + deterministic docid assignment.

DocID contract (SURVEY.md §1.2, §7.3): docid = the row's rank in the corpus's
canonical total order ``(conv_id, turn_idx)`` as a ``uint64``. This mirrors the
reference's positional assignment (driver running counter,
``HW2/engine/build_runs_mp.py:136-159``) but is **invariant to parallelism**:
input files are required to be pre-sorted by ``(conv_id, turn_idx)`` with file
order = sorted path order, so docids are ``file_base + row_group_base + row
offset`` — a metadata-only cumulative-offset pass over parquet footers that
never reads data and never depends on task completion order.

If an input is NOT pre-sorted, normalize it once with
:func:`sort_corpus` (an explicit ``Dataset.sort`` — the one global sort in the
system) and build from the sorted copy.

Partition = a run of whole row groups of one file (~``partition_rows`` rows).
One partition is the unit of tokenize work, run output, doc-length output, and
checkpoint/resume (see ``state.manifest``).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def corpus_files(path_or_dir: str | list[str]) -> list[str]:
    """Resolve an input spec to the ordered file list (sorted paths)."""
    if isinstance(path_or_dir, (list, tuple)):
        return sorted(path_or_dir)
    if os.path.isdir(path_or_dir):
        return sorted(glob.glob(os.path.join(path_or_dir, "*.parquet")))
    return [path_or_dir]


def plan_partitions(
    files: list[str], partition_rows: int = 100_000, docid_offset: int = 0
) -> tuple[list[dict], int]:
    """Metadata-only partition plan. Returns (descriptors, total_rows).

    Each descriptor: ``{pid, path, row_groups: [lo, hi), n_rows, base_docid}``.
    Row groups are never split; partitions close once they reach
    ``partition_rows`` rows. base_docid is the cumulative row offset — the
    docid of the partition's first row. ``docid_offset`` shifts all docids:
    used by doc-range-partitioned builds where this file set is one range of
    a larger corpus (``pipelines/distributed.py``).
    """
    descs: list[dict] = []
    base = docid_offset
    pid = 0
    for path in files:
        meta = pq.read_metadata(path)
        rg_rows = [meta.row_group(i).num_rows for i in range(meta.num_row_groups)]
        lo = 0
        while lo < len(rg_rows):
            hi = lo
            n = 0
            while hi < len(rg_rows) and (n == 0 or n + rg_rows[hi] <= partition_rows):
                n += rg_rows[hi]
                hi += 1
            descs.append(
                {
                    "pid": pid,
                    "path": path,
                    "row_groups": [lo, hi],
                    "n_rows": n,
                    "base_docid": base,
                }
            )
            base += n
            pid += 1
            lo = hi
    return descs, base - docid_offset


def read_partition(desc: dict, columns: list[str] | None = None) -> pa.Table:
    """Read one partition's rows (column-pruned, row-group-exact)."""
    f = pq.ParquetFile(desc["path"])
    lo, hi = desc["row_groups"]
    return f.read_row_groups(list(range(lo, hi)), columns=columns)


def partition_docids(desc: dict) -> np.ndarray:
    base = desc["base_docid"]
    return np.arange(base, base + desc["n_rows"], dtype=np.uint64)


def load_transcripts(path_or_dir, partition_rows: int = 100_000, columns=None):
    """Ray Dataset of transcript rows with the ``docid`` column prepended.

    Expressed as Dataset-of-descriptors -> ``map_batches`` (the same pattern
    Ray's own ``read_parquet`` uses internally: read tasks produce blocks),
    which keeps docids deterministic regardless of block splitting.
    """
    import ray.data

    files = corpus_files(path_or_dir)
    descs, _total = plan_partitions(files, partition_rows)
    want = columns

    def _read(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            t = read_partition(row, columns=want)
            docid = pa.array(partition_docids(row), pa.uint64())
            out.append(t.add_column(0, "docid", docid))
        return pa.concat_tables(out)

    ds = ray.data.from_items(descs, override_num_blocks=max(1, len(descs)))
    return ds.map_batches(_read, batch_format="pyarrow", batch_size=None)


def sort_corpus(path_or_dir, out_dir: str, rows_per_file: int = 1_000_000) -> list[str]:
    """Normalize an unsorted corpus: global ``Dataset.sort`` by
    ``(conv_id, turn_idx)`` written to sorted parquet files. The one explicit
    global sort in the system (SURVEY.md §7.3); use only when the producer
    cannot write pre-sorted files."""
    import ray.data

    files = corpus_files(path_or_dir)
    ds = ray.data.read_parquet(files)
    ds = ds.sort(["conv_id", "turn_idx"])
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir, min_rows_per_file=rows_per_file)
    return corpus_files(out_dir)
