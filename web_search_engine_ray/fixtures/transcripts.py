"""Deterministic synthetic transcript corpus generator (FIXTURES.md §1).

Schema = the BASELINE.json ``input_hint`` exactly:
``(conv_id: string, turn_idx: int32, role: string, text: string, tool: string,
ts: timestamp[us])``. Files are written pre-sorted by ``(conv_id, turn_idx)``
(conv ids zero-padded so lexicographic order == numeric order), so docid
assignment is a metadata-only cumulative-offset pass.

All randomness is a counter-based splitmix64 keyed by ``(conv, turn, stream)``
— no wall clock, no global RNG state — so any slice of the corpus can be
regenerated bit-identically at any scale and in any parallel order.

Text properties exercised (FIXTURES.md §1.1): Zipf-skewed vocab with ~20
stopwords in most turns (posting skew), dotted/hyphenated tokens kept whole by
the reference tokenizer, mixed case + punctuation, ~1% token-empty turns
(dl=0 but still a docid), repeated terms (tf>1), and df=1 unique markers
``uq{c}x{t}`` for exact posting checks.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

STOPWORDS = [
    "the", "and", "of", "to", "a", "in", "is", "that", "for", "it",
    "user", "tool", "model", "turn", "agent", "call", "run", "task", "step", "data",
]
SPECIALS = [
    "u.s.", "3.14", "v1.2-beta", "e-mail", "top-k", "bm25", "http", "api",
    "x86-64", "utf-8", "o.k.", "1.0", "2.5-flash", "co-pilot",
]
TOOLS = [
    "search", "browse", "calc", "code", "shell", "sql",
    "fetch", "plot", "read", "write", "diff", "test",
]
VOCAB_SIZE = 5000
ZIPF_S = 1.1


# 0-d array constants: bit-identical to np.uint64 scalars (see
# pipelines/dedup.py _splitmix — the once-suspected scalar slow path was
# a measurement artifact; both forms time identically when warmed).
_SM64_A = np.array(0x9E3779B97F4A7C15, dtype=np.uint64)
_SM64_B = np.array(0xBF58476D1CE4E5B9, dtype=np.uint64)
_SM64_C = np.array(0x94D049BB133111EB, dtype=np.uint64)
_SM64_S30 = np.array(30, dtype=np.uint64)
_SM64_S27 = np.array(27, dtype=np.uint64)
_SM64_S31 = np.array(31, dtype=np.uint64)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64: u64 counter -> u64 hash."""
    z = (x + _SM64_A).astype(np.uint64)
    z = (z ^ (z >> _SM64_S30)) * _SM64_B
    z = (z ^ (z >> _SM64_S27)) * _SM64_C
    return z ^ (z >> _SM64_S31)


def _rand_u64(keys: np.ndarray, stream: int) -> np.ndarray:
    return _splitmix64(keys * np.uint64(0x100000001B3) + np.uint64(stream) + np.uint64(SEED))


def _uniform(keys: np.ndarray, stream: int) -> np.ndarray:
    return (_rand_u64(keys, stream) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _vocab() -> np.ndarray:
    words = list(STOPWORDS)
    words += SPECIALS
    words += [f"w{i:04d}" for i in range(VOCAB_SIZE - len(words))]
    return np.array(words, dtype=object)


def _zipf_cdf(n: int) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = 1.0 / ranks**ZIPF_S
    p /= p.sum()
    return np.cumsum(p)


_VOCAB = _vocab()
_CDF = _zipf_cdf(VOCAB_SIZE)
_PUNCT = np.array([",", ".", "!", "?", ";"], dtype=object)


def n_turns(conv: int, max_turns: int) -> int:
    k = _rand_u64(np.array([conv], dtype=np.uint64), 1)[0]
    return 1 + int(k % np.uint64(max_turns))


def conv_batch_rows(conv_lo: int, conv_hi: int, max_turns: int) -> pa.Table:
    """Generate all rows for convs in [conv_lo, conv_hi), sorted."""
    convs, turns = [], []
    for c in range(conv_lo, conv_hi):
        t = n_turns(c, max_turns)
        convs.extend([c] * t)
        turns.extend(range(t))
    c_arr = np.array(convs, dtype=np.uint64)
    t_arr = np.array(turns, dtype=np.uint64)
    n = c_arr.size
    row_key = c_arr * np.uint64(0x9E3779B1) + t_arr

    # per-turn token counts: 5..120, but ~1% empty turns
    L = 5 + (_rand_u64(row_key, 2) % np.uint64(116)).astype(np.int64)
    empty = _rand_u64(row_key, 3) % np.uint64(100) == 0
    L[empty] = 0
    # df=1 unique marker on ~2.7% of turns
    marker = (_rand_u64(row_key, 4) % np.uint64(37) == 0) & ~empty

    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(L, out=offsets[1:])
    total = int(offsets[-1])

    # vectorized token sampling over the whole batch
    tok_key = np.repeat(row_key, L) * np.uint64(0x85EBCA77) + np.concatenate(
        [np.arange(k, dtype=np.uint64) for k in L]
    ) if total else np.empty(0, dtype=np.uint64)
    u = _uniform(tok_key, 5)
    widx = np.searchsorted(_CDF, u, side="left")
    words = _VOCAB[widx].copy()

    # decorations: ~8% capitalized, ~6% trailing punctuation
    cap = _rand_u64(tok_key, 6) % np.uint64(100) < 8
    if cap.any():
        words[cap] = np.array([w.capitalize() for w in words[cap]], dtype=object)
    pn = _rand_u64(tok_key, 7) % np.uint64(100) < 6
    if pn.any():
        words[pn] = words[pn] + _PUNCT[(_rand_u64(tok_key, 8)[pn] % np.uint64(5)).astype(np.int64)]

    texts = []
    wl = words.tolist()
    whitespace_only = _rand_u64(row_key, 9) % np.uint64(2) == 0
    for i in range(n):
        if L[i] == 0:
            texts.append("   " if whitespace_only[i] else "")
            continue
        t = " ".join(wl[offsets[i] : offsets[i + 1]])
        if marker[i]:
            t += f" uq{convs[i]}x{turns[i]}"
        texts.append(t)

    role_idx = ((c_arr + t_arr) % np.uint64(3)).astype(np.int64)
    roles = np.array(["user", "assistant", "tool"], dtype=object)[role_idx]
    tool_pick = np.array(TOOLS, dtype=object)[
        (_rand_u64(row_key, 10) % np.uint64(len(TOOLS))).astype(np.int64)
    ]
    tools = np.where(role_idx == 2, tool_pick, "")

    ts = EPOCH_US + c_arr.astype(np.int64) * 3_600_000_000 + t_arr.astype(np.int64) * 7_000_000
    return pa.table(
        {
            "conv_id": pa.array([f"conv{c:08d}" for c in convs], pa.string()),
            "turn_idx": pa.array(t_arr.astype(np.int32), pa.int32()),
            "role": pa.array(roles.tolist(), pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools.tolist(), pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


def write_corpus_ray(
    out_dir: str,
    n_convs: int,
    max_turns: int = 8,
    convs_per_file: int = 20_000,
    skip_existing: bool = True,
) -> list[str]:
    """Ray-parallel corpus writer for big benches: one task per conv range,
    each writing its own (deterministic) sorted file. Content of a given
    (n_convs, max_turns, convs_per_file) triple is bit-stable; file
    boundaries follow conv ranges (unlike :func:`write_corpus`'s fixed row
    count, which is what the small-fixture tests pin down)."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    ranges = [
        (i, lo, min(lo + convs_per_file, n_convs))
        for i, lo in enumerate(range(0, n_convs, convs_per_file))
    ]

    @ray.remote(num_cpus=1)
    def gen(i: int, lo: int, hi: int) -> str:
        path = os.path.join(out_dir, f"transcripts_{i:05d}.parquet")
        if skip_existing and os.path.exists(path):
            return path
        t = conv_batch_rows(lo, hi, max_turns)
        tmp = path + f".tmp{i}"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return path

    return sorted(ray.get([gen.remote(*r) for r in ranges]))


def write_corpus(
    out_dir: str,
    n_convs: int,
    max_turns: int = 8,
    rows_per_file: int = 1000,
    skip_existing: bool = True,
) -> list[str]:
    """Write the corpus as sorted parquet files of ~rows_per_file rows each.

    Deterministic content + filenames; existing complete files are reused
    (generation cache for benches). Returns the file list in order.
    """
    os.makedirs(out_dir, exist_ok=True)
    table = None
    paths: list[str] = []
    # generate conv-chunked, then slice into fixed-size files
    chunk = max(1, (4 * rows_per_file) // max(1, (max_turns // 2 + 1)))
    tables = []
    for lo in range(0, n_convs, chunk):
        tables.append(conv_batch_rows(lo, min(lo + chunk, n_convs), max_turns))
    table = pa.concat_tables(tables)
    nfiles = (table.num_rows + rows_per_file - 1) // rows_per_file
    for i in range(nfiles):
        path = os.path.join(out_dir, f"transcripts_{i:05d}.parquet")
        paths.append(path)
        part = table.slice(i * rows_per_file, rows_per_file)
        if skip_existing and os.path.exists(path):
            try:
                if pq.read_metadata(path).num_rows == part.num_rows:
                    continue
            except OSError:
                pass
        tmp = path + ".tmp"
        pq.write_table(part, tmp)
        os.replace(tmp, path)
    return paths
