"""Conversation-level operators over the native transcript table
``(conv_id, turn_idx, role, text, tool, ts)`` — the engine's input shape.

The index build treats each TURN as a document (SURVEY §1.2 docid
contract); these operators work at the other granularity a transcript
corpus needs: whole conversations. A conversation CAN span input files
(files split on row count), so per-conv work is a partial-agg + hash
exchange on ``conv_id`` — never a global sort.

- :func:`conversation_rollup_ds` — per-conv turn/role/tool counts, char
  volume and time span. All aggregates are mergeable (sum/min/max), so the
  shuffle moves one partial row per (batch, conv).
- :func:`role_stats_ds` — per-role turn and token totals (three-row
  result; partials are role-sized).
- :func:`tool_usage_ds` — per-tool call counts + distinct conversations
  (the partial is the distinct (tool, conv) pair set per batch).
- :func:`conversation_text_ds` — reassemble full ordered conversation
  text ("role: text" lines) — the conv-granularity corpus for downstream
  conv-level dedup/packing. Ships text through the exchange (inherent:
  the output IS the reassembled corpus).
- :func:`sft_examples_ds` — one (context, target) training example per
  assistant turn with a keep-last-k context budget: the canonical SFT-pair
  construction over multi-turn transcripts.
- :func:`conversation_minhash_dups_ds` — near-duplicate conversation
  candidate pairs (banded minhash LSH over the reassembled text), the
  fuzzy counterpart of :func:`conversation_dedup_ds`.
- :func:`role_filtered_search_table` — fielded BM25 ("what did the
  assistant say about X"): corpus-global ranking post-filtered by role
  via score-ordered row-group-seek probes.

Each has a DuckDB-oracle pytest contract over the deterministic fixture
corpus (tests/test_transcripts_ops.py); the driver-gate entries run over a
cached fixture slice (the driver's test tables have no transcript-shaped
relation, same pattern as ``crawl_log``).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from web_search_engine_ray.functions.tokenize import token_lists

_EPOCH_DIV = 1_000_000  # us -> s, the events-family epoch convention


def _read(corpus: str | list[str], columns: list[str]):
    import ray.data

    from web_search_engine_ray.sources.transcripts import corpus_files

    return ray.data.read_parquet(corpus_files(corpus), columns=columns)


def events_as_transcripts(sf_dir: str, n_parts: int = 16) -> str:
    """Deterministic conversation VIEW of the driver's ``events`` table,
    cached as transcript-schema parquet — this is what lets the conversation
    operators carry REAL SQL twins in the driver gate (the driver's tables
    have no native transcript relation, but this derivation is expressible
    in both engines):

        conv_id  = 'u' || user_id
        turn_idx = rank of (ts, event_id) within user      (0-based)
        role     = ['user','assistant','tool'][turn_idx % 3]
        tool     = event_type if role == 'tool' else ''
        text     = event_type || ' ' || props
        ts       = ts

    One hash exchange on user_id (all of a user's events land in one
    partition, so the within-user rank is exact), then a per-partition
    vectorized sort + window. Cached by events-file identity."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from web_search_engine_ray.pipelines.serving import _cache_key
    from web_search_engine_ray.stages.exchange import exchange_map

    path = os.path.join(sf_dir, "events.parquet")
    out = os.path.join(
        "/tmp", "wse_ray_cache", f"evconv_{_cache_key(path, f'evconv{n_parts}:v1')}"
    )
    marker = os.path.join(out, ".complete")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)

    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )

    def route(t: pa.Table) -> np.ndarray:
        return (
            t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
            % n_parts
        ).astype(np.int64)

    def build(t: pa.Table, pi: int) -> pa.Table:
        part_path = os.path.join(out, f"evconv_{pi:05d}.parquet")
        if t.num_rows == 0:
            pq.write_table(schema.empty_table(), part_path + ".tmp")
        else:
            df = (
                pl.from_arrow(t)
                .sort(["user_id", "ts", "event_id"])
                .with_columns(
                    turn_idx=pl.int_range(pl.len()).over("user_id").cast(pl.Int32)
                )
                .with_columns(
                    conv_id=pl.lit("u") + pl.col("user_id").cast(pl.Utf8),
                    role=pl.when(pl.col("turn_idx") % 3 == 0)
                    .then(pl.lit("user"))
                    .when(pl.col("turn_idx") % 3 == 1)
                    .then(pl.lit("assistant"))
                    .otherwise(pl.lit("tool")),
                    text=pl.col("event_type") + pl.lit(" ") + pl.col("props"),
                )
                .with_columns(
                    tool=pl.when(pl.col("role") == "tool")
                    .then(pl.col("event_type"))
                    .otherwise(pl.lit(""))
                )
                .select(["conv_id", "turn_idx", "role", "text", "tool", "ts"])
            )
            pq.write_table(df.to_arrow().cast(schema), part_path + ".tmp")
        os.replace(part_path + ".tmp", part_path)
        return pa.table({"part": pa.array([pi], pa.int64())})

    ds = ray.data.read_parquet(
        path, columns=["event_id", "ts", "user_id", "event_type", "props"]
    )
    exchange_map(ds, route, n_parts, build, with_index=True).count()
    with open(marker, "w") as f:
        f.write("ok")
    return out


def conversation_rollup_ds(corpus: str | list[str], n_parts: int = 32):
    """(conv_id, n_turns, n_user, n_assistant, n_tool, n_tool_calls,
    total_chars, first_epoch, last_epoch) per conversation."""
    from web_search_engine_ray.stages.exchange import exchange_map

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).with_columns(
            epoch=pl.col("ts").dt.epoch(time_unit="us") // _EPOCH_DIV,
            chars=pl.col("text").str.len_chars().fill_null(0).cast(pl.Int64),
        )
        g = df.group_by("conv_id").agg(
            n_turns=pl.len().cast(pl.Int64),
            n_user=(pl.col("role") == "user").sum().cast(pl.Int64),
            n_assistant=(pl.col("role") == "assistant").sum().cast(pl.Int64),
            n_tool=(pl.col("role") == "tool").sum().cast(pl.Int64),
            n_tool_calls=(pl.col("tool") != "").sum().cast(pl.Int64),
            total_chars=pl.col("chars").sum(),
            first_epoch=pl.col("epoch").min(),
            last_epoch=pl.col("epoch").max(),
        )
        return g.to_arrow()

    def route(t: pa.Table) -> np.ndarray:
        return (
            pl.from_arrow(t["conv_id"]).hash(seed=7).to_numpy() % np.uint64(n_parts)
        ).astype(np.int64)

    def merge(t: pa.Table) -> pa.Table:
        g = (
            pl.from_arrow(t)
            .group_by("conv_id")
            .agg(
                pl.col("n_turns").sum(),
                pl.col("n_user").sum(),
                pl.col("n_assistant").sum(),
                pl.col("n_tool").sum(),
                pl.col("n_tool_calls").sum(),
                pl.col("total_chars").sum(),
                pl.col("first_epoch").min(),
                pl.col("last_epoch").max(),
            )
        )
        return g.to_arrow()

    ds = _read(corpus, ["conv_id", "role", "text", "tool", "ts"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return exchange_map(ds, route, n_parts, merge, auto_shrink=True)


def role_stats_ds(corpus: str | list[str], n_parts: int = 4):
    """(role, n_turns, total_tokens, avg_tokens): corpus-wide per-role
    volume; avg rounded to 6 (the engine/SQL float contract)."""
    from web_search_engine_ray.stages.exchange import exchange_map

    def partial(t: pa.Table) -> pa.Table:
        toks = token_lists(t["text"])
        df = pl.DataFrame(
            {
                "role": pl.from_arrow(t["role"]),
                "n_tok": toks.list.len().fill_null(0).cast(pl.Int64),
            }
        )
        return (
            df.group_by("role")
            .agg(n_turns=pl.len().cast(pl.Int64), total_tokens=pl.col("n_tok").sum())
            .to_arrow()
        )

    def route(t: pa.Table) -> np.ndarray:
        return (
            pl.from_arrow(t["role"]).hash(seed=7).to_numpy() % np.uint64(n_parts)
        ).astype(np.int64)

    def merge(t: pa.Table) -> pa.Table:
        g = (
            pl.from_arrow(t)
            .group_by("role")
            .agg(pl.col("n_turns").sum(), pl.col("total_tokens").sum())
        )
        nt = g["n_turns"].to_numpy().astype(np.float64)
        tt = g["total_tokens"].to_numpy().astype(np.float64)
        return pa.table(
            {
                "role": g["role"].to_arrow().cast(pa.string()),
                "n_turns": pa.array(g["n_turns"].to_numpy(), pa.int64()),
                "total_tokens": pa.array(g["total_tokens"].to_numpy(), pa.int64()),
                "avg_tokens": pa.array(np.round(tt / nt, 6), pa.float64()),
            }
        )

    ds = _read(corpus, ["role", "text"]).map_batches(partial, batch_format="pyarrow")
    return exchange_map(ds, route, n_parts, merge, auto_shrink=True)


def tool_usage_ds(corpus: str | list[str], n_parts: int = 8):
    """(tool, n_calls, n_convs): call volume and distinct-conversation
    reach per tool (empty tool = non-tool turns, excluded)."""
    from web_search_engine_ray.stages.exchange import exchange_map

    def partial(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t)
            .filter(pl.col("tool") != "")
            .group_by(["tool", "conv_id"])
            .agg(calls=pl.len().cast(pl.Int64))
        )
        return df.to_arrow()

    def route(t: pa.Table) -> np.ndarray:
        return (
            pl.from_arrow(t["tool"]).hash(seed=7).to_numpy() % np.uint64(n_parts)
        ).astype(np.int64)

    def merge(t: pa.Table) -> pa.Table:
        g = (
            pl.from_arrow(t)
            .group_by("tool")
            .agg(
                n_calls=pl.col("calls").sum(),
                n_convs=pl.col("conv_id").n_unique().cast(pl.Int64),
            )
        )
        return g.to_arrow().cast(
            pa.schema(
                [("tool", pa.string()), ("n_calls", pa.int64()), ("n_convs", pa.int64())]
            )
        )

    ds = _read(corpus, ["conv_id", "tool"]).map_batches(partial, batch_format="pyarrow")
    return exchange_map(ds, route, n_parts, merge, auto_shrink=True)


def conversation_text_ds(corpus: str | list[str], n_parts: int = 32):
    """(conv_id, n_turns, conv_text): ordered reassembly, one "role: text"
    line per turn."""
    from web_search_engine_ray.stages.exchange import exchange_map

    def rows(t: pa.Table) -> pa.Table:
        return t.select(["conv_id", "turn_idx", "role", "text"])

    def route(t: pa.Table) -> np.ndarray:
        return (
            pl.from_arrow(t["conv_id"]).hash(seed=7).to_numpy() % np.uint64(n_parts)
        ).astype(np.int64)

    def assemble(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t)
            .with_columns(
                line=pl.col("role") + ": " + pl.col("text").fill_null("")
            )
            .sort(["conv_id", "turn_idx"])
            .group_by("conv_id", maintain_order=True)
            .agg(
                n_turns=pl.len().cast(pl.Int64),
                conv_text=pl.col("line").str.join("\n"),
            )
        )
        return df.to_arrow().cast(
            pa.schema(
                [
                    ("conv_id", pa.string()),
                    ("n_turns", pa.int64()),
                    ("conv_text", pa.string()),
                ]
            )
        )

    ds = _read(corpus, ["conv_id", "turn_idx", "role", "text"]).map_batches(
        rows, batch_format="pyarrow"
    )
    return exchange_map(ds, route, n_parts, assemble, auto_shrink=True)


def conversation_episode_split_ds(
    corpus: str | list[str], gap_s: float = 1800.0, n_parts: int = 32
):
    """Per-turn relation with EPISODE assignment: a conversation splits
    wherever the gap between consecutive turns exceeds ``gap_s`` seconds —
    the session-segmentation rule for long-running agent transcripts (one
    conv_id can span days of intermittent activity; training wants
    coherent episodes). Adds three columns:

    - ``episode_idx``  — cumulative break count within the conversation
      (0 for the first episode), in turn order;
    - ``episode_id``   — ``"{conv_id}#{episode_idx}"``, the new corpus key
      downstream conv-granularity ops can run on unchanged;
    - ``episode_turn_idx`` — turns re-indexed from 0 within the episode.

    One conv-keyed hash exchange (a conversation can span input files);
    the partition pass is a single vectorized polars window chain over
    integer-microsecond arithmetic — no floats, so the DuckDB LAG/SUM
    window twin (tests/test_transcripts_ops.py) matches exactly."""
    from web_search_engine_ray.stages.exchange import exchange_map

    gap_us = int(round(gap_s * 1_000_000))
    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("episode_idx", pa.int64()),
            ("episode_id", pa.string()),
            ("episode_turn_idx", pa.int64()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )

    def rows(t: pa.Table) -> pa.Table:
        return t.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"])

    def route(t: pa.Table) -> np.ndarray:
        return (
            pl.from_arrow(t["conv_id"]).hash(seed=7).to_numpy() % np.uint64(n_parts)
        ).astype(np.int64)

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = (
            pl.from_arrow(t)
            .sort(["conv_id", "turn_idx"])
            .with_columns(us=pl.col("ts").cast(pl.Int64))
            .with_columns(
                brk=(pl.col("us") - pl.col("us").shift(1).over("conv_id") > gap_us)
                .fill_null(False)
                .cast(pl.Int64)
            )
            .with_columns(episode_idx=pl.col("brk").cum_sum().over("conv_id"))
            .with_columns(
                episode_id=pl.col("conv_id")
                + "#"
                + pl.col("episode_idx").cast(pl.String),
                episode_turn_idx=pl.int_range(pl.len(), dtype=pl.Int64).over(
                    ["conv_id", "episode_idx"]
                ),
            )
            .select(
                "conv_id",
                "turn_idx",
                "episode_idx",
                "episode_id",
                "episode_turn_idx",
                "role",
                "text",
                "tool",
                "ts",
            )
        )
        return df.to_arrow().cast(out_schema)

    ds = _read(corpus, ["conv_id", "turn_idx", "role", "text", "tool", "ts"]).map_batches(
        rows, batch_format="pyarrow"
    )
    return exchange_map(ds, route, n_parts, split, auto_shrink=True)


def conversation_structure_stats_ds(corpus: str | list[str], n_parts: int = 32):
    """Per-conversation STRUCTURE validation — the malformed-transcript
    gate an SFT pipeline runs before example construction:

    - ``n_turns``, ``n_empty_turns`` (null/empty text),
    - ``first_role`` / ``last_role`` (by turn order),
    - ``n_role_repeats``   — consecutive same-role turns (descriptive:
      tool,tool is a legal parallel-call shape, so repeats do NOT fail
      well-formedness on their own),
    - ``n_idx_gaps``       — non-contiguous turn_idx steps,
    - ``is_wellformed``    — starts with user, ends with assistant, no
      empty turns, turn_idx is exactly 0..n_turns-1.

    One conv-keyed hash exchange (a conversation can span files); the
    partition pass is vectorized polars windows. DuckDB twin via
    arg_min/arg_max + LAG in tests/test_transcripts_ops.py."""
    from web_search_engine_ray.stages.exchange import exchange_map

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_turns", pa.int64()),
            ("n_empty_turns", pa.int64()),
            ("first_role", pa.string()),
            ("last_role", pa.string()),
            ("n_role_repeats", pa.int64()),
            ("n_idx_gaps", pa.int64()),
            ("is_wellformed", pa.bool_()),
        ]
    )

    def rows(t: pa.Table) -> pa.Table:
        return t.select(["conv_id", "turn_idx", "role", "text"])

    def route(t: pa.Table) -> np.ndarray:
        return (
            pl.from_arrow(t["conv_id"]).hash(seed=7).to_numpy() % np.uint64(n_parts)
        ).astype(np.int64)

    def stats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = (
            pl.from_arrow(t)
            .sort(["conv_id", "turn_idx"])
            .with_columns(
                empty=pl.col("text").fill_null("").eq("").cast(pl.Int64),
                rep=(pl.col("role") == pl.col("role").shift(1).over("conv_id"))
                .fill_null(False)
                .cast(pl.Int64),
                gap=(
                    pl.col("turn_idx") - pl.col("turn_idx").shift(1).over("conv_id")
                    != 1
                )
                .fill_null(False)
                .cast(pl.Int64),
            )
            .group_by("conv_id", maintain_order=True)
            .agg(
                n_turns=pl.len().cast(pl.Int64),
                n_empty_turns=pl.col("empty").sum(),
                first_role=pl.col("role").first(),
                last_role=pl.col("role").last(),
                n_role_repeats=pl.col("rep").sum(),
                n_idx_gaps=pl.col("gap").sum(),
                min_idx=pl.col("turn_idx").min().cast(pl.Int64),
                max_idx=pl.col("turn_idx").max().cast(pl.Int64),
            )
            .with_columns(
                is_wellformed=(pl.col("first_role") == "user")
                & (pl.col("last_role") == "assistant")
                & (pl.col("n_empty_turns") == 0)
                & (pl.col("min_idx") == 0)
                & (pl.col("max_idx") == pl.col("n_turns") - 1)
                & (pl.col("n_idx_gaps") == 0)
            )
            .drop("min_idx", "max_idx")
        )
        return df.to_arrow().cast(out_schema)

    ds = _read(corpus, ["conv_id", "turn_idx", "role", "text"]).map_batches(
        rows, batch_format="pyarrow"
    )
    return exchange_map(ds, route, n_parts, stats, auto_shrink=True)


def pack_conversations_ds(
    corpus: str | list[str], bin_tokens: int = 8192, n_parts: int = 32
):
    """(conv_id, n_tokens, start_tok, bin_id, bin_off): conversation-granular
    sequence packing — conversations are concatenated in global conv_id
    order and every conversation belongs to the ``bin_tokens``-sized
    training bin its FIRST token lands in (the conv-level counterpart of
    ``pack.pack_chunks_ds``; a whole conversation is never split across an
    attention-masked pack boundary mid-count).

    The order-dependent primitive is the global exclusive prefix sum over
    per-conversation token counts, in STRING conv_id order — the engine's
    two-level scan with sampled range boundaries:

    1. per-turn token counts partial-agg per (batch, conv), hash exchange
       on conv_id -> one (conv_id, n_tok) row per conversation (the
       working set: ~tens of bytes/conv, not the corpus);
    2. ordered ranges over strings: each partition emits its conv_id
       quantiles, the driver merges the tiny sample and picks R-1 range
       boundaries; ``range_id = searchsorted(boundaries, conv_id)`` is
       order-preserving;
    3. per-range totals -> driver exclusive prefix in range order
       (R rows) -> broadcast; one exchange on range_id computes the
       within-range cumsum in conv_id order and adds the range offset.

    Token counts are over turn ``text`` only (same counting rule as
    ``role_stats_ds``). Oracle: one SQL window sum ORDER BY conv_id —
    integer arithmetic, no drift (tests/test_transcripts_ops.py)."""
    import ray
    import ray.data

    from web_search_engine_ray.stages.exchange import cluster_parts, exchange_map

    if bin_tokens < 1:
        raise ValueError(f"need bin_tokens >= 1, got {bin_tokens}")
    np_ = cluster_parts(max(n_parts, 16))

    def turn_partials(t: pa.Table) -> pa.Table:
        n = token_lists(t["text"]).list.len().fill_null(0)
        df = (
            pl.DataFrame(
                {"conv_id": pl.from_arrow(t["conv_id"]), "n_tok": n}
            )
            .group_by("conv_id")
            .agg(pl.col("n_tok").sum())
        )
        return df.to_arrow().cast(
            pa.schema([("conv_id", pa.string()), ("n_tok", pa.int64())])
        )

    def merge_conv(t: pa.Table) -> pa.Table:
        schema = pa.schema([("conv_id", pa.string()), ("n_tok", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        df = (
            pl.from_arrow(t)
            .group_by("conv_id")
            .agg(pl.col("n_tok").sum())
            .sort("conv_id")
        )
        return df.to_arrow().cast(schema)

    def route(t: pa.Table) -> np.ndarray:
        return (
            pl.from_arrow(t["conv_id"]).hash(seed=7).to_numpy() % np.uint64(np_)
        ).astype(np.int64)

    convs = exchange_map(
        _read(corpus, ["conv_id", "text"]).map_batches(
            turn_partials, batch_format="pyarrow"
        ),
        route,
        np_,
        merge_conv,
        auto_shrink=True,
    ).materialize()

    # --- sampled string boundaries for order-preserving ranges
    def sample_keys(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["conv_id"].to_pylist(), dtype=object)
        ids.sort()
        k = min(32, ids.size)
        if k == 0:
            return pa.table({"key": pa.array([], pa.string())})
        pick = ids[np.linspace(0, ids.size - 1, k).astype(np.int64)]
        return pa.table({"key": pa.array(pick.tolist(), pa.string())})

    sample = sorted(
        s
        for b in convs.map_batches(sample_keys, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        for s in b["key"].to_pylist()
    )
    nr = int(np_)
    if sample:
        bidx = np.linspace(0, len(sample) - 1, nr + 1).astype(np.int64)[1:-1]
        boundaries = sorted(set(sample[i] for i in bidx))
    else:
        boundaries = []
    barr = np.asarray(boundaries, dtype=object)

    def _rid(t: pa.Table) -> np.ndarray:
        """range_id from conv_id on the fly (monotone in conv_id) — no
        intermediate column, so empty skipped-UDF blocks can't lose it."""
        ids = np.asarray(t["conv_id"].to_pylist(), dtype=object)
        if not barr.size:
            return np.zeros(ids.size, dtype=np.int64)
        return np.searchsorted(barr, ids, side="right").astype(np.int64)

    # --- range totals -> driver exclusive prefix (R rows), broadcast
    def range_partial(t: pa.Table) -> pa.Table:
        return (
            pl.DataFrame(
                {
                    "range_id": _rid(t),
                    "n_tok": pl.from_arrow(t["n_tok"]),
                }
            )
            .group_by("range_id")
            .agg(pl.col("n_tok").sum())
            .to_arrow()
            .cast(pa.schema([("range_id", pa.int64()), ("n_tok", pa.int64())]))
        )

    partials = convs.map_batches(range_partial, batch_format="pyarrow").to_pandas()
    totals = partials.groupby("range_id")["n_tok"].sum().sort_index()
    offsets = totals.cumsum().shift(fill_value=0)
    off_by_range = dict(zip(offsets.index.astype(int), offsets.astype(int)))
    oref = ray.put(off_by_range)

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_tokens", pa.int64()),
            ("start_tok", pa.int64()),
            ("bin_id", pa.int64()),
            ("bin_off", pa.int64()),
        ]
    )

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        offs = ray.get(oref)
        # range_id is monotone in conv_id, so one string sort orders both
        df = pl.from_arrow(t.select(["conv_id", "n_tok"])).sort("conv_id")
        rid = _rid(df.to_arrow())
        ntok = df["n_tok"].to_numpy()
        cum = np.cumsum(ntok) - ntok
        starts = np.flatnonzero(np.r_[True, rid[1:] != rid[:-1]])
        reps = np.diff(np.r_[starts, len(rid)])
        base = np.repeat(cum[starts], reps)
        local = cum - base
        goff = local + np.repeat(
            np.array([offs[int(r)] for r in rid[starts]], np.int64), reps
        )
        return pa.table(
            {
                "conv_id": df["conv_id"].to_arrow().cast(pa.string()),
                "n_tokens": pa.array(ntok, pa.int64()),
                "start_tok": pa.array(goff, pa.int64()),
                "bin_id": pa.array(goff // bin_tokens, pa.int64()),
                "bin_off": pa.array(goff % bin_tokens, pa.int64()),
            },
            schema=out_schema,
        )

    return exchange_map(convs, _rid, np_, assign, auto_shrink=True)


def conversation_minhash_dups_ds(
    corpus: str | list[str],
    n_parts: int = 32,
    max_bucket: int | None = None,
    conv_text=None,
):
    """(conv_a, conv_b): candidate NEAR-duplicate conversation pairs —
    banded minhash LSH over the reassembled ordered conversation text
    (:func:`conversation_text_ds`), the fuzzy counterpart of
    :func:`conversation_dedup_ds` and the granularity LLM training data is
    actually near-deduped at (a re-run of the same session differs by a few
    turns, so turn- or doc-level dedup misses it).

    Reuses the doc-level minhash kernels (shingle -> signature -> band
    buckets -> intra-bucket pairs, all vectorized) but carries STRING conv
    ids: inside each bucket partition the ids are factorized with
    ``np.unique`` (codes sort lexicographically, so pair order a < b is the
    conv_id order) and mapped back after pairing. Pairs from different
    bands dedupe in a second coarse exchange. Approximate by construction
    (LSH) — rows-only in the driver gate; the planted-near-dup recall
    contract lives in tests/test_transcripts_ops.py.

    ``conv_text``: optionally pass an already-built (ideally materialized)
    :func:`conversation_text_ds` Dataset so composed jobs reassemble the
    corpus ONCE instead of once per consumer."""
    from web_search_engine_ray.pipelines.dedup import (
        LSH_BANDS,
        _band_hashes,
        _batch_signatures,
        _intra_bucket_pairs,
    )
    from web_search_engine_ray.stages.exchange import cluster_parts, exchange_map

    np_ = cluster_parts(max(n_parts, 16))
    # the signature stage's parallelism is capped by the reassembly
    # exchange's output partition count — scale it with the cluster, not
    # the caller's (bucket-oriented) n_parts (measured: 32 parts serialized
    # 444k convs into 32 long signature tasks)
    n_parts = max(n_parts, np_)

    def to_bands(t: pa.Table) -> pa.Table:
        ids = t["conv_id"].to_pylist()
        col = t["conv_text"].combine_chunks()
        txt = np.asarray(col.to_pylist(), dtype=object)
        # dictionary-encode identical conversation texts: sign each UNIQUE
        # text once and gather (min over a multiset == min over its set, so
        # the gathered signatures are bit-identical). Wins on templated
        # corpora with repeated whole conversations; ~free otherwise (one
        # string sort per batch). Turn-LEVEL dictionary encoding was
        # investigated and rejected — see BASELINE.md round-5 notes (the
        # per-chunk unique-shingle pass in _batch_signatures already
        # captures cross-conversation shingle repetition).
        if col.null_count == 0 and txt.size:
            uniq, inv = np.unique(txt, return_inverse=True)
            if uniq.size < txt.size:
                utoks = token_lists(
                    pa.chunked_array([pa.array(uniq.tolist(), pa.string())])
                ).to_list()
                sigs = _batch_signatures(utoks)[inv]
            else:
                sigs = _batch_signatures(token_lists(col).to_list())
        else:
            sigs = _batch_signatures(token_lists(col).to_list())
        bh = _band_hashes(sigs)
        n = len(ids)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(LSH_BANDS, dtype=np.int32), n)),
                "bhash": pa.array((bh.reshape(-1) >> np.uint64(1)).astype(np.int64)),
                "conv_id": pa.array(np.repeat(np.asarray(ids, dtype=object), LSH_BANDS)),
            }
        )

    def partition_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"conv_a": pa.array([], pa.string()), "conv_b": pa.array([], pa.string())}
        )
        if t.num_rows == 0:
            return empty
        band = t["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        bhash = t["bhash"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = np.asarray(t["conv_id"].to_pylist(), dtype=object)
        uniq, codes = np.unique(ids, return_inverse=True)
        a, b = _intra_bucket_pairs((band, bhash), codes, max_bucket=max_bucket)
        if a.size == 0:
            return empty
        return pa.table(
            {
                "conv_a": pa.array(uniq[a].tolist(), pa.string()),
                "conv_b": pa.array(uniq[b].tolist(), pa.string()),
            }
        )

    def dedup_pairs(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .unique(subset=["conv_a", "conv_b"])
            .to_arrow()
            .select(["conv_a", "conv_b"])
            .cast(pa.schema([("conv_a", pa.string()), ("conv_b", pa.string())]))
        )

    if conv_text is None:
        conv_text = conversation_text_ds(corpus, n_parts=n_parts)
    bands = conv_text.map_batches(to_bands, batch_format="pyarrow")
    pairs = exchange_map(
        bands,
        lambda t: t["bhash"].to_numpy(zero_copy_only=False) % np_,
        np_,
        partition_pairs,
        auto_shrink=True,
    )
    return exchange_map(
        pairs,
        lambda t: (
            pl.from_arrow(t["conv_a"]).hash(seed=7).to_numpy() % np.uint64(np_)
        ).astype(np.int64),
        np_,
        dedup_pairs,
        auto_shrink=True,
    )


_CJ_REQUEST = 0  # (ckey=conv_id, p): "verify partition p needs this conv"
_CJ_CORPUS = 1  # (ckey=conv_id, text): a reassembled-conversation row
_CJ_SHINGLES = 1  # (p, ckey, shingles): a conv's shingle set, en route to p
_CJ_PAIR = 2  # (p, conv_a, conv_b): a candidate pair, en route to p


def _cj_shingle_schema() -> pa.Schema:
    return pa.schema(
        [
            ("p", pa.int64()),
            ("kind", pa.int8()),
            ("ckey", pa.string()),
            ("shingles", pa.list_(pa.uint64())),
            ("conv_a", pa.string()),
            ("conv_b", pa.string()),
        ]
    )


def conversation_jaccard_dups_ds(
    corpus: str | list[str],
    tau: float = 0.8,
    n_parts: int = 32,
    max_bucket: int | None = None,
    conv_text=None,
):
    """(conv_a, conv_b, jaccard): VERIFIED near-duplicate conversation
    pairs — :func:`conversation_minhash_dups_ds` candidates whose exact
    conversation-shingle Jaccard clears ``tau``. The conversation-level
    twin of the doc-level ``ngram_jaccard_dups`` (pipelines/dedup.py), and
    like it FULLY distributed: candidate pairs never leave Dataset land, no
    driver dicts, two hash exchanges over union relations:

    1. **Semi-join exchange on hash(conv_id) % P.** Union of request rows
       (two per candidate pair, tagging each endpoint with the pair's
       verify partition ``p = hash(conv_a) % P``) and the reassembled
       corpus (:func:`conversation_text_ds`). The partition fn inner-joins
       distinct requests against its corpus slice ON THE STRING conv_id
       (exact — no hash-collision exposure), shingles each requested
       conversation once, and fans the set out per partition with a
       vectorized offset gather.
    2. **Verify exchange on p.** Union of shingle rows and pair rows;
       string ids are factorized per partition (``np.unique`` codes), then
       exact Jaccard per pair via sorted-u64 membership count.

    The driver sees only the VERIFIED pair relation — true-dup-scale, not
    candidate-scale (the 2M-turn stress produced 5.35M candidates but
    ~500 verified dups). Used by the SFT dataset job's conversation-dedup
    stage (pipelines/corpus_job.py)."""
    from web_search_engine_ray.pipelines.dedup import _shingle_hashes
    from web_search_engine_ray.stages.exchange import cluster_parts, exchange_map

    np_ = cluster_parts(max(n_parts, 16))
    if conv_text is None:
        # one reassembly shared by the candidate stage and the semi-join
        # corpus side; materialized because BOTH consume it (a lazy Dataset
        # re-executes per consumer). Object-store spill bounds the cost —
        # the reassembled text is the same order of bytes as the input.
        conv_text = conversation_text_ds(
            corpus, n_parts=max(n_parts, np_)
        ).materialize()
    cand = conversation_minhash_dups_ds(
        corpus, n_parts=n_parts, max_bucket=max_bucket, conv_text=conv_text
    )

    def _route_str(col: str):
        def f(t: pa.Table) -> np.ndarray:
            return (
                pl.from_arrow(t[col]).hash(seed=7).to_numpy() % np.uint64(np_)
            ).astype(np.int64)

        return f

    def _pair_p(t: pa.Table) -> np.ndarray:
        return (
            pl.from_arrow(t["conv_a"]).hash(seed=11).to_numpy() % np.uint64(np_)
        ).astype(np.int64)

    def pairs_to_requests(t: pa.Table) -> pa.Table:
        p = pl.Series("p", _pair_p(t))
        df = pl.concat(
            [
                pl.DataFrame(
                    {"ckey": pl.from_arrow(t["conv_a"]), "p": p}
                ),
                pl.DataFrame(
                    {"ckey": pl.from_arrow(t["conv_b"]), "p": p}
                ),
            ]
        ).unique()  # clone-heavy corpora repeat endpoints across pairs
        n = df.height
        return pa.table(
            {
                "ckey": df["ckey"].to_arrow().cast(pa.string()),
                "kind": pa.array(np.full(n, _CJ_REQUEST, np.int8), pa.int8()),
                "p": pa.array(df["p"].to_numpy().astype(np.int64), pa.int64()),
                "text": pa.nulls(n, pa.string()),
            }
        )

    def corpus_to_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "ckey": t["conv_id"].cast(pa.string()),
                "kind": pa.array(np.full(n, _CJ_CORPUS, np.int8), pa.int8()),
                "p": pa.array(np.zeros(n, np.int64), pa.int64()),
                "text": t["conv_text"],
            }
        )

    def join_shingles(t: pa.Table) -> pa.Table:
        kind = t["kind"].to_numpy(zero_copy_only=False).astype(np.int8)
        req = t.filter(pa.array(kind == _CJ_REQUEST))
        corp = t.filter(pa.array(kind == _CJ_CORPUS))
        need = (
            pl.from_arrow(req.select(["ckey", "p"]))
            .unique()
            .join(
                pl.from_arrow(corp.select(["ckey", "text"])),
                on="ckey",
                how="inner",
            )
            .sort(["ckey", "p"])
        )
        docs = need.unique(subset="ckey", maintain_order=True)
        sh_per_doc = (
            [
                _shingle_hashes(tl or [])
                for tl in token_lists(docs["text"].to_arrow()).to_list()
            ]
            if docs.height
            else []
        )
        doc_lens = np.array([r.size for r in sh_per_doc], dtype=np.int64)
        doc_offs = np.zeros(doc_lens.size + 1, dtype=np.int64)
        np.cumsum(doc_lens, out=doc_offs[1:])
        doc_values = (
            np.concatenate(sh_per_doc)
            if sh_per_doc
            else np.empty(0, dtype=np.uint64)
        )
        # need -> row in docs, by exact string join (need is a superset of
        # docs rows repeated per p; docs order == first-occurrence order of
        # the ckey-sorted need, so searchsorted over the sorted keys works)
        dkeys = docs["ckey"].to_numpy()
        idx = np.searchsorted(dkeys, need["ckey"].to_numpy())
        lens = doc_lens[idx]
        offsets = np.zeros(lens.size + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        total = int(offsets[-1])
        pos = (
            np.repeat(doc_offs[idx], lens)
            + np.arange(total, dtype=np.int64)
            - np.repeat(offsets[:-1], lens)
        )
        values = doc_values[pos]
        shingles = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(values, pa.uint64())
        ).cast(pa.list_(pa.uint64()))
        n = need.height
        empty_str = pa.array([""] * n, pa.string())
        return pa.table(
            {
                "p": pa.array(need["p"].to_numpy().astype(np.int64), pa.int64()),
                "kind": pa.array(np.full(n, _CJ_SHINGLES, np.int8), pa.int8()),
                "ckey": need["ckey"].to_arrow().cast(pa.string()),
                "shingles": shingles,
                "conv_a": empty_str,
                "conv_b": empty_str,
            },
            schema=_cj_shingle_schema(),
        )

    def pairs_to_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        empty = pa.ListArray.from_arrays(
            pa.array(np.zeros(n + 1, np.int32), pa.int32()),
            pa.array(np.empty(0, np.uint64), pa.uint64()),
        )
        return pa.table(
            {
                "p": pa.array(_pair_p(t), pa.int64()),
                "kind": pa.array(np.full(n, _CJ_PAIR, np.int8), pa.int8()),
                "ckey": pa.array([""] * n, pa.string()),
                "shingles": empty,
                "conv_a": t["conv_a"].cast(pa.string()),
                "conv_b": t["conv_b"].cast(pa.string()),
            },
            schema=_cj_shingle_schema(),
        )

    def verify(group: pa.Table) -> pa.Table:
        kind = group["kind"].to_numpy(zero_copy_only=False).astype(np.int8)
        pairs_t = group.filter(pa.array(kind == _CJ_PAIR))
        docs_t = group.filter(pa.array(kind == _CJ_SHINGLES))
        a_s = np.asarray(pairs_t["conv_a"].to_pylist(), dtype=object)
        b_s = np.asarray(pairs_t["conv_b"].to_pylist(), dtype=object)
        did_s = np.asarray(docs_t["ckey"].to_pylist(), dtype=object)
        # factorize the partition's string ids once; codes preserve
        # lexicographic order so downstream logic is pure int64
        uniq, codes = np.unique(
            np.concatenate([a_s, b_s, did_s]), return_inverse=True
        )
        a = codes[: a_s.size].astype(np.int64)
        b = codes[a_s.size : a_s.size + b_s.size].astype(np.int64)
        did = codes[a_s.size + b_s.size :].astype(np.int64)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        sh = docs_t["shingles"].combine_chunks()
        if isinstance(sh, pa.ChunkedArray):
            sh = (
                sh.chunk(0)
                if sh.num_chunks
                else pa.array([], pa.list_(pa.uint64()))
            )
        offs = sh.offsets.to_numpy()
        vals = sh.values.to_numpy(zero_copy_only=False)
        sorder = np.argsort(did, kind="stable")
        dsorted = did[sorder]

        def locate(x: np.ndarray) -> np.ndarray:
            if dsorted.size == 0:
                return np.full(x.size, -1, dtype=np.int64)
            p_ = np.searchsorted(dsorted, x)
            p_c = np.minimum(p_, dsorted.size - 1)
            ok = dsorted[p_c] == x
            return np.where(ok, sorder[p_c], -1)

        ia_all = locate(a)
        ib_all = locate(b)
        a_l, b_l, j_l = [], [], []
        for i in range(a.size):
            ra, rb = int(ia_all[i]), int(ib_all[i])
            sa = vals[offs[ra] : offs[ra + 1]] if ra >= 0 else vals[:0]
            sb = vals[offs[rb] : offs[rb + 1]] if rb >= 0 else vals[:0]
            if sa.size and sb.size:
                # both sorted unique: membership count beats intersect1d
                p_ = np.searchsorted(sa, sb)
                p_[p_ == sa.size] = sa.size - 1
                inter = int(np.count_nonzero(sa[p_] == sb))
            else:
                inter = 0
            denom = sa.size + sb.size - inter
            if denom == 0:
                continue
            j = inter / denom
            if j >= tau:
                a_l.append(a[i])
                b_l.append(b[i])
                j_l.append(round(j, 6))
        ai = np.asarray(a_l, dtype=np.int64)
        bi = np.asarray(b_l, dtype=np.int64)
        return pa.table(
            {
                "conv_a": pa.array(uniq[ai].tolist(), pa.string()),
                "conv_b": pa.array(uniq[bi].tolist(), pa.string()),
                "jaccard": pa.array(j_l, pa.float64()),
            }
        )

    requests = cand.map_batches(pairs_to_requests, batch_format="pyarrow")
    corpus_rows = conv_text.map_batches(corpus_to_rows, batch_format="pyarrow")
    shingle_rows = exchange_map(
        requests.union(corpus_rows),
        _route_str("ckey"),
        np_,
        join_shingles,
        auto_shrink=True,
    )
    pair_rows = cand.map_batches(pairs_to_rows, batch_format="pyarrow")
    return exchange_map(
        shingle_rows.union(pair_rows), "p", np_, verify, auto_shrink=True
    )


def sft_examples_ds(
    corpus: str | list[str], n_parts: int = 32, max_context_turns: int = 64
):
    """(conv_id, turn_idx, n_context_turns, context, target): one training
    example per ASSISTANT turn — ``target`` is that turn's text, ``context``
    is the preceding ``max_context_turns`` turns rendered as "role: text"
    lines joined by newline (empty for a conversation-opening assistant
    turn). The canonical SFT-pair construction over multi-turn transcripts;
    ``max_context_turns`` is the context-window budget knob (keep-last-k).

    Shape: conversations route whole through the conv_id exchange; inside
    the partition the per-row context BOUNDS are pure offset arithmetic
    (cum_sum of line lengths + two window shifts — vectorized), and the
    only per-row work is the final substring copy, which is
    output-proportional (the context string must be materialized anyway).
    Contexts never ship through a shuffle — they are born in the output."""
    from web_search_engine_ray.stages.exchange import exchange_map

    k = int(max_context_turns)
    if k < 1:
        raise ValueError("max_context_turns must be >= 1")

    def rows(t: pa.Table) -> pa.Table:
        return t.select(["conv_id", "turn_idx", "role", "text"])

    def route(t: pa.Table) -> np.ndarray:
        return (
            pl.from_arrow(t["conv_id"]).hash(seed=7).to_numpy() % np.uint64(n_parts)
        ).astype(np.int64)

    def build(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int64()),
                "n_context_turns": pa.array([], pa.int64()),
                "context": pa.array([], pa.string()),
                "target": pa.array([], pa.string()),
            }
        )
        if t.num_rows == 0:
            return empty
        df = (
            pl.from_arrow(t)
            .sort(["conv_id", "turn_idx"])
            .with_columns(line=pl.col("role") + ": " + pl.col("text").fill_null(""))
            .with_columns(
                pos=pl.int_range(pl.len()).over("conv_id"),
                # +1 = the "\n" separator each line carries in the offsets
                llen=pl.col("line").str.len_chars().cast(pl.Int64) + 1,
            )
            .with_columns(end_off=pl.col("llen").cum_sum().over("conv_id"))
            .with_columns(
                # chars through line pos-k-1 = start offset of line pos-k
                ctx_start=pl.col("end_off").shift(k + 1).over("conv_id").fill_null(0),
                # chars through line pos-1 (incl. its separator)
                ctx_end=pl.col("end_off").shift(1).over("conv_id").fill_null(0),
                n_ctx=pl.min_horizontal(pl.col("pos"), pl.lit(k)).cast(pl.Int64),
            )
        )
        full = df.group_by("conv_id", maintain_order=True).agg(
            full=pl.col("line").str.join("\n")
        )
        fmap = dict(zip(full["conv_id"].to_list(), full["full"].to_list()))
        a = df.filter(pl.col("role") == "assistant")
        if a.height == 0:
            return empty
        convs = a["conv_id"].to_list()
        cs = a["ctx_start"].to_numpy()
        ce = a["ctx_end"].to_numpy()
        # output-proportional: each slice IS the emitted context string
        # (ce-1 drops the window's trailing separator)
        ctxs = [
            fmap[c][s : e - 1] if e > s else ""
            for c, s, e in zip(convs, cs, ce)
        ]
        return pa.table(
            {
                "conv_id": pa.array(convs, pa.string()),
                "turn_idx": a["turn_idx"].cast(pl.Int64).to_arrow(),
                "n_context_turns": a["n_ctx"].to_arrow(),
                "context": pa.array(ctxs, pa.string()),
                "target": a["text"].fill_null("").to_arrow().cast(pa.string()),
            }
        )

    ds = _read(corpus, ["conv_id", "turn_idx", "role", "text"]).map_batches(
        rows, batch_format="pyarrow"
    )
    return exchange_map(ds, route, n_parts, build, auto_shrink=True)


# Fixed queries over the transcript fixture vocabulary (stopwords + zipf
# words + specials), mirroring serving.FIXED_QUERIES' case coverage.
FIXED_TRANSCRIPT_QUERIES = [
    "the w0007",
    "agent call",
    "w0005 w0035",
    "task step",
    "data w0091",
    "bm25 http",
    "run model tool",
    "nosuchterm w0255",
]

_tidx_searchers: dict[str, object] = {}


def transcript_index(corpus: str) -> str:
    """Build (or reuse) the inverted turn index for a transcript corpus dir.
    Keyed by the identity of EVERY corpus file (a change confined to a later
    file must invalidate the cache — docids are positional row ranks over
    the whole file list); resumable on disk like ``serving.documents_index``."""
    import hashlib
    import os

    from web_search_engine_ray.pipelines.build import build_index
    from web_search_engine_ray.sources.transcripts import corpus_files

    ident = ";".join(
        f"{f}:{os.stat(f).st_size}:{os.stat(f).st_mtime_ns}"
        for f in corpus_files(corpus)
    )
    key = hashlib.sha256(f"{corpus}:{ident}:tidx1".encode()).hexdigest()[:16]
    out = os.path.join("/tmp", "wse_ray_cache", f"tidx_{key}")
    build_index(
        corpus, out, partition_rows=20_000, num_shards=8, n_salts=4,
        heavy_df_frac=0.05,
    )
    return out


def role_filtered_search_table(
    corpus: str,
    role: str = "assistant",
    queries: list[str] | None = None,
    topk: int = 10,
    mode: str = "OR",
    probe_cap: int = 10_000,
) -> pa.Table:
    """(query_id, rank, docid, score): BM25 top-k restricted to turns of one
    ROLE — fielded retrieval over the transcript index ("what did the
    assistant say about X"). BM25 statistics (N, avgdl, df) stay
    corpus-global, exactly as if the role were a post-filter on the full
    ranking — the contract the OracleIndex twin replays.

    Scale shape: the full TAAT ranking is candidate-scale (scored docs
    only); the role of each candidate is fetched by walking the ranking in
    score order with row-group-seek :class:`DocStore` reads and stopping at
    ``topk`` hits — expected probes ~ topk / role_frequency, never a corpus
    scan (``probe_cap`` bounds the pathological all-misses case, and a
    truncated walk is reported by raising, never silently)."""
    from web_search_engine_ray.pipelines.query import Searcher
    from web_search_engine_ray.state.docstore import DocStore

    idx = transcript_index(corpus)
    s = _tidx_searchers.get(idx)
    if s is None:
        s = _tidx_searchers[idx] = Searcher(idx)
    store = DocStore(corpus, columns=["role"])
    q_l, r_l, d_l, s_l = [], [], [], []
    for qi, q in enumerate(queries or FIXED_TRANSCRIPT_QUERIES):
        full = s.search(q, mode=mode, topk=None)  # (-score, docid) order
        kept: list[tuple[int, float]] = []
        for probes, (docid, score) in enumerate(full):
            if probes >= probe_cap:
                raise RuntimeError(
                    f"role_filtered_search: probe_cap={probe_cap} exhausted "
                    f"for query {q!r} with {len(kept)}/{topk} hits — raise "
                    "the cap or build a role-partitioned index"
                )
            row = store.get(docid)
            if row is not None and row.get("role") == role:
                kept.append((docid, score))
                if len(kept) == topk:
                    break
        for rank, (d, sc) in enumerate(kept, start=1):
            q_l.append(qi)
            r_l.append(rank)
            d_l.append(d)
            s_l.append(round(sc, 9))
    return pa.table(
        {
            "query_id": pa.array(q_l, pa.int64()),
            "rank": pa.array(r_l, pa.int64()),
            "docid": pa.array(d_l, pa.int64()),
            "score": pa.array(s_l, pa.float64()),
        }
    )


def fixture_corpus(n_convs: int = 200, max_turns: int = 6) -> str:
    """Deterministic cached transcript corpus for the driver-gate entries
    (the driver's tables have no transcript-shaped relation)."""
    import os

    from web_search_engine_ray.fixtures.transcripts import write_corpus

    d = f"/tmp/wse_gate_transcripts_c{n_convs}_t{max_turns}"
    write_corpus(d, n_convs=n_convs, max_turns=max_turns, rows_per_file=300)
    return d


def gapped_fixture_corpus(n_convs: int = 200, max_turns: int = 6) -> str:
    """:func:`fixture_corpus` with planted intra-conversation time gaps
    (every 3rd turn of every 2nd conversation jumps +2 h, cumulative) —
    the gate corpus for the episode-split entry, which is an identity map
    on the gap-free fixture."""
    import os
    import shutil

    import pyarrow.parquet as pq

    base = fixture_corpus(n_convs=n_convs, max_turns=max_turns)
    d = f"/tmp/wse_gate_transcripts_gapped_c{n_convs}_t{max_turns}"
    marker = os.path.join(d, "_done")
    if os.path.exists(marker):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    files = sorted(
        os.path.join(base, f) for f in os.listdir(base) if f.endswith(".parquet")
    )
    for f in files:
        t = pq.read_table(f)
        base_schema = pq.read_schema(f)
        df = pl.from_arrow(t).with_columns(
            _cn=pl.col("conv_id").str.slice(-2).cast(pl.Int64)
        )
        bump = (
            ((df["_cn"] % 2 == 0) & (df["turn_idx"] % 3 == 2))
            .cast(pl.Int64)
            .cum_sum()
        )
        df = df.with_columns(ts=pl.col("ts") + pl.duration(hours=2 * bump)).drop(
            "_cn"
        )
        pq.write_table(
            df.to_arrow().select(base_schema.names).cast(base_schema),
            os.path.join(d, os.path.basename(f)),
        )
    with open(marker, "w") as fh:
        fh.write("ok")
    return d


def neardup_fixture_corpus(n_convs: int = 200, max_turns: int = 6) -> str:
    """:func:`fixture_corpus` plus 7 deterministic planted clones (5 with
    one perturbed turn -> jaccard near 1, 2 exact) — the gate corpus for
    the verified conversation near-dup entry, which is empty on the plain
    fixture (no true near-dups)."""
    import os

    import pyarrow.parquet as pq

    base = fixture_corpus(n_convs=n_convs, max_turns=max_turns)
    d = f"/tmp/wse_gate_transcripts_neardup_c{n_convs}_t{max_turns}"
    marker = os.path.join(d, "_done")
    if os.path.exists(marker):
        return d
    import shutil

    shutil.rmtree(d, ignore_errors=True)  # partial build from a dead run
    os.makedirs(d, exist_ok=True)
    files = sorted(
        os.path.join(base, f) for f in os.listdir(base) if f.endswith(".parquet")
    )
    df = pl.from_arrow(pq.read_table(files[0]))
    convs = sorted(df["conv_id"].unique().to_list())[:7]
    clones = []
    for i, c in enumerate(convs):
        g = df.filter(pl.col("conv_id") == c).with_columns(
            conv_id=pl.lit(f"zclone{i:05d}")
        )
        if i < 5:  # near-dup: perturb the first turn's text
            first = g["turn_idx"].min()
            g = g.with_columns(
                text=pl.when(pl.col("turn_idx") == first)
                .then(pl.col("text").fill_null("") + " perturbed")
                .otherwise(pl.col("text"))
            )
        clones.append(g)
    for src in files:
        os.link(src, os.path.join(d, os.path.basename(src)))
    base_schema = pq.read_schema(files[0])
    # polars emits large_string; cast back to the base files' schema so the
    # multi-file read sees ONE schema (mixed string/large_string breaks
    # concat inside the reassembly exchange)
    pq.write_table(
        pl.concat(clones).to_arrow().select(base_schema.names).cast(base_schema),
        os.path.join(d, "zclones.parquet"),
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return d


def conversation_dedup_ds(corpus: str | list[str], n_parts: int = 32):
    """(conv_hash, conv_id): conversation-level exact dedup — md5 of the
    reassembled ordered conversation text, min conv_id survivor per group.
    Composition of :func:`conversation_text_ds` with the engine's
    hash-exchange dedup rule (``dedup.exact_dedup_ds``), at the granularity
    LLM training actually dedupes multi-turn data."""
    import hashlib

    from web_search_engine_ray.stages.exchange import exchange_map

    def hash_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_hash": pa.array(
                    [
                        hashlib.md5(x.encode("utf-8")).hexdigest()
                        for x in t["conv_text"].to_pylist()
                    ],
                    pa.string(),
                ),
                "conv_id": t["conv_id"].cast(pa.string()),
            }
        )

    def route(t: pa.Table) -> np.ndarray:
        return (
            pl.from_arrow(t["conv_hash"]).hash(seed=7).to_numpy() % np.uint64(n_parts)
        ).astype(np.int64)

    def merge(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .group_by("conv_hash")
            .agg(pl.col("conv_id").min())
            .to_arrow()
            .select(["conv_hash", "conv_id"])
            .cast(pa.schema([("conv_hash", pa.string()), ("conv_id", pa.string())]))
        )

    ds = conversation_text_ds(corpus, n_parts=n_parts).map_batches(
        hash_rows, batch_format="pyarrow"
    )
    return exchange_map(ds, route, n_parts, merge, auto_shrink=True)
