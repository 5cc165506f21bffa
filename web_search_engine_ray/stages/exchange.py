"""Hash-partition exchange without a sort.

``Dataset.groupby(k).map_groups(fn)`` routes through Ray Data's sort-based
shuffle — an O(n log n) range-partition exchange with a multi-second floor
that dwarfs the actual work for the coarse-partition pattern the dedup
operators use (a small int partition column, a vectorized whole-partition
function). :func:`exchange_map` is the direct expression of that pattern:

1. one Ray task per input block splits it by ``part_col`` (``num_returns=P``
   small side tables — the only data movement, O(n) total);
2. one Ray task per partition concatenates its P-th slices from every block
   and applies ``fn`` to the whole partition at once;
3. the results come back as a ``Dataset`` (``from_arrow_refs``), so the rest
   of the pipeline stays in Dataset land.

This is the classic map-side hash shuffle (same discipline as the index
build's one-row-group-per-gkey merge): B x P shuffle objects, no sort, no
comparator. Use it when (a) the partition count is modest (<= a few
hundred), (b) ``fn`` is happy receiving MANY groups in one call (it gets a
whole hash partition, exactly like ``map_groups`` on a coarse key), and
(c) per-partition output is small. For high-cardinality keys or when Ray
should manage memory per group, stick with ``groupby``.

``fn`` must tolerate an empty table (carrying the input schema) — empty
partitions still invoke it so the output block count is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa

# Schema-metadata marker for empty blocks whose schema may be PRE-UDF
# (Ray Data skips map UDFs on empty blocks, so an empty parquet file's
# block still carries the source schema after map_batches). apply() must
# never hand such a schema to ``fn``.
_PRE_UDF = "__wse_pre_udf_schema__"


def _tag_untrusted(t: pa.Table) -> pa.Table:
    meta = dict(t.schema.metadata or {})
    meta[_PRE_UDF.encode()] = b"1"
    return t.replace_schema_metadata(meta)


def _is_untrusted(t: pa.Table) -> bool:
    return bool((t.schema.metadata or {}).get(_PRE_UDF.encode()))


def exchange_map(
    ds,
    part: str | Callable[[pa.Table], np.ndarray],
    n_parts: int,
    fn: Callable[[pa.Table], pa.Table],
    drop_part_col: bool = True,
    max_split_tasks: int = 16,
    with_index: bool = False,
    auto_shrink: bool = False,
):
    """Apply ``fn`` once per hash partition of ``ds``, without a sort
    shuffle. ``part`` is either the name of an int column with values in
    [0, n_parts) (dropped before ``fn`` unless ``drop_part_col=False``) or
    a callable computing the partition vector from a block — the callable
    form sidesteps Ray Data's skip-UDF-on-empty-blocks behavior (an
    add-partition-column ``map_batches`` never runs on empty blocks, so the
    column can be missing; a callable always works). Returns a Dataset of
    ``fn``'s outputs (one block per partition).

    Input blocks are coalesced into at most ``max_split_tasks`` splitter
    tasks (Spark's shuffle-file consolidation): the exchange creates
    ``split_tasks x n_parts`` objects, and per-object bookkeeping — not
    bytes — dominates small exchanges. On a cluster, raise
    ``max_split_tasks`` toward the node count so splitters parallelize.

    ``with_index=True`` calls ``fn(table, partition_index)`` — for sinks
    that need a deterministic per-partition output name.

    ``auto_shrink=True`` lowers the partition count for small inputs: the
    effective count is the largest power-of-two DIVISOR of ``n_parts`` not
    far above twice the input block count, and routing values are re-modded
    (``(x % n) % d == x % d`` when ``d | n``), so every key still lands
    whole in one partition. Use ONLY for per-key merge fns whose result is
    partition-count invariant (aggregates, dedup, pair verify) — never for
    sinks or ``with_index`` fns, where the partition index is part of the
    output contract (raises on that combination). A tiny sf-scale input
    then pays ~4 apply tasks instead of 64; at corpus scale the count is
    unchanged."""
    import ray
    import ray.data

    if auto_shrink and with_index:
        raise ValueError("auto_shrink would change with_index partition ids")

    blocks = ds.to_arrow_refs()
    if not blocks:
        raise ValueError("exchange_map needs at least one input block")
    orig_parts = n_parts
    if auto_shrink:
        target = max(4, 2 * len(blocks))
        while n_parts % 2 == 0 and n_parts >= 2 * target:
            n_parts //= 2

    @ray.remote(num_returns=n_parts)
    def split(*ts: pa.Table):
        # empty blocks can carry a PRE-UDF schema (Ray Data skips map UDFs
        # on empty blocks) — their partition columns may not exist; they
        # contribute nothing, so route zero-row empties everywhere and let
        # apply() drop schema-mismatched empties
        ts = (
            tuple(x for x in ts if x.num_rows)
            # all-empty group: prefer a representative that at least HAS
            # columns — a zero-column empty (some Ray read plans emit them)
            # would otherwise propagate a schema the partition fn chokes on
            or tuple(x for x in ts if x.schema.names)[:1]
            or ts[:1]
        )
        if ts[0].num_rows == 0:
            empty = _tag_untrusted(ts[0].slice(0, 0))
            return [empty] * n_parts if n_parts > 1 else empty
        t = pa.concat_tables(ts).combine_chunks() if len(ts) > 1 else ts[0]
        if callable(part):
            p = np.asarray(part(t), dtype=np.int64)
        else:
            p = t[part].combine_chunks().to_numpy(zero_copy_only=False)
            if p.dtype.kind == "f":
                # nulls in an int column arrive as float NaN — NaN passes
                # every bound comparison and the row would vanish silently
                if np.isnan(p).any():
                    raise ValueError(
                        f"partition column {part!r} contains nulls — rows "
                        "would be dropped silently"
                    )
                p = p.astype(np.int64)
            if drop_part_col:
                t = t.drop_columns([part])
        if p.size and (p.min() < 0 or p.max() >= orig_parts):
            raise ValueError(
                f"partition values outside [0, {orig_parts}): "
                f"[{p.min()}, {p.max()}] — rows would be dropped silently"
            )
        if n_parts != orig_parts:
            p = p % n_parts  # n_parts | orig_parts, so keys stay whole
        order = np.argsort(p, kind="stable")
        sorted_p = p[order]
        bounds = np.searchsorted(sorted_p, np.arange(n_parts + 1))
        taken = t.take(pa.array(order))
        out = [
            taken.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
            for i in range(n_parts)
        ]
        return out if n_parts > 1 else out[0]

    @ray.remote
    def apply(pi: int, *parts: pa.Table) -> pa.Table:
        nonempty = [x for x in parts if x.num_rows]
        if nonempty:
            t = pa.concat_tables(nonempty).combine_chunks()
        else:
            # all-empty partition: empties from a splitter group that saw
            # data carry the correct post-exchange schema; empties from an
            # all-empty group are tagged _PRE_UDF and may carry a stale
            # source schema — only use one if nothing better exists (i.e.
            # the whole dataset was empty)
            trusted = [x for x in parts if not _is_untrusted(x)]
            t = trusted[0] if trusted else parts[0]
        return fn(t, pi) if with_index else fn(t)

    gsize = max(1, -(-len(blocks) // max_split_tasks))
    groups = [blocks[i : i + gsize] for i in range(0, len(blocks), gsize)]
    per_group = [split.remote(*g) for g in groups]
    if n_parts == 1:
        per_group = [[r] for r in per_group]
    out = [
        apply.remote(p, *[per_group[g][p] for g in range(len(groups))])
        for p in range(n_parts)
    ]
    return ray.data.from_arrow_refs(out)


def cluster_parts(min_parts: int = 64, per_cpu: int = 2) -> int:
    """Partition count scaled to the cluster: ``max(min_parts, per_cpu x
    total CPUs)``, so per-partition state stays roughly constant as nodes
    are added (64 partitions that fit a laptop would each hold ~1.5 TB of
    a 100 TB corpus on a 256-node cluster). Safe wherever the partition fn
    is a per-key merge — results are partition-count invariant (the same
    property ``auto_shrink`` relies on in the other direction)."""
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
            return max(min_parts, per_cpu * cpus)
    except Exception:  # pragma: no cover - resource query is best-effort
        pass
    return min_parts


def pool_size(requested: int) -> int:
    """Cap a FIXED actor-pool size to the cluster's CPU count minus one.

    A ``map_batches(Cls, concurrency=N)`` pool whose N >= cluster CPUs takes
    every slot, and the upstream task operators (``ReadParquet`` etc.) can
    never schedule — the stream deadlocks, silently, with the pool actors
    idle-waiting for input. Found live: the full gate at ``num_cpus=2``
    hung forever inside ``bpe_encode_stats`` (concurrency=4). At real
    cluster sizes the cap is a no-op; at tiny/test sizes it keeps one CPU
    free for the feeding tasks. Callers pass their tuned N; the helper
    never raises it."""
    try:
        import ray

        cpus = (
            int(ray.cluster_resources().get("CPU", 0))
            if ray.is_initialized()
            else 0
        )
    except Exception:  # pragma: no cover - resource probe best-effort
        cpus = 0
    if cpus <= 0:
        return max(1, requested)
    return max(1, min(requested, cpus - 1))
