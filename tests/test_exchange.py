"""stages/exchange.py: partition completeness, empty partitions, callable vs
column keys, coalescing, and partition-invariance of merged aggregates."""

import numpy as np
import pyarrow as pa
import pytest


def _make_ds(n_rows=1000, n_blocks=7, seed=3):
    import ray.data

    rng = np.random.default_rng(seed)
    tables = []
    per = n_rows // n_blocks
    for b in range(n_blocks):
        tables.append(
            pa.table(
                {
                    "k": pa.array(rng.integers(0, 10, per), pa.int64()),
                    "v": pa.array(rng.integers(0, 100, per), pa.int64()),
                }
            )
        )
    return ray.data.from_arrow(tables)


def test_exchange_partition_completeness(ray_session):
    from web_search_engine_ray.stages.exchange import exchange_map

    ds = _make_ds()
    src = ds.to_pandas()

    def fn(t: pa.Table) -> pa.Table:
        # identity: every row must arrive exactly once, keyed correctly
        return t

    out = exchange_map(ds, lambda t: t["k"].to_numpy() % 4, 4, fn).to_pandas()
    assert len(out) == len(src)
    assert sorted(zip(out["k"], out["v"])) == sorted(zip(src["k"], src["v"]))


def test_exchange_routes_by_key(ray_session):
    from web_search_engine_ray.stages.exchange import exchange_map

    ds = _make_ds()

    def fn(t: pa.Table) -> pa.Table:
        ks = np.unique(t["k"].to_numpy() % 4) if t.num_rows else np.array([])
        # every row in one partition task shares the partition key
        assert ks.size <= 1, ks
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    out = exchange_map(ds, lambda t: t["k"].to_numpy() % 4, 4, fn).to_pandas()
    assert len(out) == 4  # one output block per partition, empties included
    assert out["n"].sum() == len(ds.to_pandas())


def test_exchange_column_key_dropped(ray_session):
    import ray.data

    from web_search_engine_ray.stages.exchange import exchange_map

    t = pa.table(
        {
            "p": pa.array([0, 1, 0, 1], pa.int64()),
            "v": pa.array([10, 20, 30, 40], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)

    def fn(g: pa.Table) -> pa.Table:
        assert "p" not in g.column_names
        return g

    out = exchange_map(ds, "p", 2, fn).to_pandas()
    assert sorted(out["v"]) == [10, 20, 30, 40]


def test_exchange_empty_partitions_still_call_fn(ray_session):
    import ray.data

    from web_search_engine_ray.stages.exchange import exchange_map

    t = pa.table({"k": pa.array([5, 5, 5], pa.int64())})
    ds = ray.data.from_arrow(t)
    out = exchange_map(
        ds,
        lambda x: x["k"].to_numpy() % 8,
        8,
        lambda g: pa.table({"n": pa.array([g.num_rows], pa.int64())}),
    ).to_pandas()
    assert len(out) == 8
    assert sorted(out["n"]) == [0] * 7 + [3]


def test_exchange_result_invariant_to_split_tasks(ray_session):
    """Merged aggregates must not depend on the coalescing granularity."""
    from web_search_engine_ray.stages.exchange import exchange_map

    import polars as pl

    def merge(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t).group_by("k").agg(pl.col("v").sum()).to_arrow()
        )

    outs = []
    for mst in (1, 3, 100):
        ds = _make_ds()
        o = exchange_map(
            ds, lambda t: t["k"].to_numpy() % 4, 4, merge, max_split_tasks=mst
        ).to_pandas()
        outs.append(o.sort_values(["k"]).reset_index(drop=True))
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])


def test_exchange_rejects_empty_dataset(ray_session):
    import ray.data

    from web_search_engine_ray.stages.exchange import exchange_map

    empty = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    # one empty block is fine (fn sees an empty table) — zero blocks is not
    out = exchange_map(
        empty,
        lambda t: t["k"].to_numpy() % 2,
        2,
        lambda g: pa.table({"n": pa.array([g.num_rows], pa.int64())}),
    ).to_pandas()
    assert sorted(out["n"]) == [0, 0]


def test_exchange_pre_udf_empty_block_schema(ray_session):
    """An empty source block (e.g. an empty parquet file in a multi-file
    corpus) never runs the map UDF, so it reaches the exchange with the
    PRE-UDF schema. fn must still only ever see the post-UDF schema — even
    for all-empty partitions whose only candidates include that stale
    block."""
    import ray.data

    from web_search_engine_ray.stages.exchange import exchange_map

    pre = pa.table({"text": pa.array([], pa.string())})  # pre-UDF schema
    data = pa.table({"text": pa.array(["a", "b", "c"], pa.string())})
    ds = ray.data.from_arrow([pre, data])

    def udf(t: pa.Table) -> pa.Table:
        t = t.append_column(
            "k", pa.array(np.arange(t.num_rows) % 2, pa.int64())
        )
        return t.append_column(
            "val", pa.array(np.full(t.num_rows, 7), pa.int64())
        )

    ds = ds.map_batches(udf, batch_format="pyarrow")

    def fn(g: pa.Table) -> pa.Table:
        # reads a UDF-added column: KeyErrors pre-fix when g carries the
        # pre-UDF schema (text only, no val)
        s = int(pa.compute.sum(g["val"]).as_py() or 0)
        return pa.table(
            {"n": pa.array([g.num_rows], pa.int64()),
             "s": pa.array([s], pa.int64())}
        )

    # 6 partitions but keys only hit {0, 1}: partitions 2-5 are all-empty,
    # and the pre-UDF empty group routes its stale block to every partition
    out = exchange_map(ds, "k", 6, fn, max_split_tasks=100).to_pandas()
    assert len(out) == 6
    assert out["n"].sum() == 3
    assert out["s"].sum() == 21


def test_exchange_property_random(ray_session):
    """Property: for arbitrary key/value tables, block splits, and partition
    counts, the exchange is a permutation of the input (no loss, no dupes)
    and per-key sums survive a group-merge exactly."""
    import polars as pl
    import ray.data

    from web_search_engine_ray.stages.exchange import exchange_map

    rng = np.random.default_rng(123)
    for trial in range(8):
        n_rows = int(rng.integers(1, 400))
        n_blocks = int(rng.integers(1, 9))
        n_parts = int(rng.integers(1, 17))
        keys = rng.integers(0, max(1, int(rng.integers(1, 50))), n_rows)
        vals = rng.integers(-1000, 1000, n_rows)
        cuts = np.sort(rng.integers(0, n_rows + 1, n_blocks - 1)) if n_blocks > 1 else []
        bounds = [0, *cuts, n_rows]
        tables = [
            pa.table(
                {
                    "k": pa.array(keys[bounds[i] : bounds[i + 1]], pa.int64()),
                    "v": pa.array(vals[bounds[i] : bounds[i + 1]], pa.int64()),
                }
            )
            for i in range(n_blocks)
        ]
        ds = ray.data.from_arrow(tables)

        def merge(t: pa.Table) -> pa.Table:
            return (
                pl.from_arrow(t).group_by("k").agg(pl.col("v").sum()).to_arrow()
            )

        out = exchange_map(
            ds,
            lambda t: t["k"].to_numpy(zero_copy_only=False) % n_parts,
            n_parts,
            merge,
            max_split_tasks=int(rng.integers(1, 6)),
        ).to_pandas()
        want = (
            pl.DataFrame({"k": keys, "v": vals})
            .group_by("k")
            .agg(pl.col("v").sum())
            .to_pandas()
        )
        got = out.sort_values("k").reset_index(drop=True)
        want = want.sort_values("k").reset_index(drop=True)
        assert got["k"].tolist() == want["k"].tolist(), trial
        assert got["v"].tolist() == want["v"].tolist(), trial


def test_exchange_auto_shrink_invariance(ray_session):
    """auto_shrink picks a divisor partition count from the block count;
    per-key merge results must be identical to the unshrunk exchange, and
    with_index + auto_shrink must refuse."""
    import polars as pl
    import pytest as _pytest
    import ray.data

    from web_search_engine_ray.stages.exchange import exchange_map

    ds_small = _make_ds(n_rows=200, n_blocks=2)

    def merge(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t).group_by("k").agg(pl.col("v").sum()).to_arrow()
        )

    a = (
        exchange_map(
            _make_ds(200, 2), lambda t: t["k"].to_numpy() % 64, 64, merge
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    b = (
        exchange_map(
            ds_small,
            lambda t: t["k"].to_numpy() % 64,
            64,
            merge,
            auto_shrink=True,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    # shrunk: far fewer output blocks than 64 for a 2-block input
    n_blocks = len(
        exchange_map(
            _make_ds(200, 2),
            lambda t: t["k"].to_numpy() % 64,
            64,
            merge,
            auto_shrink=True,
        ).to_arrow_refs()
    )
    assert n_blocks <= 8

    with _pytest.raises(ValueError, match="with_index"):
        exchange_map(
            ds_small,
            lambda t: t["k"].to_numpy() % 64,
            64,
            merge,
            with_index=True,
            auto_shrink=True,
        )


def test_pool_size_caps_to_cluster(ray_session):
    """A fixed actor-pool concurrency >= cluster CPUs starves the upstream
    task operators and deadlocks the stream (observed live: the full gate at
    num_cpus=2 hung in bpe_encode_stats with concurrency=4). pool_size caps
    the request to CPUs-1 and never raises it."""
    import ray

    from web_search_engine_ray.stages.exchange import pool_size

    cpus = int(ray.cluster_resources()["CPU"])
    assert pool_size(cpus + 2) == max(1, cpus - 1)
    assert pool_size(1) == 1
    assert pool_size(max(1, cpus - 1)) == max(1, cpus - 1)
