"""Relational pipelines over the TPC-H-shaped tables — the general
data-processing side of the engine (the reference is documents-only; a user
replacing it still has orders/lineitem-style relations to aggregate and
join, and these pipelines pin the two join strategies every other operator
composes from):

- :func:`pricing_summary_ds` (TPC-H Q1 shape): filtered scan ->
  per-batch partial aggregation -> tiny hash exchange on the group key.
  The shuffle carries ONE row per (batch, group) — never line items.
- :func:`shipping_priority_ds` (TPC-H Q3 shape): BROADCAST join for the
  small side (filtered customer keys via ``ray.put``, tested with
  ``np.isin`` inside the scan — no shuffle), then an EXCHANGE hash join on
  ``orderkey`` for the two big sides (orders + pre-aggregated lineitem
  revenue ride the same partition route, joined locally per partition),
  then a result-scale top-k sort.

Money arithmetic is exact: prices/discounts/taxes are 2-decimal values, so
both engine and SQL convert to integer cents (``rint(x * 100)``) and sum
int64 — float association can never make the two sides disagree; the final
division back to currency happens once, on identical integers.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

Q1_CUTOFF = "1999-09-01"
Q3_DATE = "1998-03-15"
Q3_SEGMENT = "BUILDING"


def _path(sf_dir: str, table: str) -> str:
    import os

    return os.path.join(sf_dir, f"{table}.parquet")


def _ts(s: str):
    from datetime import datetime

    return datetime.strptime(s, "%Y-%m-%d")


def pricing_summary_ds(sf_dir: str, cutoff: str = Q1_CUTOFF):
    """(returnflag, linestatus, sum_qty, sum_base_price, sum_disc_price,
    sum_charge, avg_qty, avg_price, avg_disc, count_order) — the Q1
    pricing-summary aggregate over lineitem rows shipped on or before
    ``cutoff``."""
    import ray
    import ray.data

    from web_search_engine_ray.stages.exchange import exchange_map

    n_parts = 8

    def partial(t: pa.Table) -> pa.Table:
        qty_c = np.rint(
            t["l_quantity"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        price_c = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.rint(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        tax_c = np.rint(t["l_tax"].to_numpy(zero_copy_only=False) * 100).astype(
            np.int64
        )
        df = pl.DataFrame(
            {
                "returnflag": pl.from_arrow(t["l_returnflag"]),
                "linestatus": pl.from_arrow(t["l_linestatus"]),
                "qty_c": qty_c,
                "price_c": price_c,
                "d_c": disc_c,
                "dp_c": price_c * (100 - disc_c),
                "ch_c": price_c * (100 - disc_c) * (100 + tax_c),
            }
        )
        return (
            df.group_by(["returnflag", "linestatus"])
            .agg(
                pl.col("qty_c").sum(),
                pl.col("price_c").sum(),
                pl.col("d_c").sum(),
                pl.col("dp_c").sum(),
                pl.col("ch_c").sum(),
                n=pl.len().cast(pl.Int64),
            )
            .to_arrow()
        )

    def route(t: pa.Table) -> np.ndarray:
        key = pl.from_arrow(t).select(
            k=pl.col("returnflag") + "|" + pl.col("linestatus")
        )["k"]
        return (key.hash(seed=7).to_numpy() % np.uint64(n_parts)).astype(np.int64)

    def merge(t: pa.Table) -> pa.Table:
        g = (
            pl.from_arrow(t)
            .group_by(["returnflag", "linestatus"])
            .agg(
                pl.col("qty_c").sum(),
                pl.col("price_c").sum(),
                pl.col("d_c").sum(),
                pl.col("dp_c").sum(),
                pl.col("ch_c").sum(),
                pl.col("n").sum(),
            )
        )
        qty = g["qty_c"].to_numpy().astype(np.float64)
        price = g["price_c"].to_numpy().astype(np.float64)
        n = g["n"].to_numpy().astype(np.float64)
        dsum = g["d_c"].to_numpy().astype(np.float64)
        return pa.table(
            {
                "returnflag": g["returnflag"].to_arrow().cast(pa.string()),
                "linestatus": g["linestatus"].to_arrow().cast(pa.string()),
                "sum_qty": pa.array(qty / 100.0, pa.float64()),
                "sum_base_price": pa.array(price / 100.0, pa.float64()),
                "sum_disc_price": pa.array(
                    g["dp_c"].to_numpy().astype(np.float64) / 10000.0, pa.float64()
                ),
                "sum_charge": pa.array(
                    g["ch_c"].to_numpy().astype(np.float64) / 1000000.0,
                    pa.float64(),
                ),
                "avg_qty": pa.array(np.round(qty / (100.0 * n), 6), pa.float64()),
                "avg_price": pa.array(np.round(price / (100.0 * n), 6), pa.float64()),
                "avg_disc": pa.array(np.round(dsum / (100.0 * n), 6), pa.float64()),
                "count_order": pa.array(g["n"].to_numpy().astype(np.int64)),
            }
        )

    ds = ray.data.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        ],
        filter=(pc.field("l_shipdate") <= pa.scalar(_ts(cutoff))),
    )
    return exchange_map(
        ds.map_batches(partial, batch_format="pyarrow"),
        route,
        n_parts,
        merge,
        auto_shrink=True,
    )


def shipping_priority_ds(
    sf_dir: str, date: str = Q3_DATE, segment: str = Q3_SEGMENT, k: int = 10
):
    """(orderkey, revenue, order_epoch, priority): top-k unshipped orders of
    one market segment by revenue — the Q3 shape. Broadcast semi-join on
    customer, exchange hash join orders x lineitem on orderkey, top-k cut
    by (revenue desc, order_epoch, orderkey)."""
    import ray
    import ray.data

    from web_search_engine_ray.stages.exchange import cluster_parts, exchange_map

    np_ = cluster_parts(32)
    d = _ts(date)

    cust = ray.data.read_parquet(
        _path(sf_dir, "customer"),
        columns=["c_custkey", "c_mktsegment"],
        filter=(pc.field("c_mktsegment") == segment),
    )
    keys = np.sort(
        np.concatenate(
            [
                t["c_custkey"].to_numpy(zero_copy_only=False)
                for t in ray.get(cust.to_arrow_refs())
                if t.num_rows
            ]
            or [np.empty(0, np.int64)]
        )
    )
    kref = ray.put(keys)

    def order_rows(t: pa.Table) -> pa.Table:
        ck = ray.get(kref)
        cust_k = t["o_custkey"].to_numpy(zero_copy_only=False)
        m = np.isin(cust_k, ck)
        tt = t.filter(pa.array(m))
        epoch = (
            tt["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // 1_000_000
        )
        return pa.table(
            {
                "kind": pa.array(np.zeros(tt.num_rows, np.int8)),
                "orderkey": tt["o_orderkey"].cast(pa.int64()),
                "rev_c": pa.array(np.zeros(tt.num_rows, np.int64)),
                "epoch": pa.array(epoch, pa.int64()),
                "priority": tt["o_orderpriority"].cast(pa.string()),
            }
        )

    def line_rows(t: pa.Table) -> pa.Table:
        price_c = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.rint(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        g = (
            pl.DataFrame(
                {
                    "orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                    "rev_c": price_c * (100 - disc_c),
                }
            )
            .group_by("orderkey")
            .agg(pl.col("rev_c").sum())
        )
        n = g.height
        return pa.table(
            {
                "kind": pa.array(np.ones(n, np.int8)),
                "orderkey": pa.array(g["orderkey"].to_numpy(), pa.int64()),
                "rev_c": pa.array(g["rev_c"].to_numpy(), pa.int64()),
                "epoch": pa.array(np.zeros(n, np.int64)),
                "priority": pa.array([""] * n, pa.string()),
            }
        )

    orders = ray.data.read_parquet(
        _path(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=(pc.field("o_orderdate") < pa.scalar(d)),
    ).map_batches(order_rows, batch_format="pyarrow")
    lines = ray.data.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") > pa.scalar(d)),
    ).map_batches(line_rows, batch_format="pyarrow")

    def route(t: pa.Table) -> np.ndarray:
        return (
            t["orderkey"].combine_chunks().to_numpy(zero_copy_only=False) % np_
        ).astype(np.int64)

    def join(t: pa.Table) -> pa.Table:
        tt = pl.from_arrow(t)
        o = tt.filter(pl.col("kind") == 0).select("orderkey", "epoch", "priority")
        l = (
            tt.filter(pl.col("kind") == 1)
            .group_by("orderkey")
            .agg(pl.col("rev_c").sum())
        )
        j = o.join(l, on="orderkey", how="inner")
        return pa.table(
            {
                "orderkey": pa.array(j["orderkey"].to_numpy(), pa.int64()),
                "rev_c": pa.array(j["rev_c"].to_numpy(), pa.int64()),
                "order_epoch": pa.array(j["epoch"].to_numpy(), pa.int64()),
                "priority": j["priority"].to_arrow().cast(pa.string()),
            }
        )

    joined = exchange_map(orders.union(lines), route, np_, join, auto_shrink=True)
    top = joined.sort(
        ["rev_c", "order_epoch", "orderkey"], descending=[True, False, False]
    ).limit(k)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "orderkey": t["orderkey"],
                "revenue": pa.array(
                    t["rev_c"].to_numpy(zero_copy_only=False) / 10000.0, pa.float64()
                ),
                "order_epoch": t["order_epoch"],
                "priority": t["priority"],
            }
        )

    return top.map_batches(finish, batch_format="pyarrow")
