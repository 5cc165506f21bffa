"""Stream-shaped operators over the ``events`` table.

Ray Data is a (streaming-)batch engine with no event-time watermarks; the
bounded-log equivalents of the classic streaming ops are expressed as
partial-aggregate ``map_batches`` + a window-routed partition exchange
(tumbling + hopping windows) and a user-routed exchange with one vectorized
sessionization pass per partition (session windows) — the patterns a
transcript-event pipeline needs (nothing assumes global order). All three
have exact DuckDB SQL twins in ``__ray_entry__``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

WINDOW_S = 3600
SESSION_GAP_S = 1800


def _read_events(sf_dir: str, columns):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def window_agg_ds(sf_dir: str, window_s: int = WINDOW_S):
    """Tumbling window per event_type: (event_type, window_start, n_events,
    sum_value). Pre-aggregated per batch (one row per (type, window) per
    batch) before the tiny groupby — the shuffle moves partials, not events."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        epoch = df["ts"].astype("int64") // 1_000_000
        df["window_start"] = (epoch // window_s) * window_s
        g = (
            df.groupby(["event_type", "window_start"], as_index=False)
            .agg(n_events_p=("event_id", "size"), sum_value_p=("value", "sum"))
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from web_search_engine_ray.stages.exchange import exchange_map

    def merge(t: pa.Table) -> pa.Table:
        import polars as pl

        g = (
            pl.from_arrow(t)
            .group_by(["event_type", "window_start"])
            .agg(
                pl.col("n_events_p").sum().alias("n_events"),
                pl.col("sum_value_p").sum().alias("sum_value"),
            )
        )
        out = g.to_arrow()
        return pa.table(
            {
                "event_type": out["event_type"].cast(pa.string()),
                "window_start": out["window_start"].cast(pa.int64()),
                "n_events": out["n_events"].cast(pa.int64()),
                "sum_value": pa.array(
                    np.round(
                        out["sum_value"].to_numpy(zero_copy_only=False).astype(np.float64),
                        6,
                    ),
                    pa.float64(),
                ),
            }
        )

    ds = _read_events(sf_dir, ["event_id", "event_type", "ts", "value"]).map_batches(
        partial, batch_format="pyarrow"
    )
    # route partials by window (all partials of one (type, window) share the
    # window, so a window-keyed partition sees every partial it must merge)
    return exchange_map(
        ds,
        lambda t: (
            t["window_start"].combine_chunks().to_numpy(zero_copy_only=False)
            // window_s
        ).astype(np.int64)
        % 32,
        32,
        merge,
    )


def sessionize_ds(sf_dir: str, gap_s: int = SESSION_GAP_S):
    """Session windows per user (new session when the gap since the previous
    event exceeds ``gap_s``): (user_id, session_idx, n_events, start_epoch,
    end_epoch).

    Shuffle shape: a partition hash exchange on ``user_id`` (all of a user's
    events land in one partition), then the WHOLE partition is sessionized
    in one vectorized pandas pass — sort by (user, ts, event_id), session
    breaks = new-user OR gap, global cumsum re-based per user — instead of
    one ``map_groups`` dispatch per user (users are numerous and tiny; the
    per-group call overhead dwarfs the work)."""

    def sessions_part(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
        epoch = df["ts"].astype("int64") // 1_000_000
        new_user = df["user_id"].ne(df["user_id"].shift())
        gap = epoch.diff().fillna(gap_s + 1) > gap_s
        gsid = (new_user | gap).cumsum()
        df = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "gsid": gsid.to_numpy(),
                "epoch": epoch.to_numpy(),
            }
        )
        df["session_idx"] = df["gsid"] - df.groupby("user_id")["gsid"].transform(
            "min"
        )
        g = df.groupby(["user_id", "session_idx"], as_index=False).agg(
            n_events=("epoch", "size"),
            start_epoch=("epoch", "min"),
            end_epoch=("epoch", "max"),
        )
        g = g[["user_id", "session_idx", "n_events", "start_epoch", "end_epoch"]]
        return pa.Table.from_pandas(g, preserve_index=False).cast(
            pa.schema(
                [
                    ("user_id", pa.int64()),
                    ("session_idx", pa.int64()),
                    ("n_events", pa.int64()),
                    ("start_epoch", pa.int64()),
                    ("end_epoch", pa.int64()),
                ]
            )
        )

    from web_search_engine_ray.stages.exchange import exchange_map

    N = 32
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])
    return exchange_map(
        ds,
        lambda t: (
            t["user_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            % N
        ),
        N,
        sessions_part,
    )


HOP_S = 900


def hopping_window_ds(sf_dir: str, window_s: int = WINDOW_S, hop_s: int = HOP_S):
    """Hopping (sliding) window per event_type: a ``window_s`` window starts
    every ``hop_s``, so each event contributes to ``window_s // hop_s``
    overlapping windows. (event_type, window_start, n_events, sum_value).

    Same scale shape as :func:`window_agg_ds`: the k-fold window expansion
    and partial aggregation happen inside ``map_batches`` (the shuffle moves
    one partial row per (type, window) per batch, never k x events), merged
    by a window-routed partition exchange."""
    assert window_s % hop_s == 0, "window_s must be a multiple of hop_s"
    k = window_s // hop_s

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        epoch = (df["ts"].astype("int64") // 1_000_000).to_numpy()
        base = (epoch // hop_s) * hop_s
        n = len(df)
        starts = np.repeat(base, k) - np.tile(np.arange(k, dtype=np.int64) * hop_s, n)
        rep = pd.DataFrame(
            {
                "event_type": np.repeat(df["event_type"].to_numpy(), k),
                "window_start": starts,
                "value": np.repeat(df["value"].to_numpy(), k),
            }
        )
        g = rep.groupby(["event_type", "window_start"], as_index=False).agg(
            n_events_p=("value", "size"), sum_value_p=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(t: pa.Table) -> pa.Table:
        import polars as pl

        g = (
            pl.from_arrow(t)
            .group_by(["event_type", "window_start"])
            .agg(
                pl.col("n_events_p").sum().alias("n_events"),
                pl.col("sum_value_p").sum().alias("sum_value"),
            )
        )
        out = g.to_arrow()
        return pa.table(
            {
                "event_type": out["event_type"].cast(pa.string()),
                "window_start": out["window_start"].cast(pa.int64()),
                "n_events": out["n_events"].cast(pa.int64()),
                "sum_value": pa.array(
                    np.round(
                        out["sum_value"].to_numpy(zero_copy_only=False).astype(np.float64),
                        6,
                    ),
                    pa.float64(),
                ),
            }
        )

    from web_search_engine_ray.stages.exchange import exchange_map

    ds = _read_events(sf_dir, ["event_id", "event_type", "ts", "value"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return exchange_map(
        ds,
        lambda t: (
            t["window_start"].combine_chunks().to_numpy(zero_copy_only=False)
            // hop_s
        ).astype(np.int64)
        % 32,
        32,
        merge,
    )


def asof_join_ds(
    sf_dir: str, left_type: str = "purchase", right_type: str = "view"
):
    """As-of join — an operator Ray Data has no native expression for: each
    ``left_type`` event joins its user's most recent STRICTLY-prior
    ``right_type`` event. (event_id, user_id, prior_epoch_us, gap_us);
    left events with no prior match drop (inner as-of semantics, same as
    DuckDB's ``ASOF JOIN ... ON l.user_id = r.user_id AND l.ts > r.ts`` —
    the exact oracle twin).

    Shuffle shape: one partition hash exchange on ``user_id`` (both sides
    ride the same exchange — the filter to the two types happens before it,
    so only relevant events move), then each partition resolves every left
    event with ONE ``np.searchsorted`` against its users' sorted right
    timestamps. Epochs stay in integer microseconds end-to-end, so engine
    and SQL agree exactly. The output carries the prior event's TIMESTAMP
    (unique per user-instant) rather than its event_id — two right events
    on the same microsecond would make an id choice arbitrary in both
    engines."""
    import pyarrow.compute as pc

    from web_search_engine_ray.stages.exchange import exchange_map

    def keep_types(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(
            batch["event_type"],
            value_set=pa.array([left_type, right_type], pa.string()),
        )
        return batch.filter(mask)

    def join_part(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if df.empty:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "prior_epoch_us": pa.array([], pa.int64()),
                    "gap_us": pa.array([], pa.int64()),
                }
            )
        df["ep"] = df["ts"].astype("int64")  # microseconds
        # composite sort key (user, ep): searchsorted over the concatenated
        # right side works across users because users are contiguous
        right = (
            df[df["event_type"] == right_type]
            .sort_values(["user_id", "ep"], kind="mergesort")
            .reset_index(drop=True)
        )
        left = df[df["event_type"] == left_type]
        if right.empty or left.empty:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "prior_epoch_us": pa.array([], pa.int64()),
                    "gap_us": pa.array([], pa.int64()),
                }
            )
        r_user = right["user_id"].to_numpy()
        r_ep = right["ep"].to_numpy()
        l_user = left["user_id"].to_numpy()
        l_ep = left["ep"].to_numpy()
        l_id = left["event_id"].to_numpy()
        # per-user segment of the (user, ep)-sorted right side, then one
        # vectorized searchsorted per user over its left events
        seg_lo = np.searchsorted(r_user, l_user, side="left")
        pos = np.full(l_user.size, -1, dtype=np.int64)
        lorder = np.lexsort((l_ep, l_user))
        i = 0
        while i < lorder.size:
            j = i + 1
            u = l_user[lorder[i]]
            while j < lorder.size and l_user[lorder[j]] == u:
                j += 1
            li = lorder[i:j]
            s0 = int(seg_lo[li[0]])
            e0 = int(np.searchsorted(r_user, u, side="right"))
            if e0 > s0:
                p_ = s0 + np.searchsorted(r_ep[s0:e0], l_ep[li], side="left") - 1
                pos[li] = np.where(p_ >= s0, p_, -1)
            i = j
        ok = pos >= 0
        pe = r_ep[pos[ok]]
        return pa.table(
            {
                "event_id": pa.array(l_id[ok], pa.int64()),
                "user_id": pa.array(l_user[ok], pa.int64()),
                "prior_epoch_us": pa.array(pe, pa.int64()),
                "gap_us": pa.array(l_ep[ok] - pe, pa.int64()),
            }
        )

    N = 32
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    ds = ds.map_batches(keep_types, batch_format="pyarrow")
    return exchange_map(
        ds,
        lambda t: (
            t["user_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            % N
        ),
        N,
        join_part,
    )


def session_range_join_ds(sf_dir: str, gap_s: int = SESSION_GAP_S):
    """Range (interval) join — the second join shape Ray Data lacks: assign
    each event to the session interval containing it. (event_id, user_id,
    session_idx).

    Per partition (user-routed exchange, so an interval and its points are
    co-located), session intervals are derived and each event resolves its
    interval with ONE ``np.searchsorted`` against the user's sorted session
    starts — the general interval-assignment mechanic; any other interval
    table (ad campaigns, deploy windows) would ride the same exchange. The
    SQL twin is the literal range join: events JOIN sessions ON user AND
    ep BETWEEN start AND end (session intervals are disjoint per user, so
    the join is one-to-one and row count == event count)."""

    def join_part(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
        if df.empty:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "session_idx": pa.array([], pa.int64()),
                }
            )
        epoch = (df["ts"].astype("int64") // 1_000_000).to_numpy()
        user = df["user_id"].to_numpy()
        eid = df["event_id"].to_numpy()
        new_user = np.ones(user.size, dtype=bool)
        new_user[1:] = user[1:] != user[:-1]
        gap = np.ones(user.size, dtype=bool)
        gap[1:] = (epoch[1:] - epoch[:-1]) > gap_s
        brk = new_user | gap
        # session interval starts (the break rows), per user
        starts = epoch[brk]
        s_user = user[brk]
        # assign every event by searchsorted over ITS user's session starts
        out_idx = np.empty(user.size, dtype=np.int64)
        i = 0
        n = user.size
        while i < n:
            j = i + 1
            u = user[i]
            while j < n and user[j] == u:
                j += 1
            s_lo = int(np.searchsorted(s_user, u, side="left"))
            s_hi = int(np.searchsorted(s_user, u, side="right"))
            out_idx[i:j] = (
                np.searchsorted(starts[s_lo:s_hi], epoch[i:j], side="right") - 1
            )
            i = j
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(user, pa.int64()),
                "session_idx": pa.array(out_idx, pa.int64()),
            }
        )

    from web_search_engine_ray.stages.exchange import exchange_map

    N = 32
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])
    return exchange_map(
        ds,
        lambda t: (
            t["user_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            % N
        ),
        N,
        join_part,
    )
