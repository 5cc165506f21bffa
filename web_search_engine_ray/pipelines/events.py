"""Stream-shaped operators over the ``events`` table.

Ray Data is a (streaming-)batch engine with no event-time watermarks; the
bounded-log equivalents of the classic streaming ops are expressed as
partial-aggregate ``map_batches`` + a small ``groupby`` (tumbling windows) and
``groupby(key).map_groups`` over ts-sorted groups (session windows) — the
patterns a transcript-event pipeline needs (ordering assumption: within a
group, rows are sorted by ``ts`` inside the group function; nothing assumes
global order). Both have exact DuckDB SQL twins in ``__ray_entry__``.
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

    ds = _read_events(sf_dir, ["event_id", "event_type", "ts", "value"]).map_batches(
        partial, batch_format="pyarrow"
    )
    agg = ds.groupby(["event_type", "window_start"]).sum(["n_events_p", "sum_value_p"])

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": batch["window_start"].cast(pa.int64()),
                "n_events": batch["sum(n_events_p)"].cast(pa.int64()),
                "sum_value": pa.array(
                    np.round(
                        batch["sum(sum_value_p)"].to_numpy(zero_copy_only=False).astype(np.float64),
                        6,
                    ),
                    pa.float64(),
                ),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def sessionize_ds(sf_dir: str, gap_s: int = SESSION_GAP_S):
    """Session windows per user (new session when the gap since the previous
    event exceeds ``gap_s``): (user_id, session_idx, n_events, start_epoch,
    end_epoch). ``groupby(user_id).map_groups`` over the ts-sorted group."""

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        epoch = df["ts"].astype("int64") // 1_000_000
        new = (epoch.diff().fillna(gap_s + 1) > gap_s).astype("int64")
        sess = new.cumsum() - 1
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "session_idx": sess.to_numpy(),
                "epoch": epoch.to_numpy(),
            }
        )
        g = out.groupby("session_idx", as_index=False).agg(
            user_id=("user_id", "first"),
            n_events=("epoch", "size"),
            start_epoch=("epoch", "min"),
            end_epoch=("epoch", "max"),
        )
        return g[["user_id", "session_idx", "n_events", "start_epoch", "end_epoch"]]

    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])
    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")
