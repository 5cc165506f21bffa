"""10M-event stress cards for the events analytics family (BASELINE.md):
funnel, retention, DAU, anomalies, top-N/user, running sum, sessionize,
pagerank — wall time + driver RSS, the tools/stress_r4.py discipline.

Corpus: deterministic synthetic events (seeded numpy), 100k users x ~100
events over 30 days, written once to /tmp and cached by a .complete marker.

Usage: python tools/events_stress.py [substring]  (run alone — bench
discipline: never measure concurrently with other work)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.dedup_stress import _driver_rss_mb

DIR = "/tmp/wse_events_stress"
N_EVENTS = 10_000_000
N_USERS = 100_000
TYPES = ["click", "error", "purchase", "signup", "view"]


def ensure_events() -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    marker = os.path.join(DIR, ".complete")
    if os.path.exists(marker):
        return DIR
    os.makedirs(DIR, exist_ok=True)
    rng = np.random.default_rng(42)
    user = rng.integers(0, N_USERS, N_EVENTS)
    # 30 days of microsecond timestamps starting 2024-01-01
    base = 1_704_067_200_000_000
    ts = base + rng.integers(0, 30 * 86_400_000_000, N_EVENTS)
    et = rng.integers(0, len(TYPES), N_EVENTS)
    value = np.round(rng.random(N_EVENTS) * 500, 2)
    k = rng.integers(0, 100, N_EVENTS)
    order = np.argsort(ts, kind="stable")
    t = pa.table(
        {
            "event_id": pa.array(np.arange(N_EVENTS, dtype=np.int64)),
            "ts": pa.array(ts[order], pa.timestamp("us")),
            "user_id": pa.array(user[order], pa.int64()),
            "event_type": pa.array(
                np.array(TYPES, dtype=object)[et[order]], pa.string()
            ),
            "value": pa.array(value[order], pa.float64()),
            "props": pa.array(
                [f'{{"k": {int(x)}}}' for x in k[order]], pa.string()
            ),
        }
    )
    pq.write_table(t, os.path.join(DIR, "events.parquet"), row_group_size=500_000)
    with open(marker, "w") as f:
        f.write("ok")
    return DIR


def main() -> None:
    import ray

    d = ensure_events()
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    from web_search_engine_ray.pipelines import events, graph

    ops = [
        ("sessionize_10M", lambda: events.sessionize_ds(d).count()),
        ("daily_users_10M", lambda: events.daily_active_users_ds(d).count()),
        ("retention_10M", lambda: events.retention_cohorts_ds(d).count()),
        ("funnel_10M", lambda: events.session_funnel_ds(d).count()),
        ("anomalies_10M", lambda: events.window_anomalies_ds(d).count()),
        ("topn_per_user_10M", lambda: events.topn_per_user_ds(d).count()),
        ("running_sum_10M", lambda: events.running_sum_ds(d).count()),
        ("json_props_agg_10M", lambda: events.json_props_agg_ds(d).count()),
        ("pagerank_10M_events", lambda: len(graph.event_type_pagerank_table(d))),
    ]
    only = sys.argv[1] if len(sys.argv) > 1 else None
    if only:
        ops = [(n, f) for n, f in ops if only in n]
    for name, fn in ops:
        t0 = time.time()
        n = fn()
        print(
            f"{name}: {time.time() - t0:.1f}s -> {n} "
            f"(driver_rss={_driver_rss_mb():.0f}MB)",
            flush=True,
        )
    ray.shutdown()


if __name__ == "__main__":
    main()
