"""Skew test for the event joins: one user holds ~1M of the events in a
partition, so any per-user interpreter loop would dominate and any
composite-key overflow would corrupt results. Verified against DuckDB
(native ASOF JOIN / BETWEEN range join) on the same parquet."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

N_HOT = 1_000_000
N_COLD_USERS = 50
N_COLD_EACH = 40


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_skew")
    rng = np.random.default_rng(42)
    # hot user 7: ~1M events over ~12 days, mixed types
    hot_ts = np.sort(rng.integers(0, 1_000_000_000_000, N_HOT))  # us
    hot_user = np.full(N_HOT, 7, dtype=np.int64)
    cold_ts = rng.integers(0, 1_000_000_000_000, N_COLD_USERS * N_COLD_EACH)
    cold_user = np.repeat(
        np.arange(100, 100 + N_COLD_USERS, dtype=np.int64), N_COLD_EACH
    )
    ts = np.concatenate([hot_ts, cold_ts])
    user = np.concatenate([hot_user, cold_user])
    n = ts.size
    etype = np.array(["view", "purchase", "click"])[
        rng.integers(0, 3, n)
    ]
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(user),
            "event_type": pa.array(etype, pa.string()),
            "value": pa.array(rng.random(n)),
            "props": pa.array(np.full(n, "{}"), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(str(d), "events.parquet"))
    return str(d)


def test_asof_join_skewed_user(ray_session, skew_dir):
    from web_search_engine_ray.pipelines.events import asof_join_ds

    got = (
        asof_join_ds(skew_dir)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{skew_dir}/events.parquet')"
    )
    want = con.execute(
        """
        SELECT l.event_id,
               l.user_id,
               epoch_us(r.ts) AS prior_epoch_us,
               epoch_us(l.ts) - epoch_us(r.ts) AS gap_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') r
          ON l.user_id = r.user_id AND l.ts > r.ts
        ORDER BY l.event_id
        """
    ).df()
    assert len(got) == len(want)
    for c in ["event_id", "user_id", "prior_epoch_us", "gap_us"]:
        assert np.array_equal(
            got[c].to_numpy().astype(np.int64),
            want[c].to_numpy().astype(np.int64),
        ), c


def test_range_join_skewed_user(ray_session, skew_dir):
    from web_search_engine_ray.pipelines.events import (
        SESSION_GAP_S,
        session_range_join_ds,
        sessionize_ds,
    )

    got = (
        session_range_join_ds(skew_dir)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # every event lands in exactly one session
    n = pq.read_metadata(os.path.join(skew_dir, "events.parquet")).num_rows
    assert len(got) == n
    # cross-check against the sessionize relation: the (user, session_idx)
    # intervals must contain each event's epoch
    sess = sessionize_ds(skew_dir).to_pandas()
    merged = got.merge(sess, on=["user_id", "session_idx"], how="left")
    assert merged["n_events"].notna().all()
    ev = pq.read_table(
        os.path.join(skew_dir, "events.parquet"),
        columns=["event_id", "ts"],
    ).to_pandas()
    ev["epoch"] = ev["ts"].astype("int64") // 1_000_000
    merged = merged.merge(ev[["event_id", "epoch"]], on="event_id")
    assert (merged["epoch"] >= merged["start_epoch"]).all()
    assert (merged["epoch"] <= merged["end_epoch"]).all()
    # and session event counts agree with the assignment's group sizes
    sizes = (
        got.groupby(["user_id", "session_idx"])
        .size()
        .rename("sz")
        .reset_index()
    )
    chk = sess.merge(sizes, on=["user_id", "session_idx"], how="outer")
    assert (chk["n_events"] == chk["sz"]).all()


def test_asof_self_join(ray_session, skew_dir):
    """left_type == right_type is a SELF as-of join: each view event joins
    its user's strictly-prior view (never itself), matching DuckDB."""
    from web_search_engine_ray.pipelines.events import asof_join_ds

    got = (
        asof_join_ds(skew_dir, left_type="view", right_type="view")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) > 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{skew_dir}/events.parquet')"
    )
    want = con.execute(
        """
        SELECT l.event_id, l.user_id,
               epoch_us(r.ts) AS prior_epoch_us,
               epoch_us(l.ts) - epoch_us(r.ts) AS gap_us
        FROM (SELECT * FROM events WHERE event_type = 'view') l
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') r
          ON l.user_id = r.user_id AND l.ts > r.ts
        ORDER BY l.event_id
        """
    ).df()
    assert len(got) == len(want)
    for c in ["event_id", "user_id", "prior_epoch_us", "gap_us"]:
        assert np.array_equal(
            got[c].to_numpy().astype(np.int64),
            want[c].to_numpy().astype(np.int64),
        ), c


def test_json_props_agg(ray_session, tmp_path_factory):
    """Vectorized JSON field extraction: malformed/missing fields drop on
    both sides; aggregates hand-checkable."""
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_search_engine_ray.pipelines.events import json_props_agg_ds

    d = tmp_path_factory.mktemp("json_events")
    ts = datetime(2024, 1, 1)
    props = ['{"k": 5}', '{"k": 7}', '{"other": 1}', "not json", '{"k": 2}']
    types = ["a", "a", "a", "a", "b"]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(5), pa.int64()),
                "ts": pa.array([ts] * 5, pa.timestamp("us")),
                "user_id": pa.array([1] * 5, pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array([0.0] * 5),
                "props": pa.array(props, pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    got = json_props_agg_ds(str(d)).to_pandas().set_index("event_type")
    assert got.loc["a", "n"] == 2 and got.loc["a", "sum_k"] == 12
    assert got.loc["a", "min_k"] == 5 and got.loc["a", "max_k"] == 7
    assert got.loc["a", "avg_k"] == 6.0
    assert got.loc["b", "n"] == 1 and got.loc["b", "avg_k"] == 2.0


def test_json_props_agg_matches_oracle(ray_session, oracle_eq):
    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    got = entrymod.queries()["json_props_agg"](sf).to_pandas()
    want = con.sql(entrymod.oracle_sql()["json_props_agg"]).df()


    oracle_eq(got, want)


def test_topn_running_histogram_planted(ray_session, tmp_path_factory):
    from datetime import datetime, timedelta

    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_search_engine_ray.pipelines.events import (
        running_sum_ds,
        topn_per_user_ds,
        value_histogram_ds,
    )

    d = tmp_path_factory.mktemp("tiny_events")
    t0 = datetime(2024, 1, 1)
    # user 1: values 5, 3, 9 in ts order; user 2: one event
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([10, 11, 12, 20], pa.int64()),
                "ts": pa.array(
                    [t0, t0 + timedelta(seconds=1), t0 + timedelta(seconds=2), t0],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                "event_type": pa.array(["x"] * 4, pa.string()),
                "value": pa.array([5.0, 3.0, 9.0, 700.0]),
                "props": pa.array(["{}"] * 4, pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    top = topn_per_user_ds(str(d), n=2).to_pandas().sort_values(
        ["user_id", "rnk"]
    )
    assert list(top.event_id) == [12, 10, 20]  # 9.0, 5.0 for u1; u2's single
    assert list(top.rnk) == [1, 2, 1]
    run = (
        running_sum_ds(str(d))
        .to_pandas()
        .set_index("event_id")["running_value"]
    )
    assert list(run.loc[[10, 11, 12]]) == [5.0, 8.0, 17.0]
    assert run.loc[20] == 700.0
    hist = value_histogram_ds(str(d), lo=0.0, hi=10.0, bins=2).to_pandas()
    # 5.0 -> bucket 1 (floor(5/5)=1), 3.0 -> 0, 9.0 -> 1, 700 clamps to 1
    assert list(hist.n) == [1, 3]


def test_new_event_ops_match_oracle(ray_session, oracle_eq):
    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    for q in ["events_topn_per_user", "events_running_sum", "events_value_histogram"]:
        got = entrymod.queries()[q](sf)
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        want = con.sql(entrymod.oracle_sql()[q]).df()


        oracle_eq(got, want)


def test_value_quantiles_per_type(ray_session, tmp_path_factory):
    """Rank rule hand-check: 5 values -> p50 = rank ceil(2.5)=3."""
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_search_engine_ray.pipelines.events import value_quantiles_per_type_ds

    d = tmp_path_factory.mktemp("q_events")
    ts = datetime(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(5), pa.int64()),
                "ts": pa.array([ts] * 5, pa.timestamp("us")),
                "user_id": pa.array([1] * 5, pa.int64()),
                "event_type": pa.array(["a"] * 5, pa.string()),
                "value": pa.array([10.0, 30.0, 20.0, 50.0, 40.0]),
                "props": pa.array(["{}"] * 5, pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    got = value_quantiles_per_type_ds(str(d)).to_pandas().set_index("q")
    assert got.loc[0.5, "value"] == 30.0   # rank ceil(2.5) = 3
    assert got.loc[0.9, "value"] == 50.0   # rank ceil(4.5) = 5
    assert got.loc[0.99, "value"] == 50.0  # rank ceil(4.95) = 5


def test_value_quantiles_match_oracle(ray_session, oracle_eq):
    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    got = entrymod.queries()["events_value_quantiles"](sf).to_pandas()
    want = con.sql(entrymod.oracle_sql()["events_value_quantiles"]).df()


    oracle_eq(got, want)


def test_daily_active_users(ray_session, tmp_path_factory):
    """Distinct-combiner correctness: a user active many times in one day
    counts once; day boundary at UTC midnight (epoch_us // 86.4e9)."""
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_search_engine_ray.pipelines.events import daily_active_users_ds

    d = tmp_path_factory.mktemp("dau_events")
    rows = [
        (datetime(2024, 1, 1, 10), 1, "a"),
        (datetime(2024, 1, 1, 11), 1, "a"),  # same user, same day: once
        (datetime(2024, 1, 1, 12), 2, "a"),
        (datetime(2024, 1, 2, 0, 0, 1), 1, "a"),  # next day
        (datetime(2024, 1, 1, 10), 1, "b"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    got = (
        daily_active_users_ds(str(d))
        .to_pandas()
        .set_index(["day", "event_type"])
        .sort_index()
    )
    d0 = (datetime(2024, 1, 1) - datetime(1970, 1, 1)).days
    assert got.loc[(d0, "a"), "n_users"] == 2
    assert got.loc[(d0, "a"), "n_events"] == 3
    assert got.loc[(d0 + 1, "a"), "n_users"] == 1
    assert got.loc[(d0, "b"), "n_users"] == 1


def test_daily_active_users_matches_oracle(ray_session, oracle_eq):
    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    got = entrymod.queries()["events_daily_users"](sf).to_pandas()
    want = con.sql(entrymod.oracle_sql()["events_daily_users"]).df()


    oracle_eq(got, want)


def test_window_anomalies_planted(ray_session, tmp_path_factory):
    """Four quiet hourly windows + one 5x spike: only the spike flags."""
    from datetime import datetime, timedelta

    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_search_engine_ray.pipelines.events import window_anomalies_ds

    d = tmp_path_factory.mktemp("anom_events")
    t0 = datetime(2024, 1, 1)
    rows = []
    for h in range(5):
        n = 10 if h == 4 else 2  # spike in the last hour
        for i in range(n):
            rows.append((t0 + timedelta(hours=h, seconds=i), "a"))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    got = window_anomalies_ds(str(d)).to_pandas()
    assert len(got) == 1 and got.iloc[0].n_events == 10
    assert got.iloc[0].zscore == 2.0  # (10-3.6)/3.2 exactly


def test_window_anomalies_match_oracle(ray_session, oracle_eq):
    import duckdb

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    oracle_eq(
        entrymod.queries()["events_anomalies"](sf),
        con.sql(entrymod.oracle_sql()["events_anomalies"]).df(),
    )


def test_retention_cohorts_planted(ray_session, tmp_path_factory):
    """Two cohorts: user1/user2 start day0 (user1 returns day1 and day3,
    user2 never), user3 starts day1 and returns day2."""
    from datetime import datetime, timedelta

    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_search_engine_ray.pipelines.events import retention_cohorts_ds

    d = tmp_path_factory.mktemp("ret_events")
    t0 = datetime(2024, 1, 1)
    rows = [
        (1, 0), (1, 0),  # user1 twice on day0: counts once
        (1, 1), (1, 3),
        (2, 0),
        (3, 1), (3, 2),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [t0 + timedelta(days=r[1], seconds=i) for i, r in enumerate(rows)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array(["x"] * len(rows), pa.string()),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    got = (
        retention_cohorts_ds(str(d))
        .to_pandas()
        .set_index(["cohort_day", "day_offset"])["n_users"]
        .sort_index()
    )
    d0 = (datetime(2024, 1, 1) - datetime(1970, 1, 1)).days
    assert got.loc[(d0, 0)] == 2      # users 1+2 on their first day
    assert got.loc[(d0, 1)] == 1      # only user1 returned next day
    assert got.loc[(d0, 3)] == 1
    assert got.loc[(d0 + 1, 0)] == 1  # user3's cohort
    assert got.loc[(d0 + 1, 1)] == 1
    assert (d0, 2) not in got.index


def test_retention_matches_oracle(ray_session, oracle_eq):
    import duckdb

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    oracle_eq(
        entrymod.queries()["events_retention"](sf),
        con.sql(entrymod.oracle_sql()["events_retention"]).df(),
    )


def test_session_funnel_planted(ray_session, tmp_path_factory):
    """Hand-built sessions: one completes the full ordered funnel, one has
    the stages out of order (view before signup), one breaks across the
    session gap."""
    from datetime import datetime, timedelta

    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_search_engine_ray.pipelines.events import session_funnel_ds

    d = tmp_path_factory.mktemp("funnel_events")
    t0 = datetime(2024, 1, 1)
    rows = [
        # user1 session: signup -> view -> purchase (completes all 3)
        (1, 0, "signup"), (1, 10, "view"), (1, 20, "purchase"),
        # user2 session: view BEFORE signup -> only stage 1 counts
        (2, 0, "view"), (2, 10, "signup"),
        # user3: signup, then the view lands after the 1800 s gap (new
        # session without a signup) -> stage 1 only
        (3, 0, "signup"), (3, 5000, "view"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [t0 + timedelta(seconds=r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    got = (
        session_funnel_ds(str(d))
        .to_pandas()
        .set_index("stage")["n_sessions"]
        .sort_index()
    )
    assert got.loc[1] == 3  # three sessions contain a signup
    assert got.loc[2] == 1  # only user1's has a view AFTER it
    assert got.loc[3] == 1


def test_session_funnel_same_second_tiebreak(
    ray_session, oracle_eq, tmp_path_factory
):
    """Adversarial twin-exactness case: two events share a SECOND right
    after a >gap break, with event_id order REVERSED vs microsecond order.
    A twin whose session cumsum orders by (ep, event_id) instead of
    (epus, event_id) pulls the later-in-time purchase into the PRE-gap
    session (making it complete the funnel) while the engine keeps it in
    the post-gap session — so stage 3 reads 1 vs the correct 0."""
    from datetime import datetime, timedelta

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod
    from web_search_engine_ray.pipelines.events import session_funnel_ds

    d = tmp_path_factory.mktemp("funnel_tiebreak")
    t0 = datetime(2024, 1, 1)
    # (event_id, offset_us, event_type); eid 2/3 share second 2000 but eid 3
    # is EARLIER in microseconds.
    rows = [
        (0, 0, "signup"),
        (1, 10_000_000, "view"),
        (2, 2000_500_000, "purchase"),
        (3, 2000_000_100, "signup"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [t0 + timedelta(microseconds=r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    got = session_funnel_ds(str(d)).to_pandas()
    assert got.set_index("stage")["n_sessions"].to_dict() == {1: 2, 2: 1, 3: 0}
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet')"
    )
    oracle_eq(got, con.sql(entrymod.oracle_sql()["events_funnel"]).df())


def test_session_funnel_matches_oracle(ray_session, oracle_eq):
    import duckdb

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    oracle_eq(
        entrymod.queries()["events_funnel"](sf),
        con.sql(entrymod.oracle_sql()["events_funnel"]).df(),
    )


def test_conversion_lags_planted(ray_session, tmp_path_factory):
    """First signup -> first purchase STRICTLY after; purchases before the
    signup don't count, users without both are absent."""
    from datetime import datetime, timedelta

    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_search_engine_ray.pipelines.events import conversion_lags_ds

    d = tmp_path_factory.mktemp("conv_lag_events")
    t0 = datetime(2024, 1, 1)
    rows = [
        (1, 0, "signup"), (1, 90, "purchase"), (1, 50, "purchase"),
        (2, 10, "purchase"), (2, 20, "signup"),          # purchase BEFORE signup only
        (3, 0, "signup"),                                 # never converts
        (4, 0, "purchase"),                               # never signs up
        (2, 80, "purchase"),                              # converts at 60 s
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [t0 + timedelta(seconds=r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    got = (
        conversion_lags_ds(str(d)).to_pandas().set_index("user_id")["lag_s"]
    )
    assert dict(got) == {1: 50, 2: 60}


def test_conversion_lags_match_oracle(ray_session, oracle_eq):
    import duckdb

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    oracle_eq(
        entrymod.queries()["conversion_lags"](sf),
        con.sql(entrymod.oracle_sql()["conversion_lags"]).df(),
    )


def test_hourly_profile_matches_oracle(ray_session, oracle_eq):
    import duckdb

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    got = entrymod.queries()["events_hourly_profile"](sf).to_pandas()
    oracle_eq(got, con.sql(entrymod.oracle_sql()["events_hourly_profile"]).df())
    assert got.hour.between(0, 23).all() and got.n.sum() == 1000
