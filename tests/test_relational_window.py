"""Boundary-carry tests for the ordered-window operators (as-of join,
rolling aggregate): a synthetic events table written as MANY small parquet
parts forces the sorted dataset into many blocks, so user runs span block
boundaries and the O(#blocks) driver prefix scan's carry logic is actually
exercised (the sf0.001 parity fixture can fit in one block). Compared
against the same DuckDB SQL the driver oracle uses.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fuzzy_dedupe_pipeline_ray.pipelines import relational


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory, ray_session):
    """2,600 events over 51 users in 16 parquet parts: 50 users × 40
    events (some with zero purchases, some clicks-before-any-purchase)
    plus one 600-event user guaranteed to span several sorted blocks."""
    rng = np.random.default_rng(7)
    rows = []
    eid = 0
    base = np.datetime64("2025-01-01T00:00:00", "us")
    types = ["click", "purchase", "view", "error"]
    for u in range(50):
        t = base + np.timedelta64(u, "h")
        for i in range(40):
            t = t + np.timedelta64(int(rng.integers(1, 10_000_000)), "us")
            if u % 7 == 0:
                et = "click"            # purchase-less users
            else:
                et = types[int(rng.integers(0, 4))]
            rows.append((eid, t, u, et, round(float(rng.uniform(0, 100)), 2)
                         if rng.integers(0, 3) else float(rng.uniform(0, 100))))
            eid += 1
    t = base
    for i in range(600):                 # one user spanning many blocks
        t = t + np.timedelta64(int(rng.integers(1, 10_000_000)), "us")
        rows.append((eid, t, 50, types[int(rng.integers(0, 4))],
                     float(rng.uniform(0, 100))))
        eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    d = tmp_path_factory.mktemp("winev")
    sub = d / "events.parquet"
    os.makedirs(sub)
    for i, part in enumerate(np.array_split(df, 16)):
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       str(sub / f"part-{i:02d}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def con(events_dir):
    c = duckdb.connect()
    c.sql(f"CREATE VIEW events AS SELECT * "
          f"FROM read_parquet('{events_dir}/events.parquet/*.parquet')")
    return c


def _ray_df(res):
    return res.to_pandas()


def _assert_frames_equal(a: pd.DataFrame, b: pd.DataFrame):
    a = a[sorted(a.columns)].sort_values(list(a.columns)).reset_index(drop=True)
    b = b[sorted(b.columns)].sort_values(list(b.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_asof_join_boundary_carry(events_dir, con):
    import __ray_entry__ as e

    ray_df = _ray_df(relational.events_asof_join(events_dir))
    sql_df = con.sql(e.oracle_sql()["events_asof_join"]).fetchdf()
    assert len(ray_df) > 0
    _assert_frames_equal(ray_df, sql_df)


def test_rolling_boundary_carry(events_dir, con):
    import __ray_entry__ as e

    ray_df = _ray_df(relational.events_rolling(events_dir))
    sql_df = con.sql(e.oracle_sql()["events_rolling"]).fetchdf()
    assert len(ray_df) == 2600
    _assert_frames_equal(ray_df, sql_df)


def test_trailing_window_boundary_carry(events_dir, con):
    import __ray_entry__ as e

    ray_df = _ray_df(relational.events_trailing_window(events_dir))
    sql_df = con.sql(e.oracle_sql()["events_trailing_window"]).fetchdf()
    assert len(ray_df) == 2600
    # the dense 600-event user must produce real multi-row windows
    assert ray_df["n_in_window"].max() > 3
    _assert_frames_equal(ray_df, sql_df)


def test_range_join_boundary_carry(events_dir, con):
    import __ray_entry__ as e

    ray_df = _ray_df(relational.events_range_join(events_dir))
    sql_df = con.sql(e.oracle_sql()["events_range_join"]).fetchdf()
    assert len(ray_df) > 0
    # 1-10s inter-arrival per user means many cross-block 30s partners,
    # including partners more than one sorted block back
    assert len(ray_df) > 2600
    _assert_frames_equal(ray_df, sql_df)


def test_range_join_tie_and_window_edges(tmp_path, ray_session):
    """Hand-built corner cases: simultaneous events (tie split by id),
    a pair at exactly the window bound (kept), and one just past (dropped)."""
    sub = tmp_path / "events.parquet"
    os.makedirs(sub)
    base = np.datetime64("2025-01-01T00:00:00", "us")
    ts = [base, base,                                  # tie at t=0
          base + np.timedelta64(30_000_000, "us"),     # exactly +30s
          base + np.timedelta64(60_000_001, "us")]     # +30s + 1us from [2]
    tbl = pa.table({
        "event_id": pa.array([1, 0, 2, 3], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([0, 1, 0, 1], pa.int64()),
        "event_type": pa.array(["click"] * 4),
        "value": pa.array([1.0] * 4),
    })
    pq.write_table(tbl, str(sub / "part-00.parquet"))
    out = relational.events_range_join(str(tmp_path)).to_pandas()
    got = set(zip(out.id_a, out.id_b, out.delta_us))
    assert got == {(0, 1, 0), (0, 2, 30_000_000), (1, 2, 30_000_000)}


def test_asof_join_empty_events(tmp_path, ray_session, con):
    sub = tmp_path / "events.parquet"
    os.makedirs(sub)
    schema = pa.schema([("event_id", pa.int64()),
                        ("ts", pa.timestamp("us")),
                        ("user_id", pa.int64()),
                        ("event_type", pa.string()),
                        ("value", pa.float64())])
    pq.write_table(schema.empty_table(), str(sub / "part-00.parquet"))
    out = relational.events_asof_join(str(tmp_path)).to_pandas()
    assert len(out) == 0
    out2 = relational.events_rolling(str(tmp_path)).to_pandas()
    assert len(out2) == 0
    out3 = relational.events_range_join(str(tmp_path)).to_pandas()
    assert len(out3) == 0
