"""Targeted tests for the round-4e additions: funnel-window edge cases
(conversion before the anchor, outside the window, exactly at the
boundary), retention-matrix accounting across blocks, and the quantile
sketch's relative-error guarantee on an adversarial long-tail
distribution (plus its bucket-boundary math)."""

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from fuzzy_dedupe_pipeline_ray.pipelines import relational


def _write_parts(dirname, table_name, df, n_parts):
    sub = os.path.join(dirname, f"{table_name}.parquet")
    os.makedirs(sub)
    for i, part in enumerate(np.array_split(df, n_parts)):
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       os.path.join(sub, f"part-{i:02d}.parquet"))


def _events_df(rows):
    """rows: (user_id, event_type, ts) triples (typed even when empty)."""
    return pd.DataFrame({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "ts": np.array([r[2] for r in rows], dtype="datetime64[us]"),
        "user_id": np.array([r[0] for r in rows], np.int64),
        "event_type": pd.array([r[1] for r in rows], dtype="string"),
        "value": np.linspace(1.0, 2.0, len(rows)),
        "props": pd.array(["{}"] * len(rows), dtype="string")})


T0 = np.datetime64("2024-05-01T12:00:00", "us")
H = np.timedelta64(3_600_000_000, "us")
D = np.timedelta64(86_400_000_000, "us")


def test_funnel_window_edges(tmp_path, ray_session):
    rows = [
        # user 1: converts inside the window
        (1, "view", T0), (1, "purchase", T0 + 2 * H),
        # user 2: purchase BEFORE first view — not a conversion
        (2, "purchase", T0 - H), (2, "view", T0),
        # user 3: purchase exactly at t0 + 7 days — inclusive boundary
        (3, "view", T0), (3, "purchase", T0 + 7 * D),
        # user 4: purchase 1 µs past the window — excluded
        (4, "view", T0), (4, "purchase",
                          T0 + 7 * D + np.timedelta64(1, "us")),
        # user 5: views, never purchases
        (5, "view", T0),
        # user 6: SECOND view would put the purchase in-window, but the
        # anchor is the FIRST view — excluded
        (6, "view", T0 - 10 * D), (6, "view", T0),
        (6, "purchase", T0 + H),
        # user 7: purchases without ever viewing — not in the cohort
        (7, "purchase", T0),
    ]
    _write_parts(tmp_path, "events", _events_df(rows), 3)
    out = relational.events_funnel_conversion(str(tmp_path)).to_pandas()
    assert out.n_users_first.iloc[0] == 6      # users 1-6
    assert out.n_users_converted.iloc[0] == 2  # users 1 and 3
    assert out.conversion_bps.iloc[0] == 2 * 10000 // 6


def test_retention_matrix(tmp_path, ray_session):
    rows = [
        # cohort day0: users 1,2. user 1 returns day1 and day3; user 2 never
        (1, "view", T0), (2, "view", T0 + H),
        (1, "view", T0 + D), (1, "view", T0 + 3 * D),
        # cohort day1: user 3, returns day2 twice (still one active day)
        (3, "view", T0 + D),
        (3, "view", T0 + 2 * D), (3, "view", T0 + 2 * D + H),
    ]
    _write_parts(tmp_path, "events", _events_df(rows), 3)
    out = relational.events_user_retention(str(tmp_path)).to_pandas()
    got = {(str(r.cohort_day)[:10], r.day_offset): r.n_users
           for _, r in out.iterrows()}
    assert got == {
        ("2024-05-01", 0): 2, ("2024-05-01", 1): 1, ("2024-05-01", 3): 1,
        ("2024-05-02", 0): 1, ("2024-05-02", 1): 1,
    }


def test_quantile_sketch_error_bound_long_tail(tmp_path, ray_session):
    # adversarial: 4-decade log-uniform tail + heavy point mass
    rng = np.random.default_rng(5)
    vals = np.concatenate([
        10 ** rng.uniform(-1, 3, 4000),       # 0.1 .. 1000
        np.full(1000, 0.25),                  # point mass at a low value
    ])
    vals = np.round(vals, 2)
    vals[vals <= 0] = 0.01
    df = pd.DataFrame({
        "event_id": np.arange(len(vals), dtype=np.int64),
        "ts": T0, "user_id": np.int64(1), "event_type": "view",
        "value": vals, "props": "{}"})
    _write_parts(tmp_path, "events", df.sample(frac=1, random_state=2), 5)
    out = relational.events_value_quantile_sketch_check(
        str(tmp_path)).to_pandas()
    assert list(out.q_bp) == [2500, 5000, 9000, 9900]
    assert out.sketch_ok.all(), out
    # independent verification of the guarantee the check asserts:
    gamma = relational._DD_GAMMA
    cents = np.round(vals * 100).astype(np.int64)
    s = np.sort(cents)
    for q in (0.25, 0.5, 0.9, 0.99):
        exact = s[max(0, math.ceil(q * len(s)) - 1)] / 100.0
        k = math.ceil(math.log(exact) / math.log(gamma))
        # exact lies in its own bucket: gamma^(k-1) < exact <= gamma^k
        assert gamma ** (k - 1) < exact * (1 + 1e-9)
        assert exact <= gamma ** k * (1 + 1e-9)


def test_ntile_rank_formula_matches_naive():
    # pure arithmetic — no Ray; hypothesis-style sweep over group sizes
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(tot=st.integers(1, 500), n_tiles=st.integers(1, 12))
    def check(tot, n_tiles):
        q, rem = divmod(tot, n_tiles)
        sizes = [q + 1] * rem + [q] * (n_tiles - rem)
        naive = np.repeat(np.arange(n_tiles), sizes)
        r = np.arange(tot, dtype=np.int64)
        got = relational._ntile_of_ranks(r, tot, n_tiles)
        assert np.array_equal(got, naive[:tot])

    check()


def test_funnel_and_reports_degenerate_inputs(tmp_path, ray_session):
    # events with views but no purchases; and a fully empty events table
    rows = [(1, "view", T0), (2, "view", T0 + D)]
    _write_parts(tmp_path, "events", _events_df(rows), 2)
    out = relational.events_funnel_conversion(str(tmp_path)).to_pandas()
    assert out.n_users_first.iloc[0] == 2
    assert out.n_users_converted.iloc[0] == 0
    assert out.conversion_bps.iloc[0] == 0

    empty_dir = tmp_path / "empty"
    os.makedirs(empty_dir)
    _write_parts(empty_dir, "events", _events_df([]), 1)
    f = relational.events_funnel_conversion(str(empty_dir)).to_pandas()
    assert list(f.iloc[0]) == [0, 0, 0]
    d = relational.events_daily_users(str(empty_dir))
    d = d.to_pandas() if hasattr(d, "to_pandas") else d
    assert len(d) == 0
    r = relational.events_user_retention(str(empty_dir)).to_pandas()
    assert len(r) == 0
