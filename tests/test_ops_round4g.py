"""Round-4g additions: the rank-window family (RANK / DENSE_RANK /
PERCENT_RANK / CUME_DIST numerators) — block-split invariance with peer
groups spanning blocks, plus a DuckDB window-function parity check —
and the HyperLogLog distinct-count sketch (exact clz kernel, estimator
error bound through the full pipeline)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from fuzzy_dedupe_pipeline_ray.pipelines import relational
from tests.test_ops_round4e import _write_parts
from fuzzy_dedupe_pipeline_ray.pipelines.relational import (
    _clz64,
    _hll_estimate,
    _rank_block_labels,
    _rank_block_summary,
    _rank_prefix_scan,
)


def _tied_events(seed=7, n=400, n_types=3, n_values=9):
    """Events with HEAVY value ties so peer groups span any block split."""
    rng = np.random.RandomState(seed)
    et = np.asarray([f"t{rng.randint(n_types)}" for _ in range(n)], object)
    val = rng.choice(np.linspace(0.5, 4.5, n_values), size=n)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(val, pa.float64()),
    })
    order = pa.compute.sort_indices(tbl, sort_keys=[
        ("event_type", "ascending"), ("value", "ascending"),
        ("event_id", "ascending")])
    return tbl.take(order)


def _run_chunks(tbl, size):
    chunks = [tbl.slice(i, size) for i in range(0, tbl.num_rows, size)]
    summaries = [_rank_block_summary(c) for c in chunks]
    args = _rank_prefix_scan(summaries)
    parts = [_rank_block_labels(c, *args[i])
             for i, c in enumerate(chunks) if summaries[i] is not None]
    return pa.concat_tables(parts)


def test_rank_window_block_split_invariance():
    """Labels are identical for ANY block split — including splits in
    the middle of a peer group and peer groups spanning 3+ blocks."""
    tbl = _tied_events()
    golden = _run_chunks(tbl, tbl.num_rows)
    for size in (1, 2, 3, 7, 16, 101):
        got = _run_chunks(tbl, size)
        assert got.equals(golden), f"split size {size} diverges"


def test_rank_window_matches_duckdb_windows():
    """The numerators equal DuckDB's rank()/dense_rank()/cume-count
    window functions row for row (peers ordered by value only)."""
    tbl = _tied_events(seed=13, n=350, n_values=5)
    got = _run_chunks(tbl, 23).to_pandas()
    con = duckdb.connect()
    con.register("ev", tbl.to_pandas())
    exp = con.sql("""
        SELECT event_id, event_type,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS drnk,
               CAST(rank() OVER w - 1 AS BIGINT) AS pr_num,
               CAST(count(*) OVER (PARTITION BY event_type ORDER BY value
                                   RANGE BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW)
                    AS BIGINT) AS cd_num,
               CAST(count(*) OVER (PARTITION BY event_type)
                    AS BIGINT) AS n_part
        FROM ev WINDOW w AS (PARTITION BY event_type ORDER BY value)
        ORDER BY event_type, rnk, event_id
    """).df()
    got = got.sort_values(["event_type", "rnk", "event_id"]).reset_index(
        drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_rank_window_single_value_partition():
    """One giant peer group split across every block: rank stays 1,
    cume count stays n, dense rank stays 1 for every row."""
    n = 64
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "event_type": pa.array(["a"] * n, pa.string()),
        "value": pa.array(np.full(n, 2.5), pa.float64()),
    })
    for size in (1, 5, 64):
        out = _run_chunks(tbl, size).to_pandas()
        assert (out["rnk"] == 1).all()
        assert (out["drnk"] == 1).all()
        assert (out["cd_num"] == n).all()
        assert (out["n_part"] == n).all()


def test_rank_window_end_to_end(tmp_path, ray_session):
    """Full operator over a parquet events table vs the DuckDB oracle
    (column names per the driver contract)."""
    rng = np.random.RandomState(3)
    n = 500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": np.repeat(np.datetime64("2024-01-01", "us"), n),
        "user_id": rng.randint(0, 40, n).astype(np.int64),
        "event_type": pd.array(
            rng.choice(["click", "view", "purchase"], n), dtype="string"),
        "value": rng.choice([1.25, 2.5, 2.5, 7.75, 9.0], n),
        "props": pd.array(["{}"] * n, dtype="string"),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    got = relational.events_value_rank_window(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.register("events", df)
    exp = con.sql("""
        SELECT event_id, event_type,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS drnk,
               CAST(rank() OVER w - 1 AS BIGINT) AS pr_num,
               CAST(count(*) OVER (PARTITION BY event_type ORDER BY value
                                   RANGE BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW)
                    AS BIGINT) AS cd_num,
               CAST(count(*) OVER (PARTITION BY event_type)
                    AS BIGINT) AS n_part
        FROM events WINDOW w AS (PARTITION BY event_type ORDER BY value)
        ORDER BY event_type, rnk, event_id
    """).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True)[exp.columns], exp)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def test_clz64_matches_bit_length():
    rng = np.random.RandomState(5)
    v = rng.randint(0, 2**63, 2000).astype(np.uint64)
    v[:64] = np.uint64(1) << np.arange(64, dtype=np.uint64)  # exact powers
    v[64] = np.uint64(0)
    v[65] = np.uint64(2**64 - 1)
    got = _clz64(v)
    exp = np.asarray([64 - int(x).bit_length() if int(x) else 63
                      for x in v], np.int64)
    assert (got == exp).all()


def test_hll_estimator_error():
    """Direct register-path accuracy at several cardinalities (through
    linear-counting and raw-estimate regimes)."""
    from fuzzy_dedupe_pipeline_ray.functions.hashing import splitmix64

    p, m = 12, 1 << 12
    for n in (50, 1_000, 20_000, 300_000):
        h = splitmix64(np.arange(n, dtype=np.uint64))
        reg = (h >> np.uint64(64 - p)).astype(np.int64)
        w = h << np.uint64(p)
        rho = np.where(w == 0, np.int64(64 - p + 1), _clz64(w) + 1)
        dense = np.zeros(m, np.int64)
        np.maximum.at(dense, reg, rho)
        est = _hll_estimate(dense, p)
        assert abs(est - n) <= 0.05 * n + 2, (n, est)


def test_hll_pipeline_end_to_end(tmp_path, ray_session):
    """Full operator: per-type and ALL rows, exact counts oracle-true,
    every hll_ok flag true, merge property exercised (ALL registers are
    the max across per-type registers)."""
    rng = np.random.RandomState(9)
    rows = []
    for t, n_users, n_ev in (("click", 500, 3000), ("view", 40, 300),
                             ("purchase", 1200, 2400)):
        # user-id spaces overlap so ALL < sum(per-type)
        rows.append(pd.DataFrame({
            "user_id": rng.randint(0, n_users, n_ev).astype(np.int64),
            "event_type": pd.array([t] * n_ev, dtype="string")}))
    df = pd.concat(rows, ignore_index=True)
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    df["ts"] = np.repeat(np.datetime64("2024-01-01", "us"), len(df))
    df["value"] = 1.0
    df["props"] = pd.array(["{}"] * len(df), dtype="string")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    out = relational.events_distinct_users_hll(str(tmp_path)).to_pandas()
    assert out["hll_ok"].all()
    exact = df.groupby("event_type")["user_id"].nunique()
    for t in ("click", "view", "purchase"):
        assert int(out.loc[out.event_type == t, "n_exact"].iloc[0]) \
            == int(exact[t])
    assert int(out.loc[out.event_type == "ALL", "n_exact"].iloc[0]) \
        == df["user_id"].nunique()
    assert list(out["event_type"]) == sorted(out["event_type"])


# ---------------------------------------------------------------------------
# Trailing 7-day distinct users / per-group mode / grouped string_agg
# ---------------------------------------------------------------------------

def test_trailing_7d_users_window_edges(tmp_path, ray_session):
    """A user on day d counts toward windows d..d+6 only, and absent
    calendar days emit no row."""
    D = np.timedelta64(86_400_000_000, "us")
    t0 = np.datetime64("2024-03-01T00:00:00", "us")
    rows = [
        (1, t0),              # user 1 active day 0
        (2, t0),              # user 2 active day 0
        (2, t0 + 6 * D),      # day 6: still within user 1's window
        (3, t0 + 7 * D),      # day 7: user 1 aged out
        (3, t0 + 20 * D),     # isolated far day
    ]
    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "ts": np.array([r[1] for r in rows], dtype="datetime64[us]"),
        "user_id": np.array([r[0] for r in rows], np.int64),
        "event_type": pd.array(["click"] * len(rows), dtype="string"),
        "value": np.ones(len(rows)),
        "props": pd.array(["{}"] * len(rows), dtype="string")})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    out = relational.events_trailing_7d_users(str(tmp_path)).to_pandas()
    got = {np.datetime64(r.day, "us"): int(r.n_users_7d)
           for r in out.itertuples()}
    assert got == {
        t0: 2,                    # users 1, 2
        t0 + 6 * D: 2,            # users 1, 2 (day-0 events still in)
        t0 + 7 * D: 2,            # users 2 (day 6), 3 — user 1 aged out
        t0 + 20 * D: 1,           # user 3 alone
    }


def test_mode_tie_breaks_to_smallest_value(tmp_path, ray_session):
    """Equal counts → smallest cents wins; counts merge across blocks."""
    vals = [2.00] * 5 + [1.00] * 5 + [3.00] * 4   # tie between 1.00/2.00
    df = pd.DataFrame({
        "event_id": np.arange(len(vals), dtype=np.int64),
        "ts": np.repeat(np.datetime64("2024-01-01", "us"), len(vals)),
        "user_id": np.zeros(len(vals), np.int64),
        "event_type": pd.array(["a"] * len(vals), dtype="string"),
        "value": np.asarray(vals),
        "props": pd.array(["{}"] * len(vals), dtype="string")})
    _write_parts(str(tmp_path), "events", df, 4)  # force several blocks
    out = relational.events_value_mode_by_type(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert int(out["mode_e2"].iloc[0]) == 100     # 1.00, not 2.00
    assert int(out["n_mode"].iloc[0]) == 5


def test_nation_customer_segments_distinct_sorted(tmp_path, ray_session):
    nat = pd.DataFrame({
        "n_nationkey": np.array([0, 1], np.int64),
        "n_name": pd.array(["ALGERIA", "BRAZIL"], dtype="string"),
        "n_regionkey": np.zeros(2, np.int64),
        "n_comment": pd.array(["", ""], dtype="string")})
    cust = pd.DataFrame({
        "c_custkey": np.arange(6, dtype=np.int64),
        "c_nationkey": np.array([0, 0, 0, 1, 1, 1], np.int64),
        "c_mktsegment": pd.array(
            ["HOUSEHOLD", "AUTOMOBILE", "HOUSEHOLD",
             "MACHINERY", "MACHINERY", "MACHINERY"], dtype="string")})
    pq.write_table(pa.Table.from_pandas(nat, preserve_index=False),
                   os.path.join(tmp_path, "nation.parquet"))
    pq.write_table(pa.Table.from_pandas(cust, preserve_index=False),
                   os.path.join(tmp_path, "customer.parquet"))
    out = relational.nation_customer_segments(str(tmp_path)).to_pandas()
    assert list(out["n_name"]) == ["ALGERIA", "BRAZIL"]
    assert list(out["segments"]) == ["AUTOMOBILE,HOUSEHOLD", "MACHINERY"]


# ---------------------------------------------------------------------------
# Q4 / Q22 shapes
# ---------------------------------------------------------------------------

def test_q4_semi_join_counts_order_once(tmp_path, ray_session):
    """An order with THREE qualifying lineitems counts once (EXISTS
    semantics, not join multiplicity); non-qualifying and out-of-window
    orders drop."""
    orders = pd.DataFrame({
        "o_orderkey": np.array([1, 2, 3, 4], np.int64),
        "o_custkey": np.zeros(4, np.int64),
        "o_orderstatus": pd.array(["O"] * 4, dtype="string"),
        "o_totalprice": np.ones(4),
        "o_orderdate": np.array(
            ["1996-02-01", "1996-03-01", "1996-04-01", "1995-01-01"],
            dtype="datetime64[us]"),
        "o_orderpriority": pd.array(
            ["1-URGENT", "1-URGENT", "2-HIGH", "1-URGENT"],
            dtype="string")})
    li = pd.DataFrame({
        "l_orderkey": np.array([1, 1, 1, 2, 3, 4], np.int64),
        "l_partkey": np.zeros(6, np.int64),
        "l_suppkey": np.zeros(6, np.int64),
        "l_linenumber": np.arange(6, dtype=np.int64),
        "l_quantity": np.ones(6),
        "l_extendedprice": np.ones(6),
        # order 1: three qualifying; order 2: none; order 3: one;
        # order 4: qualifying but out of window
        "l_discount": np.array([0.10, 0.09, 0.095, 0.01, 0.09, 0.10]),
        "l_tax": np.zeros(6),
        "l_returnflag": pd.array(["N"] * 6, dtype="string"),
        "l_linestatus": pd.array(["O"] * 6, dtype="string"),
        "l_shipdate": np.repeat(np.datetime64("1996-02-02", "us"), 6)})
    pq.write_table(pa.Table.from_pandas(orders, preserve_index=False),
                   os.path.join(tmp_path, "orders.parquet"))
    pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                   os.path.join(tmp_path, "lineitem.parquet"))
    out = relational.q4_priority_with_discounted_lines(
        str(tmp_path)).to_pandas()
    got = dict(zip(out["o_orderpriority"], out["n_orders"]))
    assert got == {"1-URGENT": 1, "2-HIGH": 1}


def test_q22_average_boundary_and_lapsed(tmp_path, ray_session):
    """Exactly-at-average balances are excluded (strict integer
    cross-multiplied compare); a customer with only PRE-cutoff orders
    still counts as lapsed."""
    # positives: 100.00, 200.00, 300.00 -> avg 200.00 exactly
    cust = pd.DataFrame({
        "c_custkey": np.array([1, 2, 3, 4], np.int64),
        "c_name": pd.array(["a", "b", "c", "d"], dtype="string"),
        "c_nationkey": np.zeros(4, np.int64),
        "c_acctbal": np.array([100.0, 200.0, 300.0, -50.0]),
        "c_mktsegment": pd.array(["X"] * 4, dtype="string")})
    nat = pd.DataFrame({
        "n_nationkey": np.array([0], np.int64),
        "n_name": pd.array(["ALGERIA"], dtype="string"),
        "n_regionkey": np.zeros(1, np.int64),
        "n_comment": pd.array([""], dtype="string")})
    # customer 3 (above avg): one order BEFORE the cutoff -> lapsed;
    # customer 2 (exactly at avg): excluded regardless of orders
    orders = pd.DataFrame({
        "o_orderkey": np.array([10], np.int64),
        "o_custkey": np.array([3], np.int64),
        "o_orderstatus": pd.array(["F"], dtype="string"),
        "o_totalprice": np.ones(1),
        "o_orderdate": np.array(["1997-01-01"], dtype="datetime64[us]"),
        "o_orderpriority": pd.array(["1-URGENT"], dtype="string")})
    for name, df in (("customer", cust), ("nation", nat),
                     ("orders", orders)):
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, f"{name}.parquet"))
    out = relational.q22_idle_rich_customers(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out["n_name"].iloc[0] == "ALGERIA"
    assert int(out["n_customers"].iloc[0]) == 1        # customer 3 only
    assert int(out["total_acctbal_e2"].iloc[0]) == 30000
