"""Targeted tests for the anti-join, exact-quantile, and heavy-hitter
operators: multi-block synthetic tables exercise the cross-block logic
(block-offset selection, sketch merge) that the single-block sf0.001
parity fixture cannot, plus degenerate inputs (empty filter results,
all-active anti-join) and the Misra–Gries superset property on skewed
data.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fuzzy_dedupe_pipeline_ray.pipelines import relational
from fuzzy_dedupe_pipeline_ray.pipelines.relational import _mg_compress


def _write_parts(dirname, table_name, df, n_parts):
    sub = os.path.join(dirname, f"{table_name}.parquet")
    os.makedirs(sub)
    for i, part in enumerate(np.array_split(df, n_parts)):
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       os.path.join(sub, f"part-{i:02d}.parquet"))


# ---------------------------------------------------------------------------
# Misra–Gries property: merged sketch is a superset of true heavy hitters
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mg_merge_superset_property(seed):
    rng = np.random.default_rng(seed)
    k = 15
    # zipf-ish stream split into blocks
    stream = rng.zipf(1.3, size=20_000) % 400
    n = len(stream)
    blocks = np.array_split(stream, 13)
    ids_all, cnts_all = [], []
    for blk in blocks:
        ids, cnts = np.unique(blk, return_counts=True)
        ids, cnts = _mg_compress(ids.astype(np.int64),
                                 cnts.astype(np.int64), k)
        ids_all.append(ids)
        cnts_all.append(cnts)
    uniq, inv = np.unique(np.concatenate(ids_all), return_inverse=True)
    summed = np.bincount(inv,
                         weights=np.concatenate(cnts_all)).astype(np.int64)
    cand, _ = _mg_compress(uniq, summed, k)
    true_ids, true_cnts = np.unique(stream, return_counts=True)
    must_have = set(true_ids[true_cnts * (k + 1) > n].tolist())
    assert must_have, "fixture must produce at least one heavy hitter"
    assert must_have <= set(cand.tolist())
    assert len(cand) <= k


def test_heavy_hitters_multiblock_exact(tmp_path, ray_session):
    rng = np.random.default_rng(11)
    # 3 planted heavy users + uniform noise over 500 users
    uid = np.r_[np.repeat([7, 8, 9], [900, 500, 300]),
                rng.integers(100, 600, size=8_300)]
    rng.shuffle(uid)
    df = pd.DataFrame({"user_id": uid.astype(np.int64)})
    _write_parts(str(tmp_path), "events", df, 9)
    out = relational.events_heavy_hitters(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    ora = con.sql(f"""
        SELECT user_id, count(*) AS n_events
        FROM read_parquet('{tmp_path}/events.parquet/*.parquet')
        GROUP BY user_id
        HAVING count(*) * 128 > (SELECT count(*) FROM read_parquet(
            '{tmp_path}/events.parquet/*.parquet'))
        ORDER BY user_id""").df()
    assert {7, 8, 9} <= set(out.user_id)
    pd.testing.assert_frame_equal(out, ora.astype(out.dtypes.to_dict()),
                                  check_dtype=False)


def test_heavy_hitters_empty(tmp_path, ray_session):
    _write_parts(str(tmp_path), "events",
                 pd.DataFrame({"user_id": pd.array([], dtype="int64")}), 1)
    out = relational.events_heavy_hitters(str(tmp_path)).to_pandas()
    assert len(out) == 0


# ---------------------------------------------------------------------------
# Exact quantiles: multi-block selection with heavy duplication
# ---------------------------------------------------------------------------

def test_quantiles_multiblock_with_duplicates(tmp_path, ray_session):
    rng = np.random.default_rng(5)
    # prices with a huge duplicated mode so quantile indices land inside
    # runs of equal values, plus exact 2-decimal money values
    cents = np.r_[np.full(4_000, 12_345),
                  rng.integers(100, 1_000_000, size=6_000)]
    rng.shuffle(cents)
    df = pd.DataFrame({"l_extendedprice": cents / 100.0})
    _write_parts(str(tmp_path), "lineitem", df, 7)
    out = relational.lineitem_quantiles(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    ora = con.sql(f"""
        WITH c AS (SELECT CAST(round(l_extendedprice*100) AS BIGINT) AS cents
                   FROM read_parquet('{tmp_path}/lineitem.parquet/*.parquet'))
        SELECT unnest([25,50,75,90,99]) AS q_e2,
               unnest(quantile_disc(cents, [0.25,0.5,0.75,0.9,0.99]))
                   AS value_cents
        FROM c""").df()
    pd.testing.assert_frame_equal(
        out.sort_values("q_e2").reset_index(drop=True),
        ora.sort_values("q_e2").reset_index(drop=True).astype(
            out.dtypes.to_dict()),
        check_dtype=False)


def test_quantiles_empty(tmp_path, ray_session):
    _write_parts(str(tmp_path), "lineitem",
                 pd.DataFrame({"l_extendedprice":
                               pd.array([], dtype="float64")}), 1)
    out = relational.lineitem_quantiles(str(tmp_path)).to_pandas()
    assert len(out) == 0


# ---------------------------------------------------------------------------
# Anti-join edges
# ---------------------------------------------------------------------------

def _write_cust_orders(d, order_dates):
    cust = pd.DataFrame({"c_custkey": np.arange(5, dtype=np.int64),
                         "c_name": [f"Customer#{i}" for i in range(5)]})
    orders = pd.DataFrame({
        "o_custkey": np.arange(len(order_dates), dtype=np.int64),
        "o_orderdate": pd.to_datetime(order_dates).astype("datetime64[us]"),
    })
    _write_parts(d, "customer", cust, 2)
    _write_parts(d, "orders", orders, 2)


def test_anti_join_all_inactive(tmp_path, ray_session):
    # every order predates the cutoff → all 5 customers returned
    _write_cust_orders(str(tmp_path), ["1996-01-01"] * 5)
    out = relational.customers_inactive_since(str(tmp_path)).to_pandas()
    assert list(out.c_custkey) == [0, 1, 2, 3, 4]


def test_anti_join_none_inactive(tmp_path, ray_session):
    # every customer ordered after the cutoff → empty result
    _write_cust_orders(str(tmp_path), ["2001-01-01"] * 5)
    out = relational.customers_inactive_since(str(tmp_path)).to_pandas()
    assert len(out) == 0


# ---------------------------------------------------------------------------
# Grouped exact quantiles: groups spanning block boundaries
# ---------------------------------------------------------------------------

def test_grouped_quantiles_groups_span_blocks(tmp_path, ray_session):
    rng = np.random.default_rng(21)
    # group 'a' is huge (spans many sorted blocks), 'b' is mid-sized,
    # 'z' has ONE row (all quantiles = that row)
    et = np.r_[np.repeat("alpha", 9_000), np.repeat("beta", 800), ["zeta"]]
    df = pd.DataFrame({
        "event_type": et,
        "value": np.round(rng.uniform(0, 100, size=len(et)), 2),
    })
    df = df.sample(frac=1, random_state=0).reset_index(drop=True)
    _write_parts(str(tmp_path), "events", df, 12)
    out = relational.events_value_quantiles_by_type(
        str(tmp_path), qs=(0.25, 0.5, 0.9)).to_pandas()
    con = duckdb.connect()
    ora = con.sql(f"""
        WITH c AS (SELECT event_type,
                          CAST(round(value * 100) AS BIGINT) AS cents
                   FROM read_parquet('{tmp_path}/events.parquet/*.parquet'))
        SELECT event_type, unnest([25, 50, 90]) AS q_e2,
               unnest(quantile_disc(cents, [0.25, 0.5, 0.9])) AS value_cents
        FROM c GROUP BY event_type ORDER BY event_type, q_e2""").df()
    pd.testing.assert_frame_equal(out, ora, check_dtype=False)
    z = out[out.event_type == "zeta"]
    assert len(z) == 3 and z.value_cents.nunique() == 1


def test_grouped_quantiles_empty(tmp_path, ray_session):
    _write_parts(str(tmp_path), "events",
                 pd.DataFrame({"event_type": pd.array([], dtype="str"),
                               "value": pd.array([], dtype="float64")}), 1)
    out = relational.events_value_quantiles_by_type(str(tmp_path)).to_pandas()
    assert len(out) == 0


# ---------------------------------------------------------------------------
# Left-outer join: customers with zero orders keep a row
# ---------------------------------------------------------------------------

def test_customer_order_summary_preserves_orderless(tmp_path, ray_session):
    rng = np.random.default_rng(17)
    cust = pd.DataFrame({
        "c_custkey": np.arange(100, dtype=np.int64),
        "c_name": [f"Customer#{i:03d}" for i in range(100)],
    })
    # only customers 0..59 ever order; 60..99 must survive with zeros
    orders = pd.DataFrame({
        "o_custkey": rng.integers(0, 60, size=2_000).astype(np.int64),
        "o_totalprice": np.round(rng.uniform(10, 500, size=2_000), 2),
    })
    _write_parts(str(tmp_path), "customer", cust, 4)
    _write_parts(str(tmp_path), "orders", orders, 6)
    out = relational.customer_order_summary(str(tmp_path)).to_pandas()
    assert len(out) == 100
    orderless = out[out.c_custkey >= 60]
    assert (orderless.order_count == 0).all()
    assert (orderless.revenue_e2 == 0).all()
    con = duckdb.connect()
    ora = con.sql(f"""
        WITH per AS (SELECT o_custkey, count(*) AS n,
                            sum(CAST(round(o_totalprice*100) AS BIGINT))
                                AS rev
                     FROM read_parquet('{tmp_path}/orders.parquet/*.parquet')
                     GROUP BY o_custkey)
        SELECT c_custkey, c_name, coalesce(n, 0) AS order_count,
               coalesce(rev, 0) AS revenue_e2
        FROM read_parquet('{tmp_path}/customer.parquet/*.parquet') c
        LEFT JOIN per ON c.c_custkey = per.o_custkey
        ORDER BY c_custkey""").df()
    pd.testing.assert_frame_equal(out, ora, check_dtype=False)
