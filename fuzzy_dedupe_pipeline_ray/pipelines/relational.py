"""Relational operator demos over the TPC-H-ish testdata tables.

These exercise the engine's generic operator classes from SURVEY.md §2 —
source reads with column pruning (S1/S2), vectorized filters/projections
(M*, K2), grouped aggregation with batch-level pre-aggregation (A4),
hash joins (J2/J3), sort/limit (K1), distinct (D1), and a
groupby-windowed event aggregate (the streaming-shaped pattern) — each
with an exact DuckDB oracle.

Float aggregates are emitted as ROUND(x·10^s) BIGINT columns so the
value-hash compare is immune to float-summation-order noise and to the
round-half-even vs round-half-away difference between numpy and DuckDB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from fuzzy_dedupe_pipeline_ray.config import DEFAULT_CONFIG
from fuzzy_dedupe_pipeline_ray.sources.io import hash_join


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _scaled_int(col, scale: float):
    """float64 array → round(x·scale) int64.

    The scale is chosen so the true value is an exact integer at that
    scale (2-decimal money → 100, 4-decimal products → 10000): the float
    sum then sits within ~1e-9 of an integer and BOTH engines round to the
    same value — no half-way boundary exists. round_mode matches DuckDB's
    half-away-from-zero (pyarrow name: half_towards_infinity; irrelevant
    off-boundary, but kept aligned)."""
    return pc.cast(
        pc.round(pc.multiply(pc.cast(col, pa.float64()), pa.scalar(scale)),
                 round_mode="half_towards_infinity"),
        pa.int64())


def _e2(col):
    return _scaled_int(col, 100.0)


def _e4(col):
    return _scaled_int(col, 10000.0)


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape over lineitem: per (returnflag, linestatus) sums and
    counts, ship date < 1998-09-02. Pre-aggregated per batch inside
    map_batches, then a tiny groupby merge — the A4 pattern."""
    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b.column("l_shipdate"), cutoff))
        qty = b.column("l_quantity")
        price = b.column("l_extendedprice")
        disc = b.column("l_discount")
        disc_price = pc.multiply(price, pc.subtract(pa.scalar(1.0), disc))
        tbl = pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "l_linestatus": b.column("l_linestatus"),
            "qty": qty, "price": price, "disc_price": disc_price,
        })
        # pure-Arrow batch-level pre-aggregation (no pandas copy)
        g = tbl.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price", "sum"), ("disc_price", "sum"),
             ("qty", "count")])
        return pa.table({
            "l_returnflag": g.column("l_returnflag"),
            "l_linestatus": g.column("l_linestatus"),
            "sum_qty": g.column("qty_sum"),
            "sum_base_price": g.column("price_sum"),
            "sum_disc_price": g.column("disc_price_sum"),
            "count_order": g.column("qty_count"),
        })

    partials = _read(sf_dir, "lineitem",
                     ["l_returnflag", "l_linestatus", "l_quantity",
                      "l_extendedprice", "l_discount", "l_shipdate"]
                     ).map_batches(partial, batch_format="pyarrow",
                                   zero_copy_batch=True)
    merged = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty_f"),
        Sum("sum_base_price", alias_name="sum_base_price_f"),
        Sum("sum_disc_price", alias_name="sum_disc_price_f"),
        Sum("count_order", alias_name="count_order"),
    )

    def scale(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "l_linestatus": b.column("l_linestatus"),
            "sum_qty_e2": _e2(b.column("sum_qty_f")),
            "sum_base_price_e2": _e2(b.column("sum_base_price_f")),
            "sum_disc_price_e4": _e4(b.column("sum_disc_price_f")),
            "count_order": pc.cast(b.column("count_order"), pa.int64()),
        })

    return merged.map_batches(scale, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"])


def top_customers(sf_dir: str, k: int = 10):
    """orders ⋈ customer, revenue per customer, top-k by (revenue DESC,
    custkey ASC) — join + aggregate + sort/limit."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    per_cust = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="revenue"),
        Count(alias_name="order_count"))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    joined = hash_join(per_cust, cust, on="o_custkey", right_on="c_custkey",
                       cfg=DEFAULT_CONFIG)

    def scale(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(b.column("o_custkey"), pa.int64()),
            "c_name": b.column("c_name"),
            "revenue_e2": _e2(b.column("revenue")),
            "order_count": pc.cast(b.column("order_count"), pa.int64()),
        })

    out = joined.map_batches(scale, batch_format="pyarrow")
    return out.sort(["revenue_e2", "c_custkey"],
                    descending=[True, False]).limit(k)


def nation_order_stats(sf_dir: str):
    """3-way join region ⋈ nation ⋈ customer ⋈ orders → per-nation order
    count + total (cent-scaled)."""
    cfg = DEFAULT_CONFIG
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    per_cust = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="total"),
        Count(alias_name="n_orders"))
    j = hash_join(per_cust, cust, on="o_custkey", right_on="c_custkey",
                  cfg=cfg).materialize()
    per_nation = j.map_batches(
        lambda b: pa.table({
            "n_nationkey": pc.cast(b.column("c_nationkey"), pa.int64()),
            "total": b.column("total"),
            "n_orders": b.column("n_orders")}),
        batch_format="pyarrow").groupby("n_nationkey").aggregate(
        Sum("total", alias_name="total"), Sum("n_orders", alias_name="n_orders"))
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).map_batches(
        lambda b: pa.table({"n_nationkey": pc.cast(b.column("n_nationkey"),
                                                   pa.int64()),
                            "n_name": b.column("n_name")}),
        batch_format="pyarrow")
    out = hash_join(per_nation, nation, on="n_nationkey", cfg=cfg)

    def scale(b: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": b.column("n_name"),
            "n_orders": pc.cast(b.column("n_orders"), pa.int64()),
            "total_e2": _e2(b.column("total")),
        })

    return out.map_batches(scale, batch_format="pyarrow").sort("n_name")


def part_type_distinct(sf_dir: str):
    """Distinct (p_brand, p_type) pairs with counts — the D1 shuffle-distinct
    operator in relational form."""
    return (_read(sf_dir, "part", ["p_brand", "p_type"])
            .groupby(["p_brand", "p_type"])
            .aggregate(Count(alias_name="n"))
            .map_batches(lambda b: b.set_column(
                b.schema.get_field_index("n"), "n",
                pc.cast(b.column("n"), pa.int64())), batch_format="pyarrow")
            .sort(["p_brand", "p_type"]))


def events_hourly_window(sf_dir: str):
    """Tumbling 1-hour window per (user_id, event_type): count + sum(value).

    The streaming-shaped pattern (ray_guide: groupby + windowing over the
    sorted group); here the window key is computed vectorized and the
    aggregate is a plain grouped sum — exactly what the SQL oracle
    (GROUP BY date_trunc) expresses."""
    ev = _read(sf_dir, "events", ["ts", "user_id", "event_type", "value"])

    def add_window(b: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(b.column("ts"), unit="hour")
        return pa.table({
            "user_id": b.column("user_id"),
            "event_type": b.column("event_type"),
            "window_start": hour,
            "value": b.column("value"),
        })

    agg = (ev.map_batches(add_window, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["user_id", "event_type", "window_start"])
           .aggregate(Count(alias_name="n_events"),
                      Sum("value", alias_name="sum_value")))

    def scale(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "event_type": b.column("event_type"),
            "window_start": b.column("window_start"),
            "n_events": pc.cast(b.column("n_events"), pa.int64()),
            "sum_value_e2": _e2(b.column("sum_value")),
        })

    return agg.map_batches(scale, batch_format="pyarrow").sort(
        ["user_id", "event_type", "window_start"])


def events_sessionize(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user (gap > 30 min starts a new session):
    session_id = index of the session within the user's ordered events;
    output per session: user_id, session_id, n_events, start/end ts.

    groupby(user).map_groups over ts-sorted groups — the stateful
    stream-window pattern Ray Data expresses as a grouped batch transform.
    SQL oracle: window-function gap-and-island."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("ts")
        gap = df["ts"].diff() > pd.Timedelta(minutes=gap_minutes)
        sid = gap.cumsum().astype("int64")
        out = df.assign(session_id=sid).groupby("session_id").agg(
            user_id=("user_id", "first"), n_events=("ts", "size"),
            session_start=("ts", "min"), session_end=("ts", "max"),
        ).reset_index()
        return out[["user_id", "session_id", "n_events", "session_start",
                    "session_end"]]

    return (ev.groupby("user_id").map_groups(sessions, batch_format="pandas")
            .sort(["user_id", "session_id"]))
