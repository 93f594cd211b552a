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

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from fuzzy_dedupe_pipeline_ray.config import DEFAULT_CONFIG
from fuzzy_dedupe_pipeline_ray.sources.io import hash_join


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _read_filtered(sf_dir: str, table: str, columns, expr):
    """Column-pruned read with a pyarrow SCAN-level row filter: parquet
    row groups whose min/max statistics exclude the predicate never
    leave storage, and surviving row groups are filtered inside the
    fragment scan — the "prune at the read" path for selective
    predicates (date windows, flag equality). The filter is exact, so
    no per-batch re-filter is needed downstream."""
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                                 columns=columns, filter=expr)


def _ts_window_expr(col: str, lo: str, hi: str):
    return ((pc.field(col) >= np.datetime64(lo, "us"))
            & (pc.field(col) < np.datetime64(hi, "us")))


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


def _sga_key_arrays(b: pa.Table, keys):
    """Key columns as numpy arrays — native dtypes kept (ints,
    datetime64), strings as object arrays (comparable, lexsortable)."""
    out = []
    for k in keys:
        a = b.column(k).to_numpy(zero_copy_only=False)
        if a.dtype.kind in "OUS":
            a = np.asarray(a, object)
        out.append(a)
    return out


def _sga_runs(karrs):
    """Start indices of adjacent-equal key runs over parallel arrays."""
    n = len(karrs[0])
    if n == 0:
        return np.empty(0, np.int64)
    neq = np.zeros(n - 1, bool)
    for a in karrs:
        neq |= np.asarray(a[1:] != a[:-1])
    return np.flatnonzero(np.r_[True, neq])


def _sga_partial(b: pa.Table, keys, sum_cols) -> pa.Table:
    """Per-batch local group partials: lexsort + run reduceat. Integer
    sum columns stay exact int64; floats sum as float64."""
    if b.num_rows == 0:
        # cast sum columns to the ACCUMULATOR dtypes non-empty partials
        # emit, so block schemas stay homogeneous (review finding,
        # round 5: an int32 input column would otherwise yield one
        # int32 empty block among int64 partials)
        t = b.select(list(keys))
        for sc in sum_cols:
            acc = (pa.int64() if pa.types.is_integer(
                b.schema.field(sc).type) else pa.float64())
            t = t.append_column(sc, pa.array([], acc))
        return t.append_column("_n", pa.array([], pa.int64()))
    karrs = _sga_key_arrays(b, keys)
    order = np.lexsort(tuple(reversed(karrs)))
    karrs = [a[order] for a in karrs]
    starts = _sga_runs(karrs)
    counts = np.diff(np.r_[starts, len(order)])
    cols = {k: pa.array(list(a[starts])) for k, a in zip(keys, karrs)}
    for sc in sum_cols:
        v = b.column(sc).to_numpy(zero_copy_only=False)[order]
        acc = np.int64 if v.dtype.kind in "iu" else np.float64
        cols[sc] = pa.array(np.add.reduceat(v.astype(acc), starts))
    cols["_n"] = pa.array(counts.astype(np.int64), pa.int64())
    return pa.table(cols)


def sorted_group_aggregate(ds, keys, sum_cols):
    """Grouped Count + Sum over ``keys`` via per-batch partials
    → ONE range sort → per-block run aggregation → O(#blocks) driver
    boundary merge — replacing the Ray hash aggregate's fixed
    aggregator-pool spin-up (~1–1.5 s at 32 CPUs regardless of rows;
    the round-5 per-operation-cost lesson). ``sum_cols``: the columns
    to Sum (a str or tuple; int columns stay exact int64). Output:
    keys + summed columns + ``_n`` (int64 count). Rows come back
    MOSTLY key-ordered but NOT globally sorted: groups straddling
    block boundaries re-emit via a trailing union block — callers
    needing sorted output must still sort (review finding, round 5)."""
    if isinstance(sum_cols, str):
        sum_cols = (sum_cols,)
    sum_cols = tuple(sum_cols)
    parts = ds.map_batches(
        lambda b: _sga_partial(b, keys, sum_cols),
        batch_format="pyarrow", zero_copy_batch=True)
    s = parts.sort(list(keys)).materialize()

    def summarize(tbl):
        if tbl.num_rows == 0:
            return None
        karrs = _sga_key_arrays(tbl, keys)
        starts = _sga_runs(karrs)
        n = tbl.num_rows
        f_hi = int(starts[1]) if len(starts) > 1 else n
        l_lo = int(starts[-1])
        vs = [tbl.column(sc).to_numpy(zero_copy_only=False)
              for sc in sum_cols]
        c = tbl.column("_n").to_numpy()

        def agg(lo, hi):
            return (tuple(v[lo:hi].sum() for v in vs),
                    int(c[lo:hi].sum()))

        fk = tuple(a[0] for a in karrs)
        lk = tuple(a[n - 1] for a in karrs)
        return (fk, agg(0, f_hi), lk, agg(l_lo, n))

    from fuzzy_dedupe_pipeline_ray.functions.scans import (
        scan_boundary_spans,
    )

    merged_rows = []

    def scan(summaries):
        args = [{"drop_first": False, "drop_last": False,
                 "drop_all": False} for _ in summaries]

        def split(sm):
            fk, f_agg, lk, l_agg = sm
            return fk, f_agg, lk, l_agg

        def close(p):
            if len(p["blocks"]) < 2:
                return
            aggs = p["payloads"]
            s_tots = tuple(sum(a[0][j] for a in aggs)
                           for j in range(len(sum_cols)))
            c_tot = sum(a[1] for a in aggs)
            merged_rows.append(tuple(p["key"]) + s_tots + (c_tot,))
            for i, which in p["blocks"]:
                args[i][f"drop_{which}"] = True

        scan_boundary_spans(summaries, split, close)
        return [(a["drop_first"], a["drop_last"], a["drop_all"])
                for a in args]

    def label(tbl, drop_first, drop_last, drop_all):
        if drop_all:
            return tbl.slice(0, 0)
        karrs = _sga_key_arrays(tbl, keys)
        starts = _sga_runs(karrs)
        n = tbl.num_rows
        c = tbl.column("_n").to_numpy()
        ends = np.r_[starts[1:], n]
        lo = 1 if drop_first else 0
        hi = len(starts) - 1 if drop_last else len(starts)
        if hi <= lo:
            return tbl.slice(0, 0)
        sel = np.arange(lo, hi)
        cols = {k: pa.array(list(a[starts[sel]]))
                for k, a in zip(keys, karrs)}
        for sc in sum_cols:
            v = tbl.column(sc).to_numpy(zero_copy_only=False)
            cols[sc] = pa.array(
                [v[starts[j]:ends[j]].sum() for j in sel],
                pa.int64() if v.dtype.kind in "iu" else pa.float64())
        cols["_n"] = pa.array(
            np.array([int(c[starts[j]:ends[j]].sum()) for j in sel],
                     np.int64), pa.int64())
        return pa.table(cols)

    out = _sorted_block_scan(s, summarize, (), scan, label,
                             key_of=lambda sm: (sm[0], sm[2]))
    if out is None:
        return s  # empty, key-typed
    if merged_rows:
        schema = s.schema().base_schema
        cols = {k: pa.array([r[j] for r in merged_rows])
                for j, k in enumerate(keys)}
        for j, sc in enumerate(sum_cols):
            cols[sc] = pa.array([r[len(keys) + j] for r in merged_rows])
        cols["_n"] = pa.array(
            [r[len(keys) + len(sum_cols)] for r in merged_rows],
            pa.int64())
        out = out.union(ray.data.from_arrow(
            pa.table(cols).cast(schema)))
    return out


def events_hourly_window(sf_dir: str):
    """Tumbling 1-hour window per (user_id, event_type): count + sum(value).

    The streaming-shaped pattern (ray_guide: groupby + windowing over the
    sorted group); the window key is computed vectorized and the grouped
    Count+Sum runs through ``sorted_group_aggregate`` (per-batch
    partials + one range sort + boundary merge). The explicit output
    sort below stays — the helper's trailing boundary-merge block means
    its rows are NOT globally ordered — but it sorts the tiny aggregate,
    not the events."""
    ev = _read(sf_dir, "events", ["ts", "user_id", "event_type", "value"])

    def add_window(b: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(b.column("ts"), unit="hour")
        return pa.table({
            "user_id": b.column("user_id"),
            "event_type": b.column("event_type"),
            "window_start": hour,
            "value": b.column("value"),
        })

    agg = sorted_group_aggregate(
        ev.map_batches(add_window, batch_format="pyarrow",
                       zero_copy_batch=True),
        ("user_id", "event_type", "window_start"), ("value",))

    def scale(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "event_type": b.column("event_type"),
            "window_start": b.column("window_start"),
            "n_events": pc.cast(b.column("_n"), pa.int64()),
            "sum_value_e2": _e2(b.column("value")),
        })

    return agg.map_batches(scale, batch_format="pyarrow").sort(
        ["user_id", "event_type", "window_start"])


def _session_block_summary(tbl: pa.Table, gap_us: int):
    """Per-block scan summary: (first_user, first_ts, last_user, last_ts,
    {user: local_start_count}) with the block's first row ASSUMED to start
    a session (the driver corrects that via the previous block's tail)."""
    if tbl.num_rows == 0:
        return None
    u = tbl.column("user_id").to_numpy()
    ts = tbl.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
    new_user = np.r_[True, u[1:] != u[:-1]]
    brk = np.r_[True, (ts[1:] - ts[:-1]) > gap_us]
    start = new_user | brk
    uu, counts = np.unique(u[start], return_counts=True)
    return (int(u[0]), int(ts[0]), int(u[-1]), int(ts[-1]),
            dict(zip(uu.tolist(), counts.tolist())))


def _session_block_labels(tbl: pa.Table, gap_us: int, offsets: dict,
                          cont: bool) -> pa.Table:
    """Per-block (user_id, session_id, ts) rows given per-user TRUE-start
    offsets from earlier blocks and whether the block's first row
    continues the previous block's last session."""
    u = tbl.column("user_id").to_numpy()
    ts_col = tbl.column("ts")
    ts = ts_col.to_numpy().astype("datetime64[us]").astype(np.int64)
    new_user = np.r_[True, u[1:] != u[:-1]]
    brk = np.r_[True, (ts[1:] - ts[:-1]) > gap_us]
    start = new_user | brk
    # per-user cumulative local start count (users are contiguous runs)
    run_start_rows = np.flatnonzero(new_user)
    local_cum = np.cumsum(start)
    base = np.repeat(local_cum[run_start_rows] - start[run_start_rows],
                     np.diff(np.r_[run_start_rows, len(u)]))
    c = local_cum - base                       # ≥1, counts assumed start
    off = np.array([offsets.get(int(x), 0)
                    for x in u[run_start_rows]], dtype=np.int64)
    sid = np.repeat(off, np.diff(np.r_[run_start_rows, len(u)])) + c - 1
    if cont and len(u):
        # the assumed start at row 0 was not real: the first user's whole
        # (contiguous) run sits one session too high
        sid[u == u[0]] -= 1
    return pa.table({
        "user_id": pa.array(u, pa.int64()),
        "session_id": pa.array(sid, pa.int64()),
        "ts": ts_col,
    })


def _session_prefix_scan(summaries, gap_us: int):
    """Driver-side O(#blocks) scan over ordered block summaries → per-block
    per-user TRUE-start offsets + boundary-continuation flags."""
    offsets: dict[int, int] = {}
    per_block_offsets: list[dict] = []
    conts: list[bool] = []
    prev_user: "int | None" = None
    prev_ts = 0
    for s in summaries:
        if s is None:
            per_block_offsets.append({})
            conts.append(False)
            continue
        first_u, first_ts, last_u, last_ts, local_counts = s
        cont = prev_user == first_u and (first_ts - prev_ts) <= gap_us
        conts.append(cont)
        per_block_offsets.append(
            {int(k): offsets.get(int(k), 0) for k in local_counts})
        for k, v in local_counts.items():
            offsets[int(k)] = offsets.get(int(k), 0) + int(v)
        if cont:
            offsets[int(first_u)] -= 1  # assumed start was not real
        prev_user, prev_ts = last_u, last_ts
    return per_block_offsets, conts


def _sorted_block_scan(sorted_ds, summarize_fn, sum_args, scan_fn, label_fn,
                       key_of=None):
    """Shared harness for the ordered-window family (sessionize, as-of
    join, rolling / trailing windows, range join): globally sorted
    blocks → one tiny remote summary per block → an O(#blocks) driver
    carry scan (the sequential dependency standard dataflow ops can't
    express) → one remote labeling task per block. One copy of the
    scaffold so the skip-empty-block and fan-out logic can't drift
    between the five operators (review finding, round 4).

    * ``sorted_ds`` — globally sorted, materialized Dataset;
    * ``summarize_fn(block, *sum_args)`` → per-block summary, or None
      for an empty block;
    * ``scan_fn(summaries)`` → one label-arg TUPLE per block (entries
      for None summaries are ignored);
    * ``label_fn(block, *label_args)`` → pa.Table;
    * ``key_of(summary)`` → optional ``(first_key, last_key)`` extractor
      used to VERIFY the load-bearing assumption that ``Dataset.sort``
      emits range-partitioned blocks whose ref order is the global key
      order — violated, the carry scans would silently mis-stitch, so
      the scaffold raises instead (review finding, round 5).

    Returns the labeled Dataset, or ``None`` when every block is empty —
    each operator supplies its own typed empty result in that case (the
    output schemas differ and a groupby over zero rows loses its
    schema)."""
    import ray

    refs = list(sorted_ds.to_arrow_refs())
    summarize = ray.remote(summarize_fn)
    summaries = ray.get([summarize.remote(r, *sum_args) for r in refs])
    if key_of is not None:
        prev_last = None
        for sm in summaries:
            if sm is None:
                continue
            first, last = key_of(sm)
            if prev_last is not None and first < prev_last:
                raise RuntimeError(
                    "sorted-block order violation: block first key "
                    f"{first!r} < previous block last key {prev_last!r}"
                    " — Dataset.sort no longer emits range-ordered "
                    "blocks; the boundary carry scan cannot run")
            prev_last = last
    label_args = scan_fn(summaries)
    label = ray.remote(label_fn)
    label_refs = [label.remote(r, *label_args[i])
                  for i, r in enumerate(refs) if summaries[i] is not None]
    if not label_refs:
        return None
    return ray.data.from_arrow_refs(label_refs)


def _sess_key_runs(tbl: pa.Table):
    u = tbl.column("user_id").to_numpy()
    sid = tbl.column("session_id").to_numpy()
    ts = tbl.column("ts").to_numpy()
    starts = np.flatnonzero(np.r_[True, (u[1:] != u[:-1])
                                  | (sid[1:] != sid[:-1])])
    return u, sid, ts, starts


def _sess_agg_summary(tbl: pa.Table):
    """((first_u, first_sid), (cnt, min_ts, max_ts), (last_u, last_sid),
    (cnt, min_ts, max_ts)) for the block's boundary session runs."""
    if tbl.num_rows == 0:
        return None
    u, sid, ts, starts = _sess_key_runs(tbl)
    n = len(u)
    f_hi = int(starts[1]) if len(starts) > 1 else n
    l_lo = int(starts[-1])

    def agg(lo, hi):
        seg = ts[lo:hi]
        return (hi - lo, seg.min(), seg.max())

    return ((int(u[0]), int(sid[0])), agg(0, f_hi),
            (int(u[-1]), int(sid[-1])), agg(l_lo, n))


def _sess_agg_scan(summaries):
    """Boundary-span merge for the session aggregate: count=sum,
    start=min, end=max; the span's FIRST involved block EMITS the merged
    row in place of its claimed run (order-preserving), the rest drop
    theirs."""
    from fuzzy_dedupe_pipeline_ray.functions.scans import (
        scan_boundary_spans,
    )

    args = [{"ov_first": None, "ov_last": None, "ov_all": None,
             "drop_first": False, "drop_last": False, "drop_all": False}
            for _ in summaries]

    def split(sm):
        fk, f_agg, lk, l_agg = sm
        return fk, f_agg, lk, l_agg

    def close(p):
        if len(p["blocks"]) < 2:
            return
        aggs = p["payloads"]
        cnt = sum(a[0] for a in aggs)
        t0 = min(a[1] for a in aggs)
        t1 = max(a[2] for a in aggs)
        first_i, first_which = p["blocks"][0]
        args[first_i][f"ov_{first_which}"] = (cnt, t0, t1)
        for i, which in p["blocks"][1:]:
            args[i][f"drop_{which}"] = True

    scan_boundary_spans(summaries, split, close)
    return [(a["ov_first"], a["ov_last"], a["ov_all"], a["drop_first"],
             a["drop_last"], a["drop_all"]) for a in args]


def _sess_agg_label(tbl: pa.Table, ov_first, ov_last, ov_all, drop_first,
                    drop_last, drop_all) -> pa.Table:
    u, sid, ts, starts = _sess_key_runs(tbl)
    n = len(u)
    ends = np.r_[starts[1:], n]
    cnt = (ends - starts).astype(np.int64)
    t0 = np.minimum.reduceat(ts, starts)
    t1 = np.maximum.reduceat(ts, starts)
    keep = np.ones(len(starts), bool)
    if drop_all:
        keep[:] = False
    else:
        if ov_all is not None:
            cnt[0], t0[0], t1[0] = ov_all
            if len(starts) > 1:  # single-run block: 0 IS the only run
                keep[1:] = False
        if drop_first:
            keep[0] = False
        elif ov_first is not None:
            cnt[0], t0[0], t1[0] = ov_first
        if drop_last:
            keep[-1] = False
        elif ov_last is not None:
            cnt[-1], t0[-1], t1[-1] = ov_last
    sel = np.flatnonzero(keep)
    return pa.table({
        "user_id": pa.array(u[starts[sel]], pa.int64()),
        "session_id": pa.array(sid[starts[sel]], pa.int64()),
        "n_events": pa.array(cnt[sel], pa.int64()),
        "session_start": pa.array(t0[sel]),
        "session_end": pa.array(t1[sel]),
    })


def events_sessionize(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user (gap > 30 min starts a new session):
    session_id = 0-based index of the session within the user's ordered
    events; output per session: user_id, session_id, n_events, start/end.

    Fully vectorized distributed shape (no per-user Python callbacks):

    1. global ``sort(user_id, ts)`` → ordered blocks;
    2. one tiny remote summary per block (first/last row + per-user local
       session-start counts) → the driver runs the O(#blocks) prefix scan
       that standard dataflow ops can't express, producing per-block
       per-user TRUE-start offsets and a boundary-continuation flag;
    3. one remote labeling task per block emits (user_id, session_id, ts)
       rows with the corrected ids — numpy diff/cumsum, no Python rows;
    4. a plain Ray Data groupby aggregate (Count/Min/Max) finalizes.

    Driver state is O(#blocks + users-at-block-boundaries), never rows.
    SQL oracle: window-function gap-and-island."""

    gap_us = gap_minutes * 60 * 1_000_000
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    sorted_ds = ev.sort(["user_id", "ts"]).materialize()

    def scan(summaries):
        offs, conts = _session_prefix_scan(summaries, gap_us)
        return [(gap_us, offs[i], conts[i]) for i in range(len(summaries))]

    labeled = _sorted_block_scan(sorted_ds, _session_block_summary,
                                 (gap_us,), scan, _session_block_labels,
                                 key_of=lambda s: ((s[0], s[1]),
                                                   (s[2], s[3])))
    if labeled is None:
        # empty events table: return an empty result with the explicit
        # final output schema (the groupby below would lose it)
        ts_type = sorted_ds.schema().base_schema.field("ts").type
        empty = pa.schema([
            ("user_id", pa.int64()), ("session_id", pa.int64()),
            ("n_events", pa.int64()), ("session_start", ts_type),
            ("session_end", ts_type)]).empty_table()
        return ray.data.from_arrow(empty)

    # Final per-session Count/Min/Max WITHOUT another shuffle: the
    # labeled blocks are already (user, ts)-ordered and session_id is
    # monotone within user, so (user, session) runs are contiguous
    # across the block sequence — per-block run aggregation with the
    # span's merged row emitted IN PLACE by the first involved block
    # keeps global order, making the output sort free too (round-5
    # per-operation-cost lesson; was a hash aggregate + full sort).
    out = _sorted_block_scan(
        labeled.materialize(), _sess_agg_summary, (), _sess_agg_scan,
        _sess_agg_label,
        key_of=lambda s: (s[0], s[2]))
    if out is None:  # unreachable (labeled is non-empty) — typed guard
        return labeled
    return out


# ---------------------------------------------------------------------------
# As-of join (ordered point-in-time lookup) — an operator Ray Data lacks
# ---------------------------------------------------------------------------
#
# Implemented as the same "sorted blocks + O(#blocks) driver prefix scan"
# shape as events_sessionize: the only cross-block state is the last
# right-side row of each block's final user, so driver state stays
# O(#blocks), rows never leave workers, and the partitioning assumption is
# exactly the one the global sort provides (a user's rows are contiguous
# across at most adjacent blocks). Values are converted to integer cents
# PER ROW (one IEEE multiply+round is bit-identical in every engine), so
# the compared output needs no float-summation-order caveats.

def _cents(col):
    """Per-row round(value*100) → int64. A single scalar multiply+round is
    deterministic across engines (unlike a float SUM, whose accumulation
    order varies), so downstream arithmetic can stay exact-integer."""
    return pc.cast(
        pc.round(pc.multiply(pc.cast(col, pa.float64()), pa.scalar(100.0)),
                 round_mode="half_towards_infinity"),
        pa.int64())


def _asof_block_summary(tbl: pa.Table):
    """(first_user, last_user, last right-side (ts_us, cents) of the last
    user, or None) for one sorted block."""
    if tbl.num_rows == 0:
        return None
    u = tbl.column("user_id").to_numpy()
    side = tbl.column("side").to_numpy()
    last_u = int(u[-1])
    idx = np.flatnonzero((u == last_u) & (side == 0))
    tail = None
    if len(idx):
        i = int(idx[-1])
        tail = (int(tbl.column("ts_us").to_numpy()[i]),
                int(tbl.column("cents").to_numpy()[i]))
    return (int(u[0]), last_u, tail)


def _asof_block_labels(tbl: pa.Table, carry_in) -> pa.Table:
    """Left rows of one sorted block joined to the most recent right row at
    or before their ts (same user); ``carry_in`` is the previous blocks'
    last right row for this block's FIRST user (or None). Sentinel -1 for
    no-match keeps the output null-free."""
    u = tbl.column("user_id").to_numpy()
    side = tbl.column("side").to_numpy()
    ts = tbl.column("ts_us").to_numpy()
    cents = tbl.column("cents").to_numpy()
    eid = tbl.column("event_id").to_numpy()
    n = len(u)
    idx = np.where(side == 0, np.arange(n), -1)
    m = np.maximum.accumulate(idx)
    li = np.flatnonzero(side == 1)
    mi = m[li]
    ok = mi >= 0
    ok &= u[np.clip(mi, 0, n - 1)] == u[li]
    match_ts = np.full(len(li), -1, np.int64)
    match_val = np.full(len(li), -1, np.int64)
    sel = mi[ok]
    match_ts[ok] = ts[sel]
    match_val[ok] = cents[sel]
    if carry_in is not None:
        cu, cts, cval = carry_in
        fix = (~ok) & (u[li] == cu)
        match_ts[fix] = cts
        match_val[fix] = cval
    return pa.table({
        "event_id": pa.array(eid[li], pa.int64()),
        "user_id": pa.array(u[li], pa.int64()),
        "ts_us": pa.array(ts[li], pa.int64()),
        "last_purchase_ts_us": pa.array(match_ts, pa.int64()),
        "last_purchase_value_cents": pa.array(match_val, pa.int64()),
    })


def events_asof_join(sf_dir: str, left_type: str = "click",
                     right_type: str = "purchase"):
    """AS-OF LEFT JOIN: each ``left_type`` event gets the most recent
    ``right_type`` event (ts_right <= ts_left) of the same user.

    Ray Data has no asof join; this composes one from a tagged union +
    global sort(user_id, ts, side) + per-block vectorized
    last-observation-carried-forward with an O(#blocks) driver boundary
    scan (the sessionize machinery). (user_id, ts) is unique in the events
    table, so ordering — and therefore the match — is total and
    deterministic. Oracle: DuckDB ``ASOF LEFT JOIN``."""

    ev = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])

    def tag(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b.column("event_type"),
                        value_set=pa.array([left_type, right_type]))
        b = b.filter(keep)
        is_left = pc.equal(b.column("event_type"), pa.scalar(left_type))
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                             pa.int64()),
            "side": pc.cast(is_left, pa.int8()),
            "event_id": b.column("event_id"),
            "cents": _cents(b.column("value")),
        })

    tagged = ev.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True)
    sorted_ds = tagged.sort(["user_id", "ts_us", "side"]).materialize()

    def scan(summaries):
        carry = None  # (user, ts_us, cents) — last right row seen, running
        carry_ins: list = []
        for s in summaries:
            if s is None:
                carry_ins.append((None,))
                continue
            first_u, last_u, tail = s
            carry_ins.append(
                (carry if carry is not None and carry[0] == first_u
                 else None,))
            if tail is not None:
                carry = (last_u, tail[0], tail[1])
            elif not (carry is not None and carry[0] == last_u):
                carry = None
        return carry_ins

    out = _sorted_block_scan(sorted_ds, _asof_block_summary, (), scan,
                             _asof_block_labels,
                             key_of=lambda s: (s[0], s[1]))
    if out is None:
        empty = pa.schema([
            ("event_id", pa.int64()), ("user_id", pa.int64()),
            ("ts_us", pa.int64()), ("last_purchase_ts_us", pa.int64()),
            ("last_purchase_value_cents", pa.int64())]).empty_table()
        return ray.data.from_arrow(empty)
    return out.sort("event_id")


# ---------------------------------------------------------------------------
# Rolling window aggregate (ROWS BETWEEN k PRECEDING AND CURRENT ROW)
# ---------------------------------------------------------------------------

def _rolling_block_summary(tbl: pa.Table, k: int):
    """(first_user, last_user, last ≤k cents of the last user) for one
    sorted block."""
    if tbl.num_rows == 0:
        return None
    u = tbl.column("user_id").to_numpy()
    cents = tbl.column("cents").to_numpy()
    last_u = int(u[-1])
    run = np.flatnonzero(u == last_u)
    vals = cents[run[-k:]].tolist()
    return (int(u[0]), last_u, [int(v) for v in vals])


def _rolling_block_labels(tbl: pa.Table, k: int, carry_vals) -> pa.Table:
    """Per-row rolling count + integer-cent sum over the current row plus
    up to k preceding rows of the same user; ``carry_vals`` are the ≤k
    trailing cents of the FIRST user's run from earlier blocks."""
    u = tbl.column("user_id").to_numpy()
    cents = tbl.column("cents").to_numpy().astype(np.int64)
    n = len(u)
    new_user = np.r_[True, u[1:] != u[:-1]]
    run_start_rows = np.flatnonzero(new_user)
    run_len = np.diff(np.r_[run_start_rows, n])
    run_start = np.repeat(run_start_rows, run_len)
    i = np.arange(n)
    j = np.maximum(run_start, i - k)         # in-block window start
    cs = np.r_[0, np.cumsum(cents)]
    roll_sum = cs[i + 1] - cs[j]
    n_win = i - j + 1
    if carry_vals:
        c = np.asarray(carry_vals, np.int64)
        first_run = u == u[0]
        p = i - run_start                     # local position in run
        for pos in range(min(k, len(c) + k)):
            extra = min(k - pos, len(c))
            if extra <= 0:
                break
            rows = first_run & (p == pos)
            roll_sum[rows] += int(c[len(c) - extra:].sum())
            n_win[rows] += extra
    return pa.table({
        "event_id": tbl.column("event_id"),
        "user_id": tbl.column("user_id"),
        "ts_us": tbl.column("ts_us"),
        "n_in_window": pa.array(n_win, pa.int64()),
        "roll_sum_cents": pa.array(roll_sum, pa.int64()),
    })


def events_rolling(sf_dir: str, k: int = 3):
    """Per-user rolling aggregate over (current + k preceding) events
    ordered by ts: window row count + integer-cent value sum.

    Same sorted-blocks + driver-boundary-scan composition as the asof
    join; the only cross-block state is the trailing ≤k cents of each
    block's final user. Exact-integer window sums (per-row cents) make
    the DuckDB window-function oracle bit-comparable."""

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                             pa.int64()),
            "event_id": b.column("event_id"),
            "cents": _cents(b.column("value")),
        })

    sorted_ds = (ev.map_batches(prep, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .sort(["user_id", "ts_us"]).materialize())

    def scan(summaries):
        carry_user = None
        carry_vals: list = []
        carry_ins: list = []
        for s in summaries:
            if s is None:
                carry_ins.append((k, []))
                continue
            first_u, last_u, tail_vals = s
            carry_ins.append(
                (k, list(carry_vals) if carry_user == first_u else []))
            if carry_user == last_u:
                carry_vals = (carry_vals + tail_vals)[-k:]
            else:
                carry_vals = tail_vals[-k:]
            carry_user = last_u
        return carry_ins

    out = _sorted_block_scan(sorted_ds, _rolling_block_summary, (k,), scan,
                             _rolling_block_labels,
                             key_of=lambda s: (s[0], s[1]))
    if out is None:
        empty = pa.schema([
            ("event_id", pa.int64()), ("user_id", pa.int64()),
            ("ts_us", pa.int64()), ("n_in_window", pa.int64()),
            ("roll_sum_cents", pa.int64())]).empty_table()
        return ray.data.from_arrow(empty)
    return out.sort("event_id")


# ---------------------------------------------------------------------------
# Set operations (union / intersect / except) — SURVEY §2 D4
# ---------------------------------------------------------------------------

def part_brand_set_ops(sf_dir: str):
    """UNION / INTERSECT / EXCEPT of two derived brand sets (A = brands
    with a part of size ≤ 10; B = brands with a BRASS-type part), computed
    in ONE shuffle: a tagged membership groupby (max(a), max(b) per brand)
    followed by a vectorized emit of the three set-op result rows — no
    per-set distinct passes, no join. Output: (op, p_brand)."""
    part = _read(sf_dir, "part", ["p_brand", "p_size", "p_type"])

    def mark(b: pa.Table) -> pa.Table:
        return pa.table({
            "p_brand": b.column("p_brand"),
            "a": pc.cast(pc.less_equal(b.column("p_size"), pa.scalar(10)),
                         pa.int64()),
            "b": pc.cast(pc.match_substring(b.column("p_type"), "BRASS"),
                         pa.int64()),
        })

    member = (part.map_batches(mark, batch_format="pyarrow",
                               zero_copy_batch=True)
              .groupby("p_brand")
              .aggregate(Max("a", alias_name="in_a"),
                         Max("b", alias_name="in_b")))

    def emit(t: pa.Table) -> pa.Table:
        brand = t.column("p_brand")
        in_a = pc.cast(t.column("in_a"), pa.bool_())
        in_b = pc.cast(t.column("in_b"), pa.bool_())
        parts = []
        for op, mask in (
                ("except_a", pc.and_(in_a, pc.invert(in_b))),
                ("intersect", pc.and_(in_a, in_b)),
                ("union", pc.or_(in_a, in_b))):
            sel = brand.filter(mask)
            parts.append(pa.table({
                "op": pa.array([op] * len(sel), pa.string()),
                "p_brand": sel}))
        return pa.concat_tables(parts)

    return member.map_batches(emit, batch_format="pyarrow").sort(
        ["op", "p_brand"])


# ---------------------------------------------------------------------------
# Trailing TIME-range window (RANGE BETWEEN interval PRECEDING AND CURRENT)
# ---------------------------------------------------------------------------
#
# The time-frame member of the ordered-window family (tumbling =
# events_hourly_window, session = events_sessionize, row-frame =
# events_rolling, point-in-time = events_asof_join). Same sorted-blocks +
# driver-boundary-scan composition; the carry is every trailing row of a
# block's final user still inside the window of the block's end timestamp
# — bounded by DATA DENSITY (events per user per window), not by a count,
# which is the documented partitioning assumption.

def _trailing_block_summary(tbl: pa.Table, gap_us: int):
    """(first_user, last_user, end_ts, trailing (ts, cents) arrays of the
    last user within gap of the block end) for one sorted block."""
    if tbl.num_rows == 0:
        return None
    u = tbl.column("user_id").to_numpy()
    ts = tbl.column("ts_us").to_numpy()
    cents = tbl.column("cents").to_numpy()
    last_u = int(u[-1])
    end_ts = int(ts[-1])
    run = np.flatnonzero(u == last_u)
    keep = run[ts[run] >= end_ts - gap_us]
    return (int(u[0]), last_u, end_ts,
            ts[keep].astype(np.int64), cents[keep].astype(np.int64))


def _trailing_block_labels(tbl: pa.Table, gap_us: int, c_ts, c_cents
                           ) -> pa.Table:
    """Per-row count + integer-cent sum over rows of the same user with
    ts in [ts_i - gap, ts_i]; ``c_ts``/``c_cents`` are the carried
    trailing rows of the FIRST user's run from earlier blocks (sorted)."""
    u = tbl.column("user_id").to_numpy()
    ts = tbl.column("ts_us").to_numpy().astype(np.int64)
    cents = tbl.column("cents").to_numpy().astype(np.int64)
    n = len(u)
    new_user = np.r_[True, u[1:] != u[:-1]]
    run_start_rows = np.flatnonzero(new_user)
    run_len = np.diff(np.r_[run_start_rows, n])
    run_id = np.repeat(np.arange(len(run_start_rows)), run_len)
    # strictly-increasing composite key: per-run band offset > ts span +
    # gap keeps each row's (adj - gap) probe inside its own run's band
    off = np.int64(int(ts.max()) - int(ts.min()) + gap_us + 1)
    adj = ts + run_id * off
    j0 = np.searchsorted(adj, adj - gap_us, side="left")
    cs = np.r_[0, np.cumsum(cents)]
    i = np.arange(n)
    win_sum = cs[i + 1] - cs[j0]
    n_win = i - j0 + 1
    if len(c_ts):
        first_run = u == u[0]
        fi = np.flatnonzero(first_run)
        pos = np.searchsorted(c_ts, ts[fi] - gap_us, side="left")
        suffix = np.r_[np.cumsum(np.asarray(c_cents, np.int64)[::-1])[::-1], 0]
        win_sum[fi] += suffix[pos]
        n_win[fi] += len(c_ts) - pos
    return pa.table({
        "event_id": tbl.column("event_id"),
        "user_id": tbl.column("user_id"),
        "ts_us": tbl.column("ts_us"),
        "n_in_window": pa.array(n_win, pa.int64()),
        "win_sum_cents": pa.array(win_sum, pa.int64()),
    })


def events_trailing_window(sf_dir: str, gap_minutes: int = 30):
    """Per-user trailing time window: for every event, the count and
    integer-cent value sum of the user's events in the last
    ``gap_minutes`` (inclusive of the current event) — SQL's
    ``RANGE BETWEEN INTERVAL g PRECEDING AND CURRENT ROW`` frame."""

    gap_us = gap_minutes * 60 * 1_000_000
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                             pa.int64()),
            "event_id": b.column("event_id"),
            "cents": _cents(b.column("value")),
        })

    sorted_ds = (ev.map_batches(prep, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .sort(["user_id", "ts_us"]).materialize())

    def scan(summaries):
        empty64 = np.empty(0, np.int64)
        carry_user = None
        carry_ts, carry_cents = empty64, empty64
        carry_ins: list = []
        for s in summaries:
            if s is None:
                carry_ins.append((gap_us, empty64, empty64))
                continue
            first_u, last_u, end_ts, tail_ts, tail_cents = s
            if carry_user == first_u:
                carry_ins.append((gap_us, carry_ts, carry_cents))
            else:
                carry_ins.append((gap_us, empty64, empty64))
            if carry_user == last_u:
                merged_ts = np.r_[carry_ts, tail_ts]
                merged_cents = np.r_[carry_cents, tail_cents]
            else:
                merged_ts, merged_cents = tail_ts, tail_cents
            keep = merged_ts >= end_ts - gap_us
            carry_ts, carry_cents = merged_ts[keep], merged_cents[keep]
            carry_user = last_u
        return carry_ins

    out = _sorted_block_scan(sorted_ds, _trailing_block_summary, (gap_us,),
                             scan, _trailing_block_labels,
                             key_of=lambda s: (s[0], s[1]))
    if out is None:
        empty = pa.schema([
            ("event_id", pa.int64()), ("user_id", pa.int64()),
            ("ts_us", pa.int64()), ("n_in_window", pa.int64()),
            ("win_sum_cents", pa.int64())]).empty_table()
        return ray.data.from_arrow(empty)
    return out.sort("event_id")


# ---------------------------------------------------------------------------
# Range join (pure inequality predicate — no equality key)
# ---------------------------------------------------------------------------
#
# The range-join member of the ordered-join family: all pairs of events
# (any users) whose timestamps are within a window of each other. No
# equality key exists, so a hash join cannot express it; the classic
# distributed shape is banded time-bucketing (join cell c with c and
# c+1). On globally SORTED input the same result falls out of the
# sorted-blocks composition: every partner of a row lives in its trailing
# window, so per-block searchsorted + one vectorized repeat/arange
# expansion emits the pairs, and the only cross-block state is the rows
# within the window of the block's end. Partitioning assumption: the
# pair count per block is bounded by data density (events per window) —
# the same bound ANY range-join output obeys.

def _range_block_summary(tbl: pa.Table, win_us: int):
    """(end_ts, trailing (ts, event_id) within win of block end)."""
    if tbl.num_rows == 0:
        return None
    ts = tbl.column("ts_us").to_numpy()
    eid = tbl.column("event_id").to_numpy()
    end_ts = int(ts[-1])
    keep = ts >= end_ts - win_us
    return (end_ts, ts[keep].astype(np.int64), eid[keep].astype(np.int64))


def _range_block_pairs(tbl: pa.Table, win_us: int, c_ts, c_id) -> pa.Table:
    """All (earlier, later) event pairs with later-in-this-block and
    0 <= ts_later - ts_earlier <= win; ``c_ts``/``c_id`` are the carried
    trailing rows of earlier blocks (sorted, strictly before this block
    in the global (ts, event_id) order)."""
    ts = tbl.column("ts_us").to_numpy().astype(np.int64)
    eid = tbl.column("event_id").to_numpy().astype(np.int64)
    n = len(ts)
    i = np.arange(n)
    j0 = np.searchsorted(ts, ts - win_us, side="left")
    counts = i - j0
    total = int(counts.sum())
    cum = np.cumsum(counts)
    offs = np.repeat(cum - counts, counts)
    b_idx = np.repeat(i, counts)
    a_idx = np.repeat(j0, counts) + (np.arange(total) - offs)
    out_a = [eid[a_idx]]
    out_b = [eid[b_idx]]
    out_d = [ts[b_idx] - ts[a_idx]]
    if len(c_ts):
        pos = np.searchsorted(c_ts, ts - win_us, side="left")
        counts2 = len(c_ts) - pos
        total2 = int(counts2.sum())
        if total2:
            cum2 = np.cumsum(counts2)
            offs2 = np.repeat(cum2 - counts2, counts2)
            b2 = np.repeat(i, counts2)
            a2 = np.repeat(pos, counts2) + (np.arange(total2) - offs2)
            out_a.append(np.asarray(c_id, np.int64)[a2])
            out_b.append(eid[b2])
            out_d.append(ts[b2] - np.asarray(c_ts, np.int64)[a2])
    return pa.table({
        "id_a": pa.array(np.concatenate(out_a), pa.int64()),
        "id_b": pa.array(np.concatenate(out_b), pa.int64()),
        "delta_us": pa.array(np.concatenate(out_d), pa.int64()),
    })


def events_range_join(sf_dir: str, window_seconds: int = 30):
    """RANGE SELF-JOIN: all event pairs (across all users) at most
    ``window_seconds`` apart, as (id_a, id_b, delta_us) with id_a the
    earlier event in the global (ts, event_id) order (ties split by id,
    matching the SQL predicate exactly)."""

    win_us = window_seconds * 1_000_000
    ev = _read(sf_dir, "events", ["event_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "ts_us": pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                             pa.int64()),
            "event_id": b.column("event_id"),
        })

    sorted_ds = (ev.map_batches(prep, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .sort(["ts_us", "event_id"]).materialize())

    def scan(summaries):
        empty64 = np.empty(0, np.int64)
        carry_ts, carry_id = empty64, empty64
        carry_ins: list = []
        for s in summaries:
            carry_ins.append((win_us, carry_ts, carry_id))
            if s is None:
                continue
            end_ts, tail_ts, tail_id = s
            merged_ts = np.r_[carry_ts, tail_ts]
            merged_id = np.r_[carry_id, tail_id]
            keep = merged_ts >= end_ts - win_us
            carry_ts, carry_id = merged_ts[keep], merged_id[keep]
        return carry_ins

    out = _sorted_block_scan(sorted_ds, _range_block_summary, (win_us,),
                             scan, _range_block_pairs)
    if out is None:
        empty = pa.schema([
            ("id_a", pa.int64()), ("id_b", pa.int64()),
            ("delta_us", pa.int64())]).empty_table()
        return ray.data.from_arrow(empty)
    return out.sort(["id_a", "id_b"])


# ---------------------------------------------------------------------------
# Anti-join (NOT IN / NOT EXISTS)
# ---------------------------------------------------------------------------

def customers_inactive_since(sf_dir: str, cutoff: str = "2000-06-01"):
    """ANTI-JOIN: customers with NO order on/after ``cutoff``.

    The scale shape: the big probe side (orders) collapses to its distinct
    key set with one pre-aggregating groupby, then customers LEFT-OUTER
    lookup_join against that key set (broadcast under the row gate, Ray
    hash join above it) and keep the null-marker rows. The anti-join never
    shuffles the full orders table — only its distinct keys move.
    Reference analog: the pair-set membership test of
    ``dedupe_logic/processor.py:144-147`` inverted (keep NON-members)."""
    orders = _read_filtered(
        sf_dir, "orders", ["o_custkey", "o_orderdate"],
        pc.field("o_orderdate") >= np.datetime64(cutoff, "us"))

    def recent_keys(b: pa.Table) -> pa.Table:
        # batch-level distinct before the shuffle (combiner pattern)
        return pa.table({"c_custkey": pc.unique(b.column("o_custkey"))})

    active = (orders.map_batches(recent_keys, batch_format="pyarrow",
                                 zero_copy_batch=True)
              .groupby("c_custkey").aggregate(Count(alias_name="marker"))
              .materialize())
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def project(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(b.column("c_custkey"), pa.int64()),
            "c_name": b.column("c_name"),
        })

    if active.count() == 0:
        # a groupby over zero rows yields a schema-less empty dataset
        # (no key column to probe) — and "nobody ordered recently" means
        # every customer is in the anti-join result anyway
        return cust.map_batches(project,
                                batch_format="pyarrow").sort("c_custkey")

    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join
    j = lookup_join(cust, active, on="c_custkey", cfg=DEFAULT_CONFIG,
                    join_type="left_outer", right_count=active.count())

    def anti(b: pa.Table) -> pa.Table:
        return project(b.filter(pc.is_null(b.column("marker"))))

    return j.map_batches(anti, batch_format="pyarrow").sort("c_custkey")


# ---------------------------------------------------------------------------
# Exact distributed quantiles (global order statistics)
# ---------------------------------------------------------------------------

def _exact_cents_quantiles(cents_ds, qs):
    """EXACT ``quantile_disc`` order statistics of a one-column int64
    ``cents`` Dataset by distributed selection: global sort, locate the
    ceil(q·n)−1 index from per-block row counts (block METADATA — no
    extra pass), touch only the owning blocks with one tiny slice task
    each. Returns ``(n, [(q_scaled, value), ...])`` with q scaled ×100
    (the shared kernel for ``lineitem_quantiles`` and the sketch-error
    check). Driver state: O(#blocks) counts + |qs| scalars."""
    import ray

    s = cents_ds.sort("cents").materialize()

    refs, counts = [], []
    for bundle in s.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(ref)
                counts.append(meta.num_rows)
    n = int(sum(counts))
    if n == 0:
        return 0, []

    starts = np.cumsum([0] + counts[:-1])
    # quantile_disc: 0-based index ceil(q*n) - 1
    want = {}  # block_idx -> [(q_scaled, local_idx)]
    for q in qs:
        gidx = max(0, int(math.ceil(q * n)) - 1)
        b_idx = int(np.searchsorted(starts, gidx, side="right") - 1)
        want.setdefault(b_idx, []).append(
            (int(round(q * 100)), gidx - int(starts[b_idx])))

    def pick(tbl: pa.Table, pairs):
        vals = tbl.column("cents")
        return [(qs_, vals[i].as_py()) for qs_, i in pairs]

    pick_r = ray.remote(pick)
    got = ray.get([pick_r.remote(refs[b], pairs)
                   for b, pairs in sorted(want.items())])
    return n, sorted(p for chunk in got for p in chunk)


def lineitem_quantiles(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.9, 0.99)):
    """EXACT quantiles of ``l_extendedprice`` (cent-scaled) by the
    distributed-selection kernel (``_exact_cents_quantiles``). Matches
    DuckDB ``quantile_disc`` (index ceil(q*n)-1, verified in tests)."""
    import ray

    li = _read(sf_dir, "lineitem", ["l_extendedprice"])
    cents = li.map_batches(
        lambda b: pa.table({"cents": _e2(b.column("l_extendedprice"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    n, rows = _exact_cents_quantiles(cents, qs)
    if n == 0:
        return ray.data.from_arrow(pa.schema(
            [("q_e2", pa.int64()), ("value_cents", pa.int64())]).empty_table())
    return ray.data.from_arrow(pa.table({
        "q_e2": pa.array([r[0] for r in rows], pa.int64()),
        "value_cents": pa.array([r[1] for r in rows], pa.int64()),
    }))


# ---------------------------------------------------------------------------
# Exact heavy hitters (Misra–Gries candidates + exact second pass)
# ---------------------------------------------------------------------------
#
# The two-pass exact frequent-items shape that works at any scale: pass 1
# runs a Misra–Gries summary per block (k counters, pure Arrow/numpy) and
# merges the tiny summaries on the driver — the merged sketch provably
# contains every item with true frequency > n/(k+1) (Misra & Gries 1982;
# merge rule of Agarwal et al., PODS'12). Pass 2 broadcasts the <=k
# candidates and computes their EXACT counts with a pre-filtered groupby,
# so the output is exactly the SQL answer while only candidate rows are
# ever shuffled.

_MG_K = 127  # counters; guarantees capture of items with count > n/128


def _mg_compress(ids: np.ndarray, cnts: np.ndarray, k: int):
    """Reduce (ids, counts) to ≤ k positive counters (MG decrement)."""
    if len(ids) <= k:
        return ids, cnts
    # subtract the (k+1)-th largest count from all, keep positive
    kth = np.partition(cnts, len(cnts) - k - 1)[len(cnts) - k - 1]
    cnts = cnts - kth
    keep = cnts > 0
    return ids[keep], cnts[keep]


def events_heavy_hitters(sf_dir: str, k: int = _MG_K):
    """Users with strictly more than n/(k+1) of all events, with EXACT
    counts. Output: (user_id, n_events)."""
    import ray

    ev = _read(sf_dir, "events", ["user_id"]).materialize()

    def block_sketch(tbl: pa.Table):
        if tbl.num_rows == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64), 0
        vc = tbl.column("user_id").combine_chunks().value_counts()
        ids = np.asarray(vc.field(0), np.int64)
        cnts = np.asarray(vc.field(1), np.int64)
        ids, cnts = _mg_compress(ids, cnts, k)
        return ids, cnts, tbl.num_rows

    sketch_r = ray.remote(block_sketch)
    refs = [r for bundle in ev.iter_internal_ref_bundles()
            for r in bundle.block_refs]
    sketches = ray.get([sketch_r.remote(r) for r in refs])

    n = sum(s[2] for s in sketches)
    if n == 0:
        return ray.data.from_arrow(pa.schema(
            [("user_id", pa.int64()),
             ("n_events", pa.int64())]).empty_table())
    all_ids = np.concatenate([s[0] for s in sketches])
    all_cnts = np.concatenate([s[1] for s in sketches])
    # merge: sum per id (vectorized), then one more MG compression
    uniq, inv = np.unique(all_ids, return_inverse=True)
    summed = np.bincount(inv, weights=all_cnts).astype(np.int64)
    cand, _ = _mg_compress(uniq, summed, k)
    cand_ref = ray.put(np.sort(cand))

    def exact_partial(b: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        u = b.column("user_id")
        mask = pc.is_in(u, value_set=pa.array(cands, pa.int64()))
        vc = u.filter(mask).combine_chunks().value_counts()
        return pa.table({
            "user_id": pc.cast(vc.field(0), pa.int64()),
            "c": pc.cast(vc.field(1), pa.int64()),
        })

    exact = (ev.map_batches(exact_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("user_id").aggregate(Sum("c", alias_name="n_events")))

    thresh = pa.scalar(n)

    def final(b: pa.Table) -> pa.Table:
        keep = pc.greater(pc.multiply(pc.cast(b.column("n_events"),
                                              pa.int64()),
                                      pa.scalar(k + 1)), thresh)
        b = b.filter(keep)
        return pa.table({
            "user_id": pc.cast(b.column("user_id"), pa.int64()),
            "n_events": pc.cast(b.column("n_events"), pa.int64()),
        })

    return exact.map_batches(final, batch_format="pyarrow").sort("user_id")


# ---------------------------------------------------------------------------
# Pivot (conditional aggregates) and rank-per-group top-k
# ---------------------------------------------------------------------------

#: the event-type vocabulary the pivot emits one count column per — fixed
#: up front (a pivot's output schema must be static for Arrow), matching
#: the generator's event_type domain.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_type_pivot(sf_dir: str):
    """Pivot events long→wide: one row per user with per-event-type counts
    and the cent-scaled purchase revenue. Conditional aggregates are
    computed as batch-level partials (np.bincount per type over the
    batch's user index — the combiner pattern), so the shuffle moves at
    most |users|·|blocks| pre-aggregated rows of 7 ints, never the raw
    events. Output: (user_id, n_click, n_error, n_purchase, n_signup,
    n_view, purchase_cents)."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])
    cols = [f"n_{t}" for t in EVENT_TYPES]

    def partial(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy()
        users, inv = np.unique(uid, return_inverse=True)
        etype = b.column("event_type")
        cents = _e2(b.column("value")).to_numpy()
        out = {"user_id": pa.array(users, pa.int64())}
        for t in EVENT_TYPES:
            m = pc.equal(etype, t).combine_chunks().to_numpy(
                zero_copy_only=False)
            out[f"n_{t}"] = pa.array(
                np.bincount(inv[m], minlength=len(users)).astype(np.int64))
        pm = pc.equal(etype, "purchase").combine_chunks().to_numpy(
            zero_copy_only=False)
        out["purchase_cents"] = pa.array(
            np.bincount(inv[pm], weights=cents[pm],
                        minlength=len(users)).astype(np.int64))
        return pa.table(out)

    aggs = [Sum(c, alias_name=c) for c in cols]
    aggs.append(Sum("purchase_cents", alias_name="purchase_cents"))
    merged = (ev.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("user_id").aggregate(*aggs))

    def final(b: pa.Table) -> pa.Table:
        out = {"user_id": pc.cast(b.column("user_id"), pa.int64())}
        for c in cols + ["purchase_cents"]:
            out[c] = pc.cast(b.column(c), pa.int64())
        return pa.table(out)

    return merged.map_batches(final, batch_format="pyarrow").sort("user_id")


def part_brand_topk(sf_dir: str, k: int = 3):
    """Top-k parts per brand by retail price (the rank-per-group /
    ``row_number() OVER (PARTITION BY ...)`` shape), ties broken by
    partkey. Per-batch partial top-k via one lexsort keeps at most
    k·|brands| rows per block, so only partial winners shuffle into the
    per-group final selection. Output: (p_brand, rnk, p_partkey,
    price_cents)."""
    parts = _read(sf_dir, "part", ["p_brand", "p_partkey", "p_retailprice"])

    def partial(b: pa.Table) -> pa.Table:
        cents = _e2(b.column("p_retailprice")).to_numpy()
        pk = b.column("p_partkey").to_numpy()
        enc = pc.dictionary_encode(b.column("p_brand").combine_chunks())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        code = np.asarray(enc.indices, np.int64)
        order = np.lexsort((pk, -cents, code))
        # rank within each brand run = position - run start
        starts = np.flatnonzero(np.diff(code[order], prepend=-1))
        run_start = np.repeat(starts, np.diff(np.append(starts, len(order))))
        keep = np.sort(order[np.arange(len(order)) - run_start < k])
        return pa.table({
            "p_brand": b.column("p_brand").take(pa.array(keep)),
            "p_partkey": pa.array(pk[keep], pa.int64()),
            "price_cents": pa.array(cents[keep], pa.int64()),
        })

    def group_topk(g: pa.Table) -> pa.Table:
        cents = g.column("price_cents").to_numpy()
        pk = g.column("p_partkey").to_numpy()
        order = np.lexsort((pk, -cents))[:k]
        return pa.table({
            "p_brand": g.column("p_brand").take(pa.array(order)),
            "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "p_partkey": pa.array(pk[order], pa.int64()),
            "price_cents": pa.array(cents[order], pa.int64()),
        })

    return (parts.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("p_brand")
            .map_groups(group_topk, batch_format="pyarrow")
            .sort(["p_brand", "rnk"]))


def _grouped_cents_quantiles(cents_ds, qs):
    """EXACT per-group ``quantile_disc`` by distributed selection over a
    (event_type, cents) dataset: one global sort on (group, value), then
    per-block RUN-LENGTH summaries of the group column (block
    metadata-sized, not data-sized) let the driver compute each group's
    global offset and locate every k-th order statistic; only the owning
    blocks are touched, one tiny slice task each. No group is ever
    materialized in one task, so a group 1000× larger than worker memory
    still works. Returns sorted (group, q_e2, value) row tuples, or None
    when the input has no rows."""
    import ray

    s = cents_ds.sort(["event_type", "cents"]).materialize()

    def block_runs(tbl: pa.Table):
        """(types, counts) of the block's event_type runs, in order."""
        et = tbl.column("event_type").combine_chunks()
        if len(et) == 0:
            return [], []
        enc = pc.dictionary_encode(et)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        code = np.asarray(enc.indices, np.int64)
        starts = np.flatnonzero(np.diff(code, prepend=code[0] - 1))
        counts = np.diff(np.append(starts, len(code)))
        vocab = enc.dictionary.to_pylist()
        return [vocab[c] for c in code[starts]], counts.tolist()

    runs_r = ray.remote(block_runs)
    refs, block_rows = [], []
    for bundle in s.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(ref)
                block_rows.append(meta.num_rows)
    if not refs:
        return None

    runs = ray.get([runs_r.remote(r) for r in refs])
    # global (group → size, start offset) from the ordered run summaries
    sizes: dict = {}
    for types, counts in runs:
        for t, c in zip(types, counts):
            sizes[t] = sizes.get(t, 0) + int(c)
    group_start, off = {}, 0
    for t in sorted(sizes):          # sort order == the global sort order
        group_start[t] = off
        off += sizes[t]
    block_start = np.cumsum([0] + block_rows[:-1])

    want: dict = {}  # block_idx -> [(event_type, q_e2, local_idx)]
    for t in sorted(sizes):
        for q in qs:
            gidx = group_start[t] + max(0, int(math.ceil(q * sizes[t])) - 1)
            b_idx = int(np.searchsorted(block_start, gidx, side="right") - 1)
            want.setdefault(b_idx, []).append(
                (t, int(round(q * 100)), gidx - int(block_start[b_idx])))

    def pick(tbl: pa.Table, items):
        vals = tbl.column("cents")
        return [(t, qe2, vals[i].as_py()) for t, qe2, i in items]

    pick_r = ray.remote(pick)
    got = ray.get([pick_r.remote(refs[b], items)
                   for b, items in sorted(want.items())])
    return sorted(p for chunk in got for p in chunk)


def events_value_quantiles_by_type(sf_dir: str, qs=(0.25, 0.5, 0.9)):
    """EXACT per-group quantiles (``quantile_disc`` per event_type) —
    the grouped form of ``lineitem_quantiles``, via the
    ``_grouped_cents_quantiles`` distributed-selection kernel.
    Output: (event_type, q_e2, value_cents)."""
    import ray

    ev = _read(sf_dir, "events", ["event_type", "value"])
    cents = ev.map_batches(
        lambda b: pa.table({"event_type": b.column("event_type"),
                            "cents": _e2(b.column("value"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    rows = _grouped_cents_quantiles(cents, qs)
    out_schema = pa.schema([("event_type", pa.string()),
                            ("q_e2", pa.int64()),
                            ("value_cents", pa.int64())])
    if rows is None:
        return ray.data.from_arrow(out_schema.empty_table())
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "q_e2": pa.array([r[1] for r in rows], pa.int64()),
        "value_cents": pa.array([r[2] for r in rows], pa.int64()),
    }))


def events_value_mad_by_type(sf_dir: str):
    """EXACT per-group median absolute deviation: median (quantile_disc
    convention) per event_type, then the median of |cents − group
    median| — TWO passes of the ``_grouped_cents_quantiles``
    distributed-selection kernel, with the tiny per-group median table
    applied as a vectorized ``index_in`` lookup between them (group
    count is output-sized, so the lookup broadcast never grows with the
    data). Output: (event_type, median_e2, mad_e2)."""
    import ray

    ev = _read(sf_dir, "events", ["event_type", "value"])
    cents = ev.map_batches(
        lambda b: pa.table({"event_type": b.column("event_type"),
                            "cents": _e2(b.column("value"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    med_rows = _grouped_cents_quantiles(cents, (0.5,))
    out_schema = pa.schema([("event_type", pa.string()),
                            ("median_e2", pa.int64()),
                            ("mad_e2", pa.int64())])
    if med_rows is None:
        return ray.data.from_arrow(out_schema.empty_table())
    types = pa.array([r[0] for r in med_rows], pa.string())
    meds = np.array([r[2] for r in med_rows], np.int64)

    def absdev(b: pa.Table) -> pa.Table:
        pos = pc.index_in(b.column("event_type"), value_set=types)
        m = meds[np.asarray(pos.combine_chunks()
                            if isinstance(pos, pa.ChunkedArray) else pos,
                            np.int64)]
        return pa.table({
            "event_type": b.column("event_type"),
            "cents": pa.array(np.abs(
                b.column("cents").to_numpy().astype(np.int64) - m))})

    mad_rows = _grouped_cents_quantiles(
        cents.map_batches(absdev, batch_format="pyarrow",
                          zero_copy_batch=True), (0.5,))
    mad_of = {r[0]: r[2] for r in mad_rows}
    return ray.data.from_arrow(pa.table({
        "event_type": types,
        "median_e2": pa.array(meds),
        "mad_e2": pa.array([mad_of[r[0]] for r in med_rows], pa.int64()),
    }))


def customer_order_summary(sf_dir: str):
    """LEFT OUTER join demo with null preservation: every customer with
    their order count and cent-scaled revenue — customers with no orders
    keep a row (count 0, revenue 0). customer LEFT JOIN pre-aggregated
    orders (aggregate-before-join keeps the join input small), then a
    vectorized null-fill. Output: (c_custkey, c_name, order_count,
    revenue_e2)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def pre(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").to_numpy()
        keys, inv = np.unique(ck, return_inverse=True)
        cents = _e2(b.column("o_totalprice")).to_numpy()
        return pa.table({
            "o_custkey": pa.array(keys, pa.int64()),
            "n": pa.array(np.bincount(inv, minlength=len(keys))
                          .astype(np.int64)),
            "rev": pa.array(np.bincount(inv, weights=cents,
                                        minlength=len(keys))
                            .astype(np.int64)),
        })

    per_cust = (orders.map_batches(pre, batch_format="pyarrow",
                                   zero_copy_batch=True)
                .groupby("o_custkey")
                .aggregate(Sum("n", alias_name="n"),
                           Sum("rev", alias_name="rev")))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    joined = hash_join(cust, per_cust, on="c_custkey", right_on="o_custkey",
                       cfg=DEFAULT_CONFIG, join_type="left_outer")

    def fill(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(b.column("c_custkey"), pa.int64()),
            "c_name": b.column("c_name"),
            "order_count": pc.fill_null(pc.cast(b.column("n"), pa.int64()),
                                        0),
            "revenue_e2": pc.fill_null(pc.cast(b.column("rev"), pa.int64()),
                                       0),
        })

    return joined.map_batches(fill, batch_format="pyarrow").sort("c_custkey")


def orders_latest_per_customer(sf_dir: str):
    """Arg-max per group (the keep-newest-record retention shape): each
    customer's most recent order, ties broken by smallest orderkey.
    Per-batch partial arg-max via one lexsort keeps at most one row per
    (customer, block), so only block winners shuffle; the final per-group
    pick is the same kernel inside map_groups. Output: (o_custkey,
    o_orderkey, o_orderdate, total_e2)."""
    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])

    def argmax_rows(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").to_numpy()
        ok = b.column("o_orderkey").to_numpy()
        ts = (b.column("o_orderdate").to_numpy()
              .astype("datetime64[us]").astype(np.int64))
        # last row of each (custkey) run under (cust, date, -orderkey):
        # the max date, min orderkey on date ties
        order = np.lexsort((-ok, ts, ck))
        sck = ck[order]
        last = np.flatnonzero(np.r_[sck[1:] != sck[:-1], True])
        keep = np.sort(order[last])
        return b.take(pa.array(keep))

    partials = orders.map_batches(argmax_rows, batch_format="pyarrow",
                                  zero_copy_batch=True)
    final = partials.groupby("o_custkey").map_groups(
        argmax_rows, batch_format="pyarrow")

    def scale(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": pc.cast(b.column("o_custkey"), pa.int64()),
            "o_orderkey": pc.cast(b.column("o_orderkey"), pa.int64()),
            "o_orderdate": b.column("o_orderdate"),
            "total_e2": _e2(b.column("o_totalprice")),
        })

    return final.map_batches(scale, batch_format="pyarrow").sort("o_custkey")


_HIST_BIN_CENTS = 10_000  # $100-wide bins over l_extendedprice


def lineitem_price_histogram(sf_dir: str):
    """Fixed-width numeric histogram over l_extendedprice ($100 bins on
    the cent-scaled value). Per-batch np.bincount partials shuffle at most
    |bins| rows per block into a tiny groupby sum. Output: (bin_id,
    lo_cents, n)."""
    li = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        cents = _e2(b.column("l_extendedprice")).to_numpy()
        bins = cents // _HIST_BIN_CENTS
        ids, counts = np.unique(bins, return_counts=True)
        return pa.table({
            "bin_id": pa.array(ids, pa.int64()),
            "n": pa.array(counts.astype(np.int64)),
        })

    merged = (li.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("bin_id").aggregate(Sum("n", alias_name="n")))

    def final(b: pa.Table) -> pa.Table:
        bid = pc.cast(b.column("bin_id"), pa.int64())
        return pa.table({
            "bin_id": bid,
            "lo_cents": pc.multiply(bid, pa.scalar(_HIST_BIN_CENTS,
                                                   pa.int64())),
            "n": pc.cast(b.column("n"), pa.int64()),
        })

    return merged.map_batches(final, batch_format="pyarrow").sort("bin_id")


def supplier_nation_stats(sf_dir: str):
    """supplier ⋈ nation rollup: per-nation supplier count and cent-scaled
    account-balance sum (negative balances exercise signed rounding).
    Aggregate-before-join: suppliers pre-aggregate by nationkey, then the
    25-row nation table joins broadcast-style. Output: (n_name,
    n_suppliers, acctbal_e2)."""
    sup = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def pre(b: pa.Table) -> pa.Table:
        nk = b.column("s_nationkey").to_numpy().astype(np.int64)
        keys, inv = np.unique(nk, return_inverse=True)
        cents = _e2(b.column("s_acctbal")).to_numpy()
        return pa.table({
            "n_nationkey": pa.array(keys, pa.int64()),
            "n_suppliers": pa.array(np.bincount(inv, minlength=len(keys))
                                    .astype(np.int64)),
            "acctbal": pa.array(np.bincount(inv, weights=cents,
                                            minlength=len(keys))
                                .astype(np.int64)),
        })

    per_nation = (sup.map_batches(pre, batch_format="pyarrow",
                                  zero_copy_batch=True)
                  .groupby("n_nationkey")
                  .aggregate(Sum("n_suppliers", alias_name="n_suppliers"),
                             Sum("acctbal", alias_name="acctbal")))
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).map_batches(
        lambda b: pa.table({"n_nationkey": pc.cast(b.column("n_nationkey"),
                                                   pa.int64()),
                            "n_name": b.column("n_name")}),
        batch_format="pyarrow")
    out = hash_join(per_nation, nation, on="n_nationkey", cfg=DEFAULT_CONFIG)

    def scale(b: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": b.column("n_name"),
            "n_suppliers": pc.cast(b.column("n_suppliers"), pa.int64()),
            "acctbal_e2": pc.cast(b.column("acctbal"), pa.int64()),
        })

    return out.map_batches(scale, batch_format="pyarrow").sort("n_name")


def urgent_order_revenue(sf_dir: str, segment: str = "BUILDING",
                         cutoff: str = "1998-06-15", k: int = 10):
    """TPC-H Q3 shape: revenue of not-yet-shipped lineitems for one market
    segment's orders placed before the cutoff — filter-pushdown reads on
    all three tables, semi-join reduction (orders filtered by the customer
    key set before lineitem ever joins), per-batch revenue partials, top-k.
    Output: (l_orderkey, o_orderdate, revenue_e4)."""
    cfg = DEFAULT_CONFIG

    cust = (_read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
            .map_batches(
                lambda b: b.filter(pc.equal(b.column("c_mktsegment"),
                                            segment)).select(["c_custkey"]),
                batch_format="pyarrow", zero_copy_batch=True))
    orders = _read_filtered(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
        pc.field("o_orderdate") < np.datetime64(cutoff, "us"))
    orders = hash_join(orders, cust, on="o_custkey", right_on="c_custkey",
                       cfg=cfg).select_columns(["o_orderkey", "o_orderdate"])

    li = _read_filtered(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        pc.field("l_shipdate") > np.datetime64(cutoff, "us"))

    def partial_rev(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy()
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount"))).to_numpy()
        keys, inv = np.unique(ok, return_inverse=True)
        return pa.table({
            "l_orderkey": pa.array(keys, pa.int64()),
            "revenue": pa.array(np.bincount(inv, weights=rev,
                                            minlength=len(keys))),
        })

    per_order = (li.map_batches(partial_rev, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .groupby("l_orderkey")
                 .aggregate(Sum("revenue", alias_name="revenue")))
    j = hash_join(per_order, orders, on="l_orderkey", right_on="o_orderkey",
                  cfg=cfg)

    def scale(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": pc.cast(b.column("l_orderkey"), pa.int64()),
            "o_orderdate": b.column("o_orderdate"),
            "revenue_e4": _e4(b.column("revenue")),
        })

    return (j.map_batches(scale, batch_format="pyarrow")
            .sort(["revenue_e4", "l_orderkey"], descending=[True, False])
            .limit(k))


# ---------------------------------------------------------------------------
# Daily active / new users — the two-level distinct + tiny ordered scan
# ---------------------------------------------------------------------------

def events_daily_users(sf_dir: str):
    """Per-day activity report: events, DISTINCT active users, first-seen
    ("new") users, and the running total of users ever seen — the daily
    health dashboard of an event pipeline.

    Distributed shape: ONE row-scale shuffle — per-batch (day, user)
    partial dedup (lexsort + run heads, so at most one row per (day,
    user, block) leaves the scan) into a ``groupby(day, user)`` — after
    which everything is derived from that distinct table: day-level
    counts by per-batch run-length partials (+ tiny groupby), first-seen
    day by ``groupby(user).min(day)``, and the cumulative column by a
    driver pass over the ≤ #calendar-days result (bounded by time, not
    data; the same justification as the sessionize prefix scan). Days
    ride the shuffles as int64 epoch-µs (engine keys are int64) and come
    back as timestamp[us] at the end."""
    from fuzzy_dedupe_pipeline_ray.sources.io import to_local_table

    ev = _read(sf_dir, "events", ["ts", "user_id"])
    day_us = 86_400_000_000

    def du_partial(b: pa.Table) -> pa.Table:
        ts = (b.column("ts").to_numpy()
              .astype("datetime64[us]").astype(np.int64))
        day = (ts // day_us) * day_us
        u = b.column("user_id").to_numpy()
        order = np.lexsort((u, day))
        d_s, u_s = day[order], u[order]
        first = np.r_[True, (d_s[1:] != d_s[:-1]) | (u_s[1:] != u_s[:-1])]
        idx = np.flatnonzero(first)
        n = np.diff(np.r_[idx, len(d_s)])
        return pa.table({"day": pa.array(d_s[idx], pa.int64()),
                         "user_id": pa.array(u_s[idx], pa.int64()),
                         "n": pa.array(n.astype(np.int64))})

    du = (ev.map_batches(du_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
          .groupby(["day", "user_id"]).aggregate(Sum("n", alias_name="n"))
          .materialize())
    empty = pa.schema([("day", pa.timestamp("us")),
                       ("n_events", pa.int64()),
                       ("n_active_users", pa.int64()),
                       ("n_new_users", pa.int64()),
                       ("cum_users", pa.int64())]).empty_table()
    if du.count() == 0:
        # a groupby over zero rows yields a SCHEMA-LESS empty dataset no
        # downstream map/select can consume — short-circuit (same guard
        # as doc_decontaminate)
        return empty

    def day_partial(b: pa.Table) -> pa.Table:
        d = b.column("day").to_numpy()
        n = b.column("n").to_numpy()
        order = np.argsort(d, kind="stable")
        d_s, n_s = d[order], n[order]
        idx = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        cs = np.zeros(len(n_s) + 1, np.int64)
        np.cumsum(n_s, out=cs[1:])
        bounds = np.r_[idx, len(d_s)]
        return pa.table({
            "day": pa.array(d_s[idx], pa.int64()),
            "n_events": pa.array(cs[bounds[1:]] - cs[bounds[:-1]]),
            "n_active": pa.array(np.diff(bounds).astype(np.int64)),
        })

    day_tbl = (du.map_batches(day_partial, batch_format="pyarrow")
               .groupby("day")
               .aggregate(Sum("n_events", alias_name="n_events"),
                          Sum("n_active", alias_name="n_active")))

    first_day = du.groupby("user_id").aggregate(
        Min("day", alias_name="day"))

    def nu_partial(b: pa.Table) -> pa.Table:
        d = b.column("day").to_numpy()
        keys, counts = np.unique(d, return_counts=True)
        return pa.table({"day": pa.array(keys, pa.int64()),
                         "n_new": pa.array(counts.astype(np.int64))})

    new_tbl = (first_day.map_batches(nu_partial, batch_format="pyarrow")
               .groupby("day").aggregate(Sum("n_new", alias_name="n_new")))

    a = to_local_table(day_tbl)
    nt = to_local_table(new_tbl)
    if a is None or a.num_rows == 0:
        return empty
    d = a.column("day").to_numpy()
    order = np.argsort(d, kind="stable")
    d = d[order]
    n_ev = a.column("n_events").to_numpy()[order].astype(np.int64)
    n_act = a.column("n_active").to_numpy()[order].astype(np.int64)
    n_new = np.zeros(len(d), np.int64)
    if nt is not None and nt.num_rows:
        pos = np.searchsorted(d, nt.column("day").to_numpy())
        n_new[pos] = nt.column("n_new").to_numpy().astype(np.int64)
    return pa.table({
        "day": pa.array(d.astype("datetime64[us]")),
        "n_events": pa.array(n_ev),
        "n_active_users": pa.array(n_act),
        "n_new_users": pa.array(n_new),
        "cum_users": pa.array(np.cumsum(n_new)),
    })


# ---------------------------------------------------------------------------
# ROLLUP / grouping sets — multi-granularity aggregate from ONE shuffle
# ---------------------------------------------------------------------------

def orders_rollup(sf_dir: str):
    """GROUP BY ROLLUP(year, priority) over orders: order counts and
    cent-scaled revenue at three granularities — (year, priority),
    (year), and grand total — the OLAP grouping-sets shape.

    The coarser levels are DERIVED from the finest aggregate instead of
    re-scanning: one per-batch lexsort partial + one groupby shuffle
    produces the (year, priority) table, whose cardinality is bounded by
    the key domain (|years| × |priorities|), so the rollup expansion is
    a driver-side numpy pass over a provably tiny table — the partial-
    aggregate-reuse pattern a 100 TB cube build needs (never N shuffles
    for N grouping sets). Sentinels (-1 / 'ALL') replace SQL's rollup
    NULLs so row ordering is engine-independent. Output: (lvl, o_year,
    o_orderpriority, n_orders, total_e2)."""
    from fuzzy_dedupe_pipeline_ray.sources.io import to_local_table

    orders = _read(sf_dir, "orders",
                   ["o_orderdate", "o_orderpriority", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        y = pc.year(b.column("o_orderdate")).to_numpy().astype(np.int64)
        p = b.column("o_orderpriority").combine_chunks()
        enc = pc.dictionary_encode(p)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices, np.int64)
        cents = _e2(b.column("o_totalprice")).to_numpy()
        order = np.lexsort((codes, y))
        y_s, c_s, v_s = y[order], codes[order], cents[order]
        idx = np.flatnonzero(
            np.r_[True, (y_s[1:] != y_s[:-1]) | (c_s[1:] != c_s[:-1])])
        cs = np.zeros(len(v_s) + 1, np.int64)
        np.cumsum(v_s, out=cs[1:])
        bounds = np.r_[idx, len(y_s)]
        return pa.table({
            "o_year": pa.array(y_s[idx], pa.int64()),
            "o_orderpriority": enc.dictionary.take(pa.array(c_s[idx])),
            "n": pa.array(np.diff(bounds).astype(np.int64)),
            "cents": pa.array(cs[bounds[1:]] - cs[bounds[:-1]]),
        })

    fin = (orders.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby(["o_year", "o_orderpriority"])
           .aggregate(Sum("n", alias_name="n"),
                      Sum("cents", alias_name="cents")))
    tbl = to_local_table(fin)
    if tbl is None or tbl.num_rows == 0:
        return pa.schema([("lvl", pa.int64()), ("o_year", pa.int64()),
                          ("o_orderpriority", pa.string()),
                          ("n_orders", pa.int64()),
                          ("total_e2", pa.int64())]).empty_table()
    y = tbl.column("o_year").to_numpy().astype(np.int64)
    p = np.asarray(tbl.column("o_orderpriority").to_numpy(
        zero_copy_only=False), object)
    n = tbl.column("n").to_numpy().astype(np.int64)
    v = tbl.column("cents").to_numpy().astype(np.int64)

    def level(keys_y, keys_p, lvl):
        order = np.lexsort((keys_p, keys_y))
        ys, ps, ns, vs = keys_y[order], keys_p[order], n[order], v[order]
        idx = np.flatnonzero(
            np.r_[True, (ys[1:] != ys[:-1]) | (ps[1:] != ps[:-1])])
        csn = np.zeros(len(ns) + 1, np.int64)
        np.cumsum(ns, out=csn[1:])
        csv = np.zeros(len(vs) + 1, np.int64)
        np.cumsum(vs, out=csv[1:])
        bounds = np.r_[idx, len(ys)]
        return pa.table({
            "lvl": pa.array(np.full(len(idx), lvl, np.int64)),
            "o_year": pa.array(ys[idx].astype(np.int64)),
            "o_orderpriority": pa.array(list(ps[idx]), pa.string()),
            "n_orders": pa.array(csn[bounds[1:]] - csn[bounds[:-1]]),
            "total_e2": pa.array(csv[bounds[1:]] - csv[bounds[:-1]]),
        })

    all_p = np.asarray(["ALL"] * len(p), object)
    all_y = np.full(len(y), -1, np.int64)
    return pa.concat_tables([
        level(y, p, 0),            # finest (already distinct, re-sorted)
        level(y, all_p, 1),        # per-year
        level(all_y, all_p, 2),    # grand total
    ])


# ---------------------------------------------------------------------------
# NTILE — equal-frequency bucketing per group (exact, distributed)
# ---------------------------------------------------------------------------

_NTILES = 4


def _ntile_block_summary(tbl: pa.Table):
    """Per-block run-length summary of the (sorted) event_type column."""
    if tbl.num_rows == 0:
        return None
    et = np.asarray(tbl.column("event_type").to_numpy(
        zero_copy_only=False), object)
    idx = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
    counts = np.diff(np.r_[idx, len(et)]).astype(np.int64)
    return (list(et[idx]), counts)


def _ntile_of_ranks(r: np.ndarray, tot: int, n_tiles: int) -> np.ndarray:
    """SQL NTILE bucket (0-based) of 0-based ranks ``r`` in a group of
    ``tot`` rows: the first ``tot % n_tiles`` buckets hold ``ceil(tot /
    n_tiles)`` rows, the rest ``floor`` — pure arithmetic, property-
    tested against a naive size-list reference."""
    q, rem = divmod(tot, n_tiles)
    big = (q + 1) * rem
    return np.where(r < big, r // (q + 1),
                    rem + (r - big) // max(q, 1))


def _ntile_block_labels(tbl: pa.Table, types, starts, totals,
                        n_tiles: int) -> pa.Table:
    """Assign each row its exact global NTILE bucket (group rank known
    from the driver scan) and emit per-(type, tile) PARTIAL aggregates —
    at most |types|·n_tiles rows leave the block."""
    et = np.asarray(tbl.column("event_type").to_numpy(
        zero_copy_only=False), object)
    cents = _cents(tbl.column("value")).to_numpy()
    idx = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
    counts = np.diff(np.r_[idx, len(et)]).astype(np.int64)
    out_t, out_tile, out_n, out_sum = [], [], [], []
    for j in range(len(idx)):
        lo, c, start, tot = int(idx[j]), int(counts[j]), starts[j], totals[j]
        r = start + np.arange(c, dtype=np.int64)
        tile = _ntile_of_ranks(r, tot, n_tiles)
        seg = cents[lo:lo + c]
        cs = np.zeros(c + 1, np.int64)
        np.cumsum(seg, out=cs[1:])
        bounds = np.searchsorted(tile, np.arange(n_tiles + 1))
        tn = np.diff(bounds)
        nz = np.flatnonzero(tn)
        out_t.append(np.asarray([types[j]] * len(nz), object))
        out_tile.append(nz.astype(np.int64))
        out_n.append(tn[nz].astype(np.int64))
        out_sum.append(cs[bounds[1:]][nz] - cs[bounds[:-1]][nz])
    return pa.table({
        "event_type": pa.array(list(np.concatenate(out_t)), pa.string()),
        "tile": pa.array(np.concatenate(out_tile)),
        "n": pa.array(np.concatenate(out_n)),
        "sum_cents": pa.array(np.concatenate(out_sum)),
    })


def events_value_ntile(sf_dir: str, n_tiles: int = _NTILES):
    """Exact NTILE(4) per event_type over (value, event_id) — the
    equal-frequency quartile bucketing used for spend tiers / percentile
    cohorts — reported as per-(type, tile) counts and cent-scaled sums.

    Exact distributed ranks without a per-group sort task: global
    ``sort(type, value, event_id)`` (the total order makes tie handling
    engine-independent), then the sorted-block scaffold — per-block
    run-length summaries, an O(#blocks) driver scan that hands every
    block its groups' start ranks and totals, and a per-block labeling
    task that computes NTILE buckets from pure arithmetic and emits only
    per-(type, tile) partials into a tiny groupby. No group is ever
    materialized in one task (the skew story for a hot group), and
    driver state is O(#blocks · #types-per-block-boundary). Output:
    (event_type, tile, n, sum_value_e2)."""
    ev = _read(sf_dir, "events", ["event_type", "value", "event_id"])
    sorted_ds = ev.sort(["event_type", "value", "event_id"]).materialize()

    def scan(summaries):
        run: dict = {}
        starts_per_block = []
        for s in summaries:
            if s is None:
                starts_per_block.append(None)
                continue
            types, counts = s
            starts_per_block.append([run.get(t, 0) for t in types])
            for t, c in zip(types, counts):
                run[t] = run.get(t, 0) + int(c)
        args = []
        for i, s in enumerate(summaries):
            if s is None:
                args.append(())
                continue
            types, _ = s
            args.append((types, starts_per_block[i],
                         [run[t] for t in types], n_tiles))
        return args

    labeled = _sorted_block_scan(sorted_ds, _ntile_block_summary, (),
                                 scan, _ntile_block_labels)
    if labeled is None:
        return ray.data.from_arrow(pa.schema([
            ("event_type", pa.string()), ("tile", pa.int64()),
            ("n", pa.int64()),
            ("sum_value_e2", pa.int64())]).empty_table())

    agg = labeled.groupby(["event_type", "tile"]).aggregate(
        Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))

    def cast(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b.column("event_type"),
            "tile": pc.cast(b.column("tile"), pa.int64()),
            "n": pc.cast(b.column("n"), pa.int64()),
            "sum_value_e2": pc.cast(b.column("sum_cents"), pa.int64()),
        })

    return agg.map_batches(cast, batch_format="pyarrow").sort(
        ["event_type", "tile"])


# ---------------------------------------------------------------------------
# Funnel conversion — ordered two-step sequence matching
# ---------------------------------------------------------------------------

_FUNNEL_WINDOW_DAYS = 7


def events_funnel_conversion(sf_dir: str, first: str = "view",
                             then: str = "purchase",
                             window_days: int = _FUNNEL_WINDOW_DAYS):
    """Two-step funnel: of the users who ever did ``first``, how many did
    ``then`` within ``window_days`` AFTER their first ``first`` — the
    product-analytics conversion query (a sequence pattern, not a plain
    join). Output one row: (n_users_first, n_users_converted,
    conversion_bps).

    Distributed shape: first-step anchor = ``groupby(user).min(ts)``
    over a filtered scan; second-step events probe the anchor table
    through the tiered ``lookup_join`` (broadcast under the gate, hash
    join above — the 100 TB path since the anchor table is
    one-row-per-user); the window test is a vectorized int64 compare;
    converted users collapse through a per-batch unique + groupby. The
    driver holds two scalars."""
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    win_us = window_days * 86_400_000_000
    ev = _read(sf_dir, "events", ["ts", "user_id", "event_type"])

    def step_rows(which):
        def f(b: pa.Table) -> pa.Table:
            m = pc.equal(b.column("event_type"), which)
            t = b.filter(m)
            ts = (t.column("ts").to_numpy()
                  .astype("datetime64[us]").astype(np.int64))
            return pa.table({"user_id": t.column("user_id"),
                             "ts_us": pa.array(ts, pa.int64())})
        return ev.map_batches(f, batch_format="pyarrow",
                              zero_copy_batch=True)

    anchors = (step_rows(first).groupby("user_id")
               .aggregate(Min("ts_us", alias_name="t0")).materialize())
    n_first = anchors.count()
    if n_first == 0:
        return pa.table({"n_users_first": pa.array([0], pa.int64()),
                         "n_users_converted": pa.array([0], pa.int64()),
                         "conversion_bps": pa.array([0], pa.int64())})

    j = lookup_join(step_rows(then), anchors, on="user_id",
                    cfg=DEFAULT_CONFIG, right_count=n_first)

    def in_window_users(b: pa.Table) -> pa.Table:
        ts = b.column("ts_us").to_numpy()
        t0 = b.column("t0").to_numpy()
        ok = (ts >= t0) & (ts <= t0 + win_us)
        u = np.unique(b.column("user_id").to_numpy()[ok])
        return pa.table({"user_id": pa.array(u, pa.int64())})

    matched = j.map_batches(in_window_users,
                            batch_format="pyarrow").materialize()
    # probe before the distinct groupby: zero matched rows would make it
    # a schema-less empty aggregate (same guard as doc_decontaminate)
    n_conv = 0 if matched.count() == 0 else (
        matched.groupby("user_id").aggregate(Count(alias_name="_n"))
        .count())
    return pa.table({
        "n_users_first": pa.array([n_first], pa.int64()),
        "n_users_converted": pa.array([n_conv], pa.int64()),
        "conversion_bps": pa.array([n_conv * 10000 // n_first], pa.int64()),
    })


# ---------------------------------------------------------------------------
# Cohort retention matrix — first-seen cohort × day offset
# ---------------------------------------------------------------------------

def events_user_retention(sf_dir: str):
    """Cohort retention: users grouped by first-seen day, counted on each
    later day they were active — the (cohort_day, day_offset, n_users)
    retention matrix.

    Distributed shape: ONE (day, user) distinct shuffle (per-batch
    lexsort partials, same kernel as ``events_daily_users``), a
    ``groupby(user).min(day)`` for the cohort, and a tiered
    ``lookup_join`` of the distinct table against the per-user cohort
    (broadcast under the gate, hash join above). Counting is per-batch
    partials into a tiny (≤ #days²-row) groupby; days ride shuffles as
    int64 epoch-µs."""
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    day_us = 86_400_000_000
    ev = _read(sf_dir, "events", ["ts", "user_id"])

    def du_partial(b: pa.Table) -> pa.Table:
        ts = (b.column("ts").to_numpy()
              .astype("datetime64[us]").astype(np.int64))
        day = (ts // day_us) * day_us
        u = b.column("user_id").to_numpy()
        order = np.lexsort((u, day))
        d_s, u_s = day[order], u[order]
        first = np.r_[True, (d_s[1:] != d_s[:-1]) | (u_s[1:] != u_s[:-1])]
        idx = np.flatnonzero(first)
        return pa.table({"day": pa.array(d_s[idx], pa.int64()),
                         "user_id": pa.array(u_s[idx], pa.int64())})

    du = (ev.map_batches(du_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
          .groupby(["day", "user_id"]).aggregate(Count(alias_name="_n"))
          .materialize())
    if du.count() == 0:
        # schema-less empty aggregate — short-circuit (same guard as
        # events_daily_users / doc_decontaminate)
        return ray.data.from_arrow(pa.schema(
            [("cohort_day", pa.timestamp("us")),
             ("day_offset", pa.int64()),
             ("n_users", pa.int64())]).empty_table())
    du = du.select_columns(["day", "user_id"]).materialize()

    cohort = du.groupby("user_id").aggregate(
        Min("day", alias_name="cohort_day"))
    j = lookup_join(du, cohort, on="user_id", cfg=DEFAULT_CONFIG)

    def partial_counts(b: pa.Table) -> pa.Table:
        c = b.column("cohort_day").to_numpy()
        off = (b.column("day").to_numpy() - c) // day_us
        order = np.lexsort((off, c))
        c_s, o_s = c[order], off[order]
        idx = np.flatnonzero(
            np.r_[True, (c_s[1:] != c_s[:-1]) | (o_s[1:] != o_s[:-1])])
        return pa.table({
            "cohort_day": pa.array(c_s[idx], pa.int64()),
            "day_offset": pa.array(o_s[idx], pa.int64()),
            "n": pa.array(np.diff(np.r_[idx, len(c_s)]).astype(np.int64)),
        })

    agg = (j.map_batches(partial_counts, batch_format="pyarrow")
           .groupby(["cohort_day", "day_offset"])
           .aggregate(Sum("n", alias_name="n_users")))

    def cast(b: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_day": pa.array(
                b.column("cohort_day").to_numpy().astype("datetime64[us]")),
            "day_offset": pc.cast(b.column("day_offset"), pa.int64()),
            "n_users": pc.cast(b.column("n_users"), pa.int64()),
        })

    return agg.map_batches(cast, batch_format="pyarrow").sort(
        ["cohort_day", "day_offset"])


# ---------------------------------------------------------------------------
# Relative-error quantile sketch (DDSketch-style log buckets)
# ---------------------------------------------------------------------------

_DD_GAMMA = 1.02  # ≤2% relative error per bucket


def events_value_quantile_sketch_check(sf_dir: str,
                                       qs=(0.25, 0.5, 0.9, 0.99),
                                       gamma: float = _DD_GAMMA):
    """All-true INVARIANT pinning a mergeable relative-error quantile
    sketch (DDSketch-shaped log-γ buckets; Masson et al., VLDB'19
    public): bucket(v) = ceil(log_γ v), estimate = γ^bucket — the
    estimate must satisfy exact ≤ est ≤ exact·γ for every queried
    quantile, because the true order statistic provably lies inside the
    reported bucket (v ∈ (γ^(k-1), γ^k]).

    The sketch is the 100 TB path for quantiles: per-batch vectorized
    bucket bincount partials → a tiny groupby — the merged histogram is
    bounded by the VALUE RANGE (log_γ(max/min) buckets), not the row
    count, unlike the exact-selection kernel whose global sort is an
    all-to-all shuffle. The exact side of the check reuses
    ``_exact_cents_quantiles``. Assumes strictly positive values (true
    of ``events.value``; DDSketch handles zero/negative with extra
    stores — out of scope here). Output: (q_bp, sketch_ok) rows."""
    from fuzzy_dedupe_pipeline_ray.sources.io import to_local_table

    ev = _read(sf_dir, "events", ["value"])
    lng = math.log(gamma)

    def bucket_partial(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy()
        pos = v[v > 0]
        k = np.ceil(np.log(pos) / lng).astype(np.int64)
        keys, counts = np.unique(k, return_counts=True)
        return pa.table({"bucket": pa.array(keys, pa.int64()),
                         "n": pa.array(counts.astype(np.int64))})

    hist = to_local_table(
        ev.map_batches(bucket_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("bucket").aggregate(Sum("n", alias_name="n")))

    cents = ev.map_batches(
        lambda b: pa.table({"cents": _e2(b.column("value"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    n, exact_rows = _exact_cents_quantiles(cents, qs)
    if n == 0 or hist is None or hist.num_rows == 0:
        return pa.schema([("q_bp", pa.int64()),
                          ("sketch_ok", pa.bool_())]).empty_table()

    buckets = hist.column("bucket").to_numpy().astype(np.int64)
    counts = hist.column("n").to_numpy().astype(np.int64)
    order = np.argsort(buckets)
    buckets, counts = buckets[order], counts[order]
    cum = np.cumsum(counts)
    exact = {r[0]: r[1] for r in exact_rows}

    out_q, out_ok = [], []
    for q in qs:
        rank = max(1, int(math.ceil(q * n)))
        k = buckets[int(np.searchsorted(cum, rank))]
        est = gamma ** int(k)
        x = exact[int(round(q * 100))] / 100.0
        ok = (est >= x * (1 - 1e-9)) and (est <= x * gamma * (1 + 1e-9))
        out_q.append(int(round(q * 10000)))
        out_ok.append(bool(ok))
    return pa.table({"q_bp": pa.array(out_q, pa.int64()),
                     "sketch_ok": pa.array(out_ok)})


# ---------------------------------------------------------------------------
# TPC-H-shaped multi-way joins (Q5 / Q14 / Q17 / Q18 analogs)
# ---------------------------------------------------------------------------

def _rev_e4(b: pa.Table) -> pa.Array:
    """Per-row revenue l_extendedprice·(1−l_discount) as an EXACT e4 int
    (2-decimal price × 2-decimal discount factor = 4 decimals); summing
    ints makes every revenue aggregate order-independent."""
    return _e4(pc.multiply(
        b.column("l_extendedprice"),
        pc.subtract(pa.scalar(1.0), b.column("l_discount"))))


def q5_region_supplier_volume(sf_dir: str, region: str = "ASIA"):
    """TPC-H Q5 shape: per-nation revenue where the customer and the
    supplier sit in the SAME nation of one region — the 6-table join
    (region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem ⋈ supplier).

    Distributed shape: the two tiny dimensions (nation filtered by
    region, supplier key→nation) broadcast; orders ⋈ customer and
    lineitem ⋈ orders go through the tiered ``lookup_join`` (broadcast
    under the gate, hash join above — the 100 TB path, since lineitem
    and orders are the two big tables); the same-nation test is a
    vectorized equality filter AFTER both joins, and revenue partials
    collapse per batch before the final tiny per-nation groupby.
    Output: (n_name, revenue_e4) sorted by revenue DESC."""
    from fuzzy_dedupe_pipeline_ray.sources.io import (lookup_join,
                                                      to_local_table)

    cfg = DEFAULT_CONFIG
    reg = to_local_table(
        _read(sf_dir, "region", ["r_regionkey", "r_name"]).map_batches(
            lambda b: b.filter(pc.equal(b.column("r_name"), region)),
            batch_format="pyarrow"))
    nat = to_local_table(_read(sf_dir, "nation",
                               ["n_nationkey", "n_name", "n_regionkey"]))
    keep = pc.is_in(nat.column("n_regionkey"),
                    value_set=reg.column("r_regionkey"))
    nat = nat.filter(keep)
    nation_keys = nat.column("n_nationkey")

    cust = (_read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
            .map_batches(
                lambda b: b.filter(pc.is_in(b.column("c_nationkey"),
                                            value_set=nation_keys)),
                batch_format="pyarrow", zero_copy_batch=True))
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    o_nat = lookup_join(
        orders.map_batches(
            lambda b: pa.table({"c_custkey": b.column("o_custkey"),
                                "o_orderkey": b.column("o_orderkey")}),
            batch_format="pyarrow", zero_copy_batch=True),
        cust.map_batches(
            lambda b: pa.table({"c_custkey": b.column("c_custkey"),
                                "c_nationkey": b.column("c_nationkey")}),
            batch_format="pyarrow", zero_copy_batch=True),
        on="c_custkey", cfg=cfg).select_columns(
            ["o_orderkey", "c_nationkey"])

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    li = li.map_batches(
        lambda b: pa.table({"o_orderkey": b.column("l_orderkey"),
                            "l_suppkey": b.column("l_suppkey"),
                            "rev_e4": _rev_e4(b)}),
        batch_format="pyarrow", zero_copy_batch=True)
    j = lookup_join(li, o_nat, on="o_orderkey", cfg=cfg)

    supp = (_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
            .map_batches(
                lambda b: pa.table({"l_suppkey": b.column("s_suppkey"),
                                    "s_nationkey": b.column("s_nationkey")}),
                batch_format="pyarrow", zero_copy_batch=True))
    j = lookup_join(j, supp, on="l_suppkey", cfg=cfg)

    def partial(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("c_nationkey"), b.column("s_nationkey"))
        t = b.filter(m)
        nk = t.column("c_nationkey").to_numpy()
        rv = t.column("rev_e4").to_numpy()
        keys, inv = np.unique(nk, return_inverse=True)
        return pa.table({
            "n_nationkey": pa.array(keys.astype(np.int64)),
            "rev_e4": pa.array(np.bincount(
                inv, weights=rv, minlength=len(keys)).astype(np.int64)),
        })

    # per-batch partials are ≤ #nations-in-region rows each, and the
    # result was collected driver-side anyway — the hash aggregate
    # between them was pure spin-up (round-5 per-operation-cost
    # lesson); the driver merge is bounded by #nations × #blocks
    parts = to_local_table(j.map_batches(partial, batch_format="pyarrow",
                                         zero_copy_batch=True))
    if parts is None or parts.num_rows == 0:
        return pa.schema([("n_name", pa.string()),
                          ("revenue_e4", pa.int64())]).empty_table()
    nk_p = parts.column("n_nationkey").to_numpy()
    rv_p = parts.column("rev_e4").to_numpy()
    keys, inv = np.unique(nk_p, return_inverse=True)
    tot = np.zeros(len(keys), np.int64)
    np.add.at(tot, inv, rv_p)
    pos = pc.index_in(pa.array(keys.astype(np.int64)),
                      value_set=nation_keys.combine_chunks())
    res = pa.table({
        "n_name": nat.column("n_name").take(pos),
        "revenue_e4": pa.array(tot, pa.int64()),
    })
    order = pc.sort_indices(res, sort_keys=[("revenue_e4", "descending"),
                                            ("n_name", "ascending")])
    return res.take(order)


def q14_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape: share of revenue from PROMO-type parts, in
    basis points (integer). lineitem probes the part type map through
    the tiered ``lookup_join``; per-batch partials keep only two int64
    counters per batch; the driver sees one row.
    Output: (promo_rev_e4, total_rev_e4, promo_bps)."""
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join, \
        to_local_table

    cfg = DEFAULT_CONFIG
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda b: pa.table({"l_partkey": b.column("p_partkey"),
                            "is_promo": pc.equal(b.column("p_type"),
                                                 "PROMO")}),
        batch_format="pyarrow", zero_copy_batch=True)
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount"]).map_batches(
        lambda b: pa.table({"l_partkey": b.column("l_partkey"),
                            "rev_e4": _rev_e4(b)}),
        batch_format="pyarrow", zero_copy_batch=True)
    j = lookup_join(li, part, on="l_partkey", cfg=cfg)

    def partial(b: pa.Table) -> pa.Table:
        rv = b.column("rev_e4").to_numpy()
        promo = b.column("is_promo").to_numpy(zero_copy_only=False)
        return pa.table({
            "promo_rev_e4": pa.array([int(rv[promo].sum())], pa.int64()),
            "total_rev_e4": pa.array([int(rv.sum())], pa.int64()),
        })

    agg = j.map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True)
    t = to_local_table(agg)
    if t is None or t.num_rows == 0:
        promo_s = total_s = 0
    else:
        promo_s = int(pc.sum(t.column("promo_rev_e4")).as_py() or 0)
        total_s = int(pc.sum(t.column("total_rev_e4")).as_py() or 0)
    bps = promo_s * 10000 // total_s if total_s else 0
    return pa.table({"promo_rev_e4": pa.array([promo_s], pa.int64()),
                     "total_rev_e4": pa.array([total_s], pa.int64()),
                     "promo_bps": pa.array([bps], pa.int64())})


def q18_large_orders(sf_dir: str, threshold: int = 300, k: int = 100):
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds the
    threshold (GROUP BY + HAVING), enriched with customer names — the
    big-table groupby feeding a selective join back. Quantities are
    whole numbers, so the sum is exact int64. Per-batch quantity
    partials collapse before the orderkey shuffle; the surviving
    (tiny) order set joins orders and customer through the tiered
    ``lookup_join``. Output: (c_name, c_custkey, o_orderkey,
    o_orderdate, total_e2, sum_qty) top-k by (total_e2 DESC,
    o_orderkey)."""
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    cfg = DEFAULT_CONFIG

    def qty_partial(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy()
        q = np.rint(b.column("l_quantity").to_numpy()).astype(np.int64)
        keys, inv = np.unique(ok, return_inverse=True)
        return pa.table({
            "o_orderkey": pa.array(keys.astype(np.int64)),
            "sum_qty": pa.array(np.bincount(inv, weights=q,
                                            minlength=len(keys)
                                            ).astype(np.int64)),
        })

    big = (_read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
           .map_batches(qty_partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("o_orderkey").aggregate(Sum("sum_qty",
                                                alias_name="sum_qty"))
           .map_batches(
               lambda b: b.filter(pc.greater(b.column("sum_qty"),
                                             threshold)),
               batch_format="pyarrow"))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_totalprice"])
    j = lookup_join(orders, big, on="o_orderkey", cfg=cfg)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        lambda b: pa.table({"o_custkey": b.column("c_custkey"),
                            "c_name": b.column("c_name")}),
        batch_format="pyarrow", zero_copy_batch=True)
    j = lookup_join(j, cust, on="o_custkey", cfg=cfg)

    def shape(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_name": b.column("c_name"),
            "c_custkey": pc.cast(b.column("o_custkey"), pa.int64()),
            "o_orderkey": pc.cast(b.column("o_orderkey"), pa.int64()),
            "o_orderdate": b.column("o_orderdate"),
            "total_e2": _e2(b.column("o_totalprice")),
            "sum_qty": pc.cast(b.column("sum_qty"), pa.int64()),
        })

    return (j.map_batches(shape, batch_format="pyarrow")
            .sort(["total_e2", "o_orderkey"], descending=[True, False])
            .limit(k))


def q17_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape: revenue of lineitems whose quantity is below 20%
    of their part's average quantity — the correlated-subquery pattern
    as a per-part aggregate joined back onto the fact table. The
    comparison ``qty < 0.2·avg`` is evaluated as EXACT integer math
    (``5·qty·n < sum_qty``, quantities are whole numbers), so Ray and
    the SQL oracle agree bit-for-bit even at the boundary. Per-part
    stats flow through the tiered ``lookup_join`` (broadcast under the
    gate); the answer is two driver scalars.
    Output: (qualifying_rows, revenue_e4)."""
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join, \
        to_local_table

    cfg = DEFAULT_CONFIG

    def part_partial(b: pa.Table) -> pa.Table:
        pk = b.column("l_partkey").to_numpy()
        q = np.rint(b.column("l_quantity").to_numpy()).astype(np.int64)
        keys, inv = np.unique(pk, return_inverse=True)
        return pa.table({
            "l_partkey": pa.array(keys.astype(np.int64)),
            "n": pa.array(np.bincount(inv, minlength=len(keys)
                                      ).astype(np.int64)),
            "s": pa.array(np.bincount(inv, weights=q, minlength=len(keys)
                                      ).astype(np.int64)),
        })

    per_part = (_read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
                .map_batches(part_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
                .groupby("l_partkey")
                .aggregate(Sum("n", alias_name="n"),
                           Sum("s", alias_name="s")))

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice",
                "l_discount"]).map_batches(
        lambda b: pa.table({
            "l_partkey": b.column("l_partkey"),
            "qty": pa.array(np.rint(b.column("l_quantity").to_numpy()
                                    ).astype(np.int64)),
            "rev_e4": _rev_e4(b)}),
        batch_format="pyarrow", zero_copy_batch=True)
    j = lookup_join(li, per_part, on="l_partkey", cfg=cfg)

    def partial(b: pa.Table) -> pa.Table:
        q = b.column("qty").to_numpy()
        n = b.column("n").to_numpy().astype(np.int64)
        s = b.column("s").to_numpy().astype(np.int64)
        m = 5 * q * n < s
        rv = b.column("rev_e4").to_numpy()
        return pa.table({
            "rows": pa.array([int(m.sum())], pa.int64()),
            "rev_e4": pa.array([int(rv[m].sum())], pa.int64()),
        })

    t = to_local_table(j.map_batches(partial, batch_format="pyarrow",
                                     zero_copy_batch=True))
    rows = int(pc.sum(t.column("rows")).as_py() or 0) if t is not None else 0
    rev = int(pc.sum(t.column("rev_e4")).as_py() or 0) if t is not None else 0
    return pa.table({"qualifying_rows": pa.array([rows], pa.int64()),
                     "revenue_e4": pa.array([rev], pa.int64())})


def orders_cube(sf_dir: str):
    """GROUP BY CUBE(year, priority) over orders — all four grouping
    sets from ONE shuffle. Same partial-aggregate-reuse shape as
    ``orders_rollup`` (the finest (year, priority) aggregate is bounded
    by the key domain, so the three coarser levels are driver-side
    numpy passes over a provably tiny table). ``lvl`` encodes the
    grouping mask (grouping(year)·2 + grouping(priority): 0 finest, 1
    per-year, 2 per-priority, 3 grand total); sentinels (-1 / 'ALL')
    replace SQL's NULLs. Output: (lvl, o_year, o_orderpriority,
    n_orders, total_e2)."""
    from fuzzy_dedupe_pipeline_ray.sources.io import to_local_table

    orders = _read(sf_dir, "orders",
                   ["o_orderdate", "o_orderpriority", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        y = pc.year(b.column("o_orderdate")).to_numpy().astype(np.int64)
        p = b.column("o_orderpriority").combine_chunks()
        enc = pc.dictionary_encode(p)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices, np.int64)
        cents = _e2(b.column("o_totalprice")).to_numpy()
        order = np.lexsort((codes, y))
        y_s, c_s, v_s = y[order], codes[order], cents[order]
        idx = np.flatnonzero(
            np.r_[True, (y_s[1:] != y_s[:-1]) | (c_s[1:] != c_s[:-1])])
        cs = np.zeros(len(v_s) + 1, np.int64)
        np.cumsum(v_s, out=cs[1:])
        bounds = np.r_[idx, len(y_s)]
        return pa.table({
            "o_year": pa.array(y_s[idx], pa.int64()),
            "o_orderpriority": enc.dictionary.take(pa.array(c_s[idx])),
            "n": pa.array(np.diff(bounds).astype(np.int64)),
            "cents": pa.array(cs[bounds[1:]] - cs[bounds[:-1]]),
        })

    fin = (orders.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby(["o_year", "o_orderpriority"])
           .aggregate(Sum("n", alias_name="n"),
                      Sum("cents", alias_name="cents")))
    tbl = to_local_table(fin)
    if tbl is None or tbl.num_rows == 0:
        return pa.schema([("lvl", pa.int64()), ("o_year", pa.int64()),
                          ("o_orderpriority", pa.string()),
                          ("n_orders", pa.int64()),
                          ("total_e2", pa.int64())]).empty_table()
    y = tbl.column("o_year").to_numpy().astype(np.int64)
    p = np.asarray(tbl.column("o_orderpriority").to_numpy(
        zero_copy_only=False), object)
    n = tbl.column("n").to_numpy().astype(np.int64)
    v = tbl.column("cents").to_numpy().astype(np.int64)

    def level(keys_y, keys_p, lvl):
        order = np.lexsort((keys_p, keys_y))
        ys, ps, ns, vs = keys_y[order], keys_p[order], n[order], v[order]
        idx = np.flatnonzero(
            np.r_[True, (ys[1:] != ys[:-1]) | (ps[1:] != ps[:-1])])
        csn = np.zeros(len(ns) + 1, np.int64)
        np.cumsum(ns, out=csn[1:])
        csv = np.zeros(len(vs) + 1, np.int64)
        np.cumsum(vs, out=csv[1:])
        bounds = np.r_[idx, len(ys)]
        return pa.table({
            "lvl": pa.array(np.full(len(idx), lvl, np.int64)),
            "o_year": pa.array(ys[idx].astype(np.int64)),
            "o_orderpriority": pa.array(list(ps[idx]), pa.string()),
            "n_orders": pa.array(csn[bounds[1:]] - csn[bounds[:-1]]),
            "total_e2": pa.array(csv[bounds[1:]] - csv[bounds[:-1]]),
        })

    all_p = np.asarray(["ALL"] * len(p), object)
    all_y = np.full(len(y), -1, np.int64)
    return pa.concat_tables([
        level(y, p, 0),            # (year, priority)
        level(y, all_p, 1),        # per-year      (grouping(p)=1)
        level(all_y, p, 2),        # per-priority  (grouping(y)=1)
        level(all_y, all_p, 3),    # grand total
    ])


def events_value_delta(sf_dir: str):
    """Per-user LAG delta: each event's cent-value minus the user's
    previous event's (NULL on a user's first event) — the lag/lead
    window family on the shared sorted-block scaffold. The only
    cross-block state is one (user, cents) pair per block boundary;
    deltas are a numpy shifted-subtract per block. Output: (user_id,
    event_id, cents, delta_e2)."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                             pa.int64()),
            "event_id": b.column("event_id"),
            "cents": _e2(b.column("value")),
        })

    sorted_ds = (ev.map_batches(prep, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .sort(["user_id", "ts_us", "event_id"]).materialize())

    def summarize(tbl: pa.Table):
        if tbl.num_rows == 0:
            return None
        u = tbl.column("user_id").to_numpy()
        c = tbl.column("cents").to_numpy()
        return (int(u[0]), int(u[-1]), int(c[-1]))

    def scan(summaries):
        args, carry = [], None   # carry = (last_user, last_cents)
        for s in summaries:
            if s is None:
                args.append((None, None))
                continue
            first_u, last_u, last_c = s
            if carry is not None and carry[0] == first_u:
                args.append((carry[0], carry[1]))
            else:
                args.append((None, None))
            carry = (last_u, last_c)
        return args

    def label(tbl: pa.Table, cont_user, cont_cents) -> pa.Table:
        u = tbl.column("user_id").to_numpy()
        c = tbl.column("cents").to_numpy()
        prev = np.r_[np.int64(cont_cents if cont_cents is not None else 0),
                     c[:-1]]
        has_prev = np.r_[cont_user is not None and cont_user == u[0],
                         u[1:] == u[:-1]]
        delta = c - prev
        return pa.table({
            "user_id": tbl.column("user_id"),
            "event_id": tbl.column("event_id"),
            "cents": tbl.column("cents"),
            "delta_e2": pa.array(delta, pa.int64(),
                                 mask=~has_prev.astype(bool)),
        })

    labeled = _sorted_block_scan(sorted_ds, summarize, (), scan, label)
    if labeled is None:
        return pa.schema([("user_id", pa.int64()),
                          ("event_id", pa.int64()),
                          ("cents", pa.int64()),
                          ("delta_e2", pa.int64())]).empty_table()
    return labeled.sort(["user_id", "event_id"])


def events_hourly_signup_error(sf_dir: str):
    """Hourly signup counts FULL OUTER JOIN hourly error counts — the
    one join type the engine had not yet exercised (Ray's native
    ``full_outer`` hash join through the ``hash_join`` wrapper, which
    also handles the empty-side degenerations streaming-side). Hours
    where only one stream fired keep a row with the other count 0.
    Output: (hour_start, n_signup, n_error)."""
    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def side(which):
        def f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b.column("event_type"), which))
            return pa.table({
                "h": pc.floor_temporal(t.column("ts"), unit="hour")})
        return (ev.map_batches(f, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("h").aggregate(Count(alias_name=f"n_{which}")))

    j = hash_join(side("signup"), side("error"), on="h",
                  cfg=DEFAULT_CONFIG, join_type="full_outer")

    def shape(b: pa.Table) -> pa.Table:
        return pa.table({
            "hour_start": b.column("h"),
            "n_signup": pc.fill_null(
                pc.cast(b.column("n_signup"), pa.int64()), 0),
            "n_error": pc.fill_null(
                pc.cast(b.column("n_error"), pa.int64()), 0),
        })

    return j.map_batches(shape, batch_format="pyarrow").sort("hour_start")


# ---------------------------------------------------------------------------
# Rank-window family — RANK / DENSE_RANK / PERCENT_RANK / CUME_DIST
# ---------------------------------------------------------------------------

def _rank_block_summary(tbl: pa.Table):
    """Per-block summary for the rank-window scan: per-type row and
    distinct-value-run counts plus the block's first/last (type, value)
    runs, so the driver can stitch peer groups that span blocks."""
    if tbl.num_rows == 0:
        return None
    et = np.asarray(tbl.column("event_type").to_numpy(
        zero_copy_only=False), object)
    v = tbl.column("value").to_numpy()
    tb = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])     # type starts
    rb = np.flatnonzero(np.r_[True, (et[1:] != et[:-1])
                              | (v[1:] != v[:-1])])         # value runs
    rows_per_type = np.diff(np.r_[tb, len(et)]).astype(np.int64)
    runs_per_type = np.diff(np.searchsorted(rb, np.r_[tb, len(et)]))
    run_bounds = np.r_[rb, len(et)]
    return (list(et[tb]), rows_per_type, runs_per_type,
            et[0], float(v[0]), int(run_bounds[1] - run_bounds[0]),
            et[-1], float(v[-1]), int(run_bounds[-1] - run_bounds[-2]),
            int(rb.size))


def _rank_block_labels(tbl: pa.Table, types, starts, denses, totals,
                       cont: bool, carry: int, trail: int) -> pa.Table:
    """Assign each row its exact global RANK / DENSE_RANK numerators
    (peer-group arithmetic is per-run, then np.repeat — no Python rows).
    ``starts``/``denses``/``totals`` are aligned with ``types``; ``cont``
    + ``carry`` correct the block's first run when it continues the
    previous block's peer group; ``trail`` extends the last run's
    cumulative count into later blocks."""
    et = np.asarray(tbl.column("event_type").to_numpy(
        zero_copy_only=False), object)
    v = tbl.column("value").to_numpy()
    n = len(et)
    tb = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
    rb = np.flatnonzero(np.r_[True, (et[1:] != et[:-1])
                              | (v[1:] != v[:-1])])
    run_len = np.diff(np.r_[rb, n]).astype(np.int64)
    n_runs = len(rb)
    # map each value-run to its type index (runs are ordered; type starts
    # are a subset of run starts)
    run_type = np.searchsorted(tb, rb, side="right") - 1
    start_by_run = np.asarray([starts[t] for t in run_type], np.int64)
    dense_by_run = np.asarray([denses[t] for t in run_type], np.int64)
    total_by_run = np.asarray([totals[t] for t in run_type], np.int64)
    # local (within-type) run index and row prefix, per run
    first_of_type = np.r_[True, run_type[1:] != run_type[:-1]]
    local_dense = (np.arange(n_runs, dtype=np.int64)
                   - np.maximum.accumulate(
                       np.where(first_of_type,
                                np.arange(n_runs, dtype=np.int64), 0)) + 1)
    cum = np.zeros(n_runs + 1, np.int64)
    np.cumsum(run_len, out=cum[1:])
    type_base = np.maximum.accumulate(
        np.where(first_of_type, cum[:-1], 0))
    local_prefix = cum[:-1] - type_base          # rows before run, in type
    local_cume = cum[1:] - type_base             # rows through run end
    rnk = start_by_run + local_prefix + 1
    drnk = dense_by_run + local_dense
    cd = start_by_run + local_cume
    if cont and n_runs:
        rnk[0] -= carry
        # the first run's value was already counted as a distinct in an
        # earlier block: every run of the block's FIRST type shifts by 1
        drnk[:int(np.searchsorted(run_type, 1))] -= 1
    if n_runs:
        cd[-1] += trail
    rep = np.repeat(np.arange(n_runs), run_len)
    return pa.table({
        "event_id": tbl.column("event_id"),
        "event_type": tbl.column("event_type"),
        "rnk": pa.array(rnk[rep]),
        "drnk": pa.array(drnk[rep]),
        "pr_num": pa.array((rnk - 1)[rep]),
        "cd_num": pa.array(cd[rep]),
        "n_part": pa.array(total_by_run[rep]),
    })


def _rank_prefix_scan(summaries):
    """Driver scan for the rank-window family: forward pass accumulates
    per-type row counts / distinct-value counts and the length of the
    peer-group chain ending at each block boundary; backward pass
    computes how far each block's LAST peer group extends into later
    blocks. O(#blocks · types-per-block) state, never rows. Returns one
    label-arg tuple per block (empty tuple for None summaries)."""
    live = [(i, s) for i, s in enumerate(summaries) if s is not None]
    rows_so_far: dict = {}
    dense_so_far: dict = {}
    prev_last = None
    carried = 0
    fwd = {}
    for i, s in live:
        (types, rows_pt, runs_pt, f_t, f_v, f_len,
         l_t, l_v, l_len, n_runs) = s
        cont = prev_last == (f_t, f_v)
        fwd[i] = ([rows_so_far.get(t, 0) for t in types],
                  [dense_so_far.get(t, 0) for t in types],
                  cont, carried if cont else 0)
        for t, r, k in zip(types, rows_pt, runs_pt):
            rows_so_far[t] = rows_so_far.get(t, 0) + int(r)
            dense_so_far[t] = dense_so_far.get(t, 0) + int(k)
        if cont:
            dense_so_far[f_t] -= 1
        carried = (carried + l_len) if (cont and n_runs == 1) else l_len
        prev_last = (l_t, l_v)
    # backward pass: rows of each block's LAST run in later blocks
    trail = {}
    nxt = 0
    for i, s in reversed(live):
        trail[i] = nxt
        (types, _, _, f_t, f_v, f_len, l_t, l_v, l_len, n_runs) = s
        if fwd[i][2]:
            nxt = f_len + (nxt if n_runs == 1 else 0)
        else:
            nxt = 0
    args = []
    for i, s in enumerate(summaries):
        if s is None:
            args.append(())
            continue
        types = s[0]
        st, dn, cont, carry = fwd[i]
        args.append((types, st, dn, [rows_so_far[t] for t in types],
                     cont, carry, trail[i]))
    return args


def events_value_rank_window(sf_dir: str):
    """RANK / DENSE_RANK / PERCENT_RANK / CUME_DIST per event row over
    ``PARTITION BY event_type ORDER BY value`` — the rank-window family
    (spend percentiles, score normalization for curation).

    Exact distributed shape on the sorted-block scaffold: global
    ``sort(event_type, value, event_id)``, one tiny summary per block
    (per-type row/run counts + the boundary runs), an O(#blocks) driver
    scan that stitches peer groups spanning blocks (forward pass for
    start offsets / distinct counts / carried peer rows, backward pass
    for trailing peer rows), then one vectorized labeling task per
    block. Driver state is O(#blocks · types-per-block), never rows.

    Fraction-valued functions are emitted as EXACT integer numerators
    (repo float discipline): percent_rank = pr_num/(n_part-1),
    cume_dist = cd_num/n_part. Output: (event_id, event_type, rnk,
    drnk, pr_num, cd_num, n_part) sorted by (event_type, rnk,
    event_id)."""
    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    sorted_ds = ev.sort(["event_type", "value", "event_id"]).materialize()
    labeled = _sorted_block_scan(sorted_ds, _rank_block_summary, (),
                                 _rank_prefix_scan, _rank_block_labels)
    if labeled is None:
        return ray.data.from_arrow(pa.schema([
            ("event_id", pa.int64()), ("event_type", pa.string()),
            ("rnk", pa.int64()), ("drnk", pa.int64()),
            ("pr_num", pa.int64()), ("cd_num", pa.int64()),
            ("n_part", pa.int64())]).empty_table())
    return labeled.sort(["event_type", "rnk", "event_id"])


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch — approximate COUNT(DISTINCT) that
# merges (the 100 TB cardinality path: registers are bounded by 2^p, not
# by the row count, and merge is an elementwise max)
# ---------------------------------------------------------------------------

_HLL_P = 12  # 4096 registers; standard error 1.04/sqrt(4096) ~ 1.6%


def _clz64(v: np.ndarray) -> np.ndarray:
    """Exact vectorized count-leading-zeros over uint64 (branch ladder;
    returns 63 for v == 0 — callers special-case zero)."""
    v = v.astype(np.uint64, copy=True)
    n = np.zeros(v.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = v < (np.uint64(1) << np.uint64(64 - s))
        n += np.where(m, s, 0)
        v = np.where(m, v << np.uint64(s), v)
    return n


def _hll_partial(b: pa.Table, p: int) -> pa.Table:
    """Per-batch HLL register partials: (event_type, reg, rho) rows with
    rho already maxed within the batch — at most #types·2^p rows leave,
    typically far fewer. Flajolet et al. 2007 (+ the 64-bit-hash
    variant): reg = top p hash bits, rho = 1 + leading zeros of the
    remaining 64-p bits."""
    from fuzzy_dedupe_pipeline_ray.functions.hashing import splitmix64

    et = np.asarray(b.column("event_type").to_numpy(
        zero_copy_only=False), object)
    h = splitmix64(b.column("user_id").to_numpy().view(np.uint64))
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)
    rho = np.where(w == 0, np.int64(64 - p + 1), _clz64(w) + 1)
    # max rho per (type, reg): sort and take the last of each run
    order = np.lexsort((rho, reg, et))
    et_s, reg_s, rho_s = et[order], reg[order], rho[order]
    last = np.r_[(et_s[1:] != et_s[:-1]) | (reg_s[1:] != reg_s[:-1]), True]
    idx = np.flatnonzero(last)
    return pa.table({
        "event_type": pa.array(list(et_s[idx]), pa.string()),
        "reg": pa.array(reg_s[idx]),
        "rho": pa.array(rho_s[idx]),
    })


def _hll_estimate(rho_by_reg: np.ndarray, p: int) -> float:
    """Raw HLL estimate with the small-range linear-counting correction
    (large-range correction is unnecessary with 64-bit hashes)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-rho_by_reg.astype(np.float64)))
    zeros = int(np.sum(rho_by_reg == 0))
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return float(est)


def events_distinct_users_hll(sf_dir: str, p: int = _HLL_P):
    """Approximate distinct users per event_type (plus an 'ALL' row) via
    a mergeable HyperLogLog sketch, CHECKED against the exact distinct
    count computed by the engine's own distinct shuffle — ``hll_ok`` is
    an all-true invariant (|est − exact| ≤ 8% + 2, vs the sketch's
    1.6% standard error at p=12), and ``n_exact`` is fully
    DuckDB-oracled.

    Distributed shape: per-batch vectorized register partials
    (lexsort + run-max, ≤ #types·2^p rows per batch) → ONE tiny
    ``groupby(type, reg).max(rho)`` → a driver-local estimate over the
    ≤ #types·2^p merged registers. The 'ALL' registers are the
    elementwise max across types — demonstrating the merge property a
    multi-tenant 100 TB cardinality service relies on. The exact side
    is a (type, user) distinct shuffle + per-type count (bounded by
    true cardinality, not rows). Output: (event_type, n_exact,
    hll_ok)."""
    from fuzzy_dedupe_pipeline_ray.sources.io import to_local_table

    ev = _read(sf_dir, "events", ["event_type", "user_id"])

    # ONE events scan: the (type, user) distinct feeds BOTH sides of
    # the check. Register max-rho is idempotent under duplicates, so
    # sketching the distinct table gives bit-identical registers to
    # sketching raw events (a standalone 100 TB sketch — no exact side
    # — would map raw events directly and skip this shuffle entirely;
    # here the exact comparison already pays for it).
    #
    # Round-5 shape: the four Ray hash aggregates this query carried
    # (distinct, register merge, per-type count, global distinct) are
    # one SORT-distinct + driver-side merges of per-block partials —
    # registers are a mergeable sketch (≤ #types·2^p rows per block by
    # construction) and the count partials are run-lengths of the
    # sorted blocks; only the exact-check apparatus touches the driver,
    # bounded by true cardinality, never raw rows.
    types_tbl = to_local_table(ev.map_batches(
        lambda b: pa.table({"event_type": pa.array(sorted(set(
            b.column("event_type").to_pylist())), pa.string())}),
        batch_format="pyarrow"))
    if types_tbl is None or types_tbl.num_rows == 0:
        types_sorted = np.empty(0, object)
    else:
        types_sorted = np.unique(np.asarray(
            types_tbl.column("event_type").to_numpy(
                zero_copy_only=False), object))

    def to_tid(b: pa.Table) -> pa.Table:
        et = np.asarray(b.column("event_type").to_numpy(
            zero_copy_only=False), object)
        return pa.table({
            "tid": pa.array(np.searchsorted(types_sorted, et), pa.int64()),
            "user_id": b.column("user_id"),
        })

    du = _distinct2_sorted(
        ev.map_batches(to_tid, batch_format="pyarrow",
                       zero_copy_batch=True),
        "tid", "user_id").materialize()

    def back_to_type(b: pa.Table) -> pa.Table:
        tid = b.column("tid").to_numpy()
        return pa.table({
            "event_type": pa.array(list(types_sorted[tid]), pa.string()),
            "user_id": b.column("user_id"),
        })

    du_t = du.map_batches(back_to_type, batch_format="pyarrow")
    reg_parts = to_local_table(
        du_t.map_batches(_hll_partial, batch_format="pyarrow",
                         zero_copy_batch=True, fn_args=(p,)))
    regs = None
    if reg_parts is not None and reg_parts.num_rows:
        et_p = np.asarray(reg_parts.column("event_type").to_numpy(
            zero_copy_only=False), object)
        reg_p = reg_parts.column("reg").to_numpy()
        rho_p = reg_parts.column("rho").to_numpy()
        order = np.lexsort((rho_p, reg_p, et_p))
        et_s, reg_s, rho_s = et_p[order], reg_p[order], rho_p[order]
        last = np.r_[(et_s[1:] != et_s[:-1]) | (reg_s[1:] != reg_s[:-1]),
                     True]
        idx = np.flatnonzero(last)
        regs = pa.table({
            "event_type": pa.array(list(et_s[idx]), pa.string()),
            "reg": pa.array(reg_s[idx]),
            "rho": pa.array(rho_s[idx]),
        })

    def du_counts(b: pa.Table) -> pa.Table:
        tid = b.column("tid").to_numpy()
        idx = np.flatnonzero(np.r_[True, tid[1:] != tid[:-1]])
        return pa.table({
            "tid": pa.array(tid[idx]),
            "n": pa.array(np.diff(np.r_[idx, len(tid)]).astype(np.int64)),
        })

    def blk_users(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": pa.array(
            np.unique(b.column("user_id").to_numpy()), pa.int64())})

    cnt_parts = to_local_table(
        du.map_batches(du_counts, batch_format="pyarrow"))
    user_parts = to_local_table(
        du.map_batches(blk_users, batch_format="pyarrow"))
    exact_rows, gu = [], 0
    if cnt_parts is not None and cnt_parts.num_rows:
        tid_p = cnt_parts.column("tid").to_numpy()
        n_p = cnt_parts.column("n").to_numpy()
        order = np.argsort(tid_p, kind="stable")
        t_s, n_s = tid_p[order], n_p[order]
        idx = np.flatnonzero(np.r_[True, t_s[1:] != t_s[:-1]])
        exact_rows = [
            {"event_type": types_sorted[t_s[i]], "n": int(tot)}
            for i, tot in zip(idx, np.add.reduceat(n_s, idx))]
        # global distinct users: union of per-block unique-user arrays
        # (bounded by user cardinality × #types — the exact-check side;
        # the 100 TB answer to this question is the HLL 'ALL' row)
        gu = len(np.unique(
            user_parts.column("user_id").to_numpy()))
    exact = pa.Table.from_pylist(
        exact_rows or [],
        schema=pa.schema([("event_type", pa.string()),
                          ("n", pa.int64())]))

    schema = pa.schema([("event_type", pa.string()),
                        ("n_exact", pa.int64()), ("hll_ok", pa.bool_())])
    if regs is None or regs.num_rows == 0:
        return schema.empty_table()

    m = 1 << p
    et = np.asarray(regs.column("event_type").to_numpy(
        zero_copy_only=False), object)
    reg = regs.column("reg").to_numpy()
    rho = regs.column("rho").to_numpy()
    exact_n = {r["event_type"]: int(r["n"]) for r in exact.to_pylist()}
    exact_n["ALL"] = int(gu)

    all_regs = np.zeros(m, np.int64)
    out_t, out_n, out_ok = [], [], []
    for t in sorted(set(et)):
        sel = et == t
        dense = np.zeros(m, np.int64)
        dense[reg[sel]] = rho[sel]
        np.maximum(all_regs, dense, out=all_regs)
        est = _hll_estimate(dense, p)
        x = exact_n[t]
        out_t.append(t)
        out_n.append(x)
        out_ok.append(abs(est - x) <= 0.08 * x + 2)
    est_all = _hll_estimate(all_regs, p)
    x = exact_n["ALL"]
    rows = sorted(zip(out_t + ["ALL"], out_n + [x],
                      out_ok + [abs(est_all - x) <= 0.08 * x + 2]))
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "n_exact": pa.array([r[1] for r in rows], pa.int64()),
        "hll_ok": pa.array([r[2] for r in rows]),
    })


# ---------------------------------------------------------------------------
# Trailing 7-day distinct users (rolling DAU/WAU) — window-expanded
# distinct, the standard "WAU per day" report
# ---------------------------------------------------------------------------

def _distinct2_sorted(ds, c1: str, c2: str):
    """Distinct on two int64 columns via the SORT-based distinct
    (``lsh.distinct_pairs_sorted`` through a rename) — one range sort +
    adjacent-unique per block + one carried boundary pair, instead of a
    Ray hash aggregate (~1 s fixed spin-up regardless of rows; the
    round-5 per-operation-cost lesson). Output blocks come back sorted
    by (c1, c2)."""
    from fuzzy_dedupe_pipeline_ray.stages.lsh import distinct_pairs_sorted

    renamed = ds.select_columns([c1, c2]).rename_columns(
        {c1: "id_a", c2: "id_b"})
    out = distinct_pairs_sorted(renamed)
    return out.rename_columns({"id_a": c1, "id_b": c2})


def events_trailing_7d_users(sf_dir: str, window_days: int = 7):
    """Distinct users active in the trailing ``window_days``-day window
    ending on each observed day (the WAU-per-day report).

    Distributed shape: ONE (day, user) sort-distinct, then each
    distinct row is expanded to the ≤7 window-end days it contributes
    to (vectorized np.repeat, filtered against the broadcast tiny set
    of OBSERVED days so absent calendar days emit nothing), a second
    (window_day, user) sort-distinct, and per-block day-count partials
    merged on the driver (bounded by #days × #blocks — tiny). Expansion
    factor is bounded by the window length — no self-join, no per-day
    rescan, and no hash-aggregate spin-ups (three of them replaced by
    two range sorts + a driver merge; 3.0 → ~1.4 s at sf0.1/32 CPUs).
    Output: (day, n_users_7d)."""
    from fuzzy_dedupe_pipeline_ray.sources.io import to_local_table

    day_us = 86_400_000_000
    ev = _read(sf_dir, "events", ["ts", "user_id"])

    def du_partial(b: pa.Table) -> pa.Table:
        ts = (b.column("ts").to_numpy()
              .astype("datetime64[us]").astype(np.int64))
        day = (ts // day_us) * day_us
        u = b.column("user_id").to_numpy()
        order = np.lexsort((u, day))
        d_s, u_s = day[order], u[order]
        keep = np.r_[True, (d_s[1:] != d_s[:-1]) | (u_s[1:] != u_s[:-1])]
        return pa.table({"day": pa.array(d_s[keep], pa.int64()),
                         "user_id": pa.array(u_s[keep], pa.int64())})

    du = _distinct2_sorted(
        ev.map_batches(du_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        "day", "user_id").materialize()
    if du.count() == 0:
        return ray.data.from_arrow(pa.schema(
            [("day", pa.timestamp("us")),
             ("n_users_7d", pa.int64())]).empty_table())

    days_parts = du.map_batches(
        lambda b: pa.table({"day": pa.array(
            np.unique(b.column("day").to_numpy().astype(np.int64)))}),
        batch_format="pyarrow")
    days = np.unique(
        to_local_table(days_parts).column("day").to_numpy())

    def expand(b: pa.Table, days_sorted: np.ndarray, k: int) -> pa.Table:
        d = b.column("day").to_numpy().astype(np.int64)
        u = b.column("user_id").to_numpy()
        wd = (np.repeat(d, k)
              + np.tile(np.arange(k, dtype=np.int64) * day_us, len(d)))
        uu = np.repeat(u, k)
        pos = np.searchsorted(days_sorted, wd)
        ok = (pos < len(days_sorted)) & (
            days_sorted[np.minimum(pos, len(days_sorted) - 1)] == wd)
        return pa.table({"day": pa.array(wd[ok]),
                         "user_id": pa.array(uu[ok])})

    wau = _distinct2_sorted(
        du.map_batches(expand, batch_format="pyarrow",
                       zero_copy_batch=True,
                       fn_args=(days, window_days)),
        "day", "user_id")

    def count_partial(b: pa.Table) -> pa.Table:
        d = b.column("day").to_numpy().astype(np.int64)
        d_s = np.sort(d)
        idx = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        return pa.table({
            "day": pa.array(d_s[idx]),
            "n": pa.array(np.diff(np.r_[idx, len(d_s)]).astype(np.int64)),
        })

    # final day-count merge on the driver: #days × #blocks partial rows
    # (dozens) — the bounded-small driver merge the engine allows
    parts = to_local_table(
        wau.map_batches(count_partial, batch_format="pyarrow"))
    d = parts.column("day").to_numpy().astype(np.int64)
    n = parts.column("n").to_numpy().astype(np.int64)
    order = np.argsort(d, kind="stable")
    d_s, n_s = d[order], n[order]
    idx = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
    totals = np.add.reduceat(n_s, idx)
    return ray.data.from_arrow(pa.table({
        "day": pa.array(d_s[idx].astype("datetime64[us]")),
        "n_users_7d": pa.array(totals, pa.int64()),
    })).sort("day")


# ---------------------------------------------------------------------------
# Exact per-group MODE with deterministic ties (max count, then min value)
# ---------------------------------------------------------------------------

def events_value_mode_by_type(sf_dir: str):
    """Exact mode of the cent-scaled value per event_type; ties broken
    deterministically toward the SMALLEST value (SQL row_number over
    (count DESC, value ASC)).

    Distributed shape: per-batch (type, cents) count partials → one
    ``groupby(type, cents)`` merge (bounded by distinct values, not
    rows) → per-batch per-type best partials (lexsort argmax) → a tiny
    final per-type reduce. No group ever materializes in one task.
    Output: (event_type, mode_e2, n_mode)."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def count_partial(b: pa.Table) -> pa.Table:
        et = np.asarray(b.column("event_type").to_numpy(
            zero_copy_only=False), object)
        cents = _e2(b.column("value")).to_numpy()
        order = np.lexsort((cents, et))
        e_s, c_s = et[order], cents[order]
        idx = np.flatnonzero(
            np.r_[True, (e_s[1:] != e_s[:-1]) | (c_s[1:] != c_s[:-1])])
        return pa.table({
            "event_type": pa.array(list(e_s[idx]), pa.string()),
            "cents": pa.array(c_s[idx]),
            "n": pa.array(np.diff(np.r_[idx, len(e_s)]).astype(np.int64)),
        })

    counts = (ev.map_batches(count_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(["event_type", "cents"])
              .aggregate(Sum("n", alias_name="n"))
              .materialize())
    if counts.count() == 0:
        # schema-less empty aggregate — short-circuit with the output
        # schema (same guard as events_daily_users)
        return ray.data.from_arrow(pa.schema(
            [("event_type", pa.string()), ("mode_e2", pa.int64()),
             ("n_mode", pa.int64())]).empty_table())

    def best_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "cents": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        et = np.asarray(b.column("event_type").to_numpy(
            zero_copy_only=False), object)
        cents = b.column("cents").to_numpy().astype(np.int64)
        n = b.column("n").to_numpy().astype(np.int64)
        # best per type = last row under (type asc, n asc, -cents asc)
        order = np.lexsort((-cents, n, et))
        e_s, c_s, n_s = et[order], cents[order], n[order]
        last = np.r_[e_s[1:] != e_s[:-1], True]
        idx = np.flatnonzero(last)
        return pa.table({
            "event_type": pa.array(list(e_s[idx]), pa.string()),
            "cents": pa.array(c_s[idx]),
            "n": pa.array(n_s[idx]),
        })

    partials = counts.map_batches(best_partial, batch_format="pyarrow")

    def final(g: pa.Table) -> pa.Table:
        t = best_partial(g)
        return pa.table({"event_type": t.column("event_type"),
                         "mode_e2": t.column("cents"),
                         "n_mode": t.column("n")})

    out = partials.groupby("event_type").map_groups(
        final, batch_format="pyarrow")
    return out.sort("event_type")


# ---------------------------------------------------------------------------
# Grouped string aggregation — ordered, distinct string_agg per group
# ---------------------------------------------------------------------------

def nation_customer_segments(sf_dir: str):
    """Per nation: the sorted, distinct market segments of its
    customers, joined into one comma-separated string (grouped
    STRING_AGG — the one aggregate family the engine had not yet
    exercised; group payloads are bounded by the segment vocabulary).

    Distributed shape: broadcast-join customer→nation (25-row small
    side), ONE (nation, segment) distinct shuffle, then a per-group
    vectorized join — each group is ≤ |segment vocabulary| rows, so
    ``map_groups`` holds only the distinct strings, never the customer
    rows. Output: (n_name, segments)."""
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    cust = _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])

    j = lookup_join(
        cust.map_batches(
            lambda b: pa.table({"n_nationkey": b.column("c_nationkey"),
                                "c_mktsegment": b.column("c_mktsegment")}),
            batch_format="pyarrow", zero_copy_batch=True),
        nation, on="n_nationkey", cfg=DEFAULT_CONFIG)

    distinct = (j.groupby(["n_name", "c_mktsegment"])
                .aggregate(Count(alias_name="_n")).materialize())
    if distinct.count() == 0:
        return ray.data.from_arrow(pa.schema(
            [("n_name", pa.string()),
             ("segments", pa.string())]).empty_table())

    def agg(g: pa.Table) -> pa.Table:
        segs = sorted(set(g.column("c_mktsegment").to_pylist()))
        return pa.table({
            "n_name": pa.array([g.column("n_name")[0].as_py()],
                               pa.string()),
            "segments": pa.array([",".join(segs)], pa.string()),
        })

    return (distinct.groupby("n_name")
            .map_groups(agg, batch_format="pyarrow").sort("n_name"))


# ---------------------------------------------------------------------------
# Q4-shaped EXISTS semi-join: orders with >=1 qualifying lineitem,
# counted per priority — the big-big semi-join where only DISTINCT keys
# of the inner side ever move
# ---------------------------------------------------------------------------

def q4_priority_with_discounted_lines(sf_dir: str,
                                      date_lo: str = "1996-01-01",
                                      date_hi: str = "1996-07-01",
                                      min_discount: float = 0.08):
    """TPC-H Q4 shape (EXISTS): orders in a date window having at least
    one heavily-discounted lineitem, counted per o_orderpriority.

    Scale shape: the EXISTS side (lineitem, the biggest table) never
    joins row-for-row — it collapses to its DISTINCT qualifying
    order keys (batch-level pc.unique combiner → one narrow groupby),
    and orders semi-join that key set through the tiered lookup_join
    (broadcast under the gate, hash join above). Counting is per-batch
    partials into a ≤5-row groupby. Output: (o_orderpriority,
    n_orders)."""
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    li = _read_filtered(sf_dir, "lineitem", ["l_orderkey", "l_discount"],
                        pc.field("l_discount") > min_discount)

    def qual_keys(b: pa.Table) -> pa.Table:
        u = pc.unique(b.column("l_orderkey"))
        return pa.table({"o_orderkey": u,
                         "_m": pa.array(np.ones(len(u), np.int64))})

    # distinct qualifying keys via the sort-based distinct (the _m
    # constant rides as the second key; round-5 per-operation lesson)
    qual = _distinct2_sorted(
        li.map_batches(qual_keys, batch_format="pyarrow",
                       zero_copy_batch=True),
        "o_orderkey", "_m").materialize()

    win = _read_filtered(
        sf_dir, "orders",
        ["o_orderkey", "o_orderdate", "o_orderpriority"],
        _ts_window_expr("o_orderdate", date_lo, date_hi)).map_batches(
        lambda b: b.select(["o_orderkey", "o_orderpriority"]),
        batch_format="pyarrow", zero_copy_batch=True)
    schema = pa.schema([("o_orderpriority", pa.string()),
                        ("n_orders", pa.int64())])
    if qual.count() == 0:
        return ray.data.from_arrow(schema.empty_table())
    j = lookup_join(win, qual, on="o_orderkey", cfg=DEFAULT_CONFIG,
                    right_count=qual.count())

    def count_partial(b: pa.Table) -> pa.Table:
        p = np.asarray(b.column("o_orderpriority").to_numpy(
            zero_copy_only=False), object)
        p_s = np.sort(p)
        idx = np.flatnonzero(np.r_[True, p_s[1:] != p_s[:-1]])
        return pa.table({
            "o_orderpriority": pa.array(list(p_s[idx]), pa.string()),
            "n": pa.array(np.diff(np.r_[idx, len(p_s)]).astype(np.int64)),
        })

    # ≤5 partial rows per batch, result consumed whole — merge on the
    # driver instead of spinning a hash aggregate
    from fuzzy_dedupe_pipeline_ray.sources.io import to_local_table

    parts = to_local_table(
        j.map_batches(count_partial, batch_format="pyarrow"))
    if parts is None or parts.num_rows == 0:
        return ray.data.from_arrow(schema.empty_table())
    p = np.asarray(parts.column("o_orderpriority").to_numpy(
        zero_copy_only=False), object)
    n = parts.column("n").to_numpy()
    order = np.argsort(p, kind="stable")
    p_s, n_s = p[order], n[order]
    idx = np.flatnonzero(np.r_[True, p_s[1:] != p_s[:-1]])
    return ray.data.from_arrow(pa.table({
        "o_orderpriority": pa.array(list(p_s[idx]), pa.string()),
        "n_orders": pa.array(np.add.reduceat(n_s, idx).astype(np.int64),
                             pa.int64())}))


# ---------------------------------------------------------------------------
# Q22-shaped anti-join + global scalar threshold: rich customers with no
# orders, per nation — EXACT integer cross-multiplied average compare
# ---------------------------------------------------------------------------

def q22_idle_rich_customers(sf_dir: str, cutoff: str = "2000-01-01"):
    """TPC-H Q22 shape: customers whose balance exceeds the average
    POSITIVE balance and who have placed NO order since ``cutoff``
    (lapsed high-value accounts), counted (and their balances summed)
    per nation.

    Exactness: the `acctbal > avg(positive acctbal)` comparison is the
    integer cross-multiplication ``cents · n_pos > sum_pos_cents`` —
    no float division on either engine, so the boundary is exact (the
    oracle SQL uses the identical inequality). Scale shape: the global
    (n_pos, sum_pos) scalar is a per-batch partial reduce collected to
    two ints; orders collapse to DISTINCT custkeys; the anti-join is a
    left-outer tiered lookup_join keeping null markers; nation names
    arrive through the 25-row broadcast. Output: (n_name, n_customers,
    total_acctbal_e2)."""
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join, \
        to_local_table

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])

    def pos_partial(b: pa.Table) -> pa.Table:
        cents = _e2(b.column("c_acctbal")).to_numpy()
        pos = cents[cents > 0]
        return pa.table({"n": pa.array([len(pos)], pa.int64()),
                         "s": pa.array([int(pos.sum())], pa.int64())})

    stats = to_local_table(
        cust.map_batches(pos_partial, batch_format="pyarrow",
                         zero_copy_batch=True))
    n_pos = int(pc.sum(stats.column("n")).as_py() or 0)
    s_pos = int(pc.sum(stats.column("s")).as_py() or 0)

    schema = pa.schema([("n_name", pa.string()),
                        ("n_customers", pa.int64()),
                        ("total_acctbal_e2", pa.int64())])
    if n_pos == 0:
        return ray.data.from_arrow(schema.empty_table())

    def rich(b: pa.Table) -> pa.Table:
        cents = _e2(b.column("c_acctbal"))
        keep = pc.greater(pc.multiply(cents, pa.scalar(n_pos, pa.int64())),
                          pa.scalar(s_pos, pa.int64()))
        b = b.append_column("cents", cents).filter(keep)
        return b.select(["c_custkey", "c_nationkey", "cents"])

    rich_ds = cust.map_batches(rich, batch_format="pyarrow",
                               zero_copy_batch=True)

    def recent_keys(b: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": pc.unique(b.column("o_custkey"))})

    def recent_keys_m(b: pa.Table) -> pa.Table:
        t = recent_keys(b)
        return t.append_column(
            "_m", pa.array(np.ones(t.num_rows, np.int64)))

    ordered = _distinct2_sorted(
        _read_filtered(
            sf_dir, "orders", ["o_custkey", "o_orderdate"],
            pc.field("o_orderdate") >= np.datetime64(cutoff, "us"))
        .map_batches(recent_keys_m, batch_format="pyarrow",
                     zero_copy_batch=True),
        "c_custkey", "_m").materialize()
    if ordered.count() > 0:
        j = lookup_join(rich_ds, ordered, on="c_custkey",
                        cfg=DEFAULT_CONFIG, join_type="left_outer",
                        right_count=ordered.count())
        rich_ds = j.map_batches(
            lambda b: b.filter(pc.is_null(b.column("_m")))
                       .select(["c_custkey", "c_nationkey", "cents"]),
            batch_format="pyarrow")

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    jn = lookup_join(
        rich_ds.map_batches(
            lambda b: pa.table({"n_nationkey": b.column("c_nationkey"),
                                "cents": b.column("cents")}),
            batch_format="pyarrow"),
        nation, on="n_nationkey", cfg=DEFAULT_CONFIG)

    def partial(b: pa.Table) -> pa.Table:
        nm = np.asarray(b.column("n_name").to_numpy(
            zero_copy_only=False), object)
        c = b.column("cents").to_numpy().astype(np.int64)
        order = np.argsort(nm, kind="stable")
        nm_s, c_s = nm[order], c[order]
        idx = np.flatnonzero(np.r_[True, nm_s[1:] != nm_s[:-1]])
        cs = np.zeros(len(c_s) + 1, np.int64)
        np.cumsum(c_s, out=cs[1:])
        bounds = np.r_[idx, len(nm_s)]
        return pa.table({
            "n_name": pa.array(list(nm_s[idx]), pa.string()),
            "n": pa.array(np.diff(bounds).astype(np.int64)),
            "s": pa.array(cs[bounds[1:]] - cs[bounds[:-1]]),
        })

    # ≤25 partial rows per batch, result consumed whole — driver merge
    # instead of a hash aggregate (round-5 per-operation-cost lesson)
    parts = to_local_table(
        jn.map_batches(partial, batch_format="pyarrow"))
    if parts is None or parts.num_rows == 0:
        return ray.data.from_arrow(schema.empty_table())
    nm_p = np.asarray(parts.column("n_name").to_numpy(
        zero_copy_only=False), object)
    n_p = parts.column("n").to_numpy()
    s_p = parts.column("s").to_numpy()
    order = np.argsort(nm_p, kind="stable")
    nm_s, n_s, s_s = nm_p[order], n_p[order], s_p[order]
    idx = np.flatnonzero(np.r_[True, nm_s[1:] != nm_s[:-1]])
    return ray.data.from_arrow(pa.table({
        "n_name": pa.array(list(nm_s[idx]), pa.string()),
        "n_customers": pa.array(
            np.add.reduceat(n_s, idx).astype(np.int64), pa.int64()),
        "total_acctbal_e2": pa.array(
            np.add.reduceat(s_s, idx).astype(np.int64), pa.int64()),
    }))


# ---------------------------------------------------------------------------
# TPC-H-shaped analogs, second batch (Q7 / Q8 / Q10 / Q13 / Q15 / Q19)
# — completes the TPC-H query family expressible over the tables this
# corpus carries (no partsupp table, so Q2/Q9/Q11/Q16/Q20 are out of
# scope; Q12/Q21 need l_shipmode/l_receiptdate, absent here).
# ---------------------------------------------------------------------------

def _group_sum_partial(keys_cols: "dict[str, np.ndarray]",
                       vals: "dict[str, np.ndarray]") -> pa.Table:
    """Batch-level grouped-sum combiner over 1-2 int64 key columns:
    lexsort + run boundaries + cumsum diffs — the pre-aggregation shape
    every wide groupby here uses so the shuffle only moves partials."""
    ks = list(keys_cols.values())
    order = np.lexsort(ks[::-1])
    ks_s = [k[order] for k in ks]
    new = np.zeros(len(order), bool)
    new[:1] = True
    for k in ks_s:
        new[1:] |= k[1:] != k[:-1]
    idx = np.flatnonzero(new)
    bounds = np.r_[idx, len(order)]
    out = {n: pa.array(k[idx]) for n, k in zip(keys_cols, ks_s)}
    for n, v in vals.items():
        cs = np.zeros(len(order) + 1, np.int64)
        np.cumsum(v[order], out=cs[1:])
        out[n] = pa.array((cs[bounds[1:]] - cs[bounds[:-1]]).astype(np.int64))
    return pa.table(out)


def q7_nation_trade_volume(sf_dir: str, nation_a: str = "NATION_1",
                           nation_b: str = "NATION_2",
                           date_lo: str = "1996-01-01",
                           date_hi: str = "1998-01-01"):
    """TPC-H Q7 shape (volume shipping): revenue flowing between two
    nations — supplier in one, the ordering customer in the other — per
    ship year.

    Scale shape: both dimension maps (supplier key→nation, order
    key→customer nation) are pre-FILTERED to the two nations before the
    join, so the big-table probes drop non-qualifying rows at the first
    batch they touch; orders⋈customer and lineitem⋈orders run through
    the tiered ``lookup_join`` (broadcast under the gate, hash join
    above); revenue collapses per batch into (supp_nation, cust_nation,
    year) partials before one tiny groupby. Output: (supp_nation,
    cust_nation, l_year, revenue_e4) sorted by the three keys."""
    from fuzzy_dedupe_pipeline_ray.sources.io import (lookup_join,
                                                      to_local_table)

    cfg = DEFAULT_CONFIG
    nat = to_local_table(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    m = pc.is_in(nat.column("n_name"),
                 value_set=pa.array([nation_a, nation_b]))
    nat = nat.filter(m)
    nation_keys = nat.column("n_nationkey").combine_chunks()
    name_of = dict(zip(nat.column("n_nationkey").to_pylist(),
                       nat.column("n_name").to_pylist()))

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(
            lambda b: b.filter(pc.is_in(b.column("c_nationkey"),
                                        value_set=nation_keys)),
            batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]) \
        .map_batches(
            lambda b: pa.table({"c_custkey": b.column("o_custkey"),
                                "o_orderkey": b.column("o_orderkey")}),
            batch_format="pyarrow", zero_copy_batch=True)
    o_nat = lookup_join(orders, cust, on="c_custkey", cfg=cfg) \
        .map_batches(
            lambda b: pa.table({"o_orderkey": b.column("o_orderkey"),
                                "cust_nk": b.column("c_nationkey")}),
            batch_format="pyarrow", zero_copy_batch=True)

    li = _read_filtered(sf_dir, "lineitem",
                        ["l_orderkey", "l_suppkey", "l_shipdate",
                         "l_extendedprice", "l_discount"],
                        _ts_window_expr("l_shipdate", date_lo, date_hi))

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b.column("l_orderkey"),
            "l_suppkey": b.column("l_suppkey"),
            "l_year": pc.cast(pc.year(b.column("l_shipdate")), pa.int64()),
            "rev_e4": _rev_e4(b)})

    li = li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(
            lambda b: pa.table({
                "l_suppkey": b.column("s_suppkey"),
                "supp_nk": b.column("s_nationkey")}).filter(
                    pc.is_in(b.column("s_nationkey"),
                             value_set=nation_keys)),
            batch_format="pyarrow", zero_copy_batch=True)
    j = lookup_join(li, supp, on="l_suppkey", cfg=cfg)
    j = lookup_join(j, o_nat, on="o_orderkey", cfg=cfg)

    def partial(b: pa.Table) -> pa.Table:
        sn = b.column("supp_nk").to_numpy()
        cn = b.column("cust_nk").to_numpy()
        b = b.filter(pa.array(sn != cn))  # cross-nation pairs only
        return _group_sum_partial(
            {"supp_nk": b.column("supp_nk").to_numpy(),
             "cust_nk": b.column("cust_nk").to_numpy(),
             "l_year": b.column("l_year").to_numpy()},
            {"rev_e4": b.column("rev_e4").to_numpy()})

    schema = pa.schema([("supp_nation", pa.string()),
                        ("cust_nation", pa.string()),
                        ("l_year", pa.int64()),
                        ("revenue_e4", pa.int64())])
    # per-batch partials are bounded by #nation-pairs × #years each and
    # the result was collected driver-side anyway — drop the hash
    # aggregate between (round-5 per-operation-cost lesson) and merge
    # the packed keys on the driver
    parts = to_local_table(j.map_batches(partial, batch_format="pyarrow"))
    if parts is None or parts.num_rows == 0:
        return schema.empty_table()
    k1 = parts.column("supp_nk").to_numpy().astype(np.int64)
    k2 = parts.column("cust_nk").to_numpy().astype(np.int64)
    k3 = parts.column("l_year").to_numpy().astype(np.int64)
    rv = parts.column("rev_e4").to_numpy().astype(np.int64)
    pack = (k1 << 40) | (k2 << 20) | k3
    keys, inv = np.unique(pack, return_inverse=True)
    tot = np.zeros(len(keys), np.int64)
    np.add.at(tot, inv, rv)
    res = pa.table({
        "supp_nation": pa.array([name_of[int(k)] for k in keys >> 40]),
        "cust_nation": pa.array([name_of[int(k)]
                                 for k in (keys >> 20) & 0xFFFFF]),
        "l_year": pa.array(keys & 0xFFFFF, pa.int64()),
        "revenue_e4": pa.array(tot, pa.int64())})
    order = pc.sort_indices(res, sort_keys=[("supp_nation", "ascending"),
                                            ("cust_nation", "ascending"),
                                            ("l_year", "ascending")])
    return res.take(order)


def q8_market_share(sf_dir: str, region: str = "ASIA",
                    nation: str = "NATION_3", ptype: str = "ECONOMY",
                    date_lo: str = "1996-01-01",
                    date_hi: str = "1998-01-01"):
    """TPC-H Q8 shape (national market share): among orders placed by
    customers of one REGION for parts of one TYPE, the share of revenue
    (basis points) supplied by one NATION, per order year.

    Scale shape: part keys of the type and region-filtered customer keys
    collapse to key sets before any big-table probe; lineitem semi-joins
    the part keys, orders semi-join the customer keys — both through the
    tiered ``lookup_join``; the supplier→nation map probes as a
    broadcast flag column. Partials carry (year, nation_rev, total_rev)
    only. Output: (o_year, nation_rev_e4, total_rev_e4, share_bps)."""
    from fuzzy_dedupe_pipeline_ray.sources.io import (lookup_join,
                                                      to_local_table)

    cfg = DEFAULT_CONFIG
    reg = to_local_table(
        _read(sf_dir, "region", ["r_regionkey", "r_name"]).map_batches(
            lambda b: b.filter(pc.equal(b.column("r_name"), region)),
            batch_format="pyarrow"))
    nat = to_local_table(_read(sf_dir, "nation",
                               ["n_nationkey", "n_name", "n_regionkey"]))
    region_nation_keys = nat.filter(
        pc.is_in(nat.column("n_regionkey"),
                 value_set=reg.column("r_regionkey"))) \
        .column("n_nationkey").combine_chunks()
    target = nat.filter(pc.equal(nat.column("n_name"), nation))
    if target.num_rows == 0:
        raise ValueError(f"unknown nation {nation!r}")
    target_nk = target.column("n_nationkey")[0].as_py()

    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda b: pa.table({"l_partkey": b.column("p_partkey")}).filter(
            pc.equal(b.column("p_type"), ptype)),
        batch_format="pyarrow", zero_copy_batch=True)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(
            lambda b: pa.table({"c_custkey": b.column("c_custkey")}).filter(
                pc.is_in(b.column("c_nationkey"),
                         value_set=region_nation_keys)),
            batch_format="pyarrow", zero_copy_batch=True)

    orders = _read_filtered(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
        _ts_window_expr("o_orderdate", date_lo, date_hi)).map_batches(
        lambda b: pa.table({
            "c_custkey": b.column("o_custkey"),
            "o_orderkey": b.column("o_orderkey"),
            "o_year": pc.cast(pc.year(b.column("o_orderdate")),
                              pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    o_keep = lookup_join(orders, cust, on="c_custkey", cfg=cfg) \
        .select_columns(["o_orderkey", "o_year"])

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey",
                "l_extendedprice", "l_discount"]).map_batches(
        lambda b: pa.table({"l_partkey": b.column("l_partkey"),
                            "o_orderkey": b.column("l_orderkey"),
                            "l_suppkey": b.column("l_suppkey"),
                            "rev_e4": _rev_e4(b)}),
        batch_format="pyarrow", zero_copy_batch=True)
    j = lookup_join(li, part, on="l_partkey", cfg=cfg)
    j = lookup_join(j, o_keep, on="o_orderkey", cfg=cfg)
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(
            lambda b: pa.table({"l_suppkey": b.column("s_suppkey"),
                                "s_nationkey": b.column("s_nationkey")}),
            batch_format="pyarrow", zero_copy_batch=True)
    j = lookup_join(j, supp, on="l_suppkey", cfg=cfg)

    def partial(b: pa.Table) -> pa.Table:
        rev = b.column("rev_e4").to_numpy()
        is_nat = b.column("s_nationkey").to_numpy() == target_nk
        return _group_sum_partial(
            {"o_year": b.column("o_year").to_numpy()},
            {"nation_rev_e4": np.where(is_nat, rev, 0),
             "total_rev_e4": rev})

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby("o_year")
           .aggregate(Sum("nation_rev_e4", alias_name="nation_rev_e4"),
                      Sum("total_rev_e4", alias_name="total_rev_e4"))
           .materialize())
    schema = pa.schema([("o_year", pa.int64()),
                        ("nation_rev_e4", pa.int64()),
                        ("total_rev_e4", pa.int64()),
                        ("share_bps", pa.int64())])
    out = to_local_table(agg)
    if out is None or out.num_rows == 0:
        return schema.empty_table()
    nrev = out.column("nation_rev_e4").to_numpy().astype(np.int64)
    trev = out.column("total_rev_e4").to_numpy().astype(np.int64)
    res = pa.table({
        "o_year": pc.cast(out.column("o_year"), pa.int64()),
        "nation_rev_e4": pa.array(nrev),
        "total_rev_e4": pa.array(trev),
        "share_bps": pa.array(
            np.where(trev > 0, nrev * 10000 // np.maximum(trev, 1), 0)
            .astype(np.int64))})
    return res.take(pc.sort_indices(res, sort_keys=[("o_year",
                                                     "ascending")]))


def q10_returned_revenue(sf_dir: str, date_lo: str = "1996-01-01",
                         date_hi: str = "1996-04-01", k: int = 20):
    """TPC-H Q10 shape (returned-item reporting): top-k customers by
    revenue lost to returned lineitems (l_returnflag='R') for orders
    placed in a 3-month window, with nation name attached.

    Scale shape: the order window collapses to an (orderkey→custkey) map
    probed by the R-filtered lineitem scan via the tiered
    ``lookup_join``; revenue pre-aggregates per custkey inside each
    batch, one narrow groupby, then ONLY the k winners join customer /
    nation detail (k rows — driver-side take is constant).
    Output: (c_custkey, c_name, n_name, acctbal_e2, revenue_e4)."""
    from fuzzy_dedupe_pipeline_ray.sources.io import (lookup_join,
                                                      to_local_table)

    cfg = DEFAULT_CONFIG
    orders = _read_filtered(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
        _ts_window_expr("o_orderdate", date_lo, date_hi)).map_batches(
        lambda b: b.select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True)

    li = _read_filtered(sf_dir, "lineitem",
                        ["l_orderkey", "l_returnflag",
                         "l_extendedprice", "l_discount"],
                        pc.field("l_returnflag") == "R").map_batches(
        lambda b: pa.table({"o_orderkey": b.column("l_orderkey"),
                            "rev_e4": _rev_e4(b)}),
        batch_format="pyarrow", zero_copy_batch=True)
    j = lookup_join(li, orders, on="o_orderkey", cfg=cfg)

    agg = (j.map_batches(
        lambda b: _group_sum_partial(
            {"c_custkey": b.column("o_custkey").to_numpy()},
            {"revenue_e4": b.column("rev_e4").to_numpy()}),
        batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("revenue_e4", alias_name="revenue_e4")))
    # top-k: per-block partial top-k, then one tiny driver merge (the
    # same shape as top_customers / part_brand_topk)
    top = to_local_table(agg.map_batches(
        lambda b: b.take(pc.select_k_unstable(
            b, k, sort_keys=[("revenue_e4", "descending"),
                             ("c_custkey", "ascending")])),
        batch_format="pyarrow"))
    schema = pa.schema([("c_custkey", pa.int64()),
                        ("c_name", pa.string()), ("n_name", pa.string()),
                        ("acctbal_e2", pa.int64()),
                        ("revenue_e4", pa.int64())])
    if top is None or top.num_rows == 0:
        return schema.empty_table()
    top = top.take(pc.select_k_unstable(
        top, k, sort_keys=[("revenue_e4", "descending"),
                           ("c_custkey", "ascending")]))

    cust = to_local_table(
        _read(sf_dir, "customer",
              ["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
        .map_batches(
            lambda b: b.filter(pc.is_in(b.column("c_custkey"),
                                        value_set=top.column("c_custkey")
                                        .combine_chunks())),
            batch_format="pyarrow", zero_copy_batch=True))
    nat = to_local_table(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    pos = pc.index_in(top.column("c_custkey"),
                      value_set=cust.column("c_custkey").combine_chunks())
    npos = pc.index_in(cust.column("c_nationkey").take(pos),
                       value_set=nat.column("n_nationkey").combine_chunks())
    res = pa.table({
        "c_custkey": pc.cast(top.column("c_custkey"), pa.int64()),
        "c_name": cust.column("c_name").take(pos),
        "n_name": nat.column("n_name").take(npos),
        "acctbal_e2": _e2(cust.column("c_acctbal").take(pos)),
        "revenue_e4": pc.cast(top.column("revenue_e4"), pa.int64())})
    return res.take(pc.sort_indices(
        res, sort_keys=[("revenue_e4", "descending"),
                        ("c_custkey", "ascending")]))


def q13_order_count_distribution(sf_dir: str):
    """TPC-H Q13 shape (customer distribution): how many customers
    placed exactly N orders, INCLUDING the zero-order customers a plain
    inner join would drop.

    Scale shape: per-custkey order counts pre-aggregate inside each
    batch (no row-level shuffle); the zero bucket is computed
    arithmetically — total customers (a streaming count) minus
    customers with ≥1 order — instead of materializing a left-outer
    join of the full customer table, which at 100 TB would move every
    customer row to answer a ~50-row histogram. The AGGREGATED counts
    (≤1 row per customer) are semi-joined against the real customer
    keys through the tiered lookup_join, so orphan o_custkey values
    match the SQL left join's semantics exactly even on non-FK data.
    Output: (c_count, n_customers) sorted by n_customers DESC,
    c_count DESC (the TPC-H order)."""
    from fuzzy_dedupe_pipeline_ray.sources.io import (lookup_join,
                                                      to_local_table)

    cust_keys = _read(sf_dir, "customer", ["c_custkey"]).materialize()
    n_customers = cust_keys.count()
    per_cust = (_read(sf_dir, "orders", ["o_custkey"]).map_batches(
        lambda b: _group_sum_partial(
            {"c_custkey": b.column("o_custkey").to_numpy()},
            {"n": np.ones(b.num_rows, np.int64)}),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_custkey").aggregate(Sum("n", alias_name="c_count")))
    per_cust = lookup_join(per_cust, cust_keys, on="c_custkey",
                           cfg=DEFAULT_CONFIG, right_count=n_customers)

    hist = to_local_table(per_cust.map_batches(
        lambda b: _group_sum_partial(
            {"c_count": pc.cast(b.column("c_count"),
                                pa.int64()).to_numpy()},
            {"n_customers": np.ones(b.num_rows, np.int64)}),
        batch_format="pyarrow")
        .groupby("c_count").aggregate(Sum("n_customers",
                                          alias_name="n_customers")))
    schema = pa.schema([("c_count", pa.int64()),
                        ("n_customers", pa.int64())])
    rows = {"c_count": [], "n_customers": []}
    n_with_orders = 0
    if hist is not None and hist.num_rows:
        rows["c_count"] = hist.column("c_count").to_pylist()
        rows["n_customers"] = [int(v) for v in
                               hist.column("n_customers").to_pylist()]
        n_with_orders = sum(rows["n_customers"])
    if n_customers - n_with_orders > 0:
        rows["c_count"].append(0)
        rows["n_customers"].append(n_customers - n_with_orders)
    res = pa.table({"c_count": pa.array(rows["c_count"], pa.int64()),
                    "n_customers": pa.array(rows["n_customers"],
                                            pa.int64())},
                   schema=schema)
    return res.take(pc.sort_indices(
        res, sort_keys=[("n_customers", "descending"),
                        ("c_count", "descending")]))


def q15_top_supplier(sf_dir: str, date_lo: str = "1996-01-01",
                     date_hi: str = "1996-04-01"):
    """TPC-H Q15 shape (top supplier): the supplier(s) with MAX total
    revenue over a 3-month ship window — ties all kept, like the SQL
    view formulation.

    Scale shape: revenue per supplier pre-aggregates per batch into a
    narrow groupby; the global max is a streaming ``Dataset.aggregate``
    (no driver materialization of the per-supplier table); only the
    argmax row(s) — almost always one — gather supplier detail.
    Output: (s_suppkey, s_name, total_rev_e4)."""
    from fuzzy_dedupe_pipeline_ray.sources.io import to_local_table

    li = _read_filtered(sf_dir, "lineitem",
                        ["l_suppkey", "l_shipdate",
                         "l_extendedprice", "l_discount"],
                        _ts_window_expr("l_shipdate", date_lo,
                                        date_hi)).map_batches(
        lambda b: _group_sum_partial(
            {"s_suppkey": b.column("l_suppkey").to_numpy()},
            {"total_rev_e4": _rev_e4(b).to_numpy()}),
        batch_format="pyarrow", zero_copy_batch=True)
    per_supp = (li.groupby("s_suppkey")
                .aggregate(Sum("total_rev_e4", alias_name="total_rev_e4"))
                .materialize())
    schema = pa.schema([("s_suppkey", pa.int64()),
                        ("s_name", pa.string()),
                        ("total_rev_e4", pa.int64())])
    if per_supp.count() == 0:
        return schema.empty_table()
    best = per_supp.aggregate(Max("total_rev_e4", alias_name="m"))["m"]
    winners = to_local_table(per_supp.map_batches(
        lambda b: b.filter(pc.equal(b.column("total_rev_e4"),
                                    pa.scalar(best))),
        batch_format="pyarrow", zero_copy_batch=True))
    supp = to_local_table(
        _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
            lambda b: b.filter(pc.is_in(
                b.column("s_suppkey"),
                value_set=winners.column("s_suppkey").combine_chunks())),
            batch_format="pyarrow", zero_copy_batch=True))
    pos = pc.index_in(winners.column("s_suppkey"),
                      value_set=supp.column("s_suppkey").combine_chunks())
    res = pa.table({
        "s_suppkey": pc.cast(winners.column("s_suppkey"), pa.int64()),
        "s_name": supp.column("s_name").take(pos),
        "total_rev_e4": pc.cast(winners.column("total_rev_e4"),
                                pa.int64())})
    return res.take(pc.sort_indices(res, sort_keys=[("s_suppkey",
                                                     "ascending")]))


_Q19_ARMS = (  # (brand, size_lo, size_hi, qty_lo, qty_hi) — inclusive
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#24", 1, 15, 20, 30),
)


def q19_disjunctive_revenue(sf_dir: str, arms=_Q19_ARMS):
    """TPC-H Q19 shape (discounted revenue, disjunctive predicate):
    total revenue of lineitems whose part matches ANY of three
    (brand, size-range, quantity-range) arms.

    Scale shape: the part side collapses to a (partkey → arm bitmask)
    map holding ONLY parts that satisfy at least one arm's brand+size
    test (a small fraction of part), broadcast through the tiered
    ``lookup_join``; the quantity test per arm is a vectorized bitmask
    AND on the joined batch; one scalar sum leaves each batch.
    Output: a single row (revenue_e4)."""
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    cfg = DEFAULT_CONFIG

    def part_mask(b: pa.Table) -> pa.Table:
        brand = b.column("p_brand")
        size = b.column("p_size").to_numpy()
        bits = np.zeros(b.num_rows, np.int64)
        for i, (bname, s_lo, s_hi, _, _) in enumerate(arms):
            m = (pc.equal(brand, bname).to_numpy(zero_copy_only=False)
                 & (size >= s_lo) & (size <= s_hi))
            bits |= m.astype(np.int64) << i
        keep = bits != 0
        return pa.table({
            "l_partkey": b.column("p_partkey").filter(pa.array(keep)),
            "arm_bits": pa.array(bits[keep])})

    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_size"]).map_batches(
        part_mask, batch_format="pyarrow", zero_copy_batch=True)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity",
                "l_extendedprice", "l_discount"])
    j = lookup_join(li, part, on="l_partkey", cfg=cfg)

    def partial(b: pa.Table) -> pa.Table:
        qty = b.column("l_quantity").to_numpy()
        bits = b.column("arm_bits").to_numpy()
        hit = np.zeros(b.num_rows, bool)
        for i, (_, _, _, q_lo, q_hi) in enumerate(arms):
            hit |= ((bits >> i) & 1).astype(bool) \
                & (qty >= q_lo) & (qty <= q_hi)
        rev = _rev_e4(b).to_numpy()
        return pa.table({"revenue_e4": pa.array(
            [int(rev[hit].sum())], pa.int64())})

    total = j.map_batches(partial, batch_format="pyarrow") \
        .aggregate(Sum("revenue_e4", alias_name="revenue_e4"))
    val = int(total["revenue_e4"]) if total and \
        total.get("revenue_e4") is not None else 0
    return pa.table({"revenue_e4": pa.array([val], pa.int64())})


def events_props_extract(sf_dir: str):
    """JSON side-field extraction: parse the integer ``k`` field out of
    the events table's JSON ``props`` column with ONE vectorized Arrow
    ``extract_regex`` pass (no per-row json.loads), then aggregate
    (count, sum, min, max) per event_type.

    The regex path is deliberate: at 100 TB the props column is the
    widest part of the events table, and a C-level regex over the Arrow
    string buffer extracts a single scalar field ~10× cheaper than a
    JSON parser materializing per-row dicts. Output: (event_type, n,
    sum_k, min_k, max_k) sorted by event_type."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(b: pa.Table) -> pa.Table:
        hit = pc.extract_regex(b.column("props"),
                               pattern=r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(hit, "k"), pa.int64())
        valid = pc.is_valid(k)
        t = pa.table({"event_type": b.column("event_type"),
                      "k": k}).filter(valid)
        if t.num_rows == 0:  # block of all-malformed props
            return pa.table({"event_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "sum_k": pa.array([], pa.int64()),
                             "min_k": pa.array([], pa.int64()),
                             "max_k": pa.array([], pa.int64())})
        et = np.asarray(t.column("event_type").to_numpy(
            zero_copy_only=False), object)
        kv = t.column("k").to_numpy()
        order = np.argsort(et, kind="stable")
        et_s, k_s = et[order], kv[order]
        idx = np.flatnonzero(np.r_[True, et_s[1:] != et_s[:-1]])
        bounds = np.r_[idx, len(et_s)]
        cs = np.zeros(len(k_s) + 1, np.int64)
        np.cumsum(k_s, out=cs[1:])
        mins = np.minimum.reduceat(k_s, idx) if len(k_s) else k_s
        maxs = np.maximum.reduceat(k_s, idx) if len(k_s) else k_s
        return pa.table({
            "event_type": pa.array(list(et_s[idx]), pa.string()),
            "n": pa.array(np.diff(bounds).astype(np.int64)),
            "sum_k": pa.array(cs[bounds[1:]] - cs[bounds[:-1]]),
            "min_k": pa.array(mins.astype(np.int64)),
            "max_k": pa.array(maxs.astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sum_k", alias_name="sum_k"),
                      Min("min_k", alias_name="min_k"),
                      Max("max_k", alias_name="max_k")))
    return agg.map_batches(
        lambda b: pa.table({
            "event_type": b.column("event_type"),
            "n": pc.cast(b.column("n"), pa.int64()),
            "sum_k": pc.cast(b.column("sum_k"), pa.int64()),
            "min_k": pc.cast(b.column("min_k"), pa.int64()),
            "max_k": pc.cast(b.column("max_k"), pa.int64())}),
        batch_format="pyarrow").sort("event_type")


# ---------------------------------------------------------------------------
# TPC-H analog batch 3: Q9 / Q11 / Q12 / Q16 / Q21 shapes
# (this testdata has no partsupp table, so the partsupp-dependent queries
# substitute documented proxies: p_retailprice/2 for ps_supplycost and the
# lineitem (part, supplier) co-occurrence for the partsupp relationship)
# ---------------------------------------------------------------------------

def q9_profit_by_nation_year(sf_dir: str, name_substr: str = "ol"):
    """TPC-H Q9 shape (product-type profit): per (nation, ship-year)
    profit over parts whose name contains ``name_substr``. Profit per
    line = revenue − supply cost·quantity, with ps_supplycost proxied by
    p_retailprice/2 (no partsupp table; documented substitution). All
    arithmetic is exact e4 integers: round(price·(1−disc)·1e4) −
    round(p_retailprice·5000)·qty, qty being integer-valued.

    Distributed shape: part (filtered tiny) and supplier→nation are
    broadcast lookups into ONE lineitem pass; per-batch grouped-sum
    partials shuffle only (nation, year, partial) rows."""
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join, to_local_table

    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"]) \
        .map_batches(lambda b: (lambda t: pa.table({
            "l_partkey": t.column("p_partkey"),
            "cost_e4": pc.cast(pc.round(pc.multiply(
                pc.cast(t.column("p_retailprice"), pa.float64()),
                pa.scalar(5000.0)), round_mode="half_towards_infinity"),
                pa.int64())}))(
            b.filter(pc.match_substring(b.column("p_name"), name_substr))),
            batch_format="pyarrow", zero_copy_batch=True)
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = to_local_table(_read(sf_dir, "nation",
                               ["n_nationkey", "n_name"]))

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_shipdate", "l_quantity",
                "l_extendedprice", "l_discount"])
    li = lookup_join(li, part, on="l_partkey", cfg=DEFAULT_CONFIG)
    li = lookup_join(li, sup.rename_columns({"s_suppkey": "l_suppkey"}),
                     on="l_suppkey", cfg=DEFAULT_CONFIG)

    def partial(b: pa.Table) -> pa.Table:
        profit = (_rev_e4(b).to_numpy()
                  - b.column("cost_e4").to_numpy()
                  * pc.cast(b.column("l_quantity"),
                            pa.int64()).to_numpy())
        return _group_sum_partial(
            {"s_nationkey": b.column("s_nationkey").to_numpy()
                .astype(np.int64),
             "l_year": pc.year(b.column("l_shipdate")).to_numpy()
                .astype(np.int64)},
            {"profit_e4": profit})

    agg = (li.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["s_nationkey", "l_year"])
           .aggregate(Sum("profit_e4", alias_name="profit_e4")))

    def label(b: pa.Table) -> pa.Table:
        pos = pc.index_in(b.column("s_nationkey"),
                          value_set=nat.column("n_nationkey")
                          .combine_chunks())
        return pa.table({
            "n_name": nat.column("n_name").take(pos),
            "l_year": pc.cast(b.column("l_year"), pa.int64()),
            "profit_e4": pc.cast(b.column("profit_e4"), pa.int64()),
        })

    return agg.map_batches(label, batch_format="pyarrow").sort(
        ["n_name", "l_year"])


def q11_important_parts(sf_dir: str):
    """TPC-H Q11 shape (important stock): parts whose total revenue
    exceeds 1.5× the MEAN per-part revenue, by exact integer compare
    (2·n_parts·part_rev > 3·total_rev — no float threshold; Q11's
    absolute 0.0001-fraction cutoff selects nothing on this uniform
    synthetic data, so the analog uses a mean-relative cutoff with the
    same global-scalar-vs-per-group shape). Value proxy = lineitem
    revenue (no partsupp). Per-part sums pre-aggregate per batch; the
    global total and part count come from the per-part table (two tiny
    aggregates), never a second lineitem pass."""
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount"]).map_batches(
        lambda b: _group_sum_partial(
            {"l_partkey": b.column("l_partkey").to_numpy()},
            {"part_rev_e4": _rev_e4(b).to_numpy()}),
        batch_format="pyarrow", zero_copy_batch=True)
    per_part = (li.groupby("l_partkey")
                .aggregate(Sum("part_rev_e4", alias_name="part_rev_e4"))
                .materialize())
    schema = pa.schema([("l_partkey", pa.int64()),
                        ("part_rev_e4", pa.int64())])
    n_parts = per_part.count()
    if n_parts == 0:
        # plain Arrow table: Dataset.to_pandas drops the schema of a
        # zero-block dataset (same convention as q15_top_supplier)
        return schema.empty_table()
    total = per_part.aggregate(Sum("part_rev_e4", alias_name="t"))["t"] or 0

    def keep(b: pa.Table) -> pa.Table:
        m = pc.greater(pc.multiply(b.column("part_rev_e4"),
                                   pa.scalar(2 * n_parts, pa.int64())),
                       pa.scalar(3 * int(total), pa.int64()))
        t = b.filter(m)
        return pa.table({
            "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
            "part_rev_e4": pc.cast(t.column("part_rev_e4"), pa.int64())},
            schema=schema)

    return per_part.map_batches(keep, batch_format="pyarrow").sort(
        ["part_rev_e4", "l_partkey"], descending=[True, False])


def q12_priority_line_counts(sf_dir: str, date_lo: str = "1996-01-01",
                             date_hi: str = "1997-01-01"):
    """TPC-H Q12 shape (shipping priority classes): per l_linestatus (the
    available proxy for shipmode), count lines of HIGH-priority orders
    (1-URGENT / 2-HIGH) vs all others, over a ship-date year. One
    lineitem pass with a tiered lookup of o_orderpriority; counts are
    exact integers."""
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]) \
        .rename_columns({"o_orderkey": "l_orderkey"})
    li = _read_filtered(sf_dir, "lineitem",
                        ["l_orderkey", "l_linestatus", "l_shipdate"],
                        _ts_window_expr("l_shipdate", date_lo, date_hi))
    j = lookup_join(li, orders, on="l_orderkey", cfg=DEFAULT_CONFIG)

    def partial(b: pa.Table) -> pa.Table:
        hi = pc.is_in(b.column("o_orderpriority"),
                      value_set=pa.array(["1-URGENT", "2-HIGH"])) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        status = b.column("l_linestatus").dictionary_encode()
        if isinstance(status, pa.ChunkedArray):
            status = status.combine_chunks()
        codes = np.asarray(status.indices, np.int64)
        nl = max(len(status.dictionary), 1)
        high = np.bincount(codes, weights=hi, minlength=nl).astype(np.int64)
        low = np.bincount(codes, weights=1 - hi,
                          minlength=nl).astype(np.int64)
        return pa.table({
            "l_linestatus": pc.cast(status.dictionary, pa.string()),
            "high_line_count": pa.array(high, pa.int64()),
            "low_line_count": pa.array(low, pa.int64())})

    return (j.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
            .groupby("l_linestatus")
            .aggregate(Sum("high_line_count", alias_name="high_line_count"),
                       Sum("low_line_count", alias_name="low_line_count"))
            .map_batches(lambda b: pa.table({
                "l_linestatus": b.column("l_linestatus"),
                "high_line_count": pc.cast(b.column("high_line_count"),
                                           pa.int64()),
                "low_line_count": pc.cast(b.column("low_line_count"),
                                          pa.int64())}),
                batch_format="pyarrow")
            .sort("l_linestatus"))


_Q16_SIZES = (1, 4, 7, 10, 13, 16, 19, 22)


def q16_supplier_variety(sf_dir: str, exclude_brand: str = "Brand#5",
                         sizes=_Q16_SIZES):
    """TPC-H Q16 shape (part/supplier relationship variety): DISTINCT
    supplier count per (p_brand, p_type, p_size) over the lineitem
    co-occurrence (the partsupp proxy), excluding one brand and
    restricting to the Q16 size list. Distinct-pair dedup happens as a
    narrow 4-column groupby BEFORE the counting groupby (batch-local
    dedup first, so the shuffle moves near-distinct rows only)."""
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_type", "p_size"]).map_batches(
        lambda b: b.filter(pc.and_(
            pc.not_equal(b.column("p_brand"), exclude_brand),
            pc.is_in(b.column("p_size"),
                     value_set=pa.array(list(sizes),
                                        b.column("p_size").type)))),
        batch_format="pyarrow", zero_copy_batch=True).rename_columns(
        {"p_partkey": "l_partkey"})
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    j = lookup_join(li, part, on="l_partkey", cfg=DEFAULT_CONFIG)

    def localdedup(b: pa.Table) -> pa.Table:
        cols = ["p_brand", "p_type", "p_size", "l_suppkey"]
        return b.select(cols).group_by(cols).aggregate([])

    distinct = (j.map_batches(localdedup, batch_format="pyarrow",
                              zero_copy_batch=True)
                .groupby(["p_brand", "p_type", "p_size", "l_suppkey"])
                .aggregate(Count(alias_name="_n")))
    return (distinct.groupby(["p_brand", "p_type", "p_size"])
            .aggregate(Count(alias_name="supplier_cnt"))
            .map_batches(lambda b: pa.table({
                "p_brand": b.column("p_brand"),
                "p_type": b.column("p_type"),
                "p_size": pc.cast(b.column("p_size"), pa.int64()),
                "supplier_cnt": pc.cast(b.column("supplier_cnt"),
                                        pa.int64())}),
                batch_format="pyarrow")
            .sort(["supplier_cnt", "p_brand", "p_type", "p_size"],
                  descending=[True, False, False, False]))


def q21_only_returned_supplier(sf_dir: str):
    """TPC-H Q21 shape (suppliers who kept orders waiting), mapped onto
    the available columns: in orders served by ≥2 DISTINCT suppliers
    where EXACTLY ONE supplier has a returned line (l_returnflag='R'),
    that supplier takes the blame; numwait = blamed orders per supplier.
    The EXISTS (another supplier) / NOT-EXISTS (another failing
    supplier) pair becomes two distinct-count conditions on one narrow
    (orderkey, suppkey, had_r) groupby — no per-order subquery.

    Output: (s_suppkey, s_name, numwait), numwait DESC / suppkey ASC."""
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join, to_local_table

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_returnflag"])

    def pairs(b: pa.Table) -> pa.Table:
        r = pc.equal(b.column("l_returnflag"), "R").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return _group_sum_partial(
            {"l_orderkey": b.column("l_orderkey").to_numpy(),
             "l_suppkey": b.column("l_suppkey").to_numpy()},
            {"had_r": r})

    per_os = (li.map_batches(pairs, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(["l_orderkey", "l_suppkey"])
              .aggregate(Sum("had_r", alias_name="had_r")))

    def order_partial(b: pa.Table) -> pa.Table:
        """(order, supplier, had_r>0) rows → per-order partials:
        supplier count, R-supplier count, and the R-supplier key (sum —
        exact when the R-count is 1, which is the only case kept)."""
        r = (b.column("had_r").to_numpy() > 0).astype(np.int64)
        sup = b.column("l_suppkey").to_numpy().astype(np.int64)
        return _group_sum_partial(
            {"l_orderkey": b.column("l_orderkey").to_numpy()},
            {"n_supp": np.ones(len(sup), np.int64), "n_r": r,
             "r_key_sum": sup * r})

    per_order = (per_os.map_batches(order_partial, batch_format="pyarrow",
                                    zero_copy_batch=True)
                 .groupby("l_orderkey")
                 .aggregate(Sum("n_supp", alias_name="n_supp"),
                            Sum("n_r", alias_name="n_r"),
                            Sum("r_key_sum", alias_name="r_key_sum")))

    def blame(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b.column("n_supp"), 2),
                    pc.equal(b.column("n_r"), 1))
        t = b.filter(m)
        return _group_sum_partial(
            {"s_suppkey": t.column("r_key_sum").to_numpy()
                .astype(np.int64)},
            {"numwait": np.ones(t.num_rows, np.int64)})

    per_supp = (per_order.map_batches(blame, batch_format="pyarrow",
                                      zero_copy_batch=True)
                .groupby("s_suppkey")
                .aggregate(Sum("numwait", alias_name="numwait")))
    names = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    j = lookup_join(per_supp, names, on="s_suppkey", cfg=DEFAULT_CONFIG)
    return (j.map_batches(lambda b: pa.table({
        "s_suppkey": pc.cast(b.column("s_suppkey"), pa.int64()),
        "s_name": b.column("s_name"),
        "numwait": pc.cast(b.column("numwait"), pa.int64())}),
        batch_format="pyarrow")
        .sort(["numwait", "s_suppkey"], descending=[True, False]))


DEDUP_WINDOW_MINUTES = 10


def events_dedup_within_window(sf_dir: str,
                               window_minutes: int = DEDUP_WINDOW_MINUTES):
    """Streaming-shaped event debounce: drop an event when the SAME
    (user_id, event_type) occurred within the preceding
    ``window_minutes`` (previous OCCURRENCE, kept or not — the LAG
    debounce, exactly `lag(ts) OVER (PARTITION BY user, type ORDER BY
    ts, event_id)`). The at-least-once-delivery dedup pass an event
    pipeline runs before aggregation.

    Same sorted-block scaffold as the lag/rolling family: the only
    cross-block state is one (user, type, last_ts) triple per boundary.
    Output: the KEPT rows (user_id, event_type, event_id)."""
    win_us = np.int64(window_minutes) * 60_000_000
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts",
                                  "event_id"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "event_type": b.column("event_type"),
            "ts_us": pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                             pa.int64()),
            "event_id": b.column("event_id"),
        })

    sorted_ds = (ev.map_batches(prep, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .sort(["user_id", "event_type", "ts_us", "event_id"])
                 .materialize())

    def summarize(tbl: pa.Table):
        if tbl.num_rows == 0:
            return None
        u = tbl.column("user_id").to_numpy()
        t = tbl.column("event_type")
        ts = tbl.column("ts_us").to_numpy()
        return (int(u[0]), t[0].as_py(), int(u[-1]), t[-1].as_py(),
                int(ts[-1]))

    def scan(summaries):
        args, carry = [], None   # carry = (last_user, last_type, last_ts)
        for s in summaries:
            if s is None:
                args.append((None, None, None))
                continue
            fu, ft, lu, lt, lts = s
            if carry is not None and carry[0] == fu and carry[1] == ft:
                args.append(carry)
            else:
                args.append((None, None, None))
            carry = (lu, lt, lts)
        return args

    def label(tbl: pa.Table, cu, ct, cts) -> pa.Table:
        u = tbl.column("user_id").to_numpy()
        t = tbl.column("event_type")
        ts = tbl.column("ts_us").to_numpy()
        same = np.r_[False, (u[1:] == u[:-1])]
        if tbl.num_rows > 1:
            eq_t = pc.equal(t.slice(1), t.slice(0, len(t) - 1)).to_numpy(
                zero_copy_only=False)
            same[1:] &= eq_t.astype(bool)
        prev_ts = np.r_[np.int64(0), ts[:-1]]
        if cu is not None and tbl.num_rows and int(u[0]) == cu \
                and t[0].as_py() == ct:
            same[0] = True
            prev_ts[0] = cts
        keep = (~same) | (ts - prev_ts > win_us)
        sel = pa.array(np.flatnonzero(keep), pa.int64())
        return pa.table({
            "user_id": pc.cast(tbl.column("user_id").take(sel), pa.int64()),
            "event_type": tbl.column("event_type").take(sel),
            "event_id": pc.cast(tbl.column("event_id").take(sel),
                                pa.int64()),
        })

    labeled = _sorted_block_scan(sorted_ds, summarize, (), scan, label)
    if labeled is None:
        return pa.schema([("user_id", pa.int64()),
                          ("event_type", pa.string()),
                          ("event_id", pa.int64())]).empty_table()
    return labeled.sort(["user_id", "event_type", "event_id"])


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: the forecasting-revenue-change query — revenue
    that WOULD have been earned had discounts in a band been dropped:
    ``sum(l_extendedprice * l_discount)`` over one ship-date year,
    discount 5–7 cents, quantity < 24. The simplest TPC-H query, and the
    purest prune-at-the-read case: the date window is a scan-level
    parquet filter (row groups outside it never leave storage); the
    discount band re-checks on exact CENTS (never float equality) and
    quantity in-batch; each batch reduces to two int64 counters.
    Output one row: (n_lines, revenue_e4)."""
    from fuzzy_dedupe_pipeline_ray.sources.io import to_local_table

    li = _read_filtered(
        sf_dir, "lineitem",
        ["l_extendedprice", "l_discount", "l_quantity"],
        _ts_window_expr("l_shipdate", "1997-01-01", "1998-01-01"))

    def partial(b: pa.Table) -> pa.Table:
        cents = np.asarray(_scaled_int(b.column("l_discount"), 100.0),
                           np.int64)
        qty = b.column("l_quantity").to_numpy()
        m = (cents >= 5) & (cents <= 7) & (qty < 24)
        rev = _e4(pc.multiply(b.column("l_extendedprice"),
                              b.column("l_discount")))
        return pa.table({
            "n_lines": pa.array([int(m.sum())], pa.int64()),
            "revenue_e4": pa.array([int(rev.to_numpy()[m].sum())],
                                   pa.int64()),
        })

    t = to_local_table(li.map_batches(partial, batch_format="pyarrow",
                                      zero_copy_batch=True))
    n = int(pc.sum(t.column("n_lines")).as_py() or 0) if t is not None \
        and t.num_rows else 0
    rev = int(pc.sum(t.column("revenue_e4")).as_py() or 0) if t is not None \
        and t.num_rows else 0
    return pa.table({"n_lines": pa.array([n], pa.int64()),
                     "revenue_e4": pa.array([rev], pa.int64())})


def events_conversion_latency(sf_dir: str, first: str = "signup",
                              then: str = "purchase"):
    """Per-user conversion LATENCY (the attribution metric behind the
    funnel-count op): for each user, whole seconds from their FIRST
    ``first`` event to their first ``then`` event at-or-after it.
    Output (user_id, latency_sec) for converted users only.

    Distributed shape: anchor = ``groupby(user).min(ts)`` over a
    filtered scan (one row per user); ``then``-events probe the anchor
    through the tiered ``lookup_join`` (broadcast under the gate, hash
    join above); the at-or-after test and the µs→s floor are vectorized
    int64 ops; the surviving rows collapse through a per-batch partial
    min + one tiny groupby."""
    from ray.data.aggregate import Min

    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    ev = _read(sf_dir, "events", ["ts", "user_id", "event_type"])

    def step_rows(which, col):
        def f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b.column("event_type"), which))
            ts = (t.column("ts").to_numpy()
                  .astype("datetime64[us]").astype(np.int64))
            return pa.table({"user_id": t.column("user_id"),
                             col: pa.array(ts, pa.int64())})
        return ev.map_batches(f, batch_format="pyarrow",
                              zero_copy_batch=True)

    anchor = (step_rows(first, "first_us").groupby("user_id")
              .aggregate(Min("first_us", alias_name="first_us")))
    probed = lookup_join(step_rows(then, "ts_us"), anchor,
                         on="user_id", cfg=DEFAULT_CONFIG)

    def partial_min(b: pa.Table) -> pa.Table:
        ts = b.column("ts_us").to_numpy()
        fu = b.column("first_us").to_numpy(zero_copy_only=False)
        ok = ts >= fu
        u = b.column("user_id").to_numpy()[ok]
        lat = (ts[ok] - fu[ok]) // 1_000_000
        if len(u) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "lat_part": pa.array([], pa.int64())})
        order = np.lexsort((lat, u))
        us, ls = u[order], lat[order]
        firsts = np.r_[True, us[1:] != us[:-1]]
        return pa.table({"user_id": pa.array(us[firsts], pa.int64()),
                         "lat_part": pa.array(ls[firsts], pa.int64())})

    return (probed.map_batches(partial_min, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("user_id")
            .aggregate(Min("lat_part", alias_name="latency_sec"))
            .sort("user_id"))


LATE_WATERMARK_MINUTES = 15


def events_late_arrivals(sf_dir: str,
                         watermark_minutes: int = LATE_WATERMARK_MINUTES):
    """Watermark / late-data detection, the streaming-semantics op a
    batch backfill needs to reproduce: an event is LATE when its event
    time ``ts`` is more than ``watermark_minutes`` behind the running
    maximum event time over everything that ARRIVED before it (arrival
    order = event_id). Exactly ``ts < max(ts) OVER (ORDER BY event_id
    ROWS UNBOUNDED PRECEDING AND 1 PRECEDING) - W`` — the rows a
    streaming engine would have dropped (or side-channeled) at this
    allowed-lateness setting.

    Same sorted-block scaffold as the window family: the only cross-block
    state is one running-max int64 per boundary. Output: the late rows
    (event_id, user_id, lateness_sec), sorted by event_id."""
    win_us = np.int64(watermark_minutes) * 60_000_000
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b.column("event_id"),
            "ts_us": pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                             pa.int64()),
            "user_id": b.column("user_id"),
        })

    sorted_ds = (ev.map_batches(prep, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .sort("event_id").materialize())

    def summarize(tbl: pa.Table):
        if tbl.num_rows == 0:
            return None
        return int(tbl.column("ts_us").to_numpy().max())

    def scan(summaries):
        args, carry = [], None   # carry = running max ts over prior blocks
        for s in summaries:
            args.append((carry,))
            if s is not None:
                carry = s if carry is None else max(carry, s)
        return args

    def label(tbl: pa.Table, carry) -> pa.Table:
        ts = tbl.column("ts_us").to_numpy()
        run = np.maximum.accumulate(ts)
        # EXCLUSIVE running max: shift one right, seed with the carry
        wm = np.r_[np.int64(carry if carry is not None else np.iinfo(
            np.int64).min), run[:-1]]
        if carry is not None:
            wm = np.maximum(wm, np.int64(carry))
        late = (wm != np.iinfo(np.int64).min) & (ts < wm - win_us)
        sel = pa.array(np.flatnonzero(late), pa.int64())
        return pa.table({
            "event_id": pc.cast(tbl.column("event_id").take(sel),
                                pa.int64()),
            "user_id": pc.cast(tbl.column("user_id").take(sel), pa.int64()),
            "lateness_sec": pa.array(
                (wm[late.nonzero()[0]] - ts[late]) // 1_000_000, pa.int64()),
        })

    labeled = _sorted_block_scan(sorted_ds, summarize, (), scan, label)
    if labeled is None:
        return pa.schema([("event_id", pa.int64()),
                          ("user_id", pa.int64()),
                          ("lateness_sec", pa.int64())]).empty_table()
    return labeled.sort("event_id")


LATE_FIXTURE_N = 4000
LATE_FIXTURE_VERSION = "v1"


def late_events_fixture_dir(root: str = "/tmp/fdpr_late") -> str:
    """Generate-and-cache a deterministic event stream whose ARRIVAL
    order (event_id) genuinely disagrees with event time — the driver's
    synthetic events table is perfectly time-ordered, so the watermark
    op would be vacuous over it (zero late rows proves nothing). Pure
    function of constants: true event times are a strict 37 s grid;
    every 11th event's arrival is delayed by 10+(j%40) positions, giving
    lateness 370–1,813 s around the 900 s watermark — both branches of
    the late test appear many times. The oracle SQL reads the same
    parquet path."""
    import pyarrow.parquet as pq

    d = os.path.join(root, f"{LATE_FIXTURE_VERSION}_{LATE_FIXTURE_N}")
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    n = LATE_FIXTURE_N
    j = np.arange(n, dtype=np.int64)
    shift = np.where(j % 11 == 0, 10 + (j % 40), 0)
    order = np.argsort(j + shift, kind="stable")  # arrival seq of true idx
    base = np.datetime64("2024-03-01T00:00:00", "us").astype(np.int64)
    ts_us = base + order * np.int64(37_000_000)
    tbl = pa.table({
        "event_id": pa.array(j + 1, pa.int64()),
        "ts": pa.array(ts_us, pa.timestamp("us")),
        "user_id": pa.array(order % 97, pa.int64()),
    })
    # atomic publish: a concurrent first caller must never read a torn
    # file (review finding, round 4); identical deterministic bytes make
    # last-replace-wins benign
    dest = os.path.join(d, "events.parquet")
    tmp = f"{dest}.tmp.{os.getpid()}"
    pq.write_table(tbl, tmp, row_group_size=512)
    os.replace(tmp, dest)
    with open(done, "w") as f:
        f.write(LATE_FIXTURE_VERSION)
    return d


def events_late_arrivals_fixture(sf_dir: str):
    """Driver-visible form of ``events_late_arrivals`` (``sf_dir``
    unused): runs over the deterministic out-of-order fixture, where the
    late set is non-empty by construction — the driver's events table is
    perfectly time-ordered, so running there would verify nothing."""
    return events_late_arrivals(late_events_fixture_dir())


def events_key_skew_report(sf_dir: str, key: str = "user_id"):
    """Shuffle-planning SKEW diagnostic for a prospective groupby/join
    key — the question every wide-stage design in this repo starts with
    ("is this key safe, or does it need salting/star-capping?"): key
    cardinality, row count, the hottest key's absolute and e6-relative
    share, and exact p50/p99 per-key counts (the distributed-selection
    kernel, same ``quantile_disc`` convention as ``lineitem_quantiles``).
    One narrow groupby + O(#blocks) driver scalars. Output one row:
    (n_keys, n_rows, max_count, top1_share_e6, p50_count, p99_count)."""
    from fuzzy_dedupe_pipeline_ray.sources.io import to_local_table

    counts = (_read(sf_dir, "events", [key])
              .groupby(key).aggregate(Count(alias_name="n"))
              .map_batches(lambda b: pa.table({
                  "cents": pc.cast(b.column("n"), pa.int64())}),
                  batch_format="pyarrow", zero_copy_batch=True)
              .materialize())
    n_keys, qrows = _exact_cents_quantiles(counts, (0.5, 0.99))
    if n_keys == 0:
        return pa.table({c: pa.array([0], pa.int64()) for c in
                         ("n_keys", "n_rows", "max_count", "top1_share_e6",
                          "p50_count", "p99_count")})

    def partial(b: pa.Table) -> pa.Table:
        n = b.column("cents").to_numpy()
        return pa.table({"mx": pa.array([int(n.max())], pa.int64()),
                         "sm": pa.array([int(n.sum())], pa.int64())})

    t = to_local_table(counts.map_batches(partial, batch_format="pyarrow",
                                          zero_copy_batch=True))
    mx = int(pc.max(t.column("mx")).as_py())
    sm = int(pc.sum(t.column("sm")).as_py())
    q = {r[0]: r[1] for r in qrows}
    return pa.table({
        "n_keys": pa.array([n_keys], pa.int64()),
        "n_rows": pa.array([sm], pa.int64()),
        "max_count": pa.array([mx], pa.int64()),
        "top1_share_e6": pa.array([mx * 1_000_000 // sm], pa.int64()),
        "p50_count": pa.array([q[50]], pa.int64()),
        "p99_count": pa.array([q[99]], pa.int64()),
    })


def events_type_transitions(sf_dir: str):
    """Per-user event-type TRANSITION counts (the Markov/path-analysis
    aggregate behind "what do users do after X?"): count (prev_type →
    type) over each user's time-ordered events, globally. Exactly
    ``lag(event_type) OVER (PARTITION BY user ORDER BY ts, event_id)``
    then a GROUP BY over the pairs.

    Sorted-block scaffold: one (user, last_type) carry per boundary;
    each block reduces to its own tiny (from, to, n) partial via one
    dictionary-encode + bincount, and a final small groupby merges.
    Output: (from_type, to_type, n), sorted."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                             pa.int64()),
            "event_id": b.column("event_id"),
            "event_type": b.column("event_type"),
        })

    sorted_ds = (ev.map_batches(prep, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .sort(["user_id", "ts_us", "event_id"]).materialize())

    def summarize(tbl: pa.Table):
        if tbl.num_rows == 0:
            return None
        u = tbl.column("user_id")
        t = tbl.column("event_type")
        return (u[0].as_py(), t[0].as_py(),
                u[-1].as_py(), t[-1].as_py())

    def scan(summaries):
        args, carry = [], None   # carry = (last_user, last_type)
        for s in summaries:
            if s is None:
                args.append((None, None))
                continue
            fu, ft, lu, lt = s
            if carry is not None and carry[0] == fu:
                args.append(carry)
            else:
                args.append((None, None))
            carry = (lu, lt)
        return args

    def label(tbl: pa.Table, cu, ct) -> pa.Table:
        u = tbl.column("user_id").to_numpy()
        t = tbl.column("event_type").combine_chunks()
        enc = pc.dictionary_encode(t)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vocab = enc.dictionary.to_pylist()
        codes = np.asarray(enc.indices, np.int64)
        # prev code within the block; boundary row takes the carry
        prev = np.r_[np.int64(-1), codes[:-1]]
        same = np.r_[False, u[1:] == u[:-1]]
        if cu is not None and tbl.num_rows and int(u[0]) == cu:
            if ct in vocab:
                prev[0] = vocab.index(ct)
            else:
                vocab.append(ct)
                prev[0] = len(vocab) - 1
            same[0] = True
        v = len(vocab)
        pairs = prev[same] * v + codes[same]
        uniq, cnt = np.unique(pairs, return_counts=True)
        va = pa.array(vocab, pa.string())
        return pa.table({
            "from_type": va.take(pa.array(uniq // v)),
            "to_type": va.take(pa.array(uniq % v)),
            "n_part": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    labeled = _sorted_block_scan(sorted_ds, summarize, (), scan, label)
    if labeled is None:
        return pa.schema([("from_type", pa.string()),
                          ("to_type", pa.string()),
                          ("n", pa.int64())]).empty_table()
    return (labeled.groupby(["from_type", "to_type"])
            .aggregate(Sum("n_part", alias_name="n"))
            .sort(["from_type", "to_type"]))
