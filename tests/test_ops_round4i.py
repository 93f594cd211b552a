"""Round-4 batch-3 TPC-H analogs (Q9/Q11/Q12/Q16/Q21 shapes): crafted
edge-case semantics plus the forced-distributed equivalence discipline.
End-to-end DuckDB parity at sf0.001 is auto-covered by
tests/test_oracle_parity.py."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from fuzzy_dedupe_pipeline_ray.pipelines import relational

SF = "/root/testdata/sf0.001"


def _write_parts(dirname, table_name, df, n_parts):
    sub = os.path.join(dirname, f"{table_name}.parquet")
    os.makedirs(sub)
    for i, part in enumerate(np.array_split(df, n_parts)):
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       os.path.join(sub, f"part-{i:02d}.parquet"))


def test_q21_blame_semantics(ray_session, tmp_path):
    """Only multi-supplier orders with EXACTLY ONE returned supplier
    credit that supplier: single-supplier orders and two-R orders are
    excluded, clean multi-supplier orders are excluded."""
    li = pd.DataFrame({
        # order 1: suppliers 10,11; only 10 returned  -> blame 10
        # order 2: single supplier 10, returned       -> excluded
        # order 3: suppliers 10,11; both returned     -> excluded
        # order 4: suppliers 11,12; none returned     -> excluded
        # order 5: suppliers 12,10; only 10 returned (two R lines, one
        #          supplier)                          -> blame 10
        "l_orderkey": [1, 1, 2, 3, 3, 4, 4, 5, 5, 5],
        "l_suppkey": [10, 11, 10, 10, 11, 11, 12, 12, 10, 10],
        "l_returnflag": ["R", "N", "R", "R", "R", "N", "N", "N", "R", "R"],
    })
    sup = pd.DataFrame({"s_suppkey": [10, 11, 12],
                        "s_name": ["s10", "s11", "s12"],
                        "s_nationkey": [0, 0, 0],
                        "s_acctbal": [0.0, 0.0, 0.0]})
    _write_parts(tmp_path, "lineitem", li, 4)
    _write_parts(tmp_path, "supplier", sup, 1)
    out = relational.q21_only_returned_supplier(str(tmp_path)).to_pandas()
    assert out.to_dict("list") == {
        "s_suppkey": [10], "s_name": ["s10"], "numwait": [2]}


def test_q12_priority_split(ray_session, tmp_path):
    li = pd.DataFrame({
        "l_orderkey": [1, 2, 3, 4],
        "l_linestatus": ["O", "O", "F", "O"],
        "l_shipdate": pd.to_datetime(
            ["1996-02-01", "1996-03-01", "1996-04-01", "1999-01-01"]),
    })
    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4],
        "o_orderpriority": ["1-URGENT", "5-LOW", "2-HIGH", "1-URGENT"],
    })
    _write_parts(tmp_path, "lineitem", li, 2)
    _write_parts(tmp_path, "orders", orders, 2)
    out = relational.q12_priority_line_counts(str(tmp_path)).to_pandas()
    # order 4 ships outside the window and must not count
    assert out.to_dict("list") == {
        "l_linestatus": ["F", "O"],
        "high_line_count": [1, 1],
        "low_line_count": [0, 1]}


def test_q11_empty_lineitem_keeps_schema(ray_session, tmp_path):
    li = pd.DataFrame({"l_partkey": pd.Series([], dtype="int64"),
                       "l_extendedprice": pd.Series([], dtype="float64"),
                       "l_discount": pd.Series([], dtype="float64")})
    _write_parts(tmp_path, "lineitem", li, 1)
    out = relational.q11_important_parts(str(tmp_path)).to_pandas()
    assert list(out.columns) == ["l_partkey", "part_rev_e4"]
    assert len(out) == 0


def test_batch3_join_ops_distributed_tiers_match(ray_session, monkeypatch):
    """Force every broadcast gate off (the 100 TB physical plan) and
    require bit-identical results for the batch-3 join-based analogs."""
    import dataclasses

    ops = {
        "q9": relational.q9_profit_by_nation_year,
        "q12": relational.q12_priority_line_counts,
        "q16": relational.q16_supplier_variety,
        "q21": relational.q21_only_returned_supplier,
    }

    def run(f):
        return f(SF).to_pandas().reset_index(drop=True)

    base = {k: run(f) for k, f in ops.items()}
    forced = dataclasses.replace(
        relational.DEFAULT_CONFIG, broadcast_max_rows=0,
        keyed_broadcast_max_rows=0, wide_broadcast_max_rows=0,
        wide_broadcast_max_bytes=0)
    monkeypatch.setattr(relational, "DEFAULT_CONFIG", forced)
    for k, f in ops.items():
        assert run(f).equals(base[k]), k
