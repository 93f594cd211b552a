"""Round-4h additions: the second TPC-H analog batch (Q7 / Q8 / Q10 /
Q13 / Q15 / Q19) and the vectorized JSON props extractor.

The sf-dir oracle parity harness (test_oracle_parity) covers the
numbers; these tests pin the SEMANTIC edges DuckDB parity can miss on
friendly data: the Q13 zero-order bucket, Q15 max ties, Q19 rows
matching several arms at once counting exactly once, Q7 directional
split / same-nation exclusion, and malformed-JSON tolerance."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from fuzzy_dedupe_pipeline_ray.pipelines import relational
from fuzzy_dedupe_pipeline_ray.pipelines.relational import \
    _group_sum_partial


def _write(dirname, table_name, df):
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(dirname, f"{table_name}.parquet"))


def _nation(tmp, n=3):
    _write(tmp, "nation", pd.DataFrame({
        "n_nationkey": np.arange(n, dtype=np.int64),
        "n_name": [f"NATION_{i}" for i in range(n)],
        "n_regionkey": np.zeros(n, np.int64)}))


def test_group_sum_partial_multikey_and_empty():
    a = np.array([2, 1, 2, 1, 2], np.int64)
    b = np.array([9, 9, 9, 8, 9], np.int64)
    v = np.array([10, 20, 30, 40, 50], np.int64)
    t = _group_sum_partial({"a": a, "b": b}, {"v": v})
    got = {(r["a"], r["b"]): r["v"] for r in t.to_pylist()}
    assert got == {(1, 8): 40, (1, 9): 20, (2, 9): 90}

    empty = _group_sum_partial(
        {"a": np.array([], np.int64)}, {"v": np.array([], np.int64)})
    assert empty.num_rows == 0
    assert empty.schema.field("a").type == pa.int64()


def _ts(s):
    return np.datetime64(s, "us")


def test_q7_directional_split_and_same_nation_excluded(tmp_path,
                                                       ray_session):
    tmp = str(tmp_path)
    _nation(tmp)
    _write(tmp, "supplier", pd.DataFrame({
        "s_suppkey": np.array([10, 20, 30], np.int64),
        "s_name": ["s10", "s20", "s30"],
        "s_nationkey": np.array([1, 2, 0], np.int64),
        "s_acctbal": [0.0, 0.0, 0.0]}))
    _write(tmp, "customer", pd.DataFrame({
        "c_custkey": np.array([1, 2, 3], np.int64),
        "c_name": ["c1", "c2", "c3"],
        "c_nationkey": np.array([1, 2, 0], np.int64),
        "c_acctbal": [0.0, 0.0, 0.0],
        "c_mktsegment": ["A", "A", "A"]}))
    _write(tmp, "orders", pd.DataFrame({
        "o_orderkey": np.array([100, 200, 300], np.int64),
        "o_custkey": np.array([2, 1, 3], np.int64),
        "o_orderstatus": ["F"] * 3,
        "o_totalprice": [1.0] * 3,
        "o_orderdate": np.array([_ts("1996-02-01")] * 3),
        "o_orderpriority": ["1-URGENT"] * 3}))
    # (orderkey, suppkey, price, shipdate):
    #  o100(cust nation2) × s10(nation1) 1996 → 1→2
    #  o100(cust nation2) × s10(nation1) 1997 → 1→2, second year bucket
    #  o200(cust nation1) × s20(nation2)      → 2→1
    #  o100(cust nation2) × s20(nation2)      → same nation, EXCLUDED
    #  o300(cust nation0) × s10               → customer outside pair
    #  o200 × s10 shipped 1995                → outside date window
    li = [(100, 10, 100.0, "1996-03-01"), (100, 10, 50.0, "1997-03-01"),
          (200, 20, 30.0, "1996-06-01"), (100, 20, 999.0, "1996-07-01"),
          (300, 10, 999.0, "1996-08-01"), (200, 10, 999.0, "1995-03-01")]
    _write(tmp, "lineitem", pd.DataFrame({
        "l_orderkey": np.array([r[0] for r in li], np.int64),
        "l_partkey": np.zeros(len(li), np.int64),
        "l_suppkey": np.array([r[1] for r in li], np.int64),
        "l_linenumber": np.arange(len(li), dtype=np.int64),
        "l_quantity": np.ones(len(li)),
        "l_extendedprice": np.array([r[2] for r in li]),
        "l_discount": np.zeros(len(li)),
        "l_tax": np.zeros(len(li)),
        "l_returnflag": ["N"] * len(li),
        "l_linestatus": ["O"] * len(li),
        "l_shipdate": np.array([_ts(r[3]) for r in li])}))

    out = relational.q7_nation_trade_volume(tmp).to_pylist()
    assert out == [
        {"supp_nation": "NATION_1", "cust_nation": "NATION_2",
         "l_year": 1996, "revenue_e4": 100_0000},
        {"supp_nation": "NATION_1", "cust_nation": "NATION_2",
         "l_year": 1997, "revenue_e4": 50_0000},
        {"supp_nation": "NATION_2", "cust_nation": "NATION_1",
         "l_year": 1996, "revenue_e4": 30_0000},
    ]


def test_q13_zero_order_bucket(tmp_path, ray_session):
    tmp = str(tmp_path)
    _write(tmp, "customer", pd.DataFrame({
        "c_custkey": np.arange(1, 6, dtype=np.int64),
        "c_name": [f"c{i}" for i in range(1, 6)],
        "c_nationkey": np.zeros(5, np.int64),
        "c_acctbal": np.zeros(5),
        "c_mktsegment": ["A"] * 5}))
    # c1 → 3 orders, c2 → 1 order, c3/c4/c5 → none
    _write(tmp, "orders", pd.DataFrame({
        "o_orderkey": np.arange(4, dtype=np.int64),
        "o_custkey": np.array([1, 1, 1, 2], np.int64),
        "o_orderstatus": ["F"] * 4,
        "o_totalprice": np.ones(4),
        "o_orderdate": np.array([_ts("1996-01-01")] * 4),
        "o_orderpriority": ["1-URGENT"] * 4}))
    out = relational.q13_order_count_distribution(tmp).to_pylist()
    assert out == [{"c_count": 0, "n_customers": 3},
                   {"c_count": 3, "n_customers": 1},
                   {"c_count": 1, "n_customers": 1}]


def test_q15_max_ties_all_kept(tmp_path, ray_session):
    tmp = str(tmp_path)
    _write(tmp, "supplier", pd.DataFrame({
        "s_suppkey": np.array([1, 2, 3], np.int64),
        "s_name": ["sup1", "sup2", "sup3"],
        "s_nationkey": np.zeros(3, np.int64),
        "s_acctbal": np.zeros(3)}))
    # sup1: 50+50, sup2: 100 (tie), sup3: 99; one sup2 row out of window
    li = [(1, 50.0, "1996-02-01"), (1, 50.0, "1996-03-01"),
          (2, 100.0, "1996-02-15"), (3, 99.0, "1996-02-15"),
          (2, 500.0, "1996-09-01")]
    _write(tmp, "lineitem", pd.DataFrame({
        "l_orderkey": np.arange(len(li), dtype=np.int64),
        "l_partkey": np.zeros(len(li), np.int64),
        "l_suppkey": np.array([r[0] for r in li], np.int64),
        "l_linenumber": np.arange(len(li), dtype=np.int64),
        "l_quantity": np.ones(len(li)),
        "l_extendedprice": np.array([r[1] for r in li]),
        "l_discount": np.zeros(len(li)),
        "l_tax": np.zeros(len(li)),
        "l_returnflag": ["N"] * len(li),
        "l_linestatus": ["O"] * len(li),
        "l_shipdate": np.array([_ts(r[2]) for r in li])}))
    out = relational.q15_top_supplier(tmp).to_pylist()
    assert out == [
        {"s_suppkey": 1, "s_name": "sup1", "total_rev_e4": 100_0000},
        {"s_suppkey": 2, "s_name": "sup2", "total_rev_e4": 100_0000}]


def test_q19_multi_arm_row_counts_once(tmp_path, ray_session):
    """A lineitem whose part+quantity satisfies TWO overlapping arms
    contributes its revenue exactly once (the SQL disjunction
    semantics), and near-miss rows fall out per arm bounds."""
    tmp = str(tmp_path)
    arms = (("BrandX", 1, 10, 1, 5), ("BrandX", 5, 15, 3, 8))
    _write(tmp, "part", pd.DataFrame({
        "p_partkey": np.array([1, 2], np.int64),
        "p_name": ["p1", "p2"],
        "p_brand": ["BrandX", "BrandY"],
        "p_type": ["T", "T"],
        "p_size": np.array([7, 7], np.int64),  # part1 in BOTH size arms
        "p_retailprice": np.ones(2)}))
    # (partkey, qty, price): qty 4 → both arms (once); qty 6 → arm2
    # only; qty 9 → neither; BrandY never qualifies
    li = [(1, 4.0, 10.0), (1, 6.0, 100.0), (1, 9.0, 999.0),
          (2, 4.0, 999.0)]
    _write(tmp, "lineitem", pd.DataFrame({
        "l_orderkey": np.arange(len(li), dtype=np.int64),
        "l_partkey": np.array([r[0] for r in li], np.int64),
        "l_suppkey": np.zeros(len(li), np.int64),
        "l_linenumber": np.arange(len(li), dtype=np.int64),
        "l_quantity": np.array([r[1] for r in li]),
        "l_extendedprice": np.array([r[2] for r in li]),
        "l_discount": np.zeros(len(li)),
        "l_tax": np.zeros(len(li)),
        "l_returnflag": ["N"] * len(li),
        "l_linestatus": ["O"] * len(li),
        "l_shipdate": np.array([_ts("1996-02-01")] * len(li))}))
    out = relational.q19_disjunctive_revenue(tmp, arms=arms).to_pylist()
    assert out == [{"revenue_e4": 110_0000}]


def test_props_extract_malformed_json_skipped(tmp_path, ray_session):
    tmp = str(tmp_path)
    props = ['{"k": 5}', '{"k": -3}', "not json", '{"x": 1}',
             '{"k":  12}', ""]
    n = len(props)
    _write(tmp, "events", pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": np.array([_ts("2024-05-01T12:00:00")] * n),
        "user_id": np.zeros(n, np.int64),
        "event_type": pd.array(["a", "a", "a", "b", "b", "b"],
                               dtype="string"),
        "value": np.ones(n),
        "props": pd.array(props, dtype="string")}))
    out = relational.events_props_extract(tmp).to_pandas()
    got = out.set_index("event_type").to_dict("index")
    assert got == {
        "a": {"n": 2, "sum_k": 2, "min_k": -3, "max_k": 5},
        "b": {"n": 1, "sum_k": 12, "min_k": 12, "max_k": 12}}


def test_mad_by_type_known_values(tmp_path, ray_session):
    tmp = str(tmp_path)
    # type a: cents {100,200,400} → med 200 (disc), |dev| {100,0,200}
    #   → mad 100; type b: {100,300} → quantile_disc(0.5) = rank
    #   ceil(.5*2)=1 → 100; |dev| {0,200} → mad 0
    vals = [(1.00, "a"), (2.00, "a"), (4.00, "a"),
            (1.00, "b"), (3.00, "b")]
    n = len(vals)
    _write(tmp, "events", pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": np.array([_ts("2024-05-01T12:00:00")] * n),
        "user_id": np.zeros(n, np.int64),
        "event_type": pd.array([r[1] for r in vals], dtype="string"),
        "value": np.array([r[0] for r in vals]),
        "props": pd.array(["{}"] * n, dtype="string")}))
    out = relational.events_value_mad_by_type(tmp).to_pandas()
    got = out.set_index("event_type").to_dict("index")
    assert got == {"a": {"median_e2": 200, "mad_e2": 100},
                   "b": {"median_e2": 100, "mad_e2": 0}}


def _np_pagerank(vecs, ids, k=5, n_iters=3, d_pct=85,
                 scale=1_000_000_000_000):
    """Reference integer PageRank with the operator's exact formula."""
    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = m @ m.T
    np.fill_diagonal(sims, -np.inf)
    n = len(ids)
    kk = min(k, n - 1)
    # neighbors: sim DESC, neighbor id ASC
    edges = []
    for i in range(n):
        order = sorted(range(n), key=lambda j: (-sims[i, j], ids[j]))
        for j in order[:kk]:
            if j != i:
                edges.append((i, j))
    deg = np.zeros(n, np.int64)
    for u, _ in edges:
        deg[u] += 1
    base = scale // n
    tp = (100 - d_pct) * base // 100
    r = np.full(n, base, np.int64)
    for _ in range(n_iters):
        c = np.zeros(n, np.int64)
        for u, v in edges:
            c[v] += r[u] // deg[u]
        r = tp + d_pct * c // 100
    return dict(zip(ids, r))


def test_pagerank_matches_reference_and_conserves_mass(tmp_path,
                                                       ray_session):
    from fuzzy_dedupe_pipeline_ray.pipelines import ann

    tmp = str(tmp_path)
    rng = np.random.RandomState(11)
    n, d = 40, 8
    vecs = rng.randn(n, d)
    ids = np.arange(100, 100 + n, dtype=np.int64)
    _write(tmp, "embeddings", pd.DataFrame({
        "vec_id": ids,
        "embedding": [v.astype(np.float32).tolist() for v in vecs],
        "label": np.zeros(n, np.int64)}))
    out = ann.embedding_pagerank(tmp).to_pylist()
    got = {r["vec_id"]: r["rank_e12"] for r in out}
    want = _np_pagerank(vecs.astype(np.float32).astype(np.float64), ids)
    assert got == want
    # integer floor division only DROPS mass: total ≤ SCALE, and the
    # teleport floor holds for every node
    total = sum(got.values())
    assert total <= 1_000_000_000_000
    tp = (100 - 85) * (1_000_000_000_000 // n) // 100
    assert all(v >= tp for v in got.values())


def test_pagerank_single_node_teleport_only(tmp_path, ray_session):
    from fuzzy_dedupe_pipeline_ray.pipelines import ann

    tmp = str(tmp_path)
    _write(tmp, "embeddings", pd.DataFrame({
        "vec_id": np.array([7], np.int64),
        "embedding": [[1.0, 0.0]],
        "label": np.zeros(1, np.int64)}))
    out = ann.embedding_pagerank(tmp).to_pylist()
    tp = (100 - 85) * 1_000_000_000_000 // 100
    assert out == [{"vec_id": 7, "rank_e12": tp}]


def test_q13_orphan_custkey_excluded(tmp_path, ray_session):
    """An o_custkey with no customer row must NOT count (left-join
    semantics on non-FK data): the aggregated counts semi-join the real
    customer keys."""
    tmp = str(tmp_path)
    _write(tmp, "customer", pd.DataFrame({
        "c_custkey": np.array([1, 2], np.int64),
        "c_name": ["a", "b"],
        "c_nationkey": np.zeros(2, np.int64),
        "c_acctbal": np.zeros(2),
        "c_mktsegment": ["A", "A"]}))
    _write(tmp, "orders", pd.DataFrame({
        "o_orderkey": np.arange(3, dtype=np.int64),
        "o_custkey": np.array([1, 1, 99], np.int64),  # 99 is an orphan
        "o_orderstatus": ["F"] * 3,
        "o_totalprice": np.ones(3),
        "o_orderdate": np.array([_ts("1996-01-01")] * 3),
        "o_orderpriority": ["X"] * 3}))
    out = relational.q13_order_count_distribution(tmp).to_pylist()
    assert out == [{"c_count": 2, "n_customers": 1},
                   {"c_count": 0, "n_customers": 1}]
