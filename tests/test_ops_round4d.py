"""Targeted tests for the round-4d additions: consecutive-token dedup on
crafted stutter strings (incl. empty / whitespace-only / cross-batch
boundaries), daily-users new-vs-active accounting across blocks,
rollup level reconciliation, and NTILE bucket sizing at n < tiles,
n == tiles, and skewed group sizes. Multi-block synthetic tables
exercise the cross-block paths the single-block sf0.001 parity fixture
cannot."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from fuzzy_dedupe_pipeline_ray.pipelines import relational, textops


def _write_parts(dirname, table_name, df, n_parts):
    sub = os.path.join(dirname, f"{table_name}.parquet")
    os.makedirs(sub)
    for i, part in enumerate(np.array_split(df, n_parts)):
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       os.path.join(sub, f"part-{i:02d}.parquet"))


# ---------------------------------------------------------------------------
# doc_dedup_consecutive_tokens
# ---------------------------------------------------------------------------

def _naive_dedup(text):
    toks = [t for t in text.split() if t]
    out, removed = [], 0
    for t in toks:
        if out and out[-1] == t:
            removed += 1
        else:
            out.append(t)
    return " ".join(out), len(toks), removed


def test_consecutive_token_dedup_crafted(tmp_path, ray_session):
    texts = [
        "the the the cat",           # leading run
        "a b b c c c d",             # interior runs
        "x",                         # single token
        "",                          # empty doc
        "   ",                       # whitespace-only
        "A a A",                     # case-sensitive: no dup
        "end end",                   # trailing run
        "tab\ttab  space\nspace",    # mixed whitespace separators
        "z " * 50,                   # long run, entire doc one token
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts, "lang": "en", "source": "t",
                       "n_chars": [len(t) for t in texts]})
    _write_parts(tmp_path, "documents", df, 4)
    out = (textops.doc_dedup_consecutive_tokens(str(tmp_path))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == len(texts)
    for i, t in enumerate(texts):
        clean, n_tok, n_rm = _naive_dedup(t)
        r = out.iloc[i]
        assert r.text_clean == clean, (i, t, r.text_clean, clean)
        assert r.n_tokens == n_tok and r.n_removed == n_rm, (i, t)


def test_consecutive_token_dedup_runs_never_cross_docs(tmp_path,
                                                       ray_session):
    # doc k ends with "same" and doc k+1 starts with "same": the flat
    # shifted compare must NOT treat the boundary as a duplicate
    texts = ["alpha same", "same beta", "same", "same gamma same"]
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                       "text": texts, "lang": "en", "source": "t",
                       "n_chars": [len(t) for t in texts]})
    _write_parts(tmp_path, "documents", df, 1)  # one block: shared buffer
    out = (textops.doc_dedup_consecutive_tokens(str(tmp_path))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out.text_clean) == texts  # nothing removed anywhere
    assert out.n_removed.sum() == 0


# ---------------------------------------------------------------------------
# events_daily_users
# ---------------------------------------------------------------------------

def test_daily_users_new_vs_active(tmp_path, ray_session):
    # users: 1 active day1+day2; 2 only day1; 3 only day2; 4 day3
    day = np.datetime64("2024-03-01T00:00:00", "us")
    d = np.timedelta64(86_400_000_000, "us")
    rows = [(1, day), (2, day), (1, day), (1, day + d), (3, day + d),
            (4, day + 2 * d), (1, day + 2 * d), (3, day + 2 * d)]
    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "ts": [r[1] for r in rows],
        "user_id": np.array([r[0] for r in rows], np.int64),
        "event_type": "view", "value": 1.0, "props": "{}"})
    _write_parts(tmp_path, "events", df, 3)
    out = relational.events_daily_users(str(tmp_path)).to_pandas()
    assert list(out.n_events) == [3, 2, 3]
    assert list(out.n_active_users) == [2, 2, 3]
    assert list(out.n_new_users) == [2, 1, 1]
    assert list(out.cum_users) == [2, 3, 4]


# ---------------------------------------------------------------------------
# orders_rollup
# ---------------------------------------------------------------------------

def test_rollup_levels_reconcile(tmp_path, ray_session):
    rng = np.random.default_rng(7)
    n = 500
    years = rng.integers(1995, 1999, n)
    prios = rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"], n)
    price = np.round(rng.uniform(10, 9999, n), 2)
    df = pd.DataFrame({
        "o_orderkey": np.arange(n, dtype=np.int64),
        "o_custkey": np.ones(n, np.int64),
        "o_orderstatus": "F",
        "o_totalprice": price,
        "o_orderdate": np.array([np.datetime64(f"{y}-06-01", "us")
                                 for y in years]),
        "o_orderpriority": prios})
    _write_parts(tmp_path, "orders", df, 4)
    out = relational.orders_rollup(str(tmp_path)).to_pandas()

    fin = out[out.lvl == 0]
    per_year = out[out.lvl == 1]
    grand = out[out.lvl == 2]
    assert len(grand) == 1
    assert grand.n_orders.iloc[0] == n
    assert grand.n_orders.iloc[0] == fin.n_orders.sum() \
        == per_year.n_orders.sum()
    assert grand.total_e2.iloc[0] == fin.total_e2.sum() \
        == per_year.total_e2.sum()
    # per-year rows reconcile against the finest level
    for _, r in per_year.iterrows():
        sub = fin[fin.o_year == r.o_year]
        assert r.n_orders == sub.n_orders.sum()
        assert r.total_e2 == sub.total_e2.sum()
        assert r.o_orderpriority == "ALL"
    # exact ground truth on one finest cell
    cents = np.round(price * 100).astype(np.int64)
    m = (years == 1995) & (prios == "1-URGENT")
    cell = fin[(fin.o_year == 1995) & (fin.o_orderpriority == "1-URGENT")]
    assert cell.n_orders.iloc[0] == int(m.sum())
    assert cell.total_e2.iloc[0] == int(cents[m].sum())


# ---------------------------------------------------------------------------
# events_value_ntile
# ---------------------------------------------------------------------------

def _mk_events(tmp_path, type_sizes, n_parts=3):
    rows = []
    eid = 0
    rng = np.random.default_rng(11)
    for et, k in type_sizes.items():
        for _ in range(k):
            rows.append((eid, et, float(np.round(rng.uniform(0, 100), 2))))
            eid += 1
    df = pd.DataFrame({
        "event_id": np.array([r[0] for r in rows], np.int64),
        "ts": np.datetime64("2024-01-01T00:00:00", "us"),
        "user_id": np.int64(1),
        "event_type": [r[1] for r in rows],
        "value": [r[2] for r in rows],
        "props": "{}"})
    _write_parts(tmp_path, "events", df.sample(frac=1, random_state=3),
                 n_parts)
    return df


def test_ntile_bucket_sizes(tmp_path, ray_session):
    # skewed: 103 = 4q+rem → buckets 26,26,26,25; tiny groups n<4 and n==4
    sizes = {"big": 103, "four": 4, "two": 2, "one": 1}
    df = _mk_events(tmp_path, sizes)
    out = relational.events_value_ntile(str(tmp_path)).to_pandas()
    got = {(r.event_type, r.tile): r.n for _, r in out.iterrows()}
    assert [got[("big", t)] for t in range(4)] == [26, 26, 26, 25]
    assert [got[("four", t)] for t in range(4)] == [1, 1, 1, 1]
    assert [got[("two", t)] for t in sorted(
        t for (e, t) in got if e == "two")] == [1, 1]
    assert [got[("one", t)] for t in sorted(
        t for (e, t) in got if e == "one")] == [1]
    # sums reconcile exactly against per-row integer cents
    cents = np.round(df.value.to_numpy() * 100).astype(np.int64)
    for et in sizes:
        m = df.event_type == et
        assert out[out.event_type == et].sum_value_e2.sum() \
            == int(cents[m.to_numpy()].sum())
    # bucket assignment matches a local NTILE reference on the big group
    sub = df[df.event_type == "big"].sort_values(["value", "event_id"])
    scents = np.round(sub.value.to_numpy() * 100).astype(np.int64)
    q, rem = divmod(len(sub), 4)
    ref_sizes = [q + 1] * rem + [q] * (4 - rem)
    pos = np.cumsum([0] + ref_sizes)
    for t in range(4):
        seg = scents[pos[t]:pos[t + 1]]
        row = out[(out.event_type == "big") & (out.tile == t)]
        assert row.sum_value_e2.iloc[0] == int(seg.sum())
