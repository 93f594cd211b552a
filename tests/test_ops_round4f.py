"""Targeted tests for the round-4f additions: sequence packing's
distributed prefix sum across block boundaries (bins straddling blocks,
empty-table short-circuit), CUBE level accounting, and mix-weight
integer math on a skewed language distribution."""

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


def _docs_df(texts, langs=None):
    n = len(texts)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": pd.array(texts, dtype="string"),
        "lang": pd.array(langs or ["en"] * n, dtype="string"),
        "source": pd.array(["s"] * n, dtype="string"),
        "n_chars": np.array([len(t) for t in texts], np.int64)})


def test_pack_bins_straddles_blocks(tmp_path, ray_session):
    # doc i has i+1 whitespace tokens; budget 5 packs by the cumulative
    # count BEFORE each doc: before = [0,1,3,6,10,15] -> bins [0,0,0,1,2,3]
    texts = [" ".join(["tok"] * (i + 1)) for i in range(6)]
    _write_parts(tmp_path, "documents", _docs_df(texts), 4)
    out = textops.doc_pack_bins(str(tmp_path), budget=5).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out.n_tokens.tolist() == [1, 2, 3, 4, 5, 6]
    assert out.bin_id.tolist() == [0, 0, 0, 1, 2, 3]


def test_pack_bins_empty(tmp_path, ray_session):
    _write_parts(tmp_path, "documents", _docs_df([]), 1)
    out = textops.doc_pack_bins(str(tmp_path))
    assert out.num_rows == 0
    assert out.schema.names == ["doc_id", "n_tokens", "bin_id"]


def test_mix_weights_skewed(tmp_path, ray_session):
    # 8 en, 2 fr: total=10, L=2 -> en 10*1e4//(2*8)=6250, fr 25000
    texts = ["x"] * 10
    langs = ["en"] * 8 + ["fr"] * 2
    _write_parts(tmp_path, "documents", _docs_df(texts, langs), 3)
    out = textops.doc_mix_weights(str(tmp_path)).to_pandas()
    got = dict(zip(out.lang, out.weight_bps))
    assert got == {"en": 6250, "fr": 25000}
    assert dict(zip(out.lang, out.n_docs)) == {"en": 8, "fr": 2}


def test_cube_levels_consistent(tmp_path, ray_session):
    dates = np.array(["1995-03-01", "1995-07-01", "1996-01-15",
                      "1996-02-20", "1996-02-21"], dtype="datetime64[us]")
    df = pd.DataFrame({
        "o_orderkey": np.arange(5, dtype=np.int64),
        "o_custkey": np.zeros(5, np.int64),
        "o_orderstatus": pd.array(["F"] * 5, dtype="string"),
        "o_totalprice": np.array([10.0, 20.0, 30.0, 40.0, 50.0]),
        "o_orderdate": dates,
        "o_orderpriority": pd.array(["1-URGENT", "2-HIGH", "1-URGENT",
                                     "2-HIGH", "2-HIGH"], dtype="string")})
    _write_parts(tmp_path, "orders", df, 2)
    out = relational.orders_cube(str(tmp_path)).to_pandas()
    grand = out[out.lvl == 3]
    assert len(grand) == 1 and grand.n_orders.iloc[0] == 5
    assert grand.total_e2.iloc[0] == 15000
    # each level partitions the full mass
    for lvl in (0, 1, 2):
        sub = out[out.lvl == lvl]
        assert sub.n_orders.sum() == 5 and sub.total_e2.sum() == 15000
    by_prio = out[out.lvl == 2].set_index("o_orderpriority")
    assert by_prio.loc["1-URGENT", "n_orders"] == 2
    assert by_prio.loc["2-HIGH", "total_e2"] == 11000
    assert (out[out.lvl == 2].o_year == -1).all()


def _naive_lev(a, b):
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, d[0] = d[0], i
        for j in range(1, lb + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1,
                       prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[lb]


def test_banded_levenshtein_exact_with_compaction():
    from fuzzy_dedupe_pipeline_ray.pipelines.textops import \
        _banded_levenshtein

    rng = np.random.default_rng(11)
    for _ in range(120):
        k = int(rng.integers(1, 10))
        ce = int(rng.integers(1, 5))  # small check_every stresses pruning
        P = int(rng.integers(1, 6))
        pairs = []
        for _ in range(P):
            la = int(rng.integers(0, 22))
            lb = int(rng.integers(max(0, la - k - 3), la + k + 4))
            pairs.append((rng.integers(97, 100, la).astype(np.uint8),
                          rng.integers(97, 100, lb).astype(np.uint8)))
        L = max(max(len(a), len(b)) for a, b in pairs) or 1
        a_pad = np.zeros((P, L), np.uint8)
        b_pad = np.full((P, L), 1, np.uint8)
        la_v = np.zeros(P, np.int64)
        lb_v = np.zeros(P, np.int64)
        for r, (a, b) in enumerate(pairs):
            a_pad[r, :len(a)] = a
            b_pad[r, :len(b)] = b
            la_v[r], lb_v[r] = len(a), len(b)
        got = _banded_levenshtein(a_pad, b_pad, la_v, lb_v, k,
                                  check_every=ce)
        for r, (a, b) in enumerate(pairs):
            true = _naive_lev(a.tolist(), b.tolist())
            assert got[r] == (true if true <= k else k + 1)


def test_edit_distance_pairs_blocking(tmp_path, ray_session):
    # doc 0/1: 1 substitution apart, same bucket; doc 2/3: lengths 31 and
    # 33 straddle the 32-wide bucket boundary (guest×home path); doc 4:
    # same text as 0 but different lang — excluded; doc 5: length differs
    # by 3 from doc 0 — excluded by the length gate
    texts = ["a" * 30, "a" * 29 + "b",
             "c" * 31, "c" * 33,
             "a" * 30, "a" * 27]
    langs = ["en", "en", "en", "en", "fr", "en"]
    _write_parts(tmp_path, "documents", _docs_df(texts, langs), 3)
    out = textops.doc_edit_distance_pairs(str(tmp_path)).to_pandas()
    got = {(r.id_a, r.id_b): r.edit_distance for r in out.itertuples()}
    # (0,2)/(1,2) are unrelated but inside the length gate and under
    # max_dist=60, so they are reported with their true distance
    assert got == {(0, 1): 1, (2, 3): 2, (0, 2): 31, (1, 2): 31}


def test_relational_join_ops_distributed_tiers_match(ray_session,
                                                     monkeypatch):
    """Force the broadcast gates off for the round-4 join-based
    relational ops (the 100 TB physical plan: every lookup_join falls to
    the distributed hash join) and require bit-identical results — the
    same equivalence discipline test_ngram_ops applies to the text
    ops."""
    import dataclasses

    sf = "/root/testdata/sf0.001"
    ops = {
        "q5": relational.q5_region_supplier_volume,
        "q14": relational.q14_promo_revenue,
        "q17": relational.q17_small_qty_revenue,
        "q18": relational.q18_large_orders,
        "funnel": relational.events_funnel_conversion,
        "retention": relational.events_user_retention,
    }

    def run(f):
        r = f(sf)
        df = r.to_pandas() if hasattr(r, "to_pandas") else r
        return df.reset_index(drop=True)

    base = {k: run(f) for k, f in ops.items()}
    forced = dataclasses.replace(
        relational.DEFAULT_CONFIG, broadcast_max_rows=0,
        keyed_broadcast_max_rows=0, wide_broadcast_max_rows=0,
        wide_broadcast_max_bytes=0)
    monkeypatch.setattr(relational, "DEFAULT_CONFIG", forced)
    for k, f in ops.items():
        assert run(f).equals(base[k]), k
