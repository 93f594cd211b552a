"""Targeted tests for the round-4 additions: chunking boundary math,
TF-IDF cross-block DF/top-k merge, arg-max-per-group ties, label-centroid
partial merge, histogram bin edges, signed-rounding supplier rollup, and
the PII scrub regexes on crafted strings. Multi-block synthetic tables
exercise the cross-block paths the single-block sf0.001 parity fixture
cannot."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from fuzzy_dedupe_pipeline_ray.pipelines import ann, relational, textops


def _write_parts(dirname, table_name, df, n_parts):
    sub = os.path.join(dirname, f"{table_name}.parquet")
    os.makedirs(sub)
    for i, part in enumerate(np.array_split(df, n_parts)):
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       os.path.join(sub, f"part-{i:02d}.parquet"))


# ---------------------------------------------------------------------------
# doc_chunk: window boundary arithmetic + lossless coverage
# ---------------------------------------------------------------------------

def test_doc_chunk_boundaries_and_reassembly(tmp_path, ray_session):
    size, stride = textops.CHUNK_SIZE, textops.CHUNK_STRIDE
    lens = [0, 1, size - 1, size, size + 1, size + stride,
            size + stride + 1, 3 * size]
    texts = ["x" * 17 + "abcdefghij" * ((n + 9) // 10) for n in lens]
    texts = [t[:n] for t, n in zip(texts, lens)]
    df = pd.DataFrame({"doc_id": np.arange(len(lens), dtype=np.int64),
                       "text": texts,
                       "lang": "en", "source": "t",
                       "n_chars": np.array(lens, np.int64)})
    _write_parts(tmp_path, "documents", df, 3)
    out = textops.doc_chunk(str(tmp_path)).to_pandas()

    for i, n in enumerate(lens):
        want = 1 if n <= size else (n - size + stride - 1) // stride + 1
        got = out[out.doc_id == i]
        assert len(got) == want, (i, n, want, len(got))
        # chunk i starts at i*stride and has ≤ size chars; the union of
        # chunks must cover the doc exactly (overlap-consistent)
        got = got.sort_values("chunk_idx")
        assert list(got.chunk_idx) == list(range(want))
        assert list(got.chunk_start) == [j * stride for j in range(want)]
        recon = ""
        for _, r in got.iterrows():
            assert r.chunk_text == texts[i][r.chunk_start:
                                            r.chunk_start + size]
            recon = recon[:r.chunk_start] + r.chunk_text
        assert recon == texts[i]


# ---------------------------------------------------------------------------
# doc_tfidf_top_terms: DF must be global across blocks
# ---------------------------------------------------------------------------

def test_tfidf_global_df_and_topk(tmp_path, ray_session):
    # 'common' appears in every doc (df=n), 'rare<i>' only in doc i (df=1):
    # the top term per doc must be its rare token even though within any
    # single block a block-local DF would tie them differently
    n = 60
    texts = [f"common common common rare{i} mid{i % 5}" for i in range(n)]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": texts, "lang": "en", "source": "t",
                       "n_chars": [len(t) for t in texts]})
    _write_parts(tmp_path, "documents", df, 6)
    out = textops.doc_tfidf_top_terms(str(tmp_path)).to_pandas()

    top = out[out.rnk == 1].set_index("doc_id")
    for i in range(n):
        assert top.loc[i, "token"] == f"rare{i}"
        assert top.loc[i, "tfidf_score"] == textops.TFIDF_SCALE  # tf=1/df=1
    # rank-2: mid{i%5} (df=12) beats common (tf=3, df=60):
    # 1e6//12 = 83333 > 3e6//60 = 50000
    r2 = out[out.rnk == 2].set_index("doc_id")
    for i in range(n):
        assert r2.loc[i, "token"] == f"mid{i % 5}"
    assert (out.groupby("doc_id").size() == 3).all()


# ---------------------------------------------------------------------------
# orders_latest_per_customer: date ties break by min orderkey across blocks
# ---------------------------------------------------------------------------

def test_latest_order_tie_break(tmp_path, ray_session):
    rng = np.random.default_rng(7)
    n = 5_000
    cust = rng.integers(0, 40, size=n)
    # coarse date grid → many exact date ties per customer
    dates = (np.datetime64("2000-01-01", "us")
             + rng.integers(0, 5, size=n) * np.timedelta64(86400_000_000, "us"))
    df = pd.DataFrame({
        "o_orderkey": np.arange(n, dtype=np.int64),
        "o_custkey": cust.astype(np.int64),
        "o_orderdate": dates,
        "o_totalprice": rng.integers(100, 10_000, size=n) / 100.0,
    })
    _write_parts(tmp_path, "orders", df, 8)
    out = relational.orders_latest_per_customer(str(tmp_path)).to_pandas()

    exp = (df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                          ascending=[True, False, True])
           .groupby("o_custkey").head(1).sort_values("o_custkey"))
    assert list(out.o_custkey) == list(exp.o_custkey)
    assert list(out.o_orderkey) == list(exp.o_orderkey)
    assert list(out.total_e2) == [round(p * 100) for p in exp.o_totalprice]


# ---------------------------------------------------------------------------
# embedding_label_centroid: partial merge across blocks == direct numpy
# ---------------------------------------------------------------------------

def test_label_centroid_matches_direct(tmp_path, ray_session):
    rng = np.random.default_rng(11)
    n, dim = 3_000, 16
    emb = rng.normal(size=(n, dim)).astype(np.float32)
    lab = rng.integers(0, 7, size=n).astype(np.int32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.ravel()), dim).cast(pa.list_(pa.float32())),
        "label": pa.array(lab),
    })
    sub = os.path.join(tmp_path, "embeddings.parquet")
    os.makedirs(sub)
    for i in range(5):
        pq.write_table(tbl.slice(i * 600, 600),
                       os.path.join(sub, f"part-{i}.parquet"))
    out = ann.embedding_label_centroid(str(tmp_path)).to_pandas()

    scaled = np.floor(emb.astype(np.float64) * ann.CENTROID_SCALE).astype(
        np.int64)
    for label in range(7):
        m = lab == label
        want = scaled[m].sum(axis=0)
        got = out[out.label == label].sort_values("dim")
        assert (got.n == m.sum()).all()
        assert list(got.sum_e6) == list(want)


# ---------------------------------------------------------------------------
# histogram + supplier rollup vs DuckDB on signed / boundary values
# ---------------------------------------------------------------------------

def test_histogram_bin_edges(tmp_path, ray_session):
    # values sitting exactly on bin edges (100.00 → bin 1) and just below
    prices = np.array([0.01, 99.99, 100.00, 100.01, 199.99, 200.00,
                       12345.67] * 300)
    df = pd.DataFrame({"l_extendedprice": prices})
    _write_parts(tmp_path, "lineitem", df, 4)
    out = relational.lineitem_price_histogram(str(tmp_path)).to_pandas()
    got = dict(zip(out.bin_id, out.n))
    assert got == {0: 600, 1: 900, 2: 300, 123: 300}
    assert (out.lo_cents == out.bin_id * 10_000).all()


def test_supplier_rollup_negative_balances(tmp_path, ray_session):
    rng = np.random.default_rng(3)
    n = 2_000
    df = pd.DataFrame({
        "s_suppkey": np.arange(n, dtype=np.int64),
        "s_name": [f"s{i}" for i in range(n)],
        "s_nationkey": rng.integers(0, 5, size=n).astype(np.int32),
        "s_acctbal": rng.integers(-50_000, 50_000, size=n) / 100.0,
    })
    _write_parts(tmp_path, "supplier", df, 4)
    ndf = pd.DataFrame({"n_nationkey": np.arange(5, dtype=np.int64),
                        "n_name": [f"N{i}" for i in range(5)]})
    _write_parts(tmp_path, "nation", ndf, 1)
    out = relational.supplier_nation_stats(str(tmp_path)).to_pandas()

    cents = (df.s_acctbal * 100).round().astype(np.int64)
    exp = (pd.DataFrame({"nk": df.s_nationkey, "c": cents})
           .groupby("nk").agg(n=("c", "size"), s=("c", "sum")))
    for i in range(5):
        row = out[out.n_name == f"N{i}"].iloc[0]
        assert row.n_suppliers == exp.loc[i, "n"]
        assert row.acctbal_e2 == exp.loc[i, "s"]


# ---------------------------------------------------------------------------
# doc_pii_scrub on crafted strings (what the synthetic corpus can't hit)
# ---------------------------------------------------------------------------

def test_pii_scrub_crafted(tmp_path, ray_session):
    texts = [
        "mail me at jane.doe+spam@example.co.uk or call 0123456789",
        "no pii here",
        "nums 123 1234 12345 and a@b.io x@y",  # x@y: TLD too short → kept
        "",
    ]
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                       "text": texts, "lang": "en", "source": "t",
                       "n_chars": [len(t) for t in texts]})
    _write_parts(tmp_path, "documents", df, 2)
    out = (textops.doc_pii_scrub(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    assert out.scrubbed[0] == "mail me at <EMAIL> or call <NUM>"
    assert (out.n_emails[0], out.n_long_nums[0]) == (1, 1)
    assert out.scrubbed[1] == "no pii here"
    assert out.scrubbed[2] == "nums 123 <NUM> <NUM> and <EMAIL> x@y"
    assert (out.n_emails[2], out.n_long_nums[2]) == (1, 2)
    assert (out.n_emails[3], out.n_long_nums[3]) == (0, 0)
