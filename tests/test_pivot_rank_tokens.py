"""Targeted tests for the pivot, rank-per-group top-k, token document
frequency, and token repetition operators: multi-block synthetic tables
exercise the cross-block merge logic (partial top-k survivors, partial
conditional aggregates, per-batch distinct-then-sum DF) that the
single-block sf0.001 parity fixture cannot, plus degenerate inputs
(empty/whitespace-only documents, brands with fewer than k rows, price
ties at the rank boundary, DF ties at the limit cutoff).
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fuzzy_dedupe_pipeline_ray.pipelines import relational, textops


def _write_parts(dirname, table_name, df, n_parts):
    sub = os.path.join(dirname, f"{table_name}.parquet")
    os.makedirs(sub)
    for i, part in enumerate(np.array_split(df, n_parts)):
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       os.path.join(sub, f"part-{i:02d}.parquet"))


# ---------------------------------------------------------------------------
# part_brand_topk: cross-block merge, ties, small groups
# ---------------------------------------------------------------------------

def test_brand_topk_multiblock_ties_and_small_groups(tmp_path, ray_session):
    rng = np.random.default_rng(3)
    n = 4_000
    brands = rng.integers(0, 12, size=n)
    # coarse price grid forces many exact ties at the rank boundary, so the
    # partkey tie-break is load-bearing; brand 11 gets only 2 rows (< k)
    price = rng.integers(1, 6, size=n).astype(np.float64)
    keep = (brands != 11) | (np.cumsum(brands == 11) <= 2)
    df = pd.DataFrame({
        "p_brand": np.char.add("Brand#", brands[keep].astype(str)),
        "p_partkey": np.arange(keep.sum(), dtype=np.int64),
        "p_retailprice": price[keep],
    })
    _write_parts(str(tmp_path), "part", df, 7)
    out = relational.part_brand_topk(str(tmp_path), k=3).to_pandas()
    con = duckdb.connect()
    ora = con.sql(f"""
        SELECT p_brand, CAST(rnk AS BIGINT) AS rnk, p_partkey, price_cents
        FROM (SELECT p_brand, p_partkey,
                     CAST(round(p_retailprice * 100) AS BIGINT)
                         AS price_cents,
                     row_number() OVER (
                         PARTITION BY p_brand
                         ORDER BY CAST(round(p_retailprice * 100) AS BIGINT)
                                      DESC, p_partkey) AS rnk
              FROM read_parquet('{tmp_path}/part.parquet/*.parquet'))
        WHERE rnk <= 3 ORDER BY p_brand, rnk""").df()
    assert (out[out.p_brand == "Brand#11"].rnk.tolist() == [1, 2])
    pd.testing.assert_frame_equal(out, ora, check_dtype=False)


# ---------------------------------------------------------------------------
# events_type_pivot: cross-block partial sums, users with no purchases
# ---------------------------------------------------------------------------

def test_pivot_multiblock_matches_sql(tmp_path, ray_session):
    rng = np.random.default_rng(9)
    n = 6_000
    types = np.array(relational.EVENT_TYPES)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, size=n).astype(np.int64),
        "event_type": types[rng.integers(0, len(types), size=n)],
        "value": np.round(rng.uniform(0, 50, size=n), 2),
    })
    # user 39 never purchases: purchase_cents must be 0, not null
    df.loc[df.user_id == 39, "event_type"] = "view"
    _write_parts(str(tmp_path), "events", df, 11)
    out = relational.events_type_pivot(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    ora = con.sql(f"""
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'click') AS n_click,
               count(*) FILTER (WHERE event_type = 'error') AS n_error,
               count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
               count(*) FILTER (WHERE event_type = 'view') AS n_view,
               coalesce(sum(CAST(round(value * 100) AS BIGINT))
                        FILTER (WHERE event_type = 'purchase'), 0)
                   AS purchase_cents
        FROM read_parquet('{tmp_path}/events.parquet/*.parquet')
        GROUP BY user_id ORDER BY user_id""").df()
    assert int(out[out.user_id == 39].purchase_cents.iloc[0]) == 0
    pd.testing.assert_frame_equal(out, ora, check_dtype=False)


# ---------------------------------------------------------------------------
# token_doc_freq: per-batch distinct before the sum, cutoff ties
# ---------------------------------------------------------------------------

def test_token_doc_freq_distinct_per_doc_and_cutoff_tie(tmp_path,
                                                        ray_session):
    # 'dup dup dup' must count ONCE for doc frequency; tokens w/x/y/z all
    # tie at df=2 around the top_n=3 cutoff so the token tie-break decides
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["dup dup dup w x", "dup  w\t x", "y z", "y z",
                 "  ", ""],
    })
    _write_parts(str(tmp_path), "documents", docs, 3)
    out = textops.token_doc_freq(str(tmp_path), top_n=3).to_pandas()
    assert out.token.tolist() == ["dup", "w", "x"]
    assert out.df.tolist() == [2, 2, 2]


# ---------------------------------------------------------------------------
# doc_token_repetition: degenerate docs, repetitive flag
# ---------------------------------------------------------------------------

def test_token_repetition_edges(tmp_path, ray_session):
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["spam spam spam spam eggs",   # top 4/5 > 20% → repetitive
                 "a b c d e f",                # flat → not repetitive
                 "",                           # empty → all zeros
                 " \t "],                      # whitespace-only → all zeros
    })
    _write_parts(str(tmp_path), "documents", docs, 2)
    out = (textops.doc_token_repetition(str(tmp_path))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.n_tokens.tolist() == [5, 6, 0, 0]
    assert out.n_distinct_tokens.tolist() == [2, 6, 0, 0]
    assert out.top_token_count.tolist() == [4, 1, 0, 0]
    assert out.repetitive.tolist() == [True, False, False, False]


def test_exploded_token_codes_filters_empty_tokens():
    rows, codes, vocab = textops._exploded_token_codes(
        pa.chunked_array([pa.array(["A a", "", "  ", "b"])]))
    toks = [vocab[c].as_py() for c in codes]
    assert list(rows) == [0, 0, 3]
    assert toks == ["a", "a", "b"]


# ---------------------------------------------------------------------------
# doc_rarest_token: DF join-back, token-less docs, tie determinism
# ---------------------------------------------------------------------------

def test_rarest_token_multiblock(tmp_path, ray_session):
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        # 'qq' appears in one doc (df=1) → beats common tokens;
        # doc 3's tokens tie at df=2 → lexicographic tie-break ('aa');
        # docs 4/5 are token-less → ('', 0)
        "text": ["common qq common", "common aa", "common bb",
                 "aa bb", "", "   "],
    })
    _write_parts(str(tmp_path), "documents", docs, 3)
    out = (textops.doc_rarest_token(str(tmp_path))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.rarest_token.tolist() == ["qq", "aa", "bb", "aa", "", ""]
    assert out.rarest_df.tolist() == [1, 2, 2, 2, 0, 0]
