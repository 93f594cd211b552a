"""ANN variants: the approximate paths (hyperplane-LSH, IVF) have no SQL
oracle by design — these tests pin their recall against the exact
brute-force top-k on the sf0.001 embeddings."""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _topk_map(ds):
    df = ds.to_pandas()
    out = {}
    for qid, g in df.groupby("qid"):
        out[qid] = set(g["vec_id"].tolist())
    return out


@pytest.fixture(scope="module")
def exact_topk(ray_session):
    from fuzzy_dedupe_pipeline_ray.pipelines import ann

    return _topk_map(ann.ann_topk(SF_DIR))


def test_ivf_recall_vs_exact(ray_session, exact_topk):
    from fuzzy_dedupe_pipeline_ray.pipelines import ann

    approx = _topk_map(ann.ann_ivf_topk(SF_DIR, n_centroids=16, nprobe=4))
    recalls = [len(approx.get(q, set()) & hits) / len(hits)
               for q, hits in exact_topk.items()]
    assert sum(recalls) / len(recalls) >= 0.6, recalls
    # full-probe IVF degenerates to exact search — recall must be 1.0
    full = _topk_map(ann.ann_ivf_topk(SF_DIR, n_centroids=16, nprobe=16))
    assert all(full[q] == hits for q, hits in exact_topk.items())


def test_lsh_topk_multiprobe_recall(ray_session, exact_topk):
    """Multi-probe (1-bit flips) must give a real recall floor — the r2
    single-bucket probe had luck-dependent recall (VERDICT r2 #4)."""
    from fuzzy_dedupe_pipeline_ray.pipelines import ann

    approx = _topk_map(ann.ann_lsh_topk(SF_DIR))
    assert approx  # buckets non-empty for at least one query
    recalls = [len(approx.get(q, set()) & hits) / len(hits)
               for q, hits in exact_topk.items()]
    assert sum(recalls) / len(recalls) >= 0.9, recalls
    # 2-bit probing only widens the candidate set — recall is monotone
    wide = _topk_map(ann.ann_lsh_topk(SF_DIR, n_probe_bits=2))
    recalls2 = [len(wide.get(q, set()) & hits) / len(hits)
                for q, hits in exact_topk.items()]
    assert sum(recalls2) / len(recalls2) >= sum(recalls) / len(recalls)


def test_embedding_pairs_gate_trips(ray_session):
    """The exact all-pairs operator must refuse oversized inputs loudly
    instead of running O(n²·d) at cluster scale."""
    from fuzzy_dedupe_pipeline_ray.pipelines import ann

    with pytest.raises(ValueError, match="exact all-pairs"):
        ann.embedding_near_dup_pairs(SF_DIR, max_rows=1)


def test_recall_check_invariants(ray_session):
    """The oracle-able invariant queries must be all-true on the fixture:
    LSH multi-probe recall ≥ 0.8 per query, full-probe IVF == exact."""
    from fuzzy_dedupe_pipeline_ray.pipelines import ann

    for fn in (ann.ann_lsh_recall_check, ann.ann_ivf_recall_check):
        df = fn(SF_DIR).to_pandas()
        assert len(df) == 5
        assert df["recall_ok"].all(), df


def test_embedding_cc_clusters_no_edges(ray_session):
    """At an impossible threshold the pair graph is empty: every vector
    must come back a singleton labeling itself (exercises the empty-edges
    CC path + the left-outer coalesce)."""
    from fuzzy_dedupe_pipeline_ray.pipelines import ann

    df = ann.embedding_cc_clusters(SF_DIR, threshold=1.01).to_pandas()
    assert len(df) > 0
    assert (df["cluster_id"] == df["vec_id"]).all()


def test_range_search_matches_bruteforce(ray_session):
    import duckdb

    from fuzzy_dedupe_pipeline_ray.pipelines.ann import ann_range_search

    sf = "/root/testdata/sf0.001"
    out = ann_range_search(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    ora = con.sql(f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe
                   FROM read_parquet('{sf}/embeddings.parquet')
                   ORDER BY vec_id LIMIT 5)
        SELECT q.qid, e.vec_id
        FROM read_parquet('{sf}/embeddings.parquet') e CROSS JOIN q
        WHERE list_cosine_similarity(e.embedding, q.qe) >= 0.3
          AND e.vec_id <> q.qid
        ORDER BY qid, vec_id""").df()
    assert len(out) > 0, "fixture must produce at least one in-range hit"
    assert out.astype("int64").equals(ora.astype("int64"))


def test_pq_full_rerank_equals_exact(ray_session, exact_topk):
    """rerank_mult=None short-lists every vector: the exact rerank must
    reproduce ann_topk bit-for-bit (the completeness invariant the
    driver's ann_pq_recall_check pins)."""
    from fuzzy_dedupe_pipeline_ray.pipelines import ann

    full = _topk_map(ann.ann_pq_topk(SF_DIR, rerank_mult=None))
    assert all(full[q] == hits for q, hits in exact_topk.items())
    df = ann.ann_pq_recall_check(SF_DIR).to_pandas()
    assert len(df) == 5 and df["recall_ok"].all()


def test_pq_partial_shortlist_recall(ray_session, exact_topk):
    """ADC shortlist at 10×k must carry real recall on the sf0.001
    embeddings, and widening the shortlist can only help (monotone)."""
    from fuzzy_dedupe_pipeline_ray.pipelines import ann

    approx = _topk_map(ann.ann_pq_topk(SF_DIR, rerank_mult=10))
    recalls = [len(approx.get(q, set()) & hits) / len(hits)
               for q, hits in exact_topk.items()]
    assert sum(recalls) / len(recalls) >= 0.6, recalls
    wide = _topk_map(ann.ann_pq_topk(SF_DIR, rerank_mult=30))
    recalls2 = [len(wide.get(q, set()) & hits) / len(hits)
                for q, hits in exact_topk.items()]
    assert sum(recalls2) / len(recalls2) >= sum(recalls) / len(recalls)


def test_pq_codes_are_compact(ray_session):
    """The encoded table must actually be n_sub bytes per vector — the
    64× compression claim at d=64, n_sub=8 — and decode-side LUT scoring
    must read codes via the zero-copy buffer path."""
    from fuzzy_dedupe_pipeline_ray.pipelines import ann

    books = ann._pq_codebooks(SF_DIR, n_sub=8, n_codes=16)
    assert books.shape == (8, 16, 8)
    enc = ann._pq_encode(SF_DIR, books).to_pandas()
    assert len(enc) == 500
    assert all(len(c) == 8 for c in enc["code"])
