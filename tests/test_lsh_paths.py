"""Path equivalence: grouped_pairs' local fast path (broadcast budget) vs
the distributed aggregate+lookup+expand path must emit the same pair set,
and both must match the reference per-group emitter."""

import numpy as np
import pyarrow as pa
import pytest

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
from fuzzy_dedupe_pipeline_ray.stages.lsh import (
    _emit_pairs,
    _local_grouped_pairs,
    grouped_pairs,
)


def _mk_keyed(seed=0, n_rows=3000, n_keys=700):
    rng = np.random.RandomState(seed)
    keys = rng.randint(0, n_keys, n_rows).astype(np.int64)
    docs = rng.randint(0, 10_000, n_rows).astype(np.int64)
    return keys, docs


def _pairs_set(tbl):
    return set(zip(tbl.column("id_a").to_pylist(),
                   tbl.column("id_b").to_pylist()))


def test_local_matches_per_group_reference():
    keys, docs = _mk_keyed()
    cap = 8
    a, b = _local_grouped_pairs(keys, docs, cap)
    got = set(zip(a.tolist(), b.tolist()))

    expected = set()
    for k in np.unique(keys):
        g = pa.table({"band_key": pa.array(keys[keys == k], pa.int64()),
                      "doc_id": pa.array(docs[keys == k], pa.int64())})
        expected |= _pairs_set(_emit_pairs(g, cap))
    assert got == expected
    assert all(x < y for x, y in got)


@pytest.mark.parametrize("cap", [2, 8, 64])
def test_local_vs_distributed_paths(ray_session, cap):
    import ray.data

    keys, docs = _mk_keyed(seed=cap)
    ds = ray.data.from_arrow(pa.table({
        "band_key": pa.array(keys, pa.int64()),
        "doc_id": pa.array(docs, pa.int64())}))

    local_cfg = PipelineConfig(band_group_pair_cap=cap)
    dist_cfg = PipelineConfig(band_group_pair_cap=cap, broadcast_max_rows=0,
                              keyed_broadcast_max_rows=0)

    def collect(out_ds):
        df = out_ds.to_pandas()
        return set(zip(df["id_a"].tolist(), df["id_b"].tolist()))

    local = collect(grouped_pairs(ds, local_cfg))
    dist = collect(grouped_pairs(ds, dist_cfg))
    assert local == dist
    assert len(local) > 0


def test_substring_content_gather_paths_equivalent(ray_session, tmp_path):
    """substring_edges' content gather: the broadcast-ID semi-join path and
    the distributed hash-semi-join path (forced via broadcast_max_rows=0)
    must produce identical edge sets, and contents must never be required
    on the driver for either."""
    import ray.data

    from fuzzy_dedupe_pipeline_ray.fixtures import corpus_dir
    from fuzzy_dedupe_pipeline_ray.sources.io import read_files
    from fuzzy_dedupe_pipeline_ray.stages.fingerprint import fingerprint
    from fuzzy_dedupe_pipeline_ray.stages.substring import substring_edges

    d = corpus_dir("tiny", root=str(tmp_path / "fixtures"))
    files = read_files(f"{d}/files.parquet")

    def collect(cfg):
        sigs = fingerprint(files, cfg).materialize()
        edges = substring_edges(files, sigs, cfg)
        df = edges.to_pandas().sort_values(["id_a", "id_b"])
        return set(zip(df["id_a"], df["id_b"], df["span_len"]))

    base = PipelineConfig()
    forced = PipelineConfig(broadcast_max_rows=0)
    e_broadcast = collect(base)
    e_distributed = collect(forced)
    assert e_broadcast == e_distributed
    assert len(e_broadcast) > 0  # the fixture plants substring families


def test_candidate_pairs_band_matrix_path_matches_exploded(ray_session):
    """candidate_pairs' per-band driver path must equal the exploded
    grouped_pairs path (forced via a zero broadcast budget)."""
    import ray.data

    from fuzzy_dedupe_pipeline_ray.functions.hashing import (
        MinHasher,
        pack_signatures,
    )
    from fuzzy_dedupe_pipeline_ray.stages.lsh import candidate_pairs

    cfg = PipelineConfig()
    rng = np.random.RandomState(3)
    mh = MinHasher(cfg.num_perms, cfg.minhash_seed)
    sigs, ids = [], []
    base_sets = [rng.randint(0, 1 << 60, 80).astype(np.uint64)
                 for _ in range(40)]
    doc = 0
    for s in base_sets:
        for _ in range(3):  # 3 near-identical members per family
            mut = s.copy()
            mut[rng.randint(0, len(mut))] = rng.randint(0, 1 << 60)
            sigs.append(mh.signature(np.unique(mut)))
            ids.append(doc)
            doc += 1
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "minhash": pack_signatures(np.vstack(sigs)),
    })
    ds = ray.data.from_arrow(tbl)

    def collect(out_ds):
        df = out_ds.to_pandas()
        return set(zip(df["id_a"].tolist(), df["id_b"].tolist()))

    fast = collect(candidate_pairs(ds, cfg))
    dist = collect(candidate_pairs(
        ds, PipelineConfig(broadcast_max_rows=0, keyed_broadcast_max_rows=0)))
    assert fast == dist
    assert len(fast) > 0


def test_candidate_pairs_parallel_tier_matches_driver(ray_session):
    """The parallel per-band-task tier (band_driver_max_rows=0) must match
    the single-driver-pass tier exactly."""
    import ray.data

    from fuzzy_dedupe_pipeline_ray.functions.hashing import (
        MinHasher,
        pack_signatures,
    )
    from fuzzy_dedupe_pipeline_ray.stages.lsh import candidate_pairs

    cfg = PipelineConfig()
    rng = np.random.RandomState(9)
    mh = MinHasher(cfg.num_perms, cfg.minhash_seed)
    sigs, ids = [], []
    doc = 0
    for _ in range(30):
        s = rng.randint(0, 1 << 60, 60).astype(np.uint64)
        for _ in range(2):
            mut = s.copy()
            mut[rng.randint(0, len(mut))] = rng.randint(0, 1 << 60)
            sigs.append(mh.signature(np.unique(mut)))
            ids.append(doc)
            doc += 1
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "minhash": pack_signatures(np.vstack(sigs)),
    }))

    def collect(out_ds):
        df = out_ds.to_pandas()
        return set(zip(df["id_a"].tolist(), df["id_b"].tolist()))

    driver = collect(candidate_pairs(ds, cfg))
    par = collect(candidate_pairs(
        ds, PipelineConfig(band_driver_max_rows=0)))
    assert driver == par
    assert len(driver) > 0


def test_finalize_and_exact_local_fast_paths_match_distributed(
        ray_session, tmp_path):
    """The local numpy fast paths of exact_edges and finalize must produce
    the same edges/assignments as the distributed join+aggregate paths
    (forced via broadcast_max_rows=0)."""
    import ray.data

    from fuzzy_dedupe_pipeline_ray.fixtures import corpus_dir
    from fuzzy_dedupe_pipeline_ray.sources.io import read_files
    from fuzzy_dedupe_pipeline_ray.stages.cc import connected_components
    from fuzzy_dedupe_pipeline_ray.stages.exact import exact_edges
    from fuzzy_dedupe_pipeline_ray.stages.finalize import finalize
    from fuzzy_dedupe_pipeline_ray.stages.fingerprint import fingerprint
    from fuzzy_dedupe_pipeline_ray.stages.ingest import ingest_meta
    from fuzzy_dedupe_pipeline_ray.stages.lsh import candidate_pairs
    from fuzzy_dedupe_pipeline_ray.stages.verify import verify_pairs

    d = corpus_dir("tiny", root=str(tmp_path / "fx"))
    files = read_files(f"{d}/files.parquet")
    fast_cfg = PipelineConfig()
    dist_cfg = PipelineConfig(broadcast_max_rows=0)

    docs = ingest_meta(files).materialize()
    sigs = fingerprint(files, fast_cfg).materialize()

    def edges_set(cfg):
        df = exact_edges(docs, cfg).to_pandas()
        return set(zip(df["id_a"], df["id_b"], df["match_type"]))

    assert edges_set(fast_cfg) == edges_set(dist_cfg)

    ex = exact_edges(docs, fast_cfg)
    fuzzy = verify_pairs(candidate_pairs(sigs, fast_cfg), sigs, fast_cfg)
    edges = ex.union(fuzzy).materialize()
    labels = connected_components(edges, fast_cfg).materialize()

    def assigns(cfg):
        df = finalize(docs, labels, edges, cfg).to_pandas()
        return (df[["doc_id", "cluster_id", "duplicate_count",
                    "is_representative", "confidence"]]
                .sort_values("doc_id").reset_index(drop=True))

    fast = assigns(fast_cfg)
    dist = assigns(dist_cfg)
    for col in ("doc_id", "cluster_id", "duplicate_count",
                "is_representative"):
        assert fast[col].tolist() == dist[col].tolist(), col
    assert np.allclose(fast["confidence"], dist["confidence"])


@pytest.mark.parametrize("cap", [8, 64])
def test_grouped_pairs_key_slice_tier_matches(ray_session, cap):
    """The hash-key-slice parallel tier of grouped_pairs (forced with
    band_driver_max_rows=0) must match the driver tier exactly."""
    import ray.data

    keys, docs = _mk_keyed(seed=100 + cap)
    ds = ray.data.from_arrow(pa.table({
        "band_key": pa.array(keys, pa.int64()),
        "doc_id": pa.array(docs, pa.int64())}))

    def collect(out_ds):
        df = out_ds.to_pandas()
        return set(zip(df["id_a"].tolist(), df["id_b"].tolist()))

    driver = collect(grouped_pairs(ds, PipelineConfig(band_group_pair_cap=cap)))
    sliced = collect(grouped_pairs(ds, PipelineConfig(
        band_group_pair_cap=cap, band_driver_max_rows=0)))
    assert driver == sliced
    assert len(driver) > 0


def test_shard_pair_partial_single_shard_is_bare_tuple():
    """n_shards==1 callers use num_returns=1, so the single ref must
    resolve to the bare (a, b) tuple — the one-element-list shape made
    _merge_pair_shard index p[1] off the end (ADVICE r3 regression)."""
    from fuzzy_dedupe_pipeline_ray.stages.lsh import _shard_pair_partial

    a = np.array([1, 2, 3], dtype=np.int64)
    b = np.array([4, 5, 6], dtype=np.int64)
    out = _shard_pair_partial(a, b, 1)
    assert isinstance(out, tuple) and len(out) == 2
    np.testing.assert_array_equal(out[0], a)
    np.testing.assert_array_equal(out[1], b)
    empty = _shard_pair_partial(np.empty(0, np.int64),
                                np.empty(0, np.int64), 1)
    assert isinstance(empty, tuple) and len(empty[0]) == 0


def test_candidate_pairs_num_bands_one_parallel_tier(ray_session):
    """num_bands=1 collapses the mid-tier emit fan-out to ONE group
    (n_shards=1); it must run (ADVICE r3 IndexError) and match the
    driver-pass tier exactly."""
    import ray.data

    from fuzzy_dedupe_pipeline_ray.functions.hashing import (
        MinHasher,
        pack_signatures,
    )
    from fuzzy_dedupe_pipeline_ray.stages.lsh import candidate_pairs

    def cfg1(**kw):
        return PipelineConfig(num_perms=16, num_bands=1, rows_per_band=16,
                              **kw)

    rng = np.random.RandomState(17)
    mh = MinHasher(16, PipelineConfig().minhash_seed)
    sigs, ids = [], []
    doc = 0
    for _ in range(20):  # families of 3 EXACT copies → full-band collisions
        s = np.unique(rng.randint(0, 1 << 60, 60).astype(np.uint64))
        sig = mh.signature(s)
        for _ in range(3):
            sigs.append(sig)
            ids.append(doc)
            doc += 1
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "minhash": pack_signatures(np.vstack(sigs)),
    }))

    def collect(out_ds):
        df = out_ds.to_pandas()
        return set(zip(df["id_a"].tolist(), df["id_b"].tolist()))

    driver = collect(candidate_pairs(ds, cfg1()))
    par = collect(candidate_pairs(ds, cfg1(band_driver_max_rows=0)))
    assert driver == par
    assert len(driver) >= 20 * 3


def test_submit_bank_tasks_empty_refs(ray_session):
    """An empty signature-block list must yield an empty (non-crashing)
    bank — ADVICE r3: step=0 made range() raise ValueError."""
    import ray

    from fuzzy_dedupe_pipeline_ray.stages.verify import _submit_bank_tasks

    narrow_ref, piece_refs = _submit_bank_tasks([], PipelineConfig())
    ids_sorted, order, simhash, sha = ray.get(narrow_ref)
    assert len(ids_sorted) == 0
    assert piece_refs == []


@pytest.mark.parametrize("cap", [3, 64])
def test_sorted_tier_matches_hashagg_and_local(ray_session, cap):
    """Three-way pair-set equivalence: local fast path vs the sort-based
    distributed tier (default) vs the hash-aggregate tier (retained as
    the baseline), on a skewed keyed table repartitioned so band groups
    STRADDLE sorted-block boundaries (hot star group spanning many
    blocks + small groups at every boundary)."""
    import numpy as np
    import ray.data

    rng = np.random.RandomState(11)
    # one giant hot key (star path, spans blocks), many small groups
    keys = np.concatenate([
        np.full(400, 7, np.int64),                    # hot key
        rng.randint(100, 400, 1600).astype(np.int64),  # small groups
    ])
    docs = rng.randint(0, 900, len(keys)).astype(np.int64)

    def mk_ds(k, d):
        return ray.data.from_arrow(pa.table({
            "band_key": pa.array(k, pa.int64()),
            "doc_id": pa.array(d, pa.int64())})).repartition(13)

    def collect(ds, cfg):
        df = grouped_pairs(ds, cfg).to_pandas()
        return set(zip(df["id_a"].tolist(), df["id_b"].tolist()))

    gates = dict(band_group_pair_cap=cap, broadcast_max_rows=0,
                 keyed_broadcast_max_rows=0, band_driver_max_rows=0)

    # duplicate-free (key, doc): all three tiers must agree exactly
    # (production shape — explode_bands can't repeat a (band, sig) key
    # for one doc short of a hash collision)
    uniq = np.unique(keys * np.int64(1 << 32) + docs)
    ku, du = (uniq >> np.int64(32)).astype(np.int64), \
        (uniq & np.int64((1 << 32) - 1)).astype(np.int64)
    ds_u = mk_ds(ku, du)
    local = collect(ds_u, PipelineConfig(band_group_pair_cap=cap))
    srt = collect(ds_u, PipelineConfig(**gates))
    hag = collect(ds_u, PipelineConfig(**gates,
                                       extra={"grouped_pairs_impl":
                                              "hashagg"}))
    assert srt == hag == local
    assert len(local) > 0

    # WITH duplicate (key, doc) rows: all three tiers must STILL agree —
    # the hashagg baseline distincts (key, doc_id) before its Count so
    # its star decision uses unique-member counts like the sorted and
    # local tiers (review finding, round 5; previously a documented
    # divergence on this production-impossible input shape)
    ds_d = mk_ds(keys, docs)
    local_d = collect(ds_d, PipelineConfig(band_group_pair_cap=cap))
    srt_d = collect(ds_d, PipelineConfig(**gates))
    hag_d = collect(ds_d, PipelineConfig(**gates,
                                         extra={"grouped_pairs_impl":
                                                "hashagg"}))
    assert srt_d == hag_d == local_d


def test_boundary_scans_reject_unsorted_blocks(ray_session):
    """The sorted tiers' load-bearing assumption — Dataset.sort emits
    range-ordered blocks — is now VERIFIED in-path: feeding block
    summaries/refs in shuffled key order must raise, not mis-stitch
    (round-5 review item)."""
    import numpy as np
    import pytest
    import ray.data

    from fuzzy_dedupe_pipeline_ray.pipelines.relational import (
        _sorted_block_scan,
    )
    from fuzzy_dedupe_pipeline_ray.stages.lsh import _scan_boundary_spans

    # lsh span scan (pure function): first_key below previous last_key
    def sm(fk, lk):
        u = np.array([1], np.int64)
        return (fk, 1, u, 1, lk, 1, u, 1)

    _scan_boundary_spans([sm(0, 4), sm(4, 9)], cap=4)  # in order: fine
    with pytest.raises(RuntimeError, match="order violation"):
        _scan_boundary_spans([sm(10, 20), sm(2, 5)], cap=4)

    # generic scaffold with key_of: blocks materialized in the wrong
    # key order (from_arrow preserves block order; no sort applied)
    t1 = pa.table({"k": pa.array([10, 11], pa.int64())})
    t2 = pa.table({"k": pa.array([1, 2], pa.int64())})
    bad = ray.data.from_arrow([t1, t2]).materialize()

    def summarize(tbl):
        if tbl.num_rows == 0:
            return None
        kk = tbl.column("k").to_numpy()
        return (int(kk[0]), int(kk[-1]))

    with pytest.raises(RuntimeError, match="order violation"):
        _sorted_block_scan(bad, summarize, (),
                           lambda sums: [() for _ in sums],
                           lambda tbl: tbl, key_of=lambda s: s)


def test_scan_boundary_spans_shapes():
    """Direct unit coverage of the shared span scanner: single-block
    groups close as 1-block candidates (tiers no-op them), multi-block
    spans collect every run in block order, an all-one-key middle block
    joins its neighbors into one span, and empty summaries are
    skipped."""
    from fuzzy_dedupe_pipeline_ray.functions.scans import (
        scan_boundary_spans,
    )

    def sm(fk, fp, lk, lp):
        return (fk, fp, lk, lp)

    spans = []

    def close(p):
        spans.append((p["key"], list(p["blocks"]), list(p["payloads"])))

    # blocks: [5..7], None, [7..7] (all), [7..9], [10..11]
    summaries = [sm(5, "a", 7, "b"), None, sm(7, "c", 7, "c"),
                 sm(7, "d", 9, "e"), sm(10, "f", 11, "g")]
    scan_boundary_spans(summaries, lambda s: s, close)
    # key 7 spans blocks 0(last) + 2(all) + 3(first)
    assert (7, [(0, "last"), (2, "all"), (3, "first")],
            ["b", "c", "d"]) in spans
    # trailing single-block candidates also close (1-block, tiers no-op)
    assert any(k == 11 and len(b) == 1 for k, b, _ in spans)
    # key 9 closes as a 1-block candidate when key 10 opens
    assert any(k == 9 and b == [(3, "last")] for k, b, _ in spans)

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="order violation"):
        scan_boundary_spans([sm(5, "a", 9, "b"), sm(3, "c", 4, "d")],
                            lambda s: s, close)
