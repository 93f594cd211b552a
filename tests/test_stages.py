"""Unit tests for individual pipeline stages (no Ray needed for the pure
kernels; Ray-session tests live in test_pipeline_e2e.py)."""

import numpy as np
import pyarrow as pa
import pytest

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
from fuzzy_dedupe_pipeline_ray.functions.hashing import (
    MinHasher,
    pack_signatures,
    unpack_signatures,
)
from fuzzy_dedupe_pipeline_ray.stages.exact import _star_edges_batch
from fuzzy_dedupe_pipeline_ray.stages.lsh import PAIR_SCHEMA, _emit_pairs
from fuzzy_dedupe_pipeline_ray.stages.substring import longest_common_span
from fuzzy_dedupe_pipeline_ray.stages.verify import score_pairs_batch
from fuzzy_dedupe_pipeline_ray.state.unionfind import UnionFind

CFG = PipelineConfig()


def test_pack_unpack_signatures_roundtrip():
    rng = np.random.RandomState(0)
    sigs = rng.randint(0, 2**63, (7, 128), dtype=np.uint64)
    arr = pack_signatures(sigs)
    back = unpack_signatures(arr, 128)
    assert np.array_equal(sigs, back)
    # sliced array path
    back2 = unpack_signatures(arr.slice(2, 3), 128)
    assert np.array_equal(sigs[2:5], back2)


def test_emit_pairs_all_pairs_below_cap():
    g = pa.table({"band_key": pa.array([1] * 4, pa.int64()),
                  "doc_id": pa.array([30, 10, 20, 10], pa.int64())})
    out = _emit_pairs(g, cap=64)
    pairs = set(zip(out.column("id_a").to_pylist(), out.column("id_b").to_pylist()))
    assert pairs == {(10, 20), (10, 30), (20, 30)}
    assert all(a < b for a, b in pairs)


def test_emit_pairs_star_above_cap():
    ids = list(range(100, 200))
    g = pa.table({"band_key": pa.array([1] * 100, pa.int64()),
                  "doc_id": pa.array(ids, pa.int64())})
    out = _emit_pairs(g, cap=10)
    assert out.num_rows == 99  # linear, not quadratic
    assert set(out.column("id_a").to_pylist()) == {100}  # pivot = min


def test_emit_pairs_trivial_groups():
    g = pa.table({"band_key": pa.array([1], pa.int64()),
                  "doc_id": pa.array([5], pa.int64())})
    assert _emit_pairs(g, 64).num_rows == 0


def test_star_edges_exact():
    g = pa.table({"content_sha256": pa.array(["x"] * 3),
                  "doc_id": pa.array([7, 3, 9], pa.int64())})
    out = _star_edges_batch(g, confidence=0.95)
    assert out.column("id_a").to_pylist() == [3, 3]
    assert sorted(out.column("id_b").to_pylist()) == [7, 9]
    assert out.column("match_type").to_pylist() == ["exact", "exact"]
    assert out.column("confidence").to_pylist() == [0.95, 0.95]


def _mk_verify_batch(sig_a, sig_b, sim_a, sim_b, sha_a, sha_b):
    return pa.table({
        "id_a": pa.array([1], pa.int64()),
        "id_b": pa.array([2], pa.int64()),
        "minhash_a": pack_signatures(sig_a[None, :]),
        "simhash_a": pa.array([sim_a], pa.uint64()),
        "sha_a": pa.array([sha_a]),
        "minhash_b": pack_signatures(sig_b[None, :]),
        "simhash_b": pa.array([sim_b], pa.uint64()),
        "sha_b": pa.array([sha_b]),
    })


def test_verify_semantics_reference_parity():
    """Decision table mirrors dedupe_logic/processor.py:149-168."""
    rng = np.random.RandomState(1)
    sig = rng.randint(0, 2**63, 128, dtype=np.uint64)

    # identical signatures + identical sha → hybrid, conf = cap
    b = _mk_verify_batch(sig, sig, 5, 5, "h", "h")
    out = score_pairs_batch(b, CFG)
    assert out.column("match_type").to_pylist() == ["hybrid"]
    assert out.column("confidence").to_pylist() == [pytest.approx(0.95)]
    assert out.column("exact_match").to_pylist() == [True]

    # high sig_sim, close simhash, different sha → signature+bits
    sig_b = sig.copy(); sig_b[:12] = rng.randint(0, 2**63, 12, dtype=np.uint64)
    b = _mk_verify_batch(sig, sig_b, 0b111, 0b110, "h1", "h2")
    out = score_pairs_batch(b, CFG)
    assert out.column("match_type").to_pylist() == ["signature+bits"]
    sig_sim = out.column("sig_sim").to_pylist()[0]
    second = out.column("second_sim").to_pylist()[0]
    assert out.column("confidence").to_pylist()[0] == pytest.approx(
        min(0.95, (sig_sim + second) / 2))

    # high sig_sim, far simhash → plain signature, conf = sig_sim
    b = _mk_verify_batch(sig, sig_b, 0, 2**64 - 1, "h1", "h2")
    out = score_pairs_batch(b, CFG)
    assert out.column("match_type").to_pylist() == ["signature"]
    assert out.column("confidence").to_pylist()[0] == pytest.approx(
        out.column("sig_sim").to_pylist()[0])

    # below primary threshold → dropped regardless of second signal
    sig_c = rng.randint(0, 2**63, 128, dtype=np.uint64)
    b = _mk_verify_batch(sig, sig_c, 5, 5, "h", "h")
    assert score_pairs_batch(b, CFG).num_rows == 0


def test_unionfind_min_label_determinism():
    edge_sets = [
        [(1, 2), (2, 3), (10, 11), (3, 1)],
        [(3, 1), (10, 11), (2, 3), (1, 2)],   # different order
    ]
    labelings = []
    for edges in edge_sets:
        uf = UnionFind()
        for a, b in edges:
            uf.union(a, b)
        labelings.append(uf.labels())
    assert labelings[0] == labelings[1]
    assert labelings[0][3] == 1 and labelings[0][11] == 10


def test_numpy_cc_matches_unionfind():
    """The vectorized CC must label identically to the per-edge DSU on
    random graphs (path/star/cycle mixes, duplicate + self edges)."""
    from fuzzy_dedupe_pipeline_ray.state.unionfind import numpy_cc

    rng = np.random.RandomState(7)
    for trial in range(20):
        n = rng.randint(2, 400)
        m = rng.randint(1, 1000)
        a = rng.randint(0, n, m).astype(np.int64) * 17 + 3  # sparse ids
        b = rng.randint(0, n, m).astype(np.int64) * 17 + 3
        uf = UnionFind()
        uf.add_edges(a, b)
        want = uf.labels()
        nodes, labs = numpy_cc(a, b)
        assert sorted(want) == nodes.tolist()
        assert [want[x] for x in nodes.tolist()] == labs.tolist()
    # empty edge list
    e = np.empty(0, dtype=np.int64)
    nodes, labs = numpy_cc(e, e)
    assert len(nodes) == 0 and len(labs) == 0


def test_longest_common_span():
    a = "0123456789" * 20
    b = "zzz" + a[40:140] + "qqq"
    span, sa, sb = longest_common_span(a, b, min_len=50)
    assert span == 100
    assert a[sa:sa + span] == b[sb:sb + span]
    # containment fast path (periodic string → first occurrence wins)
    span, sa, sb = longest_common_span(a[10:60], a, min_len=20)
    assert span == 50 and a[sb:sb + 50] == a[10:60]
    assert longest_common_span("short", "other", 4)[0] == 0


def test_longest_common_span_no_overlap():
    assert longest_common_span("a" * 100, "b" * 100, 10)[0] == 0
    assert longest_common_span("", "abc", 1)[0] == 0


def test_ingest_sentinels_to_null_on_lang():
    from fuzzy_dedupe_pipeline_ray.stages.ingest import ingest_meta_batch

    batch = pa.table({
        "repo": ["r1", "r2", "r3", "r4"],
        "path": ["a.py", "b.py", "c.py", "d.py"],
        "commit": ["c1", "c2", "c3", "c4"],
        "lang": ["py", "none", "#ERROR!", ""],
        "content": ["x = 1\n", "y = 2\n", "z = 3\n", "w = 4\n"],
    })
    out = ingest_meta_batch(batch)
    langs = out.column("lang").to_pylist()
    assert langs == ["py", None, None, None]
    # identity columns untouched; n_chars from content length
    assert out.column("n_chars").to_pylist() == [6, 6, 6, 6]
    assert out.column("repo").to_pylist() == ["r1", "r2", "r3", "r4"]


def test_textnorm_count_kernels():
    from fuzzy_dedupe_pipeline_ray.functions.textnorm import (
        punct_count_array,
        stopword_count_array,
        token_count_array,
    )

    arr = pa.array(["the cat, and the hat!", "", "   ", "no stops here.",
                    "THE the The"])
    assert punct_count_array(arr).to_pylist() == [2, 0, 0, 1, 0]
    assert token_count_array(arr).to_pylist() == [5, 0, 0, 3, 3]
    # 'the' x2 + 'and' = 3 (note 'hat!' is not a stopword token)
    assert stopword_count_array(arr).to_pylist() == [3, 0, 0, 0, 3]


def test_extract_zip_city_state():
    from fuzzy_dedupe_pipeline_ray.functions.extract import (
        extract_city_state_arrays,
        extract_zip_array,
    )

    addrs = pa.array([
        "123 Main St, Springfield, IL 62704",         # full form
        None,                                         # MID-array null: its
        # null list length must not poison later rows' offsets (r2 advice)
        "500 Oak Ave, Portland, OR 97205-1234",       # zip+4 -> 5-digit group
        "1 Short St",                                 # <3 parts -> no city/state
        "Somewhere, 4th District, XX 12345",          # city starts with digit
        "No numbers at all",
        None,
    ])
    zips = extract_zip_array(addrs).to_pylist()
    assert zips == ["62704", None, "97205", None, "12345", None, None]
    city, state = extract_city_state_arrays(addrs)
    assert city.to_pylist() == ["Springfield", None, "Portland", None, None,
                                None, None]
    assert state.to_pylist() == ["IL", None, "OR", None, "XX", None, None]


def test_sessionize_block_scan_boundary_invariance():
    """The sessionize cross-block prefix scan must give identical labels
    for ANY block split of the sorted rows — including splits mid-user,
    mid-session, and exactly at a session break."""
    from fuzzy_dedupe_pipeline_ray.pipelines.relational import (
        _session_block_labels,
        _session_block_summary,
        _session_prefix_scan,
    )

    gap_us = 30 * 60 * 1_000_000
    rng = np.random.RandomState(11)
    users, tss = [], []
    t0 = np.int64(1_700_000_000_000_000)
    for u in range(1, 6):
        t = t0 + rng.randint(0, 10**6)
        for _ in range(rng.randint(5, 25)):
            # mixture of small gaps (same session) and >30min gaps
            t = t + (rng.randint(1, 10) * 60_000_000
                     if rng.rand() < 0.7
                     else rng.randint(31, 120) * 60_000_000)
            users.append(u)
            tss.append(int(t))
    tbl = pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(np.array(tss, "datetime64[us]")),
    })
    order = pa.compute.sort_indices(
        tbl, sort_keys=[("user_id", "ascending"), ("ts", "ascending")])
    tbl = tbl.take(order)

    def run(chunks):
        summaries = [_session_block_summary(c, gap_us) for c in chunks]
        offs, conts = _session_prefix_scan(summaries, gap_us)
        parts = [_session_block_labels(c, gap_us, offs[i], conts[i])
                 for i, c in enumerate(chunks) if summaries[i] is not None]
        return pa.concat_tables(parts)

    golden = run([tbl])
    for size in (1, 3, 7, 16, 1000):
        chunks = [tbl.slice(i, size) for i in range(0, tbl.num_rows, size)]
        got = run(chunks)
        assert got.equals(golden), f"split size {size} diverges"
    # sanity: session ids are 0-based and contiguous per user
    import pandas as pd

    df = golden.to_pandas()
    for u, g in df.groupby("user_id"):
        sids = sorted(g["session_id"].unique())
        assert sids == list(range(len(sids)))


def test_regex_token_count():
    from fuzzy_dedupe_pipeline_ray.functions.textnorm import (
        regex_token_count_array,
    )

    arr = pa.array(["hello world42!", "", "  a+b=c3  ", "x_1 y-2"])
    # letter runs + digit runs + single punct marks each count once
    assert regex_token_count_array(arr).to_pylist() == [4, 0, 6, 6]


def test_verify_fused_and_join_paths_equivalent(ray_session):
    """The fused bank-lookup verify path (broadcast fast path) must emit
    row-identical edges to the two-hash-join + batch-scorer path (the
    100 TB shape, forced via a zero broadcast budget)."""
    import dataclasses

    import ray.data

    from fuzzy_dedupe_pipeline_ray.stages.fingerprint import fingerprint
    from fuzzy_dedupe_pipeline_ray.stages.lsh import candidate_pairs
    from fuzzy_dedupe_pipeline_ray.stages.verify import verify_pairs
    from fuzzy_dedupe_pipeline_ray.fixtures import corpus_dir

    d = corpus_dir("tiny", root="/tmp/fdpr_test_fixtures")
    files = ray.data.read_parquet(
        f"{d}/files.parquet",
        columns=["repo", "path", "commit", "lang", "content"])
    cfg = PipelineConfig(fingerprint_concurrency=2)
    sigs = fingerprint(files, cfg).materialize()
    pairs = candidate_pairs(sigs, cfg).materialize()
    assert pairs.count() > 0

    fused = verify_pairs(pairs, sigs, cfg).to_pandas()
    cfg_dist = dataclasses.replace(cfg, broadcast_max_rows=0,
                                   band_driver_max_rows=0)
    joined = verify_pairs(pairs, sigs, cfg_dist).to_pandas()

    key = ["id_a", "id_b"]
    fused = fused.sort_values(key).reset_index(drop=True)
    joined = joined.sort_values(key).reset_index(drop=True)
    assert len(fused) == len(joined) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(fused, joined)


def test_doc_fingerprint_exact_family_check(ray_session):
    """Identical texts must yield identical winnowing fingerprints — the
    all-true invariant the driver oracle pins."""
    from fuzzy_dedupe_pipeline_ray.pipelines import textops

    df = textops.doc_fingerprint_exact_family_check(
        "/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    assert df["same_fp_as_rep"].all()


def test_anti_join_tiers_equivalent(ray_session):
    """anti_join_pairs three ways — broadcast np.isin filter (gate on),
    sorted distributed tier (default above gate), marker hash join
    (retained baseline) — must drop exactly the same pair set."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
    from fuzzy_dedupe_pipeline_ray.stages.substring import anti_join_pairs

    rng = np.random.RandomState(17)
    a = rng.randint(0, 300, 5000).astype(np.int64)
    b = rng.randint(300, 600, 5000).astype(np.int64)
    pairs = ray.data.from_arrow(pa.table({
        "id_a": pa.array(a), "id_b": pa.array(b)})).repartition(7)
    # exclude ~half, plus pairs absent from the left side
    ex_idx = rng.choice(5000, 2500, replace=False)
    exclude = ray.data.from_arrow(pa.table({
        "id_a": pa.array(np.r_[a[ex_idx], [9999, 10000]]),
        "id_b": pa.array(np.r_[b[ex_idx], [1, 2]])})).repartition(5)

    def collect(cfg):
        df = anti_join_pairs(pairs, exclude, cfg).to_pandas()
        return sorted(zip(df["id_a"].tolist(), df["id_b"].tolist()))

    bc = collect(PipelineConfig())
    srt = collect(PipelineConfig(broadcast_max_rows=0))
    hsh = collect(PipelineConfig(broadcast_max_rows=0,
                                 extra={"anti_join_impl": "hash"}))
    assert srt == bc == hsh
    kept = set(srt)
    dropped = set(zip(a[ex_idx].tolist(), b[ex_idx].tolist()))
    assert not (kept & dropped) and len(kept) > 0
