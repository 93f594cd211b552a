"""128-bit doc-id scale path (``stages/identity.py``): collision remap
correctness, and flagship-pipeline parity + determinism under
``doc_id_bits=128`` (VERDICT r2 next-round item 5)."""

import collections

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pds

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
from fuzzy_dedupe_pipeline_ray.fixtures import corpus_dir
from fuzzy_dedupe_pipeline_ray.functions.hashing import hash64_str, hash128_str
from fuzzy_dedupe_pipeline_ray.pipelines.dedupe import DedupePipeline
from fuzzy_dedupe_pipeline_ray.stages.identity import (
    apply_id_remap,
    build_id_remap,
    remap_arrays,
)

CORPUS_ROOT = "/tmp/fdpr_test_fixtures"


def test_hash128_lo_equals_hash64():
    vals = ["a\x00b\x00c", "x", "", "héllo\x00wörld\x00π"]
    lo, hi = hash128_str(vals)
    assert np.array_equal(lo, hash64_str(vals))
    assert lo.dtype == np.int64 and hi.dtype == np.int64
    assert (lo >= 0).all() and (hi >= 0).all()


def test_apply_id_remap_rewrites_only_matching_pairs():
    remap = remap_arrays(pa.table({
        "doc_id": pa.array([10, 10, 40], pa.int64()),
        "doc_id_hi": pa.array([2, 3, 7], pa.int64()),
        "new_doc_id": pa.array([100, 101, 102], pa.int64()),
    }))
    lo = np.array([10, 10, 10, 40, 40, 5], dtype=np.int64)
    hi = np.array([1, 2, 3, 7, 8, 2], dtype=np.int64)
    out = apply_id_remap(lo, hi, remap)
    # (10,1): lo collides but hi not in remap → keeps id (the min-hi member)
    assert out.tolist() == [10, 100, 101, 102, 40, 5]
    # empty remap is a no-op passthrough
    assert apply_id_remap(lo, hi, None) is lo


def test_build_id_remap_resolves_planted_collisions(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    clean = np.unique(rng.integers(1 << 20, 1 << 40, size=5000)).astype(np.int64)
    # plant 3 collided lo groups (sizes 2, 2, 3) among the clean ids
    col_lo = np.array([111, 111, 222, 222, 333, 333, 333], dtype=np.int64)
    col_hi = np.array([5, 9, 1, 2, 30, 10, 20], dtype=np.int64)
    lo = np.concatenate([clean, col_lo])
    hi = np.concatenate([np.arange(len(clean), dtype=np.int64), col_hi])
    ids_ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(lo, pa.int64()),
        "doc_id_hi": pa.array(hi, pa.int64())}))

    remap_tbl = build_id_remap(ids_ds, PipelineConfig(doc_id_bits=128))
    # one surrogate per non-min-hi member: (2-1)+(2-1)+(3-1) = 4
    assert remap_tbl.num_rows == 4
    kept = {(111, 5), (222, 1), (333, 10)}  # min-hi member keeps its id
    remapped = set(zip(remap_tbl.column("doc_id").to_pylist(),
                       remap_tbl.column("doc_id_hi").to_pylist()))
    assert remapped.isdisjoint(kept)
    new = remap_tbl.column("new_doc_id").to_numpy()
    assert len(np.unique(new)) == len(new)          # surrogates distinct
    assert not np.isin(new, lo).any()               # ...and miss the corpus
    assert (new >= 0).all()

    # applying the remap makes the full id set collision-free
    out = apply_id_remap(lo, hi, remap_arrays(remap_tbl))
    assert len(np.unique(out)) == len(out)


def test_build_id_remap_empty_when_no_collisions(ray_session):
    import ray.data

    ids_ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 3], pa.int64()),
        "doc_id_hi": pa.array([9, 8, 7, 7], pa.int64())}))
    # lo=3 repeats but hi agrees (same doc key seen twice) — not a collision
    assert build_id_remap(ids_ds, PipelineConfig(doc_id_bits=128)).num_rows == 0


def _cluster_families(assign_tbl):
    """cluster partition as frozensets of (repo,path,commit) triples —
    id-representation-independent."""
    fams = collections.defaultdict(set)
    for r in assign_tbl.to_pylist():
        fams[r["cluster_id"]].add((r["repo"], r["path"], r["commit"]))
    return frozenset(frozenset(v) for v in fams.values())


def test_flagship_parity_and_determinism_with_128bit_ids(
        ray_session, tmp_path_factory):
    d = corpus_dir("tiny", root=CORPUS_ROOT)
    cfg128 = PipelineConfig(doc_id_bits=128)

    run64 = str(tmp_path_factory.mktemp("run_id64"))
    paths64 = DedupePipeline(f"{d}/files.parquet", run64).run()
    a64 = pds.dataset(paths64["assignments"]).to_table()

    run128 = str(tmp_path_factory.mktemp("run_id128"))
    paths128 = DedupePipeline(f"{d}/files.parquet", run128, cfg128).run()
    a128 = pds.dataset(paths128["assignments"]).to_table()

    # the id's upper half is carried through docs → assignments
    assert "doc_id_hi" in a128.schema.names
    assert a128.num_rows == a64.num_rows
    # identical cluster STRUCTURE regardless of id width
    assert _cluster_families(a128) == _cluster_families(a64)
    # at fixture scale no lo-64 collision exists, so ids coincide
    assert (np.sort(a128.column("doc_id").to_numpy())
            == np.sort(a64.column("doc_id").to_numpy())).all()

    # resume determinism: a fresh pipeline over the same run_dir resumes
    # from checkpoints (incl. the persisted remap) byte-identically
    paths_r = DedupePipeline(f"{d}/files.parquet", run128, cfg128).run()
    ar = pds.dataset(paths_r["assignments"]).to_table()
    assert ar.sort_by("doc_id").equals(a128.sort_by("doc_id"))
