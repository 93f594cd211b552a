"""Fused sort-tier (stages/fused.py) equivalence: signatures carried
through the band shuffle + in-group scoring must produce BIT-IDENTICAL
edge sets to the classic composition (candidate_pairs → verify_pairs) on
every tier — broadcast fast path, forced-distributed classic, and the
fused tier itself — including hot star groups and groups straddling
sorted-block boundaries."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
from fuzzy_dedupe_pipeline_ray.stages.fused import fused_scored_edges
from fuzzy_dedupe_pipeline_ray.stages.lsh import candidate_pairs
from fuzzy_dedupe_pipeline_ray.stages.verify import fuzzy_edges, verify_pairs

P, BANDS, ROWS = 16, 4, 4


def _cfg(**kw):
    base = dict(num_perms=P, num_bands=BANDS, rows_per_band=ROWS,
                band_group_pair_cap=6)
    base.update(kw)
    return PipelineConfig(**base)


FORCED = dict(broadcast_max_rows=0, keyed_broadcast_max_rows=0,
              band_driver_max_rows=0, verify_dag_max_pairs=0)


def _mk_signatures(seed: int = 3, n_families: int = 40,
                   hot_family: int = 30):
    """Synthetic signature table with planted near-dup families (some
    above, some below the Jaccard threshold), one HOT family larger than
    the star cap, and a tail of singletons. sha equality is planted for
    a subset of each family so hybrid/signature+bits/signature
    match_types all occur."""
    rng = np.random.RandomState(seed)
    rows_m, rows_h, rows_s, rows_id, rows_sha = [], [], [], [], []
    next_id = 1

    def add(sig, sim, sha):
        nonlocal next_id
        rows_m.append(sig.astype("<u4").tobytes())
        rows_h.append(sim)
        rows_id.append(next_id)
        rows_sha.append(sha)
        next_id += 1

    for f in range(n_families):
        base = rng.randint(0, 1 << 31, P).astype(np.uint32)
        base_sim = np.uint64(rng.randint(0, 1 << 62))
        size = rng.randint(2, 6)
        n_mut = rng.choice([0, 1, 2, 5, 9])  # 0..2 keep, 5/9 drop
        for k in range(size):
            sig = base.copy()
            if k > 0 and n_mut:
                idx = rng.choice(P, n_mut, replace=False)
                sig[idx] = rng.randint(0, 1 << 31, n_mut)
            if k % 2 == 0:
                sim = base_sim
            else:
                # flip ~16 bits: second_sim ≈ 0.75 < simhash_threshold,
                # so non-exact pairs land on plain 'signature'
                flip = np.uint64(0)
                for b in rng.choice(64, 16, replace=False):
                    flip |= np.uint64(1) << np.uint64(int(b))
                sim = np.uint64(int(base_sim) ^ int(flip))
            sha = f"f{f:04d}" * 8 if k % 3 != 2 else f"g{f:04d}x{k}" * 4
            add(sig, sim, (sha + "0" * 64)[:64])
    # hot star family: > cap identical signatures
    hot = rng.randint(0, 1 << 31, P).astype(np.uint32)
    hot_sim = np.uint64(123456789)
    for k in range(hot_family):
        add(hot, hot_sim, "h" * 64)
    # singletons
    for _ in range(60):
        add(rng.randint(0, 1 << 31, P).astype(np.uint32),
            np.uint64(rng.randint(0, 1 << 62)), "s" * 64)

    tbl = pa.table({
        "doc_id": pa.array(rows_id, pa.int64()),
        "minhash": pa.array(rows_m, pa.binary(4 * P)),
        "simhash": pa.array(rows_h, pa.uint64()),
        "content_sha256": pa.array(rows_sha, pa.string()),
    })
    # shuffle row order so families interleave across blocks
    perm = rng.permutation(tbl.num_rows)
    return tbl.take(pa.array(perm))


def _edges_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return (df.sort_values(["id_a", "id_b"]).reset_index(drop=True)
            [["id_a", "id_b", "sig_sim", "second_sim", "exact_match",
              "match_type", "confidence"]])


@pytest.fixture(scope="module")
def sig_ds(ray_session):
    import ray.data

    # many small blocks so band groups straddle sorted-block boundaries
    return ray.data.from_arrow(_mk_signatures()).repartition(17) \
        .materialize()


def test_fused_matches_classic_all_tiers(sig_ds):
    fast = _edges_df(verify_pairs(candidate_pairs(sig_ds, _cfg()),
                                  sig_ds, _cfg()))
    classic_forced = _edges_df(verify_pairs(
        candidate_pairs(sig_ds, _cfg(**FORCED)), sig_ds, _cfg(**FORCED)))
    fused = _edges_df(fused_scored_edges(sig_ds, _cfg(**FORCED)))
    assert len(fast) > 50  # the fixture plants real edge volume
    assert set(fast["match_type"]) >= {"hybrid", "signature"}
    pd.testing.assert_frame_equal(fused, fast)
    pd.testing.assert_frame_equal(fused, classic_forced)


def test_fuzzy_edges_dispatch(sig_ds):
    # forced gates → the dispatcher must pick the fused tier and agree
    # with an explicitly forced classic run
    auto = _edges_df(fuzzy_edges(sig_ds, _cfg(**FORCED)))
    classic = _edges_df(fuzzy_edges(
        sig_ds, _cfg(**FORCED, extra={"fuzzy_impl": "classic"})))
    fused = _edges_df(fuzzy_edges(
        sig_ds, _cfg(extra={"fuzzy_impl": "fused"})))
    pd.testing.assert_frame_equal(auto, classic)
    pd.testing.assert_frame_equal(auto, fused)
    with pytest.raises(ValueError):
        fuzzy_edges(sig_ds, _cfg(extra={"fuzzy_impl": "nope"}))


def test_fused_empty_signatures(ray_session):
    import ray.data

    empty = ray.data.from_arrow(_mk_signatures().slice(0, 0))
    out = fused_scored_edges(empty, _cfg(**FORCED))
    assert out.count() == 0


def test_fused_boundary_scan_rejects_shuffled_blocks():
    """The in-path sort-order assertion: feeding summaries whose block
    order violates last_key[i] <= first_key[i+1] must raise loudly."""
    from fuzzy_dedupe_pipeline_ray.stages.fused import (
        _scan_boundary_spans_sig,
    )

    def sm(fk, lk):
        ids = np.array([1], np.int64)
        m = np.zeros((1, P), np.uint32)
        h = np.zeros(1, np.uint64)
        s = np.array([b"x" * 64], "S64")
        return (fk, 1, ids, 1, m, h, s, lk, 1, ids, 1, m, h, s)

    _scan_boundary_spans_sig([sm(0, 5), sm(5, 9)], cap=6)  # fine
    with pytest.raises(RuntimeError, match="order violation"):
        _scan_boundary_spans_sig([sm(10, 20), sm(3, 7)], cap=6)


def test_fused_byte_gate_falls_back_to_classic(sig_ds):
    """Above fused_fuzzy_max_bytes the dispatcher must pick the classic
    tier (the fused explode's sort residency would not fit) — and the
    result is unchanged."""
    gated = _edges_df(fuzzy_edges(
        sig_ds, _cfg(**FORCED, fused_fuzzy_max_bytes=1)))
    fused = _edges_df(fuzzy_edges(sig_ds, _cfg(**FORCED)))
    pd.testing.assert_frame_equal(gated, fused)
