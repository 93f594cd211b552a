"""hash_join guard rails: Ray 2.49's hash-shuffle skips empty input
blocks entirely (`_shuffle_block`, hash_shuffle.py:223-225) and only the
FIRST submitted shuffle task per input broadcasts the schema to all
aggregators (hash_shuffle.py:584). A join input whose first block is
empty can therefore leave some partitions with a schema-less empty table
at finalize → Acero `No match or multiple matches for key field`.
`sources.io.hash_join` compacts empty blocks out of materialized inputs
and short-circuits empty sides; these tests pin that behavior."""

import pyarrow as pa
import pytest

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
from fuzzy_dedupe_pipeline_ray.sources.io import _compact_blocks, hash_join

CFG = PipelineConfig(num_partitions=8)


def _empty_kw():
    return pa.table({"k": pa.array([], pa.int64()),
                     "w": pa.array([], pa.int64())})


def test_compact_blocks_drops_empties(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        [_empty_kw(), pa.table({"k": [1, 2], "w": [10, 20]}),
         _empty_kw()]).materialize()
    out, n = _compact_blocks(ds)
    assert n == 2
    bundles = list(out.iter_internal_ref_bundles())
    rows = [m.num_rows for b in bundles for m in b.metadata]
    assert rows and all(r > 0 for r in rows)


def test_hash_join_right_first_block_empty(ray_session):
    import ray.data

    left = ray.data.from_arrow(
        pa.table({"k": list(range(64)), "v": list(range(64))}))
    right = ray.data.from_arrow(
        [_empty_kw(), pa.table({"k": [1], "w": [10]})]).materialize()
    out = hash_join(left, right, on="k", cfg=CFG).to_pandas()
    assert out.to_dict("records") == [{"k": 1, "v": 1, "w": 10}]


def test_hash_join_left_lazy_empty_first_block(ray_session):
    """A LAZY left whose first block is empty and whose keys concentrate
    into few hash partitions used to crash at finalize ("No match or
    multiple matches for key field reference ... left side") — the
    schema broadcast rides only the first submitted shuffle task, and an
    empty block sends none. hash_join now materializes+compacts lazy
    lefts too (the edge is triggered by SPARSE inputs — labelprop rounds
    over an edges checkpoint that leads with an empty part file — not by
    the dense at-scale case the old guard assumed away)."""
    import ray.data

    left = ray.data.from_arrow(
        [_empty_kw().rename_columns(["k", "v"]),
         pa.table({"k": [1, 1, 1, 1], "v": [10, 11, 12, 13]})]
    ).map_batches(lambda b: b, batch_format="pyarrow")
    right = ray.data.from_arrow(pa.table({"k": [1], "w": [99]}))
    out = hash_join(left, right, on="k", cfg=CFG).to_pandas()
    assert sorted(out["v"]) == [10, 11, 12, 13]
    assert set(out["w"]) == {99}


def test_hash_join_empty_right_inner_short_circuit(ray_session):
    import ray.data

    left = ray.data.from_arrow(pa.table({"k": [1, 2], "v": [5, 6]}))
    right = ray.data.from_arrow(_empty_kw()).materialize()
    out = hash_join(left, right, on="k", cfg=CFG)
    assert out.count() == 0
    assert set(out.schema().names) == {"k", "v", "w"}


def test_hash_join_empty_right_left_outer_appends_nulls(ray_session):
    import ray.data

    left = ray.data.from_arrow(pa.table({"k": [1, 2], "v": [5, 6]}))
    right = ray.data.from_arrow(_empty_kw()).materialize()
    out = hash_join(left, right, on="k", join_type="left_outer",
                    cfg=CFG).to_pandas().sort_values("k")
    assert out["k"].tolist() == [1, 2]
    assert out["v"].tolist() == [5, 6]
    assert out["w"].isna().all()


def test_hash_join_empty_left_materialized_short_circuit(ray_session):
    import ray.data

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.int64()),
                  "v": pa.array([], pa.int64())})).materialize()
    right = ray.data.from_arrow(pa.table({"k": [1], "w": [10]})).materialize()
    for jt in ("inner", "left_outer"):
        out = hash_join(left, right, on="k", join_type=jt, cfg=CFG)
        assert out.count() == 0
        assert set(out.schema().names) == {"k", "v", "w"}


def test_bloom_semi_filter_no_false_negatives(ray_session):
    """Every true match survives the Bloom pre-pass (string and int
    keys), and unrelated keys are mostly pruned (fp rate ~0.04% at 16
    bits/key — assert a loose < 5% bound on 4k probes)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from fuzzy_dedupe_pipeline_ray.config import DEFAULT_CONFIG
    from fuzzy_dedupe_pipeline_ray.sources.io import bloom_semi_filter

    rng = np.random.default_rng(3)
    right_keys = [f"gram-{i}" for i in range(1000)]
    left_hit = [right_keys[int(i)] for i in rng.integers(0, 1000, 500)]
    left_miss = [f"other-{i}" for i in range(4000)]
    left = ray.data.from_arrow(pa.table(
        {"g": pa.array(left_hit + left_miss),
         "row": pa.array(range(len(left_hit) + len(left_miss)),
                         pa.int64())})).repartition(4)
    right = ray.data.from_arrow(pa.table({"g": pa.array(right_keys)})) \
        .repartition(3)
    out = bloom_semi_filter(left, right, on="g",
                            cfg=DEFAULT_CONFIG).to_pandas()
    kept = set(out.row)
    assert set(range(500)) <= kept          # no false negatives
    fp = len(kept) - 500
    assert fp < 0.05 * 4000, fp             # real pruning

    # int64 keys take the splitmix64 path
    ir = ray.data.from_arrow(pa.table(
        {"k": pa.array(np.arange(0, 2000, 2), pa.int64())}))
    il = ray.data.from_arrow(pa.table(
        {"k": pa.array(np.arange(3000), pa.int64())}))
    got = bloom_semi_filter(il, ir, on="k", cfg=DEFAULT_CONFIG).to_pandas()
    want = set(range(0, 2000, 2))
    assert want <= set(got.k)
    assert len(got) - len(want) < 0.05 * 3000

    # empty right short-circuits to an empty left
    er = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    assert bloom_semi_filter(il, er, on="k",
                             cfg=DEFAULT_CONFIG).count() == 0


def test_hash_join_full_outer_and_empty_sides(ray_session):
    import pyarrow as pa
    import ray.data

    from fuzzy_dedupe_pipeline_ray.config import DEFAULT_CONFIG
    from fuzzy_dedupe_pipeline_ray.sources.io import hash_join

    a = ray.data.from_arrow(pa.table({"k": [1, 2, 3], "x": [10, 20, 30]}))
    b = ray.data.from_arrow(pa.table({"k": [2, 3, 4], "y": [7, 8, 9]}))
    df = hash_join(a, b, on="k", cfg=DEFAULT_CONFIG,
                   join_type="full_outer").to_pandas().sort_values(
        "k").reset_index(drop=True)
    assert df.k.tolist() == [1, 2, 3, 4]
    assert df.x.fillna(-1).tolist() == [10, 20, 30, -1]
    assert df.y.fillna(-1).tolist() == [-1, 7, 8, 9]

    empty = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                          "y": pa.array([], pa.int64())}))
    # empty right: left rows survive with null y
    d2 = hash_join(a, empty, on="k", cfg=DEFAULT_CONFIG,
                   join_type="full_outer").to_pandas()
    assert sorted(d2.k) == [1, 2, 3] and d2.y.isna().all()
    # empty left: right rows survive with null x
    d3 = hash_join(ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.int64()),
                  "x2": pa.array([], pa.int64())})), a, on="k",
        cfg=DEFAULT_CONFIG, join_type="full_outer").to_pandas()
    assert sorted(d3.k) == [1, 2, 3] and d3.x2.isna().all()


def test_merge_join_matches_hash_join_and_broadcast(ray_session):
    """Three-way equivalence of lookup_join's tiers on a skewed keyed
    table with missing keys and multi-block sides: broadcast (gate on)
    vs sort-merge (default above-gate) vs Acero hash join (retained
    baseline), inner AND left_outer."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    rng = np.random.RandomState(5)
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(rng.randint(0, 500, 4000), pa.int64()),
        "v": pa.array(np.arange(4000), pa.int64()),
    })).repartition(11)
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(0, 500, 2), pa.int64()),  # half missing
        "w": pa.array(np.arange(250) * 10, pa.int64()),
    })).repartition(7)

    def collect(cfg, jt):
        df = lookup_join(left, right, on="k", cfg=cfg,
                         join_type=jt).to_pandas()
        return df.sort_values(["k", "v"]).reset_index(drop=True) \
            .astype({"w": "float64"})

    for jt in ("inner", "left_outer"):
        bc = collect(PipelineConfig(), jt)
        mj = collect(PipelineConfig(broadcast_max_rows=0), jt)
        hj = collect(PipelineConfig(broadcast_max_rows=0,
                                    extra={"lookup_join_impl": "hash"}), jt)
        pd.testing.assert_frame_equal(mj, bc)
        pd.testing.assert_frame_equal(mj, hj[mj.columns])


def test_merge_join_null_keys_match_broadcast(ray_session):
    """Null join keys must behave identically on every tier REGARDLESS
    of Ray's sorted-block layout: index_in matches null-to-null, so a
    null-key left row finds the null right row even when the nulls land
    in their own all-null sorted block (review finding, round 4)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, None, 2, None, 3], pa.int64()),
        "v": pa.array([10, 11, 12, 13, 14], pa.int64()),
    })).repartition(3)
    # many null right rows so the sort isolates them in their own block
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([None] * 30 + [1, 2], pa.int64()),
        "w": pa.array([99] * 30 + [100, 200], pa.int64()),
    })).repartition(5)

    def collect(cfg, jt):
        df = lookup_join(left, right, on="k", cfg=cfg,
                         join_type=jt).to_pandas()
        return (df.sort_values(["v"]).reset_index(drop=True)
                .astype({"w": "float64"}))

    for jt in ("inner", "left_outer"):
        bc = collect(PipelineConfig(), jt)
        mj = collect(PipelineConfig(broadcast_max_rows=0), jt)
        pd.testing.assert_frame_equal(mj, bc)


def test_merge_join_probe_budget_falls_back_to_hash(ray_session):
    """A tiny ``merge_join_probe_max_bytes`` makes every probe exceed
    budget, so merge_join must route the whole join to the hash tier —
    and the result must still match the broadcast tier exactly (review
    finding, round 5: the full-right-gather probe shape behind the
    round-4 verify OutOfDiskError now self-guards)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    rng = np.random.RandomState(9)
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(rng.randint(0, 200, 1500), pa.int64()),
        "v": pa.array(np.arange(1500), pa.int64()),
    })).repartition(5)
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(0, 200, 2), pa.int64()),
        "w": pa.array([b"x" * 64] * 100, pa.binary()),
    })).repartition(3)

    def collect(cfg, jt):
        df = lookup_join(left, right, on="k", cfg=cfg,
                         join_type=jt).to_pandas()
        return df.sort_values(["k", "v"]).reset_index(drop=True)

    for jt in ("inner", "left_outer"):
        bc = collect(PipelineConfig(), jt)
        guarded = collect(PipelineConfig(broadcast_max_rows=0,
                                         merge_join_probe_max_bytes=1),
                          jt)
        pd.testing.assert_frame_equal(
            guarded[sorted(guarded.columns)], bc[sorted(bc.columns)])


def test_merge_join_schema_less_right(ray_session):
    """merge_join with an empty, schema-less right dataset must not
    crash (right_schema is None) and must mirror the broadcast tier's
    degenerate semantics exactly: empty for inner, ValueError for
    left_outer (review findings, round 5 — merge_join is a public
    helper, reachable without lookup_join's gates, and the tiers must
    not diverge on the same input)."""
    import ray.data

    from fuzzy_dedupe_pipeline_ray.sources.io import merge_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "v": pa.array([10, 20, 30], pa.int64()),
    }))
    right = ray.data.from_items([])
    assert right.schema() is None

    inner = merge_join(left, right, on="k", cfg=CFG, join_type="inner")
    assert inner.count() == 0
    with pytest.raises(ValueError, match="schemaless"):
        merge_join(left, right, on="k", cfg=CFG, join_type="left_outer")


def test_merge_join_probe_budget_preserves_null_matching(ray_session):
    """The probe-budget hash fallback must keep the tiers' null-key
    contract (null matches null) even though Acero would drop those
    rows — null-key left rows are joined against the null right row
    out-of-band (review finding, round 5)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, None, 2, None, 3, 4], pa.int64()),
        "v": pa.array([10, 11, 12, 13, 14, 15], pa.int64()),
    })).repartition(3)
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([None, 1, 2], pa.int64()),
        "w": pa.array([99, 100, 200], pa.int64()),
    })).repartition(2)

    def collect(cfg, jt):
        df = lookup_join(left, right, on="k", cfg=cfg,
                         join_type=jt).to_pandas()
        return (df.sort_values(["v"]).reset_index(drop=True)
                .astype({"w": "float64"}))

    for jt in ("inner", "left_outer"):
        bc = collect(PipelineConfig(), jt)
        guarded = collect(PipelineConfig(broadcast_max_rows=0,
                                         merge_join_probe_max_bytes=1),
                          jt)
        pd.testing.assert_frame_equal(
            guarded[sorted(guarded.columns)], bc[sorted(bc.columns)])
        # the null-key rows really did match the null right row
        assert (bc.loc[bc["v"].isin([11, 13]), "w"] == 99.0).all()
